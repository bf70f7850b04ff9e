# iq-to-audio-tpu runtime image (CPU JAX by default; install the TPU wheel
# for Cloud TPU VMs — see comments below).
FROM python:3.12-slim AS base

ENV PYTHONDONTWRITEBYTECODE=1 \
    PYTHONUNBUFFERED=1 \
    PIP_NO_CACHE_DIR=1

RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ make \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY pyproject.toml README.md ./
COPY iq_to_audio_tpu ./iq_to_audio_tpu
COPY native ./native

# CPU JAX; on a TPU VM replace with: pip install 'jax[tpu]' -f \
#   https://storage.googleapis.com/jax-releases/libtpu_releases.html
RUN pip install . tqdm matplotlib && make -C native

ENTRYPOINT ["iq-to-audio-tpu"]
CMD ["--help"]
