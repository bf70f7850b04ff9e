"""Built-in synthetic throughput benchmark (reference ``benchmark.py``).

Generates the same synthetic capture (complex tone at offset + Gaussian
noise, rng(42), PCM_16 WAV) and runs the full pipeline, reporting elapsed,
x-realtime and audio peak.  Because XLA compiles the chunk step on first
use, a warm-up run is performed first and the steady-state pass is timed —
the compile-inclusive cold time is reported separately.
"""

from __future__ import annotations

import logging
import math
import tempfile
import time
from collections.abc import Mapping
from pathlib import Path
from typing import Any

import numpy as np

from ..io.writer import write_stereo_wav
from .config import ProcessingConfig
from .pipeline import ProcessingPipeline

LOG = logging.getLogger(__name__)


def generate_synthetic_iq(
    path: Path,
    sample_rate: float,
    seconds: float,
    freq_offset: float,
    *,
    amplitude: float = 0.7,
    noise_std: float = 0.02,
    extra_offsets: tuple[float, ...] = (),
) -> None:
    """Synthetic capture generator (reference ``benchmark.py:19-38``).

    ``extra_offsets`` adds further carriers for multi-channel benchmarking.
    """
    total_samples = int(round(sample_rate * seconds))
    if total_samples <= 0:
        raise ValueError("Benchmark duration is too short to generate samples.")
    t = np.arange(total_samples, dtype=np.float64) / sample_rate
    tone = np.exp(1j * 2.0 * math.pi * freq_offset * t)
    for k, off in enumerate(extra_offsets):
        tone = tone + 0.6 * np.exp(
            1j * (2.0 * math.pi * off * t + 0.37 * (k + 1))
        )
    scale = amplitude / (1.0 + 0.6 * len(extra_offsets))
    rng = np.random.default_rng(42)
    noise = rng.normal(scale=noise_std, size=(total_samples, 2))
    i = scale * tone.real + noise[:, 0]
    q = scale * tone.imag + noise[:, 1]
    iq = np.clip(np.column_stack((i, q)).astype(np.float32), -0.999, 0.999)
    write_stereo_wav(path, iq, int(sample_rate), codec="pcm_s16le")


def run_benchmark(
    *,
    seconds: float,
    sample_rate: float,
    freq_offset: float,
    center_freq: float | None,
    target_freq: float | None,
    base_kwargs: Mapping[str, object] | None,
    warmup: bool = True,
    results_out: dict | None = None,
    channels: int = 1,
) -> int:
    """Synthetic throughput benchmark; ``channels > 1`` exercises the
    batched shared-channelizer pass (carriers spread across the capture)."""
    if seconds <= 0:
        raise ValueError("Benchmark duration must be positive.")
    if sample_rate <= 0:
        raise ValueError("Benchmark sample rate must be positive.")
    half_band = sample_rate / 2.0
    if abs(freq_offset) >= half_band:
        raise ValueError("Benchmark offset must be within half the sample rate.")

    demod_value = (base_kwargs or {}).get("demod_mode")
    demod_mode = demod_value.lower() if isinstance(demod_value, str) else "nfm"

    if center_freq is not None and target_freq is not None:
        offset = target_freq - center_freq
    elif center_freq is not None:
        target_freq = center_freq + freq_offset
        offset = freq_offset
    elif target_freq is not None:
        center_freq = target_freq - freq_offset
        offset = freq_offset
    else:
        center_freq = 400_000_000.0
        target_freq = center_freq + freq_offset
        offset = freq_offset

    LOG.info(
        "Running benchmark: %.2f s at %.2f MS/s, demod=%s, offset %.1f kHz",
        seconds,
        sample_rate / 1e6,
        demod_mode.upper(),
        offset / 1e3,
    )

    with tempfile.TemporaryDirectory() as tmpdir:
        tmpdir_path = Path(tmpdir)
        input_path = tmpdir_path / f"benchmark_fc-{int(center_freq)}Hz.wav"
        extra_offsets: tuple[float, ...] = ()
        extra_targets: list[float] = []
        if channels > 1:
            span = sample_rate * 0.35
            extra_offsets = tuple(
                span * (k + 1) / channels * (1 if k % 2 == 0 else -1)
                for k in range(channels - 1)
            )
            extra_targets = [center_freq + o for o in extra_offsets]
        generate_synthetic_iq(
            input_path,
            sample_rate=sample_rate,
            seconds=seconds,
            freq_offset=offset,
            extra_offsets=extra_offsets,
        )

        kwargs: dict[str, Any] = dict(base_kwargs) if base_kwargs is not None else {}
        kwargs.pop("target_freqs", None)
        kwargs.update(
            {
                "target_freq": target_freq,
                "extra_target_freqs": extra_targets,
                "center_freq": center_freq,
                "center_freq_source": "benchmark",
                "demod_mode": demod_mode,
                "output_path": tmpdir_path / f"benchmark_audio_{demod_mode}.wav",
                "probe_only": False,
                "mix_sign_override": 1 if channels > 1 else kwargs.get("mix_sign_override"),
            }
        )

        cold_elapsed = None
        if warmup:
            start = time.perf_counter()
            ProcessingPipeline(ProcessingConfig(in_path=input_path, **kwargs)).run(None)
            cold_elapsed = time.perf_counter() - start
            LOG.info("Warm-up (compile-inclusive) pass: %.2f s.", cold_elapsed)

        pipeline = ProcessingPipeline(ProcessingConfig(in_path=input_path, **kwargs))
        start = time.perf_counter()
        result = pipeline.run(progress_sink=None)
        elapsed = time.perf_counter() - start

    iq_samples = sample_rate * seconds
    realtime = seconds / elapsed if elapsed > 0 else float("inf")
    peak_dbfs = 20.0 * math.log10(max(result.audio_peak, 1e-6))

    LOG.info(
        "Benchmark processed %.0f IQ samples in %.2f s (%.2f x realtime).",
        iq_samples,
        elapsed,
        realtime,
    )
    LOG.info(
        "Channel decimation %d -> %.1f Hz; audio peak %.2f dBFS.",
        result.decimation,
        result.fs_channel,
        peak_dbfs,
    )
    if results_out is not None:
        results_out.update(
            {
                "seconds": seconds,
                "sample_rate": sample_rate,
                "demod": demod_mode,
                "iq_samples": iq_samples,
                "elapsed": elapsed,
                "cold_elapsed": cold_elapsed,
                "realtime_factor": realtime,
                "loop_seconds": result.loop_seconds,
                "msps": iq_samples / max(elapsed, 1e-12) / 1e6,
                "audio_peak_dbfs": peak_dbfs,
                "decimation": result.decimation,
                "fs_channel": result.fs_channel,
            }
        )
    return 0


__all__ = ["run_benchmark", "generate_synthetic_iq"]
