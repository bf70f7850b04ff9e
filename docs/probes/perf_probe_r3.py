"""Round-3 relay probe: overlapped-vs-phased schedule A/B + tiled Pallas.

Run on the real chip (axon relay).  Measures, with the session toll paid
up front on a background thread:

1. the tiled-tap-axis Pallas kernel (grid_k > 1) compiling and matching
   the XLA conv on device (validates Mosaic semantics the CPU interpret
   tests cannot),
2. bench-geometry end-to-end passes alternating IQ2A_OVERLAP=1/0, with
   IQ2A_TIMING=1 breakdowns, to characterise today's relay regime.

Provenance: executed 2026-08-17 (round 3); results recorded in
docs/performance.md.
"""

from __future__ import annotations

import json
import logging
import os
import sys
import threading
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO))

logging.basicConfig(level=logging.INFO, stream=sys.stderr)
LOG = logging.getLogger("probe_r3")

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def main() -> int:
    import numpy as np
    import jax.numpy as jnp

    LOG.info("backend: %s", jax.default_backend())

    toll_done = threading.Event()

    def _pay_toll():
        t0 = time.perf_counter()
        np.asarray(jnp.ones((128, 128)) @ jnp.ones((128, 128)))
        LOG.info("session toll paid: %.1f s", time.perf_counter() - t0)
        toll_done.set()

    threading.Thread(target=_pay_toll, daemon=True).start()

    # ---- 1. tiled Pallas kernel on the real chip -----------------------
    from iq_to_audio_tpu.ops import pallas_ddc
    from iq_to_audio_tpu.ops.ddc import bandpass_kernel, interleave_kernel
    from iq_to_audio_tpu.ops.nco import nco_increment_fixed

    decim = 26
    rng = np.random.default_rng(3)
    num_taps = 8193
    taps = rng.normal(size=num_taps) / num_taps
    incs = [nco_increment_fixed(25_000.0, 2_500_000.0)]
    kernel_il = interleave_kernel(bandpass_kernel(taps, incs), "iq")
    poly_il = pallas_ddc.build_poly_kernel(kernel_il, 2 * decim)
    out_size = 2048
    n = out_size * decim
    x_il = rng.normal(scale=0.1, size=2 * (num_taps - 1) + 2 * n).astype(np.float32)
    t0 = time.perf_counter()
    got = pallas_ddc.pallas_poly_fir_il(
        jnp.asarray(x_il), jnp.asarray(poly_il), decim, out_size
    )
    got.block_until_ready()
    LOG.info("tiled pallas (K=%d, auto block) compiled+ran in %.1f s",
             poly_il.shape[0], time.perf_counter() - t0)
    # reference: direct polyphase in f64 on host
    D2 = 2 * decim
    K = poly_il.shape[0]
    t_total = x_il.size // D2
    X = x_il[: t_total * D2].reshape(t_total, D2).astype(np.float64)
    ref = np.zeros((out_size, poly_il.shape[2]))
    for k in range(K):
        if k + out_size <= t_total:
            rows = X[k : k + out_size]
        else:
            rows = np.pad(X[k:], ((0, k + out_size - t_total), (0, 0)))
        ref += rows @ poly_il[k].astype(np.float64)
    got_np = np.asarray(got)
    err = 10 * np.log10(
        np.mean((got_np - ref.T) ** 2) / max(np.mean(ref**2), 1e-30)
    )
    LOG.info("tiled pallas vs f64 direct: %.1f dB", err)
    assert err < -100.0, err

    # timing vs single-block? also time steady-state
    for _ in range(2):
        t0 = time.perf_counter()
        got = pallas_ddc.pallas_poly_fir_il(
            jnp.asarray(x_il), jnp.asarray(poly_il), decim, out_size
        )
        got.block_until_ready()
        LOG.info("tiled pallas steady pass: %.3f s", time.perf_counter() - t0)

    # ---- 2. bench-geometry schedule A/B --------------------------------
    import tempfile

    from iq_to_audio_tpu.pipeline.benchmark import generate_synthetic_iq
    from iq_to_audio_tpu.pipeline.config import ProcessingConfig
    from iq_to_audio_tpu.pipeline.pipeline import ProcessingPipeline

    seconds = float(os.environ.get("IQ2A_PROBE_SECONDS", "30"))
    center, offset = 400_000_000.0, 25_000.0
    results = []
    with tempfile.TemporaryDirectory() as tmp:
        tmpdir = Path(tmp)
        capture = tmpdir / f"benchmark_fc-{int(center)}Hz.wav"
        generate_synthetic_iq(capture, sample_rate=2_500_000.0, seconds=seconds,
                              freq_offset=offset)

        def run(tag, overlap):
            os.environ["IQ2A_OVERLAP"] = overlap
            os.environ["IQ2A_TIMING"] = "1"
            cfg = ProcessingConfig(
                in_path=capture,
                target_freq=center + offset,
                center_freq=center,
                center_freq_source="benchmark",
                demod_mode="nfm",
                output_path=tmpdir / f"audio_{tag}.wav",
            )
            t0 = time.perf_counter()
            ProcessingPipeline(cfg).run(None)
            e = time.perf_counter() - t0
            LOG.info("pass %s (overlap=%s): %.3f s wall (%.1fx)",
                     tag, overlap, e, seconds / e)
            results.append({"tag": tag, "overlap": overlap, "wall_s": round(e, 3),
                            "x_realtime": round(seconds / e, 2)})

        # warm (compile) pass, fetch-free
        warm = ProcessingPipeline(ProcessingConfig(
            in_path=capture, target_freq=center + offset, center_freq=center,
            center_freq_source="benchmark", demod_mode="nfm",
            output_path=tmpdir / "audio_warm.wav"))
        warm.warm_no_fetch = True
        t0 = time.perf_counter()
        warm.run(None)
        LOG.info("warm pass: %.1f s", time.perf_counter() - t0)

        remaining = 600 - 0
        if not toll_done.is_set():
            LOG.info("waiting for toll (up to 15 min)...")
            toll_done.wait(timeout=900)

        for i in range(6):
            run(f"p{i}", "1" if i % 2 == 0 else "0")

    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.exit(main())
