"""Round-3 probe J: CPU-backend chunk-size A/B on the headline capture.

The CPU planner keeps the reference's 0.25-0.5 s tuned chunk (~1 Mi
samples at 2.5 MS/s); accelerators get the 4 Mi cap to amortise relay
latency (pipeline.py::run geometry section).  This probe measures whether
the CPU backend also benefits from larger chunks (fewer Python dispatch
boundaries, longer FFT batches) or loses to cache pressure.

Usage: JAX_PLATFORMS=cpu python docs/probes/perf_probe_r3j.py
"""

from __future__ import annotations

import logging
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO))

logging.basicConfig(level=logging.WARNING, stream=sys.stderr)

import os

import jax

# the axon host pins the platform programmatically from sitecustomize,
# which outranks the env var (same workaround as bench.py)
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from iq_to_audio_tpu.pipeline.benchmark import generate_synthetic_iq
from iq_to_audio_tpu.pipeline.config import ProcessingConfig
from iq_to_audio_tpu.pipeline.pipeline import ProcessingPipeline

SECONDS = 30.0
RATE = 2_500_000.0


def main() -> int:
    with tempfile.TemporaryDirectory() as tmp:
        tmpdir = Path(tmp)
        capture = tmpdir / "benchmark_fc-400000000Hz.wav"
        generate_synthetic_iq(capture, sample_rate=RATE, seconds=SECONDS,
                              freq_offset=25_000.0)
        for chunk in (1 << 18, 1 << 19, 1 << 20):
            best = float("inf")
            for i in range(4):
                cfg = ProcessingConfig(
                    in_path=capture,
                    target_freq=400_025_000.0,
                    center_freq=400_000_000.0,
                    center_freq_source="probe",
                    demod_mode="nfm",
                    chunk_size=chunk,
                    output_path=tmpdir / f"a_{chunk}_{i}.wav",
                )
                t0 = time.perf_counter()
                ProcessingPipeline(cfg).run(None)
                e = time.perf_counter() - t0
                best = min(best, e)
                print(f"chunk={chunk>>20}Mi pass {i}: {e:.3f} s "
                      f"({SECONDS / e:.1f}x)", flush=True)
            print(f"chunk={chunk>>20}Mi BEST: {best:.3f} s "
                  f"({SECONDS / best:.1f}x)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
