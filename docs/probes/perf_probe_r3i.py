"""Probe R3I: per-segment fixed overhead of short pipeline runs (CPU).

Motivation: the heterogeneous burst mode's CPU worker measured ~3x
effective realtime on 2.4 s segments of the bench capture while the same
backend sustains ~19x on the full 30 s run.  That gap is per-run fixed
cost (pipeline construction, probing, filter/resampler design, jit cache
lookups, writer setup) amortised over 2.9 s instead of 30 s.  This probe
times warm serial runs vs warm segment-window runs and attributes the
fixed cost, to decide segment sizing (fewer, larger segments) and what
to cache across runs.

Run: JAX_PLATFORMS=cpu python docs/probes/perf_probe_r3i.py
"""

from __future__ import annotations

import logging
import os
import sys
import tempfile
import time
from pathlib import Path

os.environ.setdefault("JAX_PLATFORMS", "cpu")
REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO))

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

logging.basicConfig(level=logging.WARNING)


def main() -> None:
    from iq_to_audio_tpu.pipeline.benchmark import generate_synthetic_iq
    from iq_to_audio_tpu.pipeline.config import ProcessingConfig
    from iq_to_audio_tpu.pipeline.pipeline import ProcessingPipeline
    from iq_to_audio_tpu.pipeline.segmented import plan_segments
    from iq_to_audio_tpu.pipeline.filters import compute_decimation
    from iq_to_audio_tpu.ops.resample import ResamplePlan

    fs = 2_500_000.0
    seconds = 12.0
    center, offset = 400e6, 25e3
    tmp = Path(tempfile.mkdtemp())
    cap = tmp / f"benchmark_fc-{int(center)}Hz.wav"
    generate_synthetic_iq(cap, sample_rate=fs, seconds=seconds, freq_offset=offset)

    def cfg(tag, **kw):
        return ProcessingConfig(
            in_path=cap,
            target_freq=center + offset,
            center_freq=center,
            center_freq_source="probe",
            demod_mode="nfm",
            output_path=tmp / f"a_{tag}.wav",
            mix_sign_override=1,
            **kw,
        )

    # serial, twice (first = compile)
    for i in range(2):
        t0 = time.perf_counter()
        ProcessingPipeline(cfg(f"s{i}")).run(None)
        e = time.perf_counter() - t0
        print(f"serial {i}: {e:.3f} s  ({seconds / e:.1f}x)")

    # segment plan like the hetero executor's
    decim, fs_ch = compute_decimation(fs, 96_000.0)
    rp = ResamplePlan.create(fs_ch, 48_000.0, 1)
    segs = plan_segments(int(seconds * fs), fs, decim, rp.up, rp.down, 5)
    print(f"{len(segs)} segments, owned ~{segs[1].length / fs:.2f} s, "
          f"lead {segs[1].lead / fs:.2f} s")

    # two rounds over the same segment geometry: round 2 is fully warm
    for rnd in range(2):
        total = 0.0
        for s in segs:
            t0 = time.perf_counter()
            ProcessingPipeline(
                cfg(
                    f"g{rnd}_{s.index}",
                    input_start_sample=s.read_start,
                    input_num_samples=s.read_samples,
                )
            ).run(None)
            e = time.perf_counter() - t0
            total += e
            sig = s.read_samples / fs
            print(f"  round {rnd} seg {s.index}: {e:.3f} s for {sig:.2f} s "
                  f"({sig / e:.1f}x)")
        print(f"round {rnd} total: {total:.3f} s ({seconds / total:.1f}x incl leads)")


if __name__ == "__main__":
    main()
