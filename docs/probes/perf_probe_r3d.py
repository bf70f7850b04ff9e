"""Round-3 probe D: cross-backend determinism refresh on the real chip.

Round 1 validated bit-identical CPU-vs-TPU WAVs; this re-validates after
the round-3 engine changes (conv-default channelizer, dual-schedule hot
loop, superstep grouping) for every demod mode plus pass-through, on a
small capture (cheap uploads; the session toll dominates wall time).
Both sides are pinned to the SAME channelizer kernel (J-conv and plain
conv are each tested) so the comparison measures backends, not kernels.

MEASURED (round 3, 2026-08-17, v5e): the interleaved-domain engine is no
longer bit-identical cross-backend — nfm/am/none agree within 1 s16 LSB
on <0.5% of samples (XLA conv summation-order divergence); ssb+AGC
amplifies those ulps at its zero-crossing gain spikes to ~24% of samples
(max ~5% FS).  Identical for both kernel choices, so the drift is the
stride-2D interleaved conv lowering itself, not the J-packing.  See
docs/performance.md "Cross-backend determinism".

Writes nothing outside a tempdir; prints one line per mode.
Provenance: round 3, 2026-08-17.
"""

from __future__ import annotations

import logging
import subprocess
import sys
import tempfile
import threading
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

logging.basicConfig(level=logging.INFO, stream=sys.stderr)
LOG = logging.getLogger("probe_r3d")

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

_CPU_RUNNER = r"""
import sys, json
sys.path.insert(0, "{repo}")
sys.path.insert(0, "{repo}/tests")
import os
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["IQ2A_CHANNELIZER"] = "conv"  # match the TPU path
os.environ["IQ2A_CONVJ"] = "{convj}"    # SAME kernel as the TPU side
import jax
jax.config.update("jax_platforms", "cpu")
from iq_to_audio_tpu.pipeline.config import ProcessingConfig
from iq_to_audio_tpu.pipeline.pipeline import ProcessingPipeline
from pathlib import Path
cap, out, mode = sys.argv[1], sys.argv[2], sys.argv[3]
cfg = ProcessingConfig(
    in_path=Path(cap), target_freq=145_025_000.0, demod_mode=mode,
    output_path=Path(out), mix_sign_override=1, chunk_size=65_536,
)
ProcessingPipeline(cfg).run(None)
"""


def main() -> int:
    # conftest pins JAX to CPU at import (it is the test-suite bootstrap);
    # keep its signal generators but restore this process's real backend
    prev_platforms = jax.config.jax_platforms
    from conftest import make_am_iq, make_nfm_iq, make_tone_iq

    jax.config.update("jax_platforms", prev_platforms)
    import os as _os

    _os.environ.pop("JAX_PLATFORMS", None)

    from iq_to_audio_tpu.io.writer import write_stereo_wav
    from iq_to_audio_tpu.pipeline.config import ProcessingConfig
    from iq_to_audio_tpu.pipeline.pipeline import ProcessingPipeline

    LOG.info("backend: %s", jax.default_backend())
    toll_done = threading.Event()

    def _pay_toll():
        t0 = time.perf_counter()
        np.asarray(jnp.ones((128, 128)) @ jnp.ones((128, 128)))
        LOG.info("session toll paid: %.1f s", time.perf_counter() - t0)
        toll_done.set()

    threading.Thread(target=_pay_toll, daemon=True).start()

    import os

    fs = 250_000.0
    cases = [
        ("nfm", make_nfm_iq(fs, 2.0, 25_000.0)),
        ("am", make_am_iq(fs, 2.0, 25_000.0)),
        ("usb", make_tone_iq(fs, 2.0, 26_000.0)),
        ("lsb", make_tone_iq(fs, 2.0, 24_000.0)),
        ("none", make_tone_iq(fs, 2.0, 25_000.0)),
    ]
    ok = True
    with tempfile.TemporaryDirectory() as tmp:
        tmpdir = Path(tmp)
        # Both sides must run the SAME channelizer kernel: the J-conv and the
        # plain conv reduce in different orders, so comparing J (TPU default)
        # against plain (CPU default) measures kernel choice, not backends.
        for convj in ("1", "0"):
            kname = "J-conv" if convj == "1" else "plain conv"
            os.environ["IQ2A_CONVJ"] = convj
            for mode, iq in cases:
                cap = tmpdir / f"baseband_145000000Hz_{mode}.wav"
                write_stereo_wav(cap, np.column_stack([iq.real, iq.imag]),
                                 int(fs))
                cpu_out = tmpdir / f"cpu_{convj}_{mode}.wav"
                r = subprocess.run(
                    [sys.executable, "-c",
                     _CPU_RUNNER.format(repo=REPO, convj=convj),
                     str(cap), str(cpu_out), mode],
                    capture_output=True, text=True, timeout=600,
                )
                if r.returncode != 0:
                    LOG.error("CPU run failed for %s: %s", mode,
                              r.stderr[-800:])
                    ok = False
                    continue
                tpu_out = tmpdir / f"tpu_{convj}_{mode}.wav"
                cfg = ProcessingConfig(
                    in_path=cap, target_freq=145_025_000.0, demod_mode=mode,
                    output_path=tpu_out, mix_sign_override=1,
                    chunk_size=65_536,
                )
                t0 = time.perf_counter()
                ProcessingPipeline(cfg).run(None)
                cpu_bytes = cpu_out.read_bytes()
                tpu_bytes = tpu_out.read_bytes()
                identical = cpu_bytes == tpu_bytes
                if not identical:
                    a = np.frombuffer(cpu_bytes[1000:], dtype=np.int16)
                    b = np.frombuffer(tpu_bytes[1000:], dtype=np.int16)
                    n = min(a.size, b.size)
                    diff = np.abs(
                        a[:n].astype(np.int32) - b[:n].astype(np.int32))
                    LOG.warning(
                        "%s (%s) differs: max lsb %d, frac>0 %.2e, "
                        "sizes %d/%d", mode, kname,
                        diff.max() if n else -1,
                        float(np.mean(diff > 0)) if n else -1,
                        len(cpu_bytes), len(tpu_bytes))
                    ok = False
                print(f"{mode} [{kname}]: "
                      f"{'IDENTICAL' if identical else 'DIFFERS'} "
                      f"({time.perf_counter() - t0:.1f} s on TPU)")
        os.environ.pop("IQ2A_CONVJ", None)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
