"""Round-5 probe: does splitting the run into multiple accumulation
windows hide the audio D2H behind the next window's upload/compute
(VERDICT r4 item 5 — "kill the flush_fetch tail")?

A/B on the flagship 30 s / 2.5 MS/s NFM geometry, device-only serial
pipeline, same process (one session toll):

  A. default geometry — 18 chunks in ONE accumulation window; the only
     fetch is the EOF fetch, so `flush_fetch` carries the whole drain.
  B. IQ2A_ACC=4 — 5 windows; windows 0-3 start their D2H async behind
     the following window's uploads/dispatches, leaving only window 4's
     fetch exposed at EOF.

Prints the per-pass `timing:` split (loop / dispatch / flush_fetch /
flush_write / h2d) for each arm.  Success criterion: arm B's total
flush_fetch ~ one window's fetch (i.e. <= ~1/5 of arm A's when the wire
regime is comparable between passes).
"""

from __future__ import annotations

import logging
import os
import re
import sys
import tempfile
import threading
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(REPO / ".jax_cache"))
os.environ["IQ2A_TIMING"] = "1"

logging.basicConfig(level=logging.INFO)

from iq_to_audio_tpu.pipeline.benchmark import generate_synthetic_iq  # noqa: E402
from iq_to_audio_tpu.pipeline.config import ProcessingConfig  # noqa: E402
from iq_to_audio_tpu.pipeline.pipeline import ProcessingPipeline  # noqa: E402

SAMPLE_RATE = 2_500_000.0
SECONDS = 30.0
CENTER = 400_000_000.0
OFFSET = 25_000.0

timings: dict[str, list[dict[str, float]]] = {"1win": [], "5win": []}
_TIMING_RE = re.compile(
    r"loop=([\d.]+)s dispatch=([\d.]+)s flush_fetch=([\d.]+)s "
    r"flush_write=([\d.]+)s h2d=([\d.]+)s"
)


class _TimingTap(logging.Handler):
    def __init__(self) -> None:
        super().__init__()
        self.arm = "?"

    def emit(self, record: logging.LogRecord) -> None:
        if self.arm not in timings:  # warm passes log timing lines too
            return
        m = _TIMING_RE.search(record.getMessage())
        if m:
            keys = ("loop", "dispatch", "flush_fetch", "flush_write", "h2d")
            timings[self.arm].append(
                {k: float(v) for k, v in zip(keys, m.groups())}
            )


def main() -> None:
    tap = _TimingTap()
    logging.getLogger("iq_to_audio_tpu.pipeline.pipeline").addHandler(tap)

    toll_done = threading.Event()

    def _toll() -> None:
        import jax.numpy as jnp
        import numpy as np

        t0 = time.perf_counter()
        np.asarray(jnp.ones((128, 128)) @ jnp.ones((128, 128)))
        logging.info("session toll paid: %.1f s", time.perf_counter() - t0)
        toll_done.set()

    threading.Thread(target=_toll, daemon=True).start()

    with tempfile.TemporaryDirectory() as tmp:
        tmpdir = Path(tmp)
        capture = tmpdir / f"benchmark_fc-{int(CENTER)}Hz.wav"
        generate_synthetic_iq(
            capture, sample_rate=SAMPLE_RATE, seconds=SECONDS, freq_offset=OFFSET
        )

        def make_config(tag: str) -> ProcessingConfig:
            return ProcessingConfig(
                in_path=capture,
                target_freq=CENTER + OFFSET,
                center_freq=CENTER,
                center_freq_source="probe",
                demod_mode="nfm",
                output_path=tmpdir / f"audio_{tag}.wav",
            )

        # warm (compile) both geometries fetch-free while the toll drains
        for acc, tag in ((None, "warm1"), ("4", "warm5")):
            if acc is None:
                os.environ.pop("IQ2A_ACC", None)
            else:
                os.environ["IQ2A_ACC"] = acc
            pipe = ProcessingPipeline(make_config(tag))
            pipe.warm_no_fetch = True
            t0 = time.perf_counter()
            pipe.run(None)
            logging.info("warm %s: %.1f s", tag, time.perf_counter() - t0)

        toll_done.wait(timeout=900)

        for i in range(4):
            for acc, arm in ((None, "1win"), ("4", "5win")):
                if acc is None:
                    os.environ.pop("IQ2A_ACC", None)
                else:
                    os.environ["IQ2A_ACC"] = acc
                tap.arm = arm
                t0 = time.perf_counter()
                ProcessingPipeline(make_config(f"{arm}{i}")).run(None)
                wall = time.perf_counter() - t0
                t = timings[arm][-1] if timings[arm] else {}
                logging.info(
                    "pass %d %s: wall %.2f s (%.1fx) split %s",
                    i, arm, wall, SECONDS / wall, t,
                )

    for arm in ("1win", "5win"):
        runs = timings[arm]
        if not runs:
            continue
        best = min(runs, key=lambda t: t["loop"])
        print(
            f"{arm}: passes={len(runs)} best loop={best['loop']:.2f}s "
            f"flush_fetch={best['flush_fetch']:.2f}s h2d={best['h2d']:.2f}s "
            f"median flush_fetch="
            f"{sorted(t['flush_fetch'] for t in runs)[len(runs) // 2]:.2f}s"
        )


if __name__ == "__main__":
    main()
