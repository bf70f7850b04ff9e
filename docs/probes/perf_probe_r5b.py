"""Round-5 probe B: accumulation-window-count sweep on the flagship
geometry (follow-up to perf_probe_r5a.py, which found 5 windows ~25%
faster than the single-window default on a slow wire).

Arms: IQ2A_ACC unset (1 window of 18 chunks), 8 (3 windows), 4
(5 windows), 2 (9 windows); 3 interleaved passes each, device-only
serial pipeline, one process / one session toll.
"""

from __future__ import annotations

import logging
import os
import sys
import tempfile
import threading
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(REPO / ".jax_cache"))

logging.basicConfig(level=logging.INFO)

from iq_to_audio_tpu.pipeline.benchmark import generate_synthetic_iq  # noqa: E402
from iq_to_audio_tpu.pipeline.config import ProcessingConfig  # noqa: E402
from iq_to_audio_tpu.pipeline.pipeline import ProcessingPipeline  # noqa: E402

SAMPLE_RATE = 2_500_000.0
SECONDS = 30.0
CENTER = 400_000_000.0
OFFSET = 25_000.0

ARMS = (None, "8", "4", "2")


def main() -> None:
    toll_done = threading.Event()

    def _toll() -> None:
        import jax.numpy as jnp
        import numpy as np

        t0 = time.perf_counter()
        np.asarray(jnp.ones((128, 128)) @ jnp.ones((128, 128)))
        logging.info("session toll paid: %.1f s", time.perf_counter() - t0)
        toll_done.set()

    threading.Thread(target=_toll, daemon=True).start()

    walls: dict[str, list[float]] = {str(a): [] for a in ARMS}

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

        def set_acc(acc: str | None) -> None:
            if acc is None:
                os.environ.pop("IQ2A_ACC", None)
            else:
                os.environ["IQ2A_ACC"] = acc

        for acc in ARMS:
            set_acc(acc)
            pipe = ProcessingPipeline(make_config(f"warm{acc}"))
            pipe.warm_no_fetch = True
            t0 = time.perf_counter()
            pipe.run(None)
            logging.info("warm acc=%s: %.1f s", acc, time.perf_counter() - t0)

        toll_done.wait(timeout=900)

        for i in range(3):
            for acc in ARMS:
                set_acc(acc)
                t0 = time.perf_counter()
                ProcessingPipeline(make_config(f"p{i}a{acc}")).run(None)
                wall = time.perf_counter() - t0
                walls[str(acc)].append(wall)
                logging.info(
                    "pass %d acc=%s: wall %.2f s (%.1fx)",
                    i, acc, wall, SECONDS / wall,
                )

    for acc in ARMS:
        runs = walls[str(acc)]
        print(
            f"acc={acc}: best {min(runs):.2f}s ({SECONDS / min(runs):.1f}x) "
            f"all {[round(w, 2) for w in runs]}"
        )


if __name__ == "__main__":
    main()
