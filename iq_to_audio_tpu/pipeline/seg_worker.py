"""Segment-worker subprocess: a persistent pipeline executor on stdin/stdout.

One worker process owns one JAX backend (``IQ2A_WORKER_PLATFORM``, default
``cpu``) and processes segment windows fed to it as JSON lines:

    {"idx": 3, "config": {<ProcessingConfig fields, paths as strings>}}

replying one JSON line per request:

    {"idx": 3, "ok": true, "peak": 0.29, "samples": 180000, "seconds": 0.41}

The process stays warm across segments, so jit compilation (cached further
by ``JAX_COMPILATION_CACHE_DIR`` when the parent sets it) is paid once per
geometry, not once per segment.  Used by :mod:`.hetero` to run host-CPU
segment workers next to the in-process accelerator stream; the protocol is
this framework's native analogue of the reference's worker subprocesses
(ffmpeg decode/encode pipes, reference ``processing.py:160-164,420-424``) —
JSON control lines instead of raw byte pipes, because the heavy data rides
the filesystem (input capture windows, output segment WAVs), not the pipe.
"""

from __future__ import annotations

import json
import logging
import os
import sys
import time
from pathlib import Path

_PATH_FIELDS = {
    "in_path",
    "output_path",
    "dump_iq_path",
    "plot_stages_path",
    "profile_dir",
}


def config_to_wire(cfg) -> dict:
    """JSON-safe dict for one ``ProcessingConfig``."""
    import dataclasses

    out = {}
    for f in dataclasses.fields(cfg):
        v = getattr(cfg, f.name)
        if f.name in _PATH_FIELDS:
            out[f.name] = str(v) if v is not None else None
        elif f.name == "extra_output_paths":
            out[f.name] = [str(p) if p is not None else None for p in v]
        else:
            out[f.name] = v
    return out


def config_from_wire(data: dict):
    """Inverse of :func:`config_to_wire`."""
    from .config import ProcessingConfig

    kwargs = dict(data)
    for name in _PATH_FIELDS:
        if kwargs.get(name) is not None:
            kwargs[name] = Path(kwargs[name])
    kwargs["extra_output_paths"] = [
        Path(p) if p is not None else None
        for p in kwargs.get("extra_output_paths", [])
    ]
    return ProcessingConfig(**kwargs)


def main() -> int:
    logging.basicConfig(
        level=logging.WARNING,
        stream=sys.stderr,
        format="seg-worker %(levelname)s %(message)s",
    )
    # raise scheduling priority when permitted (root): the parent's device
    # stream polls its wire hard enough to starve this worker's XLA
    # threads on few-core hosts.  Done here, child-side, because
    # preexec_fn is fork-unsafe in threaded parents.
    nice_req = os.environ.get("IQ2A_WORKER_NICE")
    if nice_req:
        try:
            os.nice(int(nice_req))
        except (OSError, ValueError):
            pass

    import jax

    # sitecustomize may pin the platform programmatically (outranking the
    # env var), so re-pin explicitly — same workaround as bench.py
    platform = os.environ.get("IQ2A_WORKER_PLATFORM", "cpu")
    jax.config.update("jax_platforms", platform)
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if cache_dir:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from .pipeline import ProcessingPipeline

    # handshake so the parent can fail fast on a broken environment
    print(json.dumps({"ready": True, "backend": jax.default_backend()}),
          flush=True)

    for line in sys.stdin:
        line = line.strip()
        if not line:
            continue
        req = json.loads(line)
        if req.get("cmd") == "exit":
            break
        idx = req.get("idx")
        try:
            cfg = config_from_wire(req["config"])
            start = time.perf_counter()
            result = ProcessingPipeline(cfg).run(None)
            reply = {
                "idx": idx,
                "ok": True,
                "peak": result.audio_peak,
                "samples": result.input_samples,
                "seconds": time.perf_counter() - start,
            }
        except (KeyboardInterrupt, SystemExit):
            # a process-group SIGINT is a cancellation, not a segment
            # failure: exit so the parent sees EOF (which it reports as a
            # cancellation when the user-cancel flag is set) instead of a
            # misleading "segment worker failed: KeyboardInterrupt"
            return 130
        except BaseException as exc:  # surface everything else to the parent
            reply = {"idx": idx, "ok": False, "error": f"{type(exc).__name__}: {exc}"}
        print(json.dumps(reply), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
