"""Round-3 relay probe: does upload bandwidth scale with CONNECTIONS?

The recorded bench is wire-bound on slow-wire relay days (~40 MB/s -> a
7.5 s floor for the 300 MB capture, ~4x realtime).  Nothing client-side
moves a single connection's bandwidth (docs/performance.md).  This probe
answers the one remaining question: is the throttle per-connection or
global?  If per-connection, a pool of worker processes (each its own
relay connection) can upload capture segments concurrently and multiply
effective wire bandwidth.

Protocol: spawn K child processes; each initialises JAX on the default
(axon) platform, pays its own session toll on a background thread, and
then serves upload-measurement commands over stdin/stdout.  Once >= 2
children are toll-ready the parent runs interleaved phases —
solo / pair-concurrent / solo / all-concurrent / solo — so the relay's
own hour-scale bandwidth oscillation cannot masquerade as scaling.

Each rep = device_put of a 64 MiB random int16 buffer + a sum() fetch
(forces the upload to complete; the sum program is warmed first).

MEASURED (round 3, 2026-08-17, 6 children, tolls 3-18 min): the cap is
GLOBAL, not per-connection.  Solo 25-37 MB/s; 2 concurrent connections
43 MB/s aggregate (within the relay's own rep-to-rep variance); 6
concurrent connections **32 MB/s aggregate — no better than solo** (each
child degraded to 3-13 MB/s, first concurrent rep ~19 s for all six, i.e.
near-serialised server-side).  Multi-connection upload pooling therefore
CANNOT lift the wire floor on this relay; the segmented burst mode
(pipeline/segmented.py) stays a deployment feature for genuinely parallel
wires (multi-host, multi-NIC), not a bench strategy here.

Provenance: round 3, 2026-08-17.
"""

from __future__ import annotations

import logging
import os
import subprocess
import sys
import threading
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO))

logging.basicConfig(level=logging.INFO, stream=sys.stderr)
LOG = logging.getLogger("probe_r3h")

MIB = 64
TOLL_BUDGET = 2100.0  # 35 min: above the worst toll seen (28 min)


def child_main() -> int:
    import numpy as np

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    t_start = time.perf_counter()
    np.asarray(jnp.ones((128, 128)) @ jnp.ones((128, 128)))
    toll = time.perf_counter() - t_start

    rng = np.random.default_rng(os.getpid())
    buf = rng.integers(-32768, 32767, size=MIB * 1024 * 1024 // 2,
                       dtype=np.int16)
    total = jax.jit(jnp.sum)

    def rep() -> float:
        t0 = time.perf_counter()
        x = jax.device_put(buf)
        int(total(x))
        return time.perf_counter() - t0

    warm = rep()  # compile + first server-side executable load
    print(f"READY {toll:.1f} {warm:.2f}", flush=True)

    for line in sys.stdin:
        parts = line.split()
        if not parts:
            continue
        if parts[0] == "REP":
            for r in range(int(parts[1])):
                print(f"REPDONE {r} {rep():.3f}", flush=True)
            print("PHASEDONE", flush=True)
        elif parts[0] == "EXIT":
            break
    return 0


class Child:
    def __init__(self, idx: int):
        self.idx = idx
        self.proc = subprocess.Popen(
            [sys.executable, __file__, "--child"],
            stdin=subprocess.PIPE, stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL, text=True, bufsize=1,
        )
        self.ready = threading.Event()
        self.toll = float("nan")
        self.warm = float("nan")
        self.reps: list[float] = []
        self.phase_done = threading.Event()
        threading.Thread(target=self._pump, daemon=True).start()

    def _pump(self) -> None:
        assert self.proc.stdout is not None
        for line in self.proc.stdout:
            parts = line.split()
            if parts[0] == "READY":
                self.toll, self.warm = float(parts[1]), float(parts[2])
                self.ready.set()
            elif parts[0] == "REPDONE":
                self.reps.append(float(parts[2]))
            elif parts[0] == "PHASEDONE":
                self.phase_done.set()

    def start_phase(self, n: int) -> None:
        self.reps.clear()
        self.phase_done.clear()
        assert self.proc.stdin is not None
        self.proc.stdin.write(f"REP {n}\n")
        self.proc.stdin.flush()

    def stop(self) -> None:
        try:
            if self.proc.stdin is not None:
                self.proc.stdin.write("EXIT\n")
                self.proc.stdin.flush()
            self.proc.wait(timeout=30)
        except Exception:
            self.proc.kill()


def run_phase(name: str, children: list["Child"], n: int = 3,
              timeout: float = 600.0) -> float:
    t0 = time.perf_counter()
    for c in children:
        c.start_phase(n)
    agg_bytes = 0
    for c in children:
        if not c.phase_done.wait(timeout=timeout):
            LOG.error("phase %s: child %d timed out", name, c.idx)
            return float("nan")
        agg_bytes += len(c.reps) * MIB * 1024 * 1024
    wall = time.perf_counter() - t0
    agg = agg_bytes / wall / 1e6
    for c in children:
        per = [MIB * 1.049e6 / r / 1e6 for r in c.reps]
        LOG.info("phase %-12s child %d: reps %s -> %s MB/s", name, c.idx,
                 [f"{r:.2f}s" for r in c.reps], [f"{p:.0f}" for p in per])
    LOG.info("phase %-12s AGGREGATE: %.0f MB/s over %d conns (%.1f s wall)",
             name, agg, len(children), wall)
    return agg


def main() -> int:
    if "--child" in sys.argv:
        return child_main()

    k = int(os.environ.get("PROBE_CONNS", "6"))
    LOG.info("spawning %d children (64 MiB reps, toll budget %.0f s)",
             k, TOLL_BUDGET)
    t0 = time.perf_counter()
    children = [Child(i) for i in range(k)]
    try:
        deadline = t0 + TOLL_BUDGET
        while time.perf_counter() < deadline:
            ready = [c for c in children if c.ready.is_set()]
            if len(ready) == k:
                break
            time.sleep(5)
        ready = [c for c in children if c.ready.is_set()]
        for c in ready:
            LOG.info("child %d ready: toll %.0f s, warm rep %.2f s",
                     c.idx, c.toll, c.warm)
        if len(ready) < 2:
            LOG.error("only %d children toll-ready within budget — "
                      "cannot measure concurrency", len(ready))
            return 1

        results = {}
        results["solo-a"] = run_phase("solo-a", ready[:1])
        results["pair"] = run_phase("pair", ready[:2])
        results["solo-b"] = run_phase("solo-b", ready[:1])
        if len(ready) > 2:
            results["all"] = run_phase(f"all-{len(ready)}", ready)
            results["solo-c"] = run_phase("solo-c", ready[:1])
        LOG.info("SUMMARY: %s", {p: f"{v:.0f} MB/s" for p, v in
                                 results.items()})
        solo = min(v for p, v in results.items() if p.startswith("solo"))
        conc = max(v for p, v in results.items()
                   if not p.startswith("solo"))
        LOG.info("VERDICT: best concurrent aggregate %.0f MB/s vs slowest "
                 "solo %.0f MB/s -> scaling x%.1f", conc, solo, conc / solo)
    finally:
        for c in children:
            c.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
