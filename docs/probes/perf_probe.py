#!/usr/bin/env python
"""Round-2 relay primitives probe: H2D bandwidth, D2H latency/bandwidth,
dispatch latency, and dispatch-count decay on the axon TPU.

Run fresh (one process) so compile poisoning can't leak between probes:
    python docs/perf_probe.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp


def t(fn, n=5):
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    print("backend:", jax.default_backend(), jax.devices())

    # --- H2D ---------------------------------------------------------------
    for mb in (1, 8, 32, 100):
        arr = np.zeros(mb << 19, dtype=np.int16)  # mb MiB
        jax.block_until_ready(jax.device_put(arr))  # warm transfer program
        dt = t(lambda a=arr: jax.block_until_ready(jax.device_put(a)))
        print(f"H2D {mb:4d} MiB int16: {dt*1e3:8.1f} ms  {mb/dt:8.1f} MiB/s")

    # --- D2H ---------------------------------------------------------------
    for dtype in (np.int16, np.float32):
        for mb in (1, 4, 16, 40):
            n = (mb << 20) // np.dtype(dtype).itemsize
            dev = jax.block_until_ready(
                jax.device_put(np.zeros(n, dtype=dtype))
            )
            np.asarray(dev)  # warm transfer program
            dt = t(lambda d=dev: np.asarray(d))
            print(
                f"D2H {mb:4d} MiB {np.dtype(dtype).name}: {dt*1e3:8.1f} ms "
                f"{mb/dt:8.1f} MiB/s"
            )

    # --- dispatch latency + decay ------------------------------------------
    @jax.jit
    def tiny(x):
        return x * 2.0 + 1.0

    x = jax.block_until_ready(jax.device_put(np.ones(1024, np.float32)))
    jax.block_until_ready(tiny(x))
    times = []
    for i in range(120):
        t0 = time.perf_counter()
        jax.block_until_ready(tiny(x))
        times.append(time.perf_counter() - t0)
    times = np.asarray(times) * 1e3
    for lo in range(0, 120, 20):
        seg = times[lo : lo + 20]
        print(
            f"dispatch {lo:3d}-{lo+19:3d}: median {np.median(seg):6.1f} ms  "
            f"min {seg.min():6.1f}  max {seg.max():6.1f}"
        )

    # --- async pipelining: does D2H of result k overlap dispatch k+1? ------
    @jax.jit
    def work(x):
        return jnp.tanh(x @ x)

    m = jax.block_until_ready(jax.device_put(np.ones((2048, 2048), np.float32)))
    jax.block_until_ready(work(m))
    t0 = time.perf_counter()
    h = work(m)
    submit = time.perf_counter() - t0
    jax.block_until_ready(h)
    total = time.perf_counter() - t0
    print(f"async dispatch: submit {submit*1e3:.1f} ms, complete {total*1e3:.1f} ms")


if __name__ == "__main__":
    main()
