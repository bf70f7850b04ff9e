#!/usr/bin/env python
"""Probe 2: true D2H cost (computed arrays, cache-busted), dispatch
pipelining depth, and device_put blocking behavior."""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    print("backend:", jax.default_backend())

    # --- true D2H: fetch freshly COMPUTED arrays (no host-value cache) -----
    @jax.jit
    def bump(x):
        return x + 1

    for dtype, mb in ((np.int16, 1), (np.int16, 10), (np.float32, 1), (np.float32, 10), (np.float32, 40)):
        n = (mb << 20) // np.dtype(dtype).itemsize
        dev = jax.device_put(np.zeros(n, dtype=dtype))
        jax.block_until_ready(bump(dev))  # warm exec + transfer program
        np.asarray(bump(dev))
        best = float("inf")
        for _ in range(4):
            y = jax.block_until_ready(bump(dev))  # fresh computed array
            t0 = time.perf_counter()
            np.asarray(y)
            best = min(best, time.perf_counter() - t0)
        print(f"D2H {mb:3d} MiB {np.dtype(dtype).name}: {best*1e3:8.1f} ms  {mb/best:8.1f} MiB/s")

    # --- dispatch pipelining: K async submits, one final block --------------
    @jax.jit
    def chain(x):
        for _ in range(4):
            x = jnp.tanh(x @ x)
        return x

    m = jax.device_put(np.full((1024, 1024), 0.1, np.float32))
    jax.block_until_ready(chain(m))
    # single sync reference
    t0 = time.perf_counter()
    jax.block_until_ready(chain(m))
    single = time.perf_counter() - t0
    for k in (4, 16):
        t0 = time.perf_counter()
        y = m
        for _ in range(k):
            y = chain(y)
        jax.block_until_ready(y)
        total = time.perf_counter() - t0
        print(f"pipelined x{k}: total {total*1e3:8.1f} ms ({total/k*1e3:6.1f} ms/step; single sync {single*1e3:.1f} ms)")

    # --- device_put blocking behavior ---------------------------------------
    big = np.zeros(16 << 20, np.int16)  # 32 MiB
    jax.block_until_ready(jax.device_put(big))
    t0 = time.perf_counter()
    h = jax.device_put(big)
    submit = time.perf_counter() - t0
    jax.block_until_ready(h)
    total = time.perf_counter() - t0
    print(f"device_put 32 MiB: submit {submit*1e3:.1f} ms, complete {total*1e3:.1f} ms")

    # --- overlap: upload k+1 while dispatch k runs ---------------------------
    @jax.jit
    def reduce16(x):
        return jnp.sum(x.astype(jnp.float32) ** 2)

    jax.block_until_ready(reduce16(jax.device_put(big)))
    t0 = time.perf_counter()
    h = jax.device_put(big)
    acc = []
    for _ in range(6):
        acc.append(reduce16(h))
        h = jax.device_put(big)
    jax.block_until_ready(acc[-1])
    total = time.perf_counter() - t0
    print(f"interleaved 6x(upload 32MiB + dispatch): {total*1e3:8.1f} ms total")


if __name__ == "__main__":
    main()
