#!/usr/bin/env python
"""Probe 7: poisoned-state H2D strategies.

After ONE poisoning fetch: (a) single large put vs many small, (b) parallel
thread streams, (c) recovery horizon with 5 s sampling, (d) busy-host vs
idle recovery.
"""

from __future__ import annotations

import concurrent.futures as cf
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp


def one_up(b):
    t0 = time.perf_counter()
    jax.block_until_ready(jax.device_put(b))
    return (time.perf_counter() - t0) * 1e3


def main():
    print("backend:", jax.default_backend())
    rng = np.random.default_rng(0)
    b16 = rng.integers(-32768, 32767, 8 << 20).astype(np.int16)
    b128 = rng.integers(-32768, 32767, 64 << 20).astype(np.int16)
    pieces = [b128[i * (8 << 20) : (i + 1) * (8 << 20)].copy() for i in range(8)]

    # warm transfer programs BEFORE poisoning
    jax.block_until_ready(jax.device_put(b16))
    jax.block_until_ready(jax.device_put(b128))
    for p in pieces[:1]:
        jax.block_until_ready(jax.device_put(p))
    print(f"clean 16MiB: {one_up(b16):7.1f} ms   clean 128MiB: {one_up(b128):7.1f} ms")

    @jax.jit
    def bump(x):
        return x + 1

    y = jax.block_until_ready(bump(jax.device_put(np.zeros(1024, np.int16))))
    np.asarray(y)  # POISON (single small fetch)

    print(f"poisoned 16MiB single: {one_up(b16):7.1f} ms")
    print(f"poisoned 128MiB single: {one_up(b128):7.1f} ms")

    t0 = time.perf_counter()
    with cf.ThreadPoolExecutor(8) as ex:
        hs = list(ex.map(jax.device_put, pieces))
    jax.block_until_ready(hs)
    print(f"poisoned 128MiB via 8 threads: {(time.perf_counter()-t0)*1e3:7.1f} ms")

    t0 = time.perf_counter()
    hs = [jax.device_put(p) for p in pieces]
    jax.block_until_ready(hs)
    print(f"poisoned 128MiB via 8 seq async puts: {(time.perf_counter()-t0)*1e3:7.1f} ms")

    # recovery horizon: one upload every 5 s for a minute
    for i in range(12):
        time.sleep(5.0)
        print(f"t+{5*(i+1):3d}s: 16MiB {one_up(b16):7.1f} ms")


if __name__ == "__main__":
    main()
