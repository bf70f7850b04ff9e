#!/usr/bin/env python
"""Probe 6: can we fetch D2H without poisoning H2D?

Tests: async-only fetch, tiny fetch, recovery by idle, poisoned-state D2H
speed.  Each phase prints upload times for 3x16 MiB after the action.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp


def ups(tag, blocks, k=3):
    ts = []
    for i in range(k):
        t0 = time.perf_counter()
        jax.block_until_ready(jax.device_put(blocks[i % len(blocks)]))
        ts.append((time.perf_counter() - t0) * 1e3)
    print(f"{tag}: uploads " + " ".join(f"{t:7.1f}" for t in ts) + " ms")


def main():
    print("backend:", jax.default_backend())
    rng = np.random.default_rng(0)
    blocks = [rng.integers(-32768, 32767, 8 << 20).astype(np.int16) for _ in range(3)]

    @jax.jit
    def bump(x):
        return x + 1

    small = jax.device_put(np.zeros(512 << 10, np.int16))  # 1 MiB
    y = jax.block_until_ready(bump(small))

    jax.block_until_ready(jax.device_put(blocks[0]))
    ups("baseline", blocks)

    # 1. async-only fetch: copy_to_host_async, wait, then read the value
    y.copy_to_host_async()
    time.sleep(1.0)
    ups("after copy_to_host_async (no asarray yet)", blocks)
    v = np.asarray(y)  # should be served from the landed copy
    ups("after asarray-of-landed-copy", blocks)

    # 2. tiny sync fetch
    t = jax.block_until_ready(bump(jax.device_put(np.zeros(2, np.int16))))
    np.asarray(t)
    ups("after tiny (4 B) sync fetch", blocks)

    # 3. recovery by idle
    big = jax.block_until_ready(bump(jax.device_put(blocks[1])))
    np.asarray(big)  # definitely poison (16 MiB sync fetch)
    ups("right after 16 MiB sync fetch", blocks)
    for sleep_s in (2.0, 5.0, 10.0):
        time.sleep(sleep_s)
        ups(f"after +{sleep_s:.0f}s idle", blocks)

    # 4. poisoned-state D2H speed
    z = jax.block_until_ready(bump(jax.device_put(blocks[2])))
    t0 = time.perf_counter()
    np.asarray(z)
    print(f"poisoned D2H 16 MiB: {(time.perf_counter()-t0)*1e3:.1f} ms")
    ups("after that fetch", blocks)


if __name__ == "__main__":
    main()
