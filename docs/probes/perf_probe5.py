#!/usr/bin/env python
"""Probe 5: what poisons H2D bandwidth, and does it recover?

Matrix: uploads at process start (baseline) / after a tiny dispatch / after
a heavy dispatch / after idle sleep / after a D2H fetch / long upload train.
Each upload is 16 MiB random int16, individually timed.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp


def uploads(tag, blocks, k):
    for i in range(k):
        t0 = time.perf_counter()
        jax.block_until_ready(jax.device_put(blocks[i % len(blocks)]))
        dt = (time.perf_counter() - t0) * 1e3
        print(f"{tag} up{i}: {dt:7.1f} ms")


def main():
    print("backend:", jax.default_backend())
    rng = np.random.default_rng(0)
    blocks = [rng.integers(-32768, 32767, 8 << 20).astype(np.int16) for _ in range(3)]

    # warm the transfer program with a tiny put (cheap, no dispatch)
    jax.block_until_ready(jax.device_put(blocks[0][:1024]))

    uploads("A(base)", blocks, 4)

    @jax.jit
    def tiny(x):
        return x * 2

    small = jax.device_put(np.ones(1024, np.float32))
    jax.block_until_ready(tiny(small))
    uploads("B(post-tiny)", blocks, 4)

    @jax.jit
    def heavy(x):
        return jnp.cumsum(x.astype(jnp.float32))[:: 16]

    d = jax.device_put(blocks[0])
    jax.block_until_ready(heavy(d))
    uploads("C(post-heavy)", blocks, 8)

    time.sleep(3.0)
    uploads("D(after 3s idle)", blocks, 4)

    y = jax.block_until_ready(heavy(jax.device_put(blocks[1])))
    np.asarray(y)
    uploads("E(post-fetch)", blocks, 4)

    uploads("F(long train)", blocks, 12)


if __name__ == "__main__":
    main()
