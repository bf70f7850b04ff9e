#!/usr/bin/env python
"""Probe 4: reproduce the pipeline's upload-time decay.

Mimics the bench rhythm: per iteration upload a fresh 16 MiB random int16
block, dispatch a reduction over it, and periodically fetch ~1.3 MiB.
Prints per-iteration timings to localise when/what degrades.
"""

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
    rng = np.random.default_rng(0)
    N = 8 << 20  # 16 MiB int16

    @jax.jit
    def work(x, acc, slot):
        f = x.astype(jnp.float32) * (1.0 / 32768.0)
        s = jnp.cumsum(f)  # some real work + a big intermediate
        out = jnp.round(s[:: 16] * 32767.0).astype(jnp.int16)[: 80_000]
        acc = jax.lax.dynamic_update_slice(acc, out[None], (slot, 0))
        return acc

    acc = jnp.zeros((8, 80_000), jnp.int16)
    blocks = [rng.integers(-32768, 32767, N).astype(np.int16) for _ in range(4)]
    d = jax.device_put(blocks[0])
    acc = work(d, acc, 0)
    jax.block_until_ready(acc)
    np.asarray(acc)

    for it in range(40):
        blk = blocks[it % 4]
        t0 = time.perf_counter()
        d = jax.device_put(blk)
        jax.block_until_ready(d)
        t_up = time.perf_counter() - t0
        t0 = time.perf_counter()
        acc = work(d, acc, it % 8)
        jax.block_until_ready(acc)
        t_ex = time.perf_counter() - t0
        t_fetch = 0.0
        if it % 8 == 7:
            t0 = time.perf_counter()
            np.asarray(acc)
            t_fetch = time.perf_counter() - t0
        print(
            f"iter {it:3d}: upload {t_up*1e3:7.1f} ms  exec {t_ex*1e3:7.1f} ms"
            + (f"  fetch {t_fetch*1e3:7.1f} ms" if t_fetch else "")
        )


if __name__ == "__main__":
    main()
