#!/usr/bin/env python
"""Probe 3: H2D truth — compressibility, buffer identity, parallel streams,
and async D2H (copy_to_host_async)."""

from __future__ import annotations

import concurrent.futures as cf
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax


def bench(label, fn, n=5):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    ts = np.asarray(ts) * 1e3
    print(f"{label}: median {np.median(ts):7.1f} ms  min {ts.min():7.1f}  max {ts.max():7.1f}")
    return float(np.median(ts))


def main():
    print("backend:", jax.default_backend())
    rng = np.random.default_rng(0)
    MB32 = 16 << 20  # int16 elements

    zeros = np.zeros(MB32, np.int16)
    rand = (rng.integers(-32768, 32767, MB32)).astype(np.int16)
    rands = [(rng.integers(-32768, 32767, MB32)).astype(np.int16) for _ in range(5)]

    jax.block_until_ready(jax.device_put(zeros))  # warm transfer program

    bench("H2D 32MiB zeros (same arr)", lambda: jax.block_until_ready(jax.device_put(zeros)))
    bench("H2D 32MiB random (same arr)", lambda: jax.block_until_ready(jax.device_put(rand)))
    it = iter(rands * 3)
    bench("H2D 32MiB random (fresh arr)", lambda: jax.block_until_ready(jax.device_put(next(it))))

    # parallel streams: split 32 MiB into 4 pieces, upload from 4 threads
    pieces = [rand[i * (MB32 // 4) : (i + 1) * (MB32 // 4)].copy() for i in range(4)]
    for p in pieces:
        jax.block_until_ready(jax.device_put(p))  # warm shape

    def par():
        with cf.ThreadPoolExecutor(4) as ex:
            hs = list(ex.map(jax.device_put, pieces))
        jax.block_until_ready(hs)

    bench("H2D 32MiB random (4 par streams)", par)

    def seq():
        hs = [jax.device_put(p) for p in pieces]
        jax.block_until_ready(hs)

    bench("H2D 32MiB random (4 seq pieces)", seq)

    # --- async D2H ----------------------------------------------------------
    @jax.jit
    def bump(x):
        return x + 1

    dev = jax.block_until_ready(bump(jax.device_put(rand[: 1 << 19])))  # 1 MiB
    np.asarray(dev)
    y = jax.block_until_ready(bump(jax.device_put(rand[: 1 << 19])))
    has_async = hasattr(y, "copy_to_host_async")
    print("copy_to_host_async available:", has_async)
    if has_async:
        t0 = time.perf_counter()
        y.copy_to_host_async()
        submit = time.perf_counter() - t0
        time.sleep(0.2)
        t0 = time.perf_counter()
        np.asarray(y)
        fetch = time.perf_counter() - t0
        print(f"async D2H 1MiB: submit {submit*1e3:.1f} ms, asarray-after-sleep {fetch*1e3:.1f} ms")

    # --- does H2D overlap compute? queue big matmul, then upload ------------
    @jax.jit
    def heavy(x):
        for _ in range(8):
            x = jnp_tanh(x @ x)
        return x

    import jax.numpy as jnp

    global jnp_tanh
    jnp_tanh = jnp.tanh
    m = jax.device_put(np.full((4096, 4096), 0.01, np.float32))
    jax.block_until_ready(heavy(m))
    t0 = time.perf_counter()
    h = heavy(m)
    t_submit = time.perf_counter() - t0
    up = jax.device_put(rand)
    jax.block_until_ready(up)
    t_upload_done = time.perf_counter() - t0
    jax.block_until_ready(h)
    t_all = time.perf_counter() - t0
    print(
        f"overlap: submit {t_submit*1e3:.1f} ms, upload-done {t_upload_done*1e3:.1f} ms, "
        f"compute-done {t_all*1e3:.1f} ms"
    )
    t0 = time.perf_counter()
    jax.block_until_ready(heavy(m))
    print(f"heavy alone: {(time.perf_counter()-t0)*1e3:.1f} ms")


if __name__ == "__main__":
    main()
