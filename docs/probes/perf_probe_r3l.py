"""Round-3 probe L: native C++ channelizer (native/ddc.cpp) vs the JAX
paths — correctness against ddc_apply_il and isolated ns/sample.

Usage: JAX_PLATFORMS=cpu python docs/probes/perf_probe_r3l.py
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO))

import numpy as np

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))

import jax.numpy as jnp

from iq_to_audio_tpu.ops.ddc import (
    DDCPlan,
    bandpass_kernel,
    ddc_apply_il,
    interleave_kernel,
)
from iq_to_audio_tpu.ops.resample import ResamplePlan
from iq_to_audio_tpu.pipeline.filters import design_channel_filter

RATE = 2_500_000.0
DECIM = 26


def build_lib() -> ctypes.CDLL:
    # use the production builder (compile/link split keeps crtfastmath.o
    # out of the .so -- see ops/native_ddc.py::_build) and its C ABI
    from iq_to_audio_tpu.ops import native_ddc

    assert native_ddc.available()
    lib = ctypes.CDLL(str(REPO / "native" / "libddc.so"))
    lib.iq2a_ddc_scratch_floats.restype = ctypes.c_int64
    lib.iq2a_ddc_scratch_floats.argtypes = [ctypes.c_int64, ctypes.c_int64, ctypes.c_int64]
    lib.iq2a_ddc_run.restype = ctypes.c_int
    lib.iq2a_ddc_run.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int64,   # raw, codec, n
        ctypes.c_void_p, ctypes.c_int64,                  # tail, L
        ctypes.c_void_p,                                  # h_rev
        ctypes.c_void_p, ctypes.c_void_p,                 # phase0, incs
        ctypes.c_int64, ctypes.c_int64,                   # C, D
        ctypes.c_int, ctypes.c_float,                     # re_idx, im_sign
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,  # yr, yi, scratch
    ]
    return lib


def main() -> int:
    lib = build_lib()
    taps = np.asarray(design_channel_filter(RATE, 12_500.0, DECIM))
    L = len(taps)
    rs_plan0 = ResamplePlan.create(RATE / DECIM, 48_000.0, 1)
    plan = DDCPlan.create(L, DECIM, target_chunk=1 << 20, out_align=rs_plan0.down)
    n = plan.chunk_size
    m = plan.out_size
    print(f"chunk={n} m={m} L={L}")

    inc = int(round(25_000.0 / RATE * 2**32)) % 2**32
    incs = np.asarray([inc], np.uint32)
    phase0 = np.asarray([123456789], np.uint32)
    inc_lo = np.asarray([(inc * DECIM) % 2**32], np.uint32)

    rng = np.random.default_rng(3)
    raw = rng.integers(-20000, 20000, size=2 * n, dtype=np.int16)
    tail = (rng.standard_normal(2 * (L - 1)) * 0.1).astype(np.float32)

    # --- JAX reference: ddc_apply_il on the interleaved conv path ---------
    kernel_np = bandpass_kernel(taps, [inc])
    kernel_il = jnp.asarray(interleave_kernel(kernel_np, "iq"))
    f32 = jnp.asarray(raw, jnp.float32) * jnp.float32(1.0 / 32768.0)

    @jax.jit
    def ref(f, t, p):
        return ddc_apply_il(plan, kernel_il, f, t, p, jnp.asarray(inc_lo))

    yr_j, yi_j, _, phase_next = ref(f32, jnp.asarray(tail), jnp.asarray(phase0))
    yr_j, yi_j = np.asarray(yr_j), np.asarray(yi_j)

    # --- native ------------------------------------------------------------
    h_rev = taps[::-1].astype(np.float32).copy()
    yr = np.empty((1, m), np.float32)
    yi = np.empty((1, m), np.float32)
    scratch = np.empty(lib.iq2a_ddc_scratch_floats(n, L, DECIM), np.float32)

    def run_native():
        rc = lib.iq2a_ddc_run(
            raw.ctypes.data, 1, n, tail.ctypes.data, L, h_rev.ctypes.data,
            phase0.ctypes.data, incs.ctypes.data, 1, DECIM, 0,
            ctypes.c_float(1.0), yr.ctypes.data, yi.ctypes.data,
            scratch.ctypes.data,
        )
        assert rc == 0, rc

    run_native()
    ref_pow = np.mean(yr_j**2 + yi_j**2)
    err = np.mean((yr - yr_j) ** 2 + (yi - yi_j) ** 2)
    print(f"agreement vs ddc_apply_il: {10 * np.log10(err / ref_pow + 1e-300):.1f} dB")

    best = float("inf")
    for _ in range(16):
        t0 = time.perf_counter()
        run_native()
        best = min(best, time.perf_counter() - t0)
    print(f"native channelizer: {best * 1e9 / n:6.2f} ns/sample ({best * 1e3:.2f} ms)")

    # JAX path timing for the same op
    for _ in range(2):
        jax.block_until_ready(ref(f32, jnp.asarray(tail), jnp.asarray(phase0)))
    bestj = float("inf")
    for _ in range(8):
        t0 = time.perf_counter()
        jax.block_until_ready(ref(f32, jnp.asarray(tail), jnp.asarray(phase0)))
        bestj = min(bestj, time.perf_counter() - t0)
    print(f"jax conv (plain, cpu): {bestj * 1e9 / n:6.2f} ns/sample")

    # other iq orders
    for order, (re_idx, sgn) in {
        "iq_inv": (0, -1.0), "qi": (1, 1.0), "qi_inv": (1, -1.0)
    }.items():
        kil = jnp.asarray(interleave_kernel(kernel_np, order))

        @jax.jit
        def ref_o(f, t, p, kil=kil):
            return ddc_apply_il(plan, kil, f, t, p, jnp.asarray(inc_lo))

        yr_o, yi_o, _, _ = ref_o(f32, jnp.asarray(tail), jnp.asarray(phase0))
        lib.iq2a_ddc_run(
            raw.ctypes.data, 1, n, tail.ctypes.data, L, h_rev.ctypes.data,
            phase0.ctypes.data, incs.ctypes.data, 1, DECIM, re_idx,
            ctypes.c_float(sgn), yr.ctypes.data, yi.ctypes.data,
            scratch.ctypes.data,
        )
        err = np.mean((yr - np.asarray(yr_o)) ** 2 + (yi - np.asarray(yi_o)) ** 2)
        print(f"order {order}: {10 * np.log10(err / ref_pow + 1e-300):.1f} dB")
    return 0


if __name__ == "__main__":
    sys.exit(main())
