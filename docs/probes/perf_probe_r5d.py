"""Round-5 probe D: channelizer as SHIFTED DENSE MATMULS (no conv op).

Probe r5c showed the XLA conv lowering — not MXU flops — bounds the
J-conv at ~302 Msps (fp32): halving/thirding the MXU pass count (HIGH /
DEFAULT precision) barely moved the wall time.

Observation: the lane-filling J-conv IS a banded matmul whose window
stride (J*2D = 3328 raw floats at the flagship geometry) exceeds half
its window width (2L + (J-1)*2D = 6478).  Splitting the tap axis at
stride boundaries turns it into ``n_shift = ceil(width/stride)`` (= 2
here) dense matmuls over the CONTIGUOUS reshape of the raw stream:

    A = x.reshape(R + n_shift, stride)           # free relayout
    Y[r, jc] = sum_s  A[r + s] @ W_s[:, jc]      # two (R,3328)@(3328,128)

No im2col, no conv — exactly the MXU's favorite shape.  This probe
times it (loop-varying inputs, sweeps inside one dispatch, same
methodology as r5c) and checks fidelity vs a float64 host reference.

Provenance: round 5, 2026-08-20.  Decides the production channelizer.
"""

from __future__ import annotations

import logging
import sys
import threading
import time
from functools import partial
from pathlib import Path

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO))

logging.basicConfig(level=logging.INFO, stream=sys.stderr)
LOG = logging.getLogger("probe_r5d")

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def main() -> int:
    from iq_to_audio_tpu.ops.ddc import (
        DDCPlan,
        bandpass_kernel,
        interleave_kernel,
        j_lanes_kernel,
    )
    from iq_to_audio_tpu.ops.nco import nco_increment_fixed
    from iq_to_audio_tpu.ops.resample import ResamplePlan
    from iq_to_audio_tpu.pipeline.filters import (
        compute_decimation,
        design_channel_filter,
    )

    LOG.info("backend: %s", jax.default_backend())
    toll_done = threading.Event()

    def _pay_toll():
        t0 = time.perf_counter()
        np.asarray(jnp.ones((128, 128)) @ jnp.ones((128, 128)))
        LOG.info("toll: %.1f s", time.perf_counter() - t0)
        toll_done.set()

    threading.Thread(target=_pay_toll, daemon=True).start()

    fs = 2_500_000.0
    decim, _fs_ch = compute_decimation(fs, 96_000.0)
    taps = design_channel_filter(fs, 12_500.0, decim)
    rate_plan = ResamplePlan.create(_fs_ch, 48_000.0, 1)
    plan = DDCPlan.create(len(taps), decim, target_chunk=1 << 22,
                          out_align=rate_plan.down, max_chunk=1 << 22)
    inc = nco_increment_fixed(25_000.0, fs)
    L, D, N, m = plan.num_taps, plan.decimation, plan.chunk_size, plan.out_size
    S = 4
    LOG.info("geometry: L=%d D=%d N=%d m=%d S=%d", L, D, N, m, S)

    k_il_np = interleave_kernel(bandpass_kernel(taps, [inc]), "iq")
    out_ch, _, Wd = k_il_np.shape
    J = max(1, 128 // out_ch)
    wj_np = j_lanes_kernel(k_il_np, D, J)  # (J*2C, 1, width)
    width = wj_np.shape[2]
    stride = J * 2 * D
    R = -(-m // J)
    n_shift = -(-width // stride)
    LOG.info("J=%d width=%d stride=%d R=%d n_shift=%d",
             J, width, stride, R, n_shift)

    # W_s: (n_shift, stride, J*2C) — channel-major columns (o*J + j),
    # matching j_lanes_kernel's row layout
    w_split = np.zeros((n_shift, stride, J * out_ch), np.float32)
    for s in range(n_shift):
        seg = wj_np[:, 0, s * stride : (s + 1) * stride]  # (J*2C, <=stride)
        w_split[s, : seg.shape[1], :] = seg.T
    ws = jnp.asarray(w_split)

    full_len = 2 * (L - 1) + 2 * N
    need_rows = R + n_shift
    need = need_rows * stride

    rng = np.random.default_rng(0)
    xs = jax.device_put(
        rng.normal(scale=0.1, size=(S, full_len)).astype(np.float32)
    )

    def matmul_ddc(x, prec):
        pad = need - x.shape[-1]
        xp = jnp.pad(x, (0, pad)) if pad > 0 else x[:need]
        a = xp.reshape(need_rows, stride)
        y = jnp.zeros((R, J * out_ch), jnp.float32)
        for s in range(n_shift):
            y = y + lax.dot_general(
                lax.dynamic_slice_in_dim(a, s, R, 0), ws[s],
                (((1,), (0,)), ((), ())),
                precision=prec, preferred_element_type=jnp.float32,
            )
        # (R, J*2C) cols channel-major (o*J + j) -> (2C, m)
        yt = y.reshape(R, out_ch, J).transpose(1, 0, 2).reshape(out_ch, R * J)
        return yt[:, :m]

    def sweeper(body, sweeps):
        def run():
            def outer(c, acc):
                def inner(a, x):
                    y = body(x + c.astype(jnp.float32) * jnp.float32(1e-12))
                    return a + y[..., -1].sum(), None

                a, _ = lax.scan(inner, acc, xs)
                return a

            return lax.fori_loop(0, sweeps, outer, jnp.float32(0.0))

        return jax.jit(run)

    P = lax.Precision
    arms = [
        ("mm_f32", sweeper(partial(matmul_ddc, prec=P.HIGHEST), 64), 64),
        ("mm_high (bf16x3)", sweeper(partial(matmul_ddc, prec=P.HIGH), 128), 128),
        ("mm_default (bf16)", sweeper(partial(matmul_ddc, prec=P.DEFAULT), 128), 128),
    ]

    compiled = []
    for name, fn, sweeps in arms:
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        LOG.info("%s: first call %.1f s", name, time.perf_counter() - t0)
        compiled.append((name, fn, sweeps))

    if not toll_done.is_set():
        toll_done.wait(timeout=2400)

    for name, fn, sweeps in compiled:
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(fn())
            best = min(best, time.perf_counter() - t0)
        samples = sweeps * S * N
        msps = samples / best / 1e6
        LOG.info("%-24s %7.3f s best -> %9.1f Msps", name, best, msps)

    # -- fidelity vs float64 host reference --------------------------------
    x1 = np.asarray(xs[0], dtype=np.float64)
    g = (
        k_il_np[0, 0].astype(np.float64)
        + 1j * k_il_np[1, 0].astype(np.float64)
    )
    idx = np.arange(m)[:, None] * 2 * D + np.arange(Wd)[None, :]
    ref = (x1[idx] @ g.real) + 1j * (x1[idx] @ g.imag)
    for prec, tag in ((P.HIGHEST, "f32"), (P.HIGH, "bf16x3")):
        y = np.asarray(jax.jit(partial(matmul_ddc, prec=prec))(xs[0]))
        got = y[0].astype(np.float64) + 1j * y[1].astype(np.float64)
        err = got - ref
        snr = 10 * np.log10(
            (np.abs(ref) ** 2).mean() / max((np.abs(err) ** 2).mean(), 1e-300)
        )
        LOG.info("fidelity mm_%s: SNR %.1f dB", tag, snr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
