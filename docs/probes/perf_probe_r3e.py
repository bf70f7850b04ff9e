"""Round-3 probe E: bisect the superstep's 0.63 s/step anomaly.

Probe B measured the conv stage at 0.027 s for the same S=3 scan; probe C
measured the FULL superstep at 0.63 s/step with trivial dispatch cost
ruled out.  This probe rebuilds the chain stage-by-stage inside the same
scan harness to find where the time goes:

  v_conv      scan{ convert + conv }
  v_mix       + lowrate_osc mix
  v_demod     + quadrature discriminator (arctan2) + deemph block-matmul
  v_resample  + 312/625 polyphase conv
  v_encode    + s16 encode + peak + dynamic_update_slice accumulators
  v_step      the real step.fn_super (reference point)

Chained-call timing (8 per sync).  Provenance: round 3, 2026-08-17.
"""

from __future__ import annotations

import logging
import sys
import threading
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO))

logging.basicConfig(level=logging.INFO, stream=sys.stderr)
LOG = logging.getLogger("probe_r3e")

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def main() -> int:
    from iq_to_audio_tpu.demod import create_decoder
    from iq_to_audio_tpu.ops.ddc import (
        DDCPlan, bandpass_kernel, ddc_apply_il, interleave_kernel,
    )
    from iq_to_audio_tpu.ops.iir import first_order_scan_const
    from iq_to_audio_tpu.ops.nco import nco_increment_fixed
    from iq_to_audio_tpu.ops.resample import ResamplePlan, design_resampler_kernel, polyphase_resample
    from iq_to_audio_tpu.pipeline.filters import compute_decimation, design_channel_filter
    from iq_to_audio_tpu.pipeline.step import build_chunk_step, _device_scale

    LOG.info("backend: %s", jax.default_backend())
    toll_done = threading.Event()

    def _pay_toll():
        t0 = time.perf_counter()
        np.asarray(jnp.ones((128, 128)) @ jnp.ones((128, 128)))
        LOG.info("toll: %.1f s", time.perf_counter() - t0)
        toll_done.set()

    threading.Thread(target=_pay_toll, daemon=True).start()

    fs = 2_500_000.0
    decim, fs_ch = compute_decimation(fs, 96_000.0)
    taps = design_channel_filter(fs, 12_500.0, decim)
    rate_plan = ResamplePlan.create(fs_ch, 48_000.0, 1)
    plan = DDCPlan.create(len(taps), decim, target_chunk=1 << 22,
                          out_align=rate_plan.down, max_chunk=1 << 22)
    rs_plan = ResamplePlan.create(fs_ch, 48_000.0, plan.out_size)
    inc = nco_increment_fixed(25_000.0, fs)
    L, D, N, m = plan.num_taps, plan.decimation, plan.chunk_size, plan.out_size
    S = 3
    LOG.info("geometry: L=%d D=%d N=%d m=%d S=%d", L, D, N, m, S)

    k_il = jnp.asarray(interleave_kernel(bandpass_kernel(taps, [inc]), "iq"))
    rs_k = jnp.asarray(design_resampler_kernel(rs_plan.up, rs_plan.down))
    inc_lo = jnp.asarray(np.asarray([inc], np.uint32)) * jnp.uint32(D)
    alpha = float(np.exp(-1.0 / (fs_ch * 300e-6)))

    rng = np.random.default_rng(0)
    raw_np = (rng.normal(scale=0.05, size=(S, 2 * N)) * 32767).astype("<i2")
    raw_dev = jax.device_put(raw_np)

    import functools

    def make(depth: str):
        cap = rs_plan.out_capacity

        def body(carry, raw):
            tail, phase, prev_r, prev_i, deemph_y, rs_tail, acc, peak, slot = carry
            f = _device_scale(raw, "pcm_s16le")
            yr, yi, tail, phase = ddc_apply_il(plan, k_il, f, tail, phase, inc_lo)
            out_probe = yr[..., :4].sum()
            if depth in ("demod", "resample", "encode"):
                sr = jnp.concatenate([prev_r[..., None], yr[..., :-1]], axis=-1)
                si = jnp.concatenate([prev_i[..., None], yi[..., :-1]], axis=-1)
                pr = yr * sr + yi * si
                pi = yi * sr - yr * si
                demod = jnp.arctan2(pi, pr).astype(jnp.float32)
                prev_r, prev_i = yr[..., -1], yi[..., -1]
                b = (jnp.float32(1.0) - jnp.float32(alpha)) * demod
                audio_ch, deemph_y = first_order_scan_const(alpha, b, deemph_y)
                out_probe = audio_ch[..., :4].sum()
            if depth in ("resample", "encode"):
                audio48, rs_tail = polyphase_resample(
                    rs_plan, rs_k, audio_ch, rs_tail, jnp.int32(2)
                )
                out_probe = audio48[..., :4].sum()
            if depth == "encode":
                peak = jnp.maximum(peak, jnp.max(jnp.abs(audio48), axis=-1))
                enc = jnp.round(
                    jnp.clip(audio48, -0.99, 0.99) * jnp.float32(32767.0)
                ).astype(jnp.int16)
                acc = lax.dynamic_update_slice(
                    acc, enc, (jnp.int32(0), slot * jnp.int32(cap))
                )
                slot = slot + jnp.int32(1)
                out_probe = peak.sum()
            return (tail, phase, prev_r, prev_i, deemph_y, rs_tail, acc, peak, slot), out_probe

        def run(carry):
            carry, outs = lax.scan(body, carry, raw_dev)
            return carry, outs.sum()

        return jax.jit(run)

    def init_carry():
        c = 1
        return (
            jnp.zeros((2 * (L - 1),), jnp.float32),
            jnp.zeros((c,), jnp.uint32),
            jnp.ones((c,), jnp.float32),
            jnp.zeros((c,), jnp.float32),
            jnp.zeros((c,), jnp.float32),
            jnp.zeros((c, rs_plan.tail_len), jnp.float32),
            jnp.zeros((c, 18 * rs_plan.out_capacity), jnp.int16),
            jnp.zeros((c,), jnp.float32),
            jnp.int32(0),
        )

    variants = [(d, make(d)) for d in ("conv", "demod", "resample", "encode")]

    # reference: the real production superstep
    decoder = create_decoder("nfm", deemph_us=300.0, agc_enabled=True)
    decoder.setup(fs_ch)
    step = build_chunk_step(
        ddc_plan=plan, rs_plan=rs_plan,
        ddc_kernel_np=bandpass_kernel(taps, [inc]),
        rs_kernel_np=design_resampler_kernel(rs_plan.up, rs_plan.down),
        incs_fixed=[inc], codec="pcm_s16le", iq_order="iq", decoder=decoder,
        pass_through=False, dump_iq=False, super_chunks=S, est_total_chunks=18,
    )

    # compile everything first
    compiled = []
    for name, fn in variants:
        t0 = time.perf_counter()
        carry = init_carry()
        carry, probe = fn(carry)
        jax.block_until_ready(probe)
        LOG.info("%s: first call %.1f s", name, time.perf_counter() - t0)
        compiled.append((name, fn, carry))
    st = step.init_state()
    ac = step.init_accs()
    st, ac = step.fn_super(st, ac, raw_dev, 0, 0)
    jax.block_until_ready(ac["audio"])

    if not toll_done.is_set():
        toll_done.wait(timeout=2400)

    for name, fn, carry in compiled:
        np.asarray(jax.block_until_ready(fn(carry)[1]))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            c2 = carry
            last = None
            for _ in range(8):
                c2, last = fn(c2)
            np.asarray(last)
            best = min(best, (time.perf_counter() - t0) / 8)
        LOG.info("%s: %.4f s/superstep (%.0f Msps)", name, best, S * N / best / 1e6)
        print(f"{name}: {best:.4f} s/superstep")
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        s2, a2 = st, ac
        for _ in range(8):
            s2, a2 = step.fn_super(s2, a2, raw_dev, 0, 0)
        np.asarray(a2["peak"])
        best = min(best, (time.perf_counter() - t0) / 8)
    LOG.info("real step.fn_super: %.4f s/superstep (%.0f Msps)", best, S * N / best / 1e6)
    print(f"step_fn_super: {best:.4f} s/superstep")
    return 0


if __name__ == "__main__":
    sys.exit(main())
