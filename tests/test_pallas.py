"""Pallas DDC kernel vs the XLA conv path (interpret mode on CPU)."""

from __future__ import annotations

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import error_db, make_tone_iq

from iq_to_audio_tpu.ops.ddc import DDCPlan, bandpass_kernel, ddc_apply
from iq_to_audio_tpu.ops.nco import nco_increment_fixed
from iq_to_audio_tpu.pipeline.filters import design_channel_filter

pl = pytest.importorskip("jax.experimental.pallas")

from iq_to_audio_tpu.ops import pallas_ddc  # noqa: E402


def _interpret_poly_fir(x_pair, poly_w, decim, out_size):
    """Run the kernel in interpreter mode (no TPU needed)."""
    import jax.experimental.pallas as pl_mod

    orig = pl_mod.pallas_call

    def patched(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    pl_mod.pallas_call = patched
    # also patch the symbol captured inside the module
    pallas_ddc.pl.pallas_call = patched
    try:
        return pallas_ddc.pallas_poly_fir(x_pair, poly_w, decim, out_size)
    finally:
        pl_mod.pallas_call = orig
        pallas_ddc.pl.pallas_call = orig


@pytest.mark.parametrize("decim", [4, 26])
def test_pallas_matches_conv(decim):
    fs = 250_000.0
    taps = design_channel_filter(fs, 12_500.0, decim)
    plan = DDCPlan.create(len(taps), decim, target_chunk=decim * 2048)
    n = plan.chunk_size
    x = make_tone_iq(fs, (n + 10) / fs, 10_000.0)[:n]
    incs = [nco_increment_fixed(25_000.0, fs), nco_increment_fixed(-40_000.0, fs)]
    kernel_np = bandpass_kernel(taps, incs)
    tail = jnp.zeros((2, plan.overlap), jnp.float32)
    phase = jnp.zeros((2,), jnp.uint32)
    inc_lo = jnp.asarray(
        np.asarray([(i * decim) % (1 << 32) for i in incs], np.uint32)
    )
    # reference: the conv path (post-mix disabled by comparing pre-mix output)
    yr, yi, _, _ = ddc_apply(
        plan, jnp.asarray(kernel_np), jnp.asarray(x.real), jnp.asarray(x.imag),
        tail, phase, inc_lo,
    )
    # pallas path: bandpass conv only, then the same low-rate mix
    from iq_to_audio_tpu.ops.ddc import lowrate_osc

    x_full = jnp.stack(
        [
            jnp.concatenate([tail[0], jnp.asarray(x.real)]),
            jnp.concatenate([tail[1], jnp.asarray(x.imag)]),
        ]
    )
    poly_w = jnp.asarray(pallas_ddc.build_poly_kernel(kernel_np, decim))
    out = _interpret_poly_fir(x_full, poly_w, decim, plan.out_size)  # (2C, m)
    bb = out.reshape(2, 2, plan.out_size)
    br, bi = bb[:, 0], bb[:, 1]
    cos, sin = lowrate_osc(phase, inc_lo, plan.out_size)
    got_r = br * cos - bi * sin
    got_i = br * sin + bi * cos
    err_r = error_db(np.asarray(got_r), np.asarray(yr))
    err_i = error_db(np.asarray(got_i), np.asarray(yi))
    assert err_r < -100.0 and err_i < -100.0, (err_r, err_i)


def test_poly_kernel_packing_roundtrip():
    """build_poly_kernel must preserve every tap exactly."""
    rng = np.random.default_rng(0)
    conv_k = rng.normal(size=(4, 2, 37)).astype(np.float32)
    w = pallas_ddc.build_poly_kernel(conv_k, decimation=5)
    K, F, O = w.shape
    assert F == 10 and O == 4 and K == -(-37 // 5) + 1
    # reconstruct: conv_k[:, i, kD+p] == w[k, i*D+p, :]
    for j in range(37):
        k, p = divmod(j, 5)
        for i in range(2):
            np.testing.assert_array_equal(w[k, i * 5 + p, :], conv_k[:, i, j])
