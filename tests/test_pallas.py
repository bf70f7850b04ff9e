"""Pallas DDC kernel vs the XLA conv path (interpret mode on CPU).

Exercises the PRODUCT path: the interleaved-stream variant
(``pallas_poly_fir_il`` — see ``ops/ddc.py::ddc_apply_il``), with the pair
variant kept as a secondary check of the shared matmul kernel.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax.numpy as jnp

from conftest import error_db, make_tone_iq

from iq_to_audio_tpu.ops.ddc import (
    DDCPlan,
    bandpass_kernel,
    ddc_apply,
    interleave_kernel,
)
from iq_to_audio_tpu.ops.nco import nco_increment_fixed
from iq_to_audio_tpu.pipeline.filters import design_channel_filter

pl = pytest.importorskip("jax.experimental.pallas")

from iq_to_audio_tpu.ops import pallas_ddc  # noqa: E402


class _Interpret:
    """Force pallas_call into interpreter mode (no TPU needed)."""

    def __enter__(self):
        import jax.experimental.pallas as pl_mod

        self._orig = pl_mod.pallas_call

        def patched(*args, **kwargs):
            kwargs["interpret"] = True
            return self._orig(*args, **kwargs)

        pl_mod.pallas_call = patched
        pallas_ddc.pl.pallas_call = patched
        return self

    def __exit__(self, *exc):
        import jax.experimental.pallas as pl_mod

        pl_mod.pallas_call = self._orig
        pallas_ddc.pl.pallas_call = self._orig
        return False


def _setup(decim):
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
    yr, yi, _, _ = ddc_apply(
        plan, jnp.asarray(kernel_np), jnp.asarray(x.real), jnp.asarray(x.imag),
        tail, phase, inc_lo,
    )
    return plan, x, kernel_np, phase, inc_lo, yr, yi


@pytest.mark.parametrize("decim", [4, 26])
def test_pallas_interleaved_matches_conv(decim):
    """The product path: interleaved stream -> pallas_poly_fir_il -> mix,
    against the pair conv reference."""
    from iq_to_audio_tpu.ops.ddc import lowrate_osc

    plan, x, kernel_np, phase, inc_lo, yr, yi = _setup(decim)
    L = plan.num_taps
    kernel_il = interleave_kernel(kernel_np, "iq")
    poly_il = jnp.asarray(
        pallas_ddc.build_poly_kernel(kernel_il, 2 * plan.decimation)
    )
    x_il = np.empty(2 * plan.chunk_size, np.float32)
    x_il[0::2] = x.real
    x_il[1::2] = x.imag
    full = jnp.concatenate([jnp.zeros(2 * (L - 1), jnp.float32), jnp.asarray(x_il)])
    with _Interpret():
        out = pallas_ddc.pallas_poly_fir_il(
            full, poly_il, plan.decimation, plan.out_size
        )
    bb = out.reshape(2, 2, plan.out_size)
    br, bi = bb[:, 0], bb[:, 1]
    cos, sin = lowrate_osc(phase, inc_lo, plan.out_size)
    got_r = br * cos - bi * sin
    got_i = br * sin + bi * cos
    err_r = error_db(np.asarray(got_r), np.asarray(yr))
    err_i = error_db(np.asarray(got_i), np.asarray(yi))
    assert err_r < -100.0 and err_i < -100.0, (err_r, err_i)


@pytest.mark.parametrize("decim", [26])
def test_pallas_pair_matches_conv(decim):
    """The pair-input variant (secondary check of the shared kernel)."""
    from iq_to_audio_tpu.ops.ddc import lowrate_osc

    plan, x, kernel_np, phase, inc_lo, yr, yi = _setup(decim)
    x_full = jnp.stack(
        [
            jnp.concatenate([jnp.zeros(plan.overlap, jnp.float32), jnp.asarray(x.real)]),
            jnp.concatenate([jnp.zeros(plan.overlap, jnp.float32), jnp.asarray(x.imag)]),
        ]
    )
    poly_w = jnp.asarray(pallas_ddc.build_poly_kernel(kernel_np, decim))
    with _Interpret():
        out = pallas_ddc.pallas_poly_fir(x_full, poly_w, decim, plan.out_size)
    bb = out.reshape(2, 2, plan.out_size)
    br, bi = bb[:, 0], bb[:, 1]
    cos, sin = lowrate_osc(phase, inc_lo, plan.out_size)
    got_r = br * cos - bi * sin
    got_i = br * sin + bi * cos
    assert error_db(np.asarray(got_r), np.asarray(yr)) < -100.0
    assert error_db(np.asarray(got_i), np.asarray(yi)) < -100.0


def test_poly_kernel_packing_roundtrip():
    """build_poly_kernel must preserve every tap exactly — including when
    applied to the interleaved kernel with window stride 2D (the feature
    axis becomes the contiguous (T, 2D) reshape of the raw stream)."""
    rng = np.random.default_rng(0)
    conv_k = rng.normal(size=(4, 2, 37)).astype(np.float32)
    w = pallas_ddc.build_poly_kernel(conv_k, decimation=5)
    K, F, O = w.shape
    assert F == 10 and O == 4 and K == (37 - 1) // 5 + 1  # exact, no zero block
    for j in range(37):
        k, p = divmod(j, 5)
        for i in range(2):
            np.testing.assert_array_equal(w[k, i * 5 + p, :], conv_k[:, i, j])
    # interleaved: kernel (O, 1, 2L), stride 2D
    ki = interleave_kernel(conv_k, "iq")
    wi = pallas_ddc.build_poly_kernel(ki, decimation=10)
    Ki, Fi, Oi = wi.shape
    assert Fi == 10 and Oi == 4 and Ki == (74 - 1) // 10 + 1
    for j in range(74):
        k, p = divmod(j, 10)
        np.testing.assert_array_equal(wi[k, p, :], ki[:, 0, j])


@pytest.mark.parametrize("num_taps", [8193])
def test_pallas_big_l_tap_tiling(num_taps):
    """Big-L regime (VERDICT round-2 weak 5): a filter far beyond the old
    8 MB VMEM gate runs through the SAME kernel with the tap axis tiled
    (k innermost, output tile accumulated in place) and matches the
    direct polyphase evaluation exactly."""
    decim = 26
    rng = np.random.default_rng(3)
    taps = rng.normal(size=num_taps).astype(np.float64) / num_taps
    incs = [nco_increment_fixed(25_000.0, 250_000.0)]
    kernel_np = bandpass_kernel(taps, incs)
    kernel_il = interleave_kernel(kernel_np, "iq")
    poly_il = pallas_ddc.build_poly_kernel(kernel_il, 2 * decim)
    K, F, out_ch = poly_il.shape
    assert K > 256  # genuinely beyond any single-block VMEM budget
    # auto block choice must tile
    kb = pallas_ddc.choose_k_block(K, 128, 128)
    assert kb < K and kb % 8 == 0

    out_size = 96
    n = out_size * decim
    L = num_taps
    x = make_tone_iq(250_000.0, (n + 10) / 250_000.0, 10_000.0)[:n]
    x_il = np.empty(2 * n, np.float32)
    x_il[0::2] = x.real
    x_il[1::2] = x.imag
    full = np.concatenate([np.zeros(2 * (L - 1), np.float32), x_il])

    # float64 direct polyphase reference on the same reshaped input
    D2 = 2 * decim
    t_total = full.size // D2
    X = full[: t_total * D2].reshape(t_total, D2).astype(np.float64)
    ref = np.zeros((out_size, out_ch))
    for k in range(K):
        rows = X[k : k + out_size, :] if k + out_size <= t_total else np.pad(
            X[k:, :], ((0, k + out_size - t_total), (0, 0))
        )
        ref += rows @ poly_il[k].astype(np.float64)

    with _Interpret():
        got = pallas_ddc.pallas_poly_fir_il(
            jnp.asarray(full), jnp.asarray(poly_il), decim, out_size,
            k_block=64,  # force several k-steps even in interpret mode
        )
    err = error_db(np.asarray(got), ref.T)
    assert err < -100.0, err


def test_choose_k_block_degrades_below_eight():
    # wide geometries where even an 8-tap block exceeds the budget must
    # degrade to the largest fitting block, not return an unallocatable 8
    kb = pallas_ddc.choose_k_block(100, 4096, 4096)  # 64 MiB per tap block
    assert kb == 1
    kb = pallas_ddc.choose_k_block(100, 1024, 1024)  # 4 MiB per tap: fit=1
    assert 1 <= kb < 8
    assert pallas_ddc.choose_k_block(5, 128, 128) == 5  # small: whole tensor
