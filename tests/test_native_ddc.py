"""Native C++ channelizer (native/ddc.cpp) vs the JAX conv path.

The custom call must reproduce ``ops.ddc.ddc_apply_il`` — same decimated
channel samples, same carried-state layout — at f32-rounding agreement
(the two formulations are algebraically identical: bandpass-taps-then-
rotate == mix-then-real-filter; see native/ddc.cpp header).  The golden
-60 dB end-to-end contract is covered by test_pipeline (the native path
is the CPU default when the library builds); this file pins the op-level
contract: every codec, every IQ order, chunked == whole, and the exact
uint32 phase carry.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from iq_to_audio_tpu.ops import native_ddc
from iq_to_audio_tpu.ops.ddc import (
    DDCPlan,
    bandpass_kernel,
    ddc_apply_il,
    interleave_kernel,
)
from iq_to_audio_tpu.pipeline.filters import design_channel_filter

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "cpu" or not native_ddc.available(),
    reason="native DDC library unavailable (or not a CPU backend)",
)

RATE = 250_000.0
DECIM = 10


def _setup(num_taps=257, n=26_000, incs_hz=(25_000.0,)):
    taps = np.asarray(design_channel_filter(RATE, 12_500.0, DECIM))
    taps = taps[:num_taps] if len(taps) > num_taps else taps
    if len(taps) % 2 == 0:
        taps = taps[:-1]
    plan = DDCPlan.create(len(taps), DECIM, target_chunk=n)
    incs = np.asarray(
        [int(round(f / RATE * 2**32)) % 2**32 for f in incs_hz], np.uint32
    )
    return taps, plan, incs


def _native(plan, taps, incs, raw, itail, phase0, codec, order):
    h_rev = np.asarray(taps, np.float32)[::-1].copy()
    inc_lo = (incs.astype(np.uint64) * plan.decimation % 2**32).astype(
        np.uint32
    )

    @jax.jit
    def run(r, t, p):
        return native_ddc.ddc_apply_native(
            plan, jnp.asarray(h_rev), jnp.asarray(incs), r, t, p,
            jnp.asarray(inc_lo), codec, order,
        )

    return run(raw, jnp.asarray(itail), jnp.asarray(phase0))


def _conv(plan, taps, incs, f32, itail, phase0, order):
    kernel_il = jnp.asarray(
        interleave_kernel(bandpass_kernel(np.asarray(taps), list(incs)), order)
    )
    inc_lo = (incs.astype(np.uint64) * plan.decimation % 2**32).astype(
        np.uint32
    )

    @jax.jit
    def run(f, t, p):
        return ddc_apply_il(plan, kernel_il, f, t, p, jnp.asarray(inc_lo))

    return run(f32, jnp.asarray(itail), jnp.asarray(phase0))


def _err_db(yr, yi, yr_ref, yi_ref):
    ref = np.mean(np.square(yr_ref) + np.square(yi_ref))
    err = np.mean(
        np.square(np.asarray(yr) - yr_ref) + np.square(np.asarray(yi) - yi_ref)
    )
    return 10 * np.log10(err / ref + 1e-300)


@pytest.mark.parametrize("order", ["iq", "iq_inv", "qi", "qi_inv"])
def test_native_matches_conv_all_orders(order):
    taps, plan, incs = _setup()
    rng = np.random.default_rng(11)
    n = plan.chunk_size
    raw = rng.integers(-20000, 20000, size=2 * n, dtype=np.int16)
    itail = (rng.standard_normal(2 * (len(taps) - 1)) * 0.2).astype(np.float32)
    phase0 = np.asarray([987654321] * len(incs), np.uint32)

    yr_n, yi_n, tail_n, ph_n = _native(
        plan, taps, incs, jnp.asarray(raw), itail, phase0, "pcm_s16le", order
    )
    f32 = jnp.asarray(raw, jnp.float32) * jnp.float32(1 / 32768.0)
    yr_c, yi_c, tail_c, ph_c = _conv(
        plan, taps, incs, f32, itail, phase0, order
    )
    assert _err_db(yr_n, yi_n, np.asarray(yr_c), np.asarray(yi_c)) < -100.0
    np.testing.assert_array_equal(np.asarray(ph_n), np.asarray(ph_c))
    np.testing.assert_allclose(
        np.asarray(tail_n), np.asarray(tail_c), rtol=0, atol=1e-7
    )


@pytest.mark.parametrize(
    "codec,gen",
    [
        ("pcm_u8", lambda rng, n: rng.integers(0, 256, 2 * n, dtype=np.uint8)),
        (
            "pcm_f32le",
            lambda rng, n: (rng.standard_normal(2 * n) * 0.4).astype(
                np.float32
            ),
        ),
    ],
)
def test_native_codecs(codec, gen):
    taps, plan, incs = _setup()
    rng = np.random.default_rng(7)
    n = plan.chunk_size
    raw = gen(rng, n)
    itail = np.zeros(2 * (len(taps) - 1), np.float32)
    phase0 = np.asarray([0], np.uint32)

    yr_n, yi_n, _, _ = _native(
        plan, taps, incs, jnp.asarray(raw), itail, phase0, codec, "iq"
    )
    if codec == "pcm_u8":
        f32 = (jnp.asarray(raw, jnp.float32) - 128.0) * jnp.float32(1 / 128.0)
    else:
        f32 = jnp.asarray(raw, jnp.float32)
    yr_c, yi_c, _, _ = _conv(plan, taps, incs, f32, itail, phase0, "iq")
    assert _err_db(yr_n, yi_n, np.asarray(yr_c), np.asarray(yi_c)) < -100.0


def test_native_chunked_equals_whole():
    taps, plan, incs = _setup()
    n = plan.chunk_size
    rng = np.random.default_rng(3)
    raw = rng.integers(-20000, 20000, size=2 * 3 * n, dtype=np.int16)
    L = len(taps)

    whole_plan = DDCPlan.create(L, DECIM, target_chunk=3 * n)
    assert whole_plan.chunk_size == 3 * n
    itail0 = np.zeros(2 * (L - 1), np.float32)
    phase0 = np.asarray([123456], np.uint32)
    yr_w, yi_w, _, _ = _native(
        whole_plan, taps, incs, jnp.asarray(raw), itail0, phase0,
        "pcm_s16le", "iq",
    )

    tail = jnp.asarray(itail0)
    ph = phase0
    outs = []
    for i in range(3):
        yr, yi, tail, ph = _native(
            plan, taps, incs, jnp.asarray(raw[2 * i * n : 2 * (i + 1) * n]),
            np.asarray(tail), np.asarray(ph), "pcm_s16le", "iq",
        )
        outs.append((np.asarray(yr), np.asarray(yi)))
    yr_c = np.concatenate([o[0] for o in outs], axis=-1)
    yi_c = np.concatenate([o[1] for o in outs], axis=-1)
    assert _err_db(yr_c, yi_c, np.asarray(yr_w), np.asarray(yi_w)) < -100.0


def test_native_multichannel():
    taps, plan, incs = _setup(incs_hz=(25_000.0, -40_000.0, 10_000.0))
    n = plan.chunk_size
    rng = np.random.default_rng(5)
    raw = rng.integers(-20000, 20000, size=2 * n, dtype=np.int16)
    itail = np.zeros(2 * (len(taps) - 1), np.float32)
    phase0 = np.asarray([1, 2, 3], np.uint32)

    yr_n, yi_n, _, _ = _native(
        plan, taps, incs, jnp.asarray(raw), itail, phase0, "pcm_s16le", "iq"
    )
    f32 = jnp.asarray(raw, jnp.float32) * jnp.float32(1 / 32768.0)
    yr_c, yi_c, _, _ = _conv(plan, taps, incs, f32, itail, phase0, "iq")
    assert yr_n.shape == (3, plan.out_size)
    assert _err_db(yr_n, yi_n, np.asarray(yr_c), np.asarray(yi_c)) < -100.0


@pytest.mark.parametrize("decim", [17, 26, 32])
@pytest.mark.parametrize("order", ["iq", "qi_inv"])
def test_native_transpose_fill_decims(decim, order):
    """D >= 16 engages the gather-free transpose fill (native/ddc.cpp).

    Covers its three seams explicitly: the scalar tail-seam rows (nonzero
    carried tail), the 16-row interior blocks (including a partial final
    p-group when D % 16 != 0), and the per-phase gather fallback for the
    final blocks whose full-width loads would run past the chunk.  Chunk
    sizes are chosen so the fill count is NOT a multiple of 16.
    """
    rate = 2_500_000.0
    taps = np.asarray(design_channel_filter(rate, 12_500.0, decim))
    # an odd tile-straddling chunk: several interior blocks + ragged end
    plan = DDCPlan.create(len(taps), decim, target_chunk=40_000)
    incs = np.asarray([int(round(25e3 / rate * 2**32))], np.uint32)
    rng = np.random.default_rng(decim)
    n = plan.chunk_size
    raw = rng.integers(-20000, 20000, size=2 * n, dtype=np.int16)
    itail = (rng.standard_normal(2 * (len(taps) - 1)) * 0.2).astype(
        np.float32
    )
    phase0 = np.asarray([456789], np.uint32)

    yr_n, yi_n, tail_n, ph_n = _native(
        plan, taps, incs, jnp.asarray(raw), itail, phase0, "pcm_s16le", order
    )
    f32 = jnp.asarray(raw, jnp.float32) * jnp.float32(1 / 32768.0)
    yr_c, yi_c, tail_c, ph_c = _conv(
        plan, taps, incs, f32, itail, phase0, order
    )
    assert _err_db(yr_n, yi_n, np.asarray(yr_c), np.asarray(yi_c)) < -100.0
    np.testing.assert_array_equal(np.asarray(ph_n), np.asarray(ph_c))


def test_native_transpose_chunked_equals_whole_d26():
    """Headline decimation (26): carried-state exactness across chunks
    must hold when interior blocks use the transpose fill but the chunk
    boundary blocks fall back to the gather path."""
    rate = 2_500_000.0
    decim = 26
    taps = np.asarray(design_channel_filter(rate, 12_500.0, decim))
    L = len(taps)
    plan = DDCPlan.create(L, decim, target_chunk=30_000)
    incs = np.asarray([int(round(25e3 / rate * 2**32))], np.uint32)
    n = plan.chunk_size
    rng = np.random.default_rng(26)
    raw = rng.integers(-20000, 20000, size=2 * 3 * n, dtype=np.int16)

    whole_plan = DDCPlan.create(L, decim, target_chunk=3 * n)
    assert whole_plan.chunk_size == 3 * n
    itail0 = np.zeros(2 * (L - 1), np.float32)
    phase0 = np.asarray([31337], np.uint32)
    yr_w, yi_w, _, _ = _native(
        whole_plan, taps, incs, jnp.asarray(raw), itail0, phase0,
        "pcm_s16le", "iq",
    )

    tail = jnp.asarray(itail0)
    ph = phase0
    outs = []
    for i in range(3):
        yr, yi, tail, ph = _native(
            plan, taps, incs, jnp.asarray(raw[2 * i * n : 2 * (i + 1) * n]),
            np.asarray(tail), np.asarray(ph), "pcm_s16le", "iq",
        )
        outs.append((np.asarray(yr), np.asarray(yi)))
    yr_c = np.concatenate([o[0] for o in outs], axis=-1)
    yi_c = np.concatenate([o[1] for o in outs], axis=-1)
    assert _err_db(yr_c, yi_c, np.asarray(yr_w), np.asarray(yi_w)) < -100.0
