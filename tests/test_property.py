"""Hypothesis property tests: the streaming invariants must hold for
arbitrary geometry (reference conftest.py hypothesis strategies,
tests/test_processing.py decimator-continuity)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

import jax.numpy as jnp

from conftest import error_db

from iq_to_audio_tpu.ops.ddc import DDCPlan, bandpass_kernel, ddc_apply
from iq_to_audio_tpu.ops.iir import feedback_agc, first_order_scan
from iq_to_audio_tpu.ops.nco import nco_increment_fixed, nco_phase_advance
from iq_to_audio_tpu.ops.resample import (
    ResamplePlan,
    design_resampler_kernel,
    polyphase_resample,
)
from iq_to_audio_tpu.ref.chain import RefResampler


@settings(max_examples=15, deadline=None)
@given(
    decim=st.integers(min_value=1, max_value=32),
    taps_len=st.sampled_from([129, 257, 513]),
    nchunks=st.integers(min_value=2, max_value=4),
    freq_frac=st.floats(min_value=-0.4, max_value=0.4),
)
def test_ddc_chunked_equals_whole(decim, taps_len, nchunks, freq_frac):
    fs = 96_000.0
    rng = np.random.default_rng(taps_len + decim)
    taps = np.kaiser(taps_len, 8.0) * np.sinc(
        0.5 * (np.arange(taps_len) - taps_len // 2)
    )
    inc = nco_increment_fixed(freq_frac * fs, fs)
    plan_small = DDCPlan.create(taps_len, decim, target_chunk=decim * 256)
    n = plan_small.chunk_size
    total = n * nchunks
    x = (rng.normal(size=total) + 1j * rng.normal(size=total)).astype(np.complex64) * 0.3
    kernel = jnp.asarray(bandpass_kernel(taps, [inc]))
    inc_lo = jnp.asarray(np.asarray([(inc * decim) % (1 << 32)], np.uint32))

    # whole-signal pass
    plan_big = DDCPlan(num_taps=taps_len, decimation=decim, chunk_size=total)
    tail0 = jnp.zeros((2, taps_len - 1), jnp.float32)
    ph0 = jnp.zeros((1,), jnp.uint32)
    yr_w, yi_w, _, _ = ddc_apply(
        plan_big, kernel, jnp.asarray(x.real), jnp.asarray(x.imag), tail0, ph0, inc_lo
    )

    # chunked pass with carried state
    tail, phase = tail0, ph0
    parts_r, parts_i = [], []
    for s in range(0, total, n):
        seg = x[s : s + n]
        yr, yi, tail, phase = ddc_apply(
            plan_small, kernel, jnp.asarray(seg.real), jnp.asarray(seg.imag),
            tail, phase, inc_lo,
        )
        parts_r.append(np.asarray(yr))
        parts_i.append(np.asarray(yi))
    got = np.concatenate(parts_r, -1)[0] + 1j * np.concatenate(parts_i, -1)[0]
    whole = np.asarray(yr_w)[0] + 1j * np.asarray(yi_w)[0]
    assert error_db(got, whole) < -100.0


def _stream_resample(plan, x):
    """Streamed resample with the pipeline's exact bookkeeping, including the
    EOF flush of the trailing incomplete block (pipeline.py EOF-flush path)."""
    kernel = jnp.asarray(design_resampler_kernel(plan.up, plan.down))
    tail = jnp.zeros(plan.tail_len, jnp.float32)
    total_in = 0
    emitted = 0
    parts = []
    y = None
    for s in range(0, x.size, plan.in_size):
        off = plan.chunk_offset(total_in)
        count = plan.out_count(total_in, plan.in_size)
        y, tail = polyphase_resample(
            plan, kernel, jnp.asarray(x[s : s + plan.in_size]), tail, off
        )
        parts.append(np.asarray(y)[:count])
        total_in += plan.in_size
        emitted += count
    extra = plan.final_flush_count(total_in, emitted)
    if extra:
        # the trailing incomplete block reads zero-padded input on device —
        # exactly the float64 twin's EOF semantics — and is always present
        # past the valid count (blocks_cap reserves its slot)
        count = plan.out_count(total_in - plan.in_size, plan.in_size)
        parts.append(np.asarray(y)[count : count + extra])
    return np.concatenate(parts)


@settings(max_examples=15, deadline=None)
@given(
    fs_in=st.integers(min_value=48_001, max_value=200_000),
    nblocks=st.integers(min_value=2, max_value=3),
)
def test_resampler_streamed_matches_whole(fs_in, nblocks):
    plan = ResamplePlan.create(fs_in, 48_000.0, in_size=4096)
    if plan.identity:
        return
    rng = np.random.default_rng(fs_in)
    x = rng.normal(size=plan.in_size * nblocks).astype(np.float32) * 0.3
    ref = RefResampler(plan.up, plan.down, plan.taps_per_phase).resample_all(x)
    got = _stream_resample(plan, x)
    assert got.size == ref.size
    assert error_db(got, ref) < -60.0


def test_resampler_streamed_eof_regression():
    """Pin the hypothesis-falsified example (round-1 red test): up=2/down=3
    dropped the final incomplete block's outputs (5460 of 5462)."""
    plan = ResamplePlan.create(71_983, 48_000.0, in_size=4096)
    assert not plan.identity
    rng = np.random.default_rng(71_983)
    x = rng.normal(size=plan.in_size * 2).astype(np.float32) * 0.3
    ref = RefResampler(plan.up, plan.down, plan.taps_per_phase).resample_all(x)
    got = _stream_resample(plan, x)
    assert got.size == ref.size
    assert error_db(got, ref) < -60.0


def test_resampler_ratio_exact_when_feasible_warns_when_not(caplog):
    import logging

    # float rate that hides an exact small rational: 2.5 MHz / 26
    with caplog.at_level(logging.WARNING, logger="iq_to_audio_tpu.ops.resample"):
        plan = ResamplePlan.create(2_500_000.0 / 26.0, 48_000.0, in_size=4096)
    assert (plan.up, plan.down) == (312, 625)
    assert plan.rate_error_ppm == 0.0
    assert not caplog.records

    # irreducible ratio past the kernel budget: approximate + loud warning
    with caplog.at_level(logging.WARNING, logger="iq_to_audio_tpu.ops.resample"):
        plan = ResamplePlan.create(71_983.0, 48_000.0, in_size=4096)
    assert plan.rate_error_ppm != 0.0
    assert abs(plan.rate_error_ppm) < 500.0  # still a tight approximation
    assert any("ppm" in r.getMessage() for r in caplog.records)


@settings(max_examples=20, deadline=None)
@given(
    freq=st.floats(min_value=-1e6, max_value=1e6),
    fs=st.sampled_from([96_000.0, 2_500_000.0]),
    n1=st.integers(min_value=1, max_value=5000),
    n2=st.integers(min_value=1, max_value=5000),
)
def test_nco_phase_advance_is_exact_and_associative(freq, fs, n1, n2):
    inc = nco_increment_fixed(freq, fs)
    p1 = nco_phase_advance(0, inc, n1)
    p2 = nco_phase_advance(p1, inc, n2)
    assert p2 == nco_phase_advance(0, inc, n1 + n2)
    assert 0 <= p2 < (1 << 32)


@settings(max_examples=10, deadline=None)
@given(
    split=st.integers(min_value=1, max_value=4094),
    decay=st.floats(min_value=1e-4, max_value=0.01),
)
def test_agc_chunk_split_invariance(split, decay):
    rng = np.random.default_rng(split)
    x = (rng.normal(size=4095) * 0.1).astype(np.float32)
    target = 0.25
    whole, _ = feedback_agc(jnp.asarray(x), target, decay, jnp.float32(1.0))
    y1, g = feedback_agc(jnp.asarray(x[:split]), target, decay, jnp.float32(1.0))
    y2, _ = feedback_agc(jnp.asarray(x[split:]), target, decay, g)
    got = np.concatenate([np.asarray(y1), np.asarray(y2)])
    assert error_db(got, np.asarray(whole)) < -80.0


@settings(max_examples=10, deadline=None)
@given(n=st.integers(min_value=2, max_value=2048))
def test_first_order_scan_matches_sequential(n):
    rng = np.random.default_rng(n)
    a = rng.uniform(0.8, 1.0, n).astype(np.float32)
    b = rng.normal(size=n).astype(np.float32)
    y, _ = first_order_scan(jnp.asarray(a), jnp.asarray(b), jnp.float32(0.1))
    exp = np.empty(n)
    prev = 0.1
    for i in range(n):
        prev = a[i] * prev + b[i]
        exp[i] = prev
    assert error_db(np.asarray(y), exp) < -80.0
