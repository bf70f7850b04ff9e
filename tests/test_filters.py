"""First-party filter design + first-order recurrence cross-checks.

The product and the float64 twin are pure NumPy (no runtime SciPy
dependency); when SciPy happens to be importable these tests pin the
first-party implementations to it — ``scipy.signal`` is the reference's
own designer (reference ``processing.py:599-620``, ``decoders/nfm.py:53-58``).
"""

from __future__ import annotations

import numpy as np
import pytest

from iq_to_audio_tpu.pipeline.filters import (
    design_channel_filter,
    firwin_kaiser_lowpass,
    kaiser_beta,
)
from iq_to_audio_tpu.ref.chain import RefDCBlocker, RefDeemphasis

scipy_signal = pytest.importorskip("scipy.signal")


@pytest.mark.parametrize("atten", [15.0, 30.0, 60.0, 80.0, 120.0])
def test_kaiser_beta_matches_scipy(atten):
    assert kaiser_beta(atten) == pytest.approx(
        scipy_signal.kaiser_beta(atten), rel=0, abs=1e-12
    )


@pytest.mark.parametrize(
    "num_taps,cutoff,fs",
    [
        (1025, 6_562.5, 250_000.0),
        (1601, 6_562.5, 2_500_000.0),
        (4097, 1_470.0, 384_000.0),
        (32767, 43_200.0, 2_500_000.0),
    ],
)
def test_firwin_matches_scipy(num_taps, cutoff, fs):
    beta = kaiser_beta(80.0)
    mine = firwin_kaiser_lowpass(num_taps, cutoff, beta, fs)
    ref = scipy_signal.firwin(num_taps, cutoff=cutoff, window=("kaiser", beta), fs=fs)
    assert mine.shape == ref.shape
    np.testing.assert_allclose(mine, ref, rtol=0, atol=1e-12 * np.abs(ref).max())


def test_design_channel_filter_matches_scipy_contract():
    fs, bw, decim = 2_500_000.0, 12_500.0, 26
    taps = design_channel_filter(fs, bw, decim)
    beta = scipy_signal.kaiser_beta(80.0)
    cutoff = min(bw * 0.5 * 1.05, (fs / (2.0 * decim)) * 0.9)
    ref = scipy_signal.firwin(len(taps), cutoff=cutoff, window=("kaiser", beta), fs=fs)
    np.testing.assert_allclose(taps, ref, rtol=0, atol=1e-12 * np.abs(ref).max())
    assert len(taps) % 2 == 1
    assert 1024 <= len(taps) <= 32768


def test_deemphasis_twin_matches_lfilter_chunked():
    rng = np.random.default_rng(3)
    x = rng.normal(size=50_000)
    fs, tau = 96_000.0, 300.0
    twin = RefDeemphasis(tau, fs)
    parts = [twin.process(c) for c in np.array_split(x, 7)]
    got = np.concatenate(parts)
    alpha = twin.alpha
    ref, _ = scipy_signal.lfilter([1.0 - alpha], [1.0, -alpha], x, zi=[0.0])
    np.testing.assert_allclose(got, ref, rtol=0, atol=1e-12 * np.abs(ref).max())


def test_dc_blocker_twin_matches_lfilter_chunked():
    rng = np.random.default_rng(4)
    x = rng.normal(size=50_000) + 0.3  # DC offset the blocker removes
    twin = RefDCBlocker()
    parts = [twin.process(c) for c in np.array_split(x, 5)]
    got = np.concatenate(parts)
    r = twin.radius
    ref, _ = scipy_signal.lfilter([1.0, -1.0], [1.0, -r], x, zi=[0.0])
    np.testing.assert_allclose(got, ref, rtol=0, atol=1e-11 * np.abs(ref).max())
