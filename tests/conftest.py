"""Test fixtures.

Tests run on CPU with 8 virtual devices so sharding tests work without TPU
hardware (the driver separately dry-runs the multichip path).  The axon
environment force-sets JAX_PLATFORMS=axon via sitecustomize, so we must
override through jax.config *before* any backend is initialised.
"""

from __future__ import annotations

import math
import os
import sys
from pathlib import Path

os.environ.setdefault("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
    os.environ["XLA_FLAGS"] = (
        os.environ["XLA_FLAGS"] + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
# pin the conv channelizer (the TPU-shaped path) for the suite: on CPU the
# product auto-selects the faster FFT bank, but CI must keep exercising the
# path the target hardware runs; dedicated tests opt into fft explicitly
os.environ.setdefault("IQ2A_CHANNELIZER", "conv")
# isolate the persistent recent-captures store from the user's real config
import tempfile as _tempfile  # noqa: E402

os.environ.setdefault(
    "IQ2A_CONFIG_DIR", _tempfile.mkdtemp(prefix="iq2a-test-config-")
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


# ---------------------------------------------------------------------------
# Synthetic signal generators (modelled on the reference conftest generators:
# reference tests/conftest.py:156-290)
# ---------------------------------------------------------------------------


def make_tone_iq(
    sample_rate: float,
    seconds: float,
    freq_offset: float,
    *,
    amplitude: float = 0.7,
    noise_std: float = 0.02,
    seed: int = 42,
) -> np.ndarray:
    """Complex tone at ``freq_offset`` plus Gaussian noise (complex64)."""
    n = int(round(sample_rate * seconds))
    t = np.arange(n, dtype=np.float64) / sample_rate
    tone = amplitude * np.exp(1j * 2.0 * math.pi * freq_offset * t)
    rng = np.random.default_rng(seed)
    noise = rng.normal(scale=noise_std, size=n) + 1j * rng.normal(scale=noise_std, size=n)
    return (tone + noise).astype(np.complex64)


def make_nfm_iq(
    sample_rate: float,
    seconds: float,
    freq_offset: float,
    *,
    audio_freq: float = 1_000.0,
    deviation: float = 2_500.0,
    amplitude: float = 0.7,
    noise_std: float = 0.01,
    seed: int = 7,
) -> np.ndarray:
    """NFM-modulated tone carrier at ``freq_offset`` (cumsum FM synthesis)."""
    n = int(round(sample_rate * seconds))
    t = np.arange(n, dtype=np.float64) / sample_rate
    audio = np.sin(2.0 * math.pi * audio_freq * t)
    inst_freq = freq_offset + deviation * audio
    phase = 2.0 * math.pi * np.cumsum(inst_freq) / sample_rate
    rng = np.random.default_rng(seed)
    iq = amplitude * np.exp(1j * phase)
    iq = iq + rng.normal(scale=noise_std, size=n) + 1j * rng.normal(scale=noise_std, size=n)
    return iq.astype(np.complex64)


def make_am_iq(
    sample_rate: float,
    seconds: float,
    freq_offset: float,
    *,
    audio_freq: float = 800.0,
    mod_index: float = 0.6,
    amplitude: float = 0.5,
    seed: int = 11,
) -> np.ndarray:
    n = int(round(sample_rate * seconds))
    t = np.arange(n, dtype=np.float64) / sample_rate
    audio = np.sin(2.0 * math.pi * audio_freq * t)
    envelope = amplitude * (1.0 + mod_index * audio)
    carrier = np.exp(1j * 2.0 * math.pi * freq_offset * t)
    rng = np.random.default_rng(seed)
    iq = envelope * carrier
    iq = iq + rng.normal(scale=0.005, size=n) + 1j * rng.normal(scale=0.005, size=n)
    return iq.astype(np.complex64)


def error_db(test: np.ndarray, ref: np.ndarray) -> float:
    """Relative error in dB: 20*log10(||test-ref|| / ||ref||)."""
    dtype = (
        np.complex128
        if (np.iscomplexobj(np.asarray(test)) or np.iscomplexobj(np.asarray(ref)))
        else np.float64
    )
    test = np.asarray(test, dtype=dtype)
    ref = np.asarray(ref, dtype=dtype)
    assert test.shape == ref.shape, (test.shape, ref.shape)
    num = float(np.linalg.norm(test - ref))
    den = float(np.linalg.norm(ref)) + 1e-30
    return 20.0 * math.log10(num / den + 1e-30)


@pytest.fixture
def tone_iq():
    return make_tone_iq(250_000.0, 0.5, 25_000.0)


@pytest.fixture
def nfm_iq():
    return make_nfm_iq(250_000.0, 0.5, 25_000.0)


def write_wav_iq(path, iq: np.ndarray, sample_rate: int, subtype: str = "pcm_s16le"):
    """Write complex IQ as a stereo WAV using the framework's own writer."""
    from iq_to_audio_tpu.io.writer import write_stereo_wav

    data = np.column_stack([iq.real, iq.imag]).astype(np.float32)
    write_stereo_wav(path, data, sample_rate, codec=subtype)
    return path
