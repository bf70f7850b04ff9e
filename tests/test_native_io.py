"""Native host-IO kernels (native/iqio.cpp via ctypes): build, load and
match the NumPy fallbacks bit-for-bit.

The library is optional product code on the ingest/encode hot path
(io/reader.py::convert_to_complex, io/writer.py::AudioWriter), so its
semantics are pinned against the pure-NumPy implementations here; when no
C++ toolchain is available the suite records the fallback-only situation
with a skip instead of silently testing nothing.
"""

from __future__ import annotations

import numpy as np
import pytest

from iq_to_audio_tpu.io import native


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native iqio library unavailable (no g++?)")
    return lib


def _numpy_convert(raw, codec, iq_order):
    if codec == "pcm_u8":
        f = (raw.astype(np.float32) - 128.0) * np.float32(1.0 / 128.0)
    elif codec == "pcm_s16le":
        f = raw.astype(np.float32) * np.float32(1.0 / 32768.0)
    else:
        f = np.asarray(raw, dtype=np.float32)
    if iq_order.startswith("iq"):
        i, q = f[0::2], f[1::2]
    else:
        q, i = f[0::2], f[1::2]
    if iq_order.endswith("_inv"):
        q = -q
    return i, q


@pytest.mark.parametrize("codec", ["pcm_u8", "pcm_s16le", "pcm_f32le"])
@pytest.mark.parametrize("iq_order", ["iq", "qi", "iq_inv", "qi_inv"])
def test_convert_deinterleave_matches_numpy(lib, codec, iq_order):
    rng = np.random.default_rng(7)
    n = 4097  # odd frame count: exercises the tail
    if codec == "pcm_u8":
        raw = rng.integers(0, 256, size=2 * n, dtype=np.uint8)
    elif codec == "pcm_s16le":
        raw = rng.integers(-32768, 32768, size=2 * n, dtype=np.int16)
    else:
        raw = rng.standard_normal(2 * n).astype(np.float32)
    got = native.convert_deinterleave(raw, codec, iq_order)
    assert got is not None
    ref_i, ref_q = _numpy_convert(raw, codec, iq_order)
    np.testing.assert_array_equal(got[0], ref_i)
    np.testing.assert_array_equal(got[1], ref_q)


def test_encode_s16_matches_reference_quantiser(lib):
    """Clip to +-clip, scale by 32767, round-half-away (the reference's
    np.round -> int16 semantics, processing.py:449-452) and report the
    pre-clip peak."""
    x = np.array(
        [0.0, 0.25, -0.25, 0.99, -0.99, 1.5, -1.5, 1.0 / 32767.0, 0.5e-4],
        dtype=np.float32,
    )
    out, peak = native.encode_s16(x, clip=0.99)
    ref = np.clip(x, -0.99, 0.99)
    ref = np.round(ref * 32767.0).astype(np.int16)
    np.testing.assert_array_equal(out, ref)
    assert peak == pytest.approx(1.5)


def test_encode_s16_random_roundtrip(lib):
    rng = np.random.default_rng(11)
    x = rng.uniform(-1.2, 1.2, size=100_001).astype(np.float32)
    out, peak = native.encode_s16(x, clip=0.99)
    ref = np.round(np.clip(x, -0.99, 0.99) * 32767.0).astype(np.int16)
    np.testing.assert_array_equal(out, ref)
    assert peak == pytest.approx(float(np.max(np.abs(x))), rel=1e-6)


@pytest.mark.parametrize("codec", ["pcm_u8", "pcm_s16le", "pcm_f32le"])
def test_interleave_encode_matches_numpy_fallback(lib, codec, monkeypatch):
    """The native pass-through IQ encode is byte-identical to the NumPy
    rules in io/writer.py::_encode_iq_raw (which themselves mirror the
    reference, processing.py:527-539)."""
    from iq_to_audio_tpu.io import writer

    rng = np.random.default_rng(23)
    iq = (
        rng.uniform(-1.2, 1.2, size=9_001)
        + 1j * rng.uniform(-1.2, 1.2, size=9_001)
    ).astype(np.complex64)
    got = native.interleave_encode(iq, codec)
    assert got is not None
    # force the NumPy path by making the native lookup fail
    monkeypatch.setattr(
        "iq_to_audio_tpu.io.native.interleave_encode", lambda *_: None
    )
    ref = writer._encode_iq_raw(iq, codec)
    assert got == ref
