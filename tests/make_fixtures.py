#!/usr/bin/env python
"""Generate a synthetic real-capture fixture set.

The reference's integration tier pulls ~403 MB of off-air recordings from
cloud storage (reference ``tests/conftest.py:29-76``); this environment has
no egress, so this script synthesizes *realistic* captures instead — voice-
like modulation, co-channel interferers, a thermal noise floor, DC offset,
multiple container/codec combinations — and writes the ``fixtures.json``
manifest that both ``tests/test_real_captures.py`` and
``run_comprehensive_tests.py``'s fixture matrix consume.

    python tests/make_fixtures.py            # ~50 MB under tests/fixtures/
    python tests/make_fixtures.py --dir D --seconds-scale 0.25

Fixture files are generated, not committed (tests/fixtures/ is
git-ignored); re-run this script to repopulate.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def _rng(tag: str) -> np.random.Generator:
    return np.random.default_rng(abs(hash(tag)) % (1 << 32))


def _voice_like(fs: float, seconds: float, rng: np.random.Generator) -> np.ndarray:
    """Band-limited (300-3000 Hz) noise with a syllabic envelope — a stand-in
    for speech that produces speech-like demod statistics."""
    n = int(fs * seconds)
    white = rng.standard_normal(n)
    spec = np.fft.rfft(white)
    freqs = np.fft.rfftfreq(n, 1.0 / fs)
    spec[(freqs < 300.0) | (freqs > 3000.0)] = 0.0
    m = np.fft.irfft(spec, n)
    # ~4 Hz syllabic amplitude modulation, never fully silent
    t = np.arange(n) / fs
    env = 0.65 + 0.35 * np.sin(2 * np.pi * 3.7 * t + rng.uniform(0, 2 * np.pi))
    m = m * env
    return (m / (np.abs(m).max() or 1.0)).astype(np.float64)


def _fm(fs: float, offset: float, deviation: float, m: np.ndarray) -> np.ndarray:
    phase = 2 * np.pi * np.cumsum(offset + deviation * m) / fs
    return np.exp(1j * phase)


def make_nfm_capture(path: Path, seconds: float) -> dict:
    """2.5 MS/s SDR++-style WAV: voice-like NFM at +25 kHz, an interfering
    NFM carrier at -180 kHz, -40 dB noise floor, slight DC offset."""
    fs = 2_500_000.0
    rng = _rng(path.name)
    sig = 0.30 * _fm(fs, 25_000.0, 3_000.0, _voice_like(fs, seconds, rng))
    interferer = 0.18 * _fm(fs, -180_000.0, 2_500.0, _voice_like(fs, seconds, rng))
    n = sig.size
    noise = 0.003 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
    iq = sig + interferer + noise + (0.004 + 0.003j)
    from iq_to_audio_tpu.io.writer import write_stereo_wav

    write_stereo_wav(
        path, np.column_stack([iq.real, iq.imag]).astype(np.float32), int(fs)
    )
    return {
        "file": path.name,
        "target_freq": 145_025_000,
        "mode": "nfm",
        "min_rms": 0.008,
        "min_peak": 0.08,
        "min_nonzero_frac": 0.5,
        "expect": {"min_rms_dbfs": -40.0, "max_clipped_pct": 5.0},
    }


def make_am_capture(path: Path, seconds: float) -> dict:
    """250 kS/s WAV: 65%-depth AM broadcast-style signal at -50 kHz."""
    fs = 250_000.0
    rng = _rng(path.name)
    m = _voice_like(fs, seconds, rng)
    t = np.arange(m.size) / fs
    carrier = np.exp(1j * 2 * np.pi * (-50_000.0) * t)
    iq = 0.35 * (1.0 + 0.65 * m) * carrier
    iq = iq + 0.002 * (rng.standard_normal(m.size) + 1j * rng.standard_normal(m.size))
    from iq_to_audio_tpu.io.writer import write_stereo_wav

    write_stereo_wav(
        path, np.column_stack([iq.real, iq.imag]).astype(np.float32), int(fs)
    )
    return {
        "file": path.name,
        "target_freq": 7_050_000,
        "mode": "am",
        "args": ["--bw", "9000"],
        "min_rms": 0.01,
        "min_peak": 0.05,
        "min_nonzero_frac": 0.5,
        "expect": {"min_rms_dbfs": -45.0, "max_clipped_pct": 5.0},
    }


def make_usb_capture(path: Path, seconds: float) -> dict:
    """96 kS/s WAV: USB two-tone + voice-like upper-sideband at +12 kHz."""
    fs = 96_000.0
    rng = _rng(path.name)
    n = int(fs * seconds)
    t = np.arange(n) / fs
    # analytic (single-sideband) content 300-2500 Hz above the carrier
    audio = _voice_like(fs, seconds, rng)
    spec = np.fft.fft(audio)
    freqs = np.fft.fftfreq(n, 1.0 / fs)
    spec[freqs < 0] = 0.0  # keep only the upper sideband
    analytic = np.fft.ifft(spec)
    # keep a realistic in-channel noise floor: the reference's feedback AGC
    # (gain += d*(target/|x| - gain)) winds up without bound on a
    # near-silent channel and slams syllable onsets into the clipper —
    # verified identical on the float64 twin — so an off-air-like floor is
    # what keeps the gain bounded, exactly as it would be off-air
    iq = 0.4 * analytic * np.exp(1j * 2 * np.pi * 12_000.0 * t)
    iq = iq + 0.012 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
    from iq_to_audio_tpu.io.writer import write_stereo_wav

    write_stereo_wav(
        path, np.column_stack([iq.real, iq.imag]).astype(np.float32), int(fs)
    )
    return {
        "file": path.name,
        "target_freq": 14_212_000,
        "mode": "usb",
        # AGC off: this is a strong, clean signal — the reference's
        # feedback AGC (target/|x| per sample) deliberately runs hot on
        # voice (heavy-tailed 1/|x|), verified identical on the float64
        # twin, so the realistic operating point is AGC off
        "args": ["--bw", "2800", "--no-agc"],
        "min_rms": 0.01,
        "min_peak": 0.05,
        "min_nonzero_frac": 0.4,
        "expect": {"min_rms_dbfs": -45.0, "max_clipped_pct": 5.0},
    }


def make_raw_cs16_capture(path: Path, seconds: float) -> dict:
    """Raw interleaved cs16 (no header): NFM telemetry burst train at
    +25 kHz — exercises the raw-format + explicit-sample-rate path."""
    fs = 1_000_000.0
    rng = _rng(path.name)
    m = _voice_like(fs, seconds, rng)
    iq = 0.35 * _fm(fs, 25_000.0, 3_500.0, m)
    n = iq.size
    iq = iq + 0.003 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
    inter = np.empty(2 * n, dtype="<i2")
    inter[0::2] = np.clip(np.round(iq.real * 32767), -32768, 32767).astype("<i2")
    inter[1::2] = np.clip(np.round(iq.imag * 32767), -32768, 32767).astype("<i2")
    path.write_bytes(inter.tobytes())
    return {
        "file": path.name,
        "target_freq": 433_945_000,
        "center_freq": 433_920_000,
        "mode": "nfm",
        "args": ["--input-sample-rate", "1000000", "--fc", "433920000"],
        "min_rms": 0.008,
        "min_peak": 0.08,
        "min_nonzero_frac": 0.5,
        "expect": {"min_rms_dbfs": -40.0, "max_clipped_pct": 5.0},
    }


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument(
        "--dir", type=Path, default=REPO / "tests" / "fixtures",
        help="fixture directory (default tests/fixtures/)",
    )
    parser.add_argument(
        "--seconds-scale", type=float, default=1.0,
        help="scale every capture's duration (smaller = faster/smaller set)",
    )
    args = parser.parse_args()
    out = args.dir
    out.mkdir(parents=True, exist_ok=True)
    s = args.seconds_scale
    entries = [
        make_nfm_capture(out / "baseband_145000000Hz_nfm_voice.wav", 3.0 * s),
        make_am_capture(out / "baseband_7100000Hz_am_bcast.wav", 5.0 * s),
        make_usb_capture(out / "baseband_14200000Hz_usb_voice.wav", 5.0 * s),
        make_raw_cs16_capture(out / "telemetry_433920000Hz.cs16", 3.0 * s),
    ]
    manifest = out / "fixtures.json"
    manifest.write_text(json.dumps(entries, indent=2) + "\n")
    total = sum((out / e["file"]).stat().st_size for e in entries)
    print(f"{len(entries)} fixtures ({total / 1e6:.1f} MB) -> {out}")
    print(f"manifest: {manifest}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
