"""Real-capture integration tier (reference ``tests/test_cli_integration.py``
``conftest.py:29-116``).

The reference pulls ~403 MB of real off-air recordings from cloud storage
and asserts per-mode audio statistics.  This environment has no egress, so
this tier is **plumbing**: drop real captures plus a ``fixtures.json``
manifest into ``$IQ2A_FIXTURE_DIR`` (default ``tests/fixtures/``) and these
tests activate; without fixtures they skip cleanly, exactly like the
reference does when its download credentials are absent.

Manifest format (one entry per demod run)::

    [
      {
        "file": "baseband_145000000Hz_2024.wav",   # relative to fixture dir
        "target_freq": 145025000,
        "mode": "nfm",                              # nfm|am|usb|lsb|none
        "args": ["--bw", "12500"],                 # extra CLI flags (opt)
        "min_rms": 0.005,                          # float64 RMS lower bound
        "min_peak": 0.02,
        "min_nonzero_frac": 0.5
      }
    ]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]
FIXTURE_DIR = Path(os.environ.get("IQ2A_FIXTURE_DIR", REPO / "tests" / "fixtures"))
MANIFEST = FIXTURE_DIR / "fixtures.json"


def _load_manifest() -> list[dict]:
    if not MANIFEST.is_file():
        return []
    entries = json.loads(MANIFEST.read_text())
    return [e for e in entries if (FIXTURE_DIR / e["file"]).is_file()]


_ENTRIES = _load_manifest()


def _audio_stats(path: Path) -> dict[str, float]:
    from iq_to_audio_tpu.io.writer import read_wav

    audio, sample_rate = read_wav(path)
    mono = audio[:, 0] if audio.ndim > 1 else audio
    x = mono.astype(np.float64)
    return {
        "samples": float(x.size),
        "sample_rate": float(sample_rate),
        "rms": float(np.sqrt(np.mean(x**2))) if x.size else 0.0,
        "peak": float(np.abs(x).max()) if x.size else 0.0,
        "nonzero_frac": float(np.count_nonzero(np.abs(x) > 1e-4)) / float(x.size or 1),
    }


@pytest.mark.skipif(
    not _ENTRIES,
    reason=f"no real-capture fixtures (populate {FIXTURE_DIR} + fixtures.json)",
)
@pytest.mark.parametrize(
    "entry", _ENTRIES, ids=[f"{e['file']}:{e.get('mode', 'nfm')}" for e in _ENTRIES]
)
def test_real_capture_demod(entry, tmp_path):
    """Run the CLI end-to-end on a real capture; assert audio statistics."""
    out = tmp_path / "audio.wav"
    cmd = [
        sys.executable,
        "-m",
        "iq_to_audio_tpu.cli",
        "--cli",
        "--in",
        str(FIXTURE_DIR / entry["file"]),
        "--ft",
        str(entry["target_freq"]),
        "--out",
        str(out),
    ]
    mode = entry.get("mode", "nfm")
    if mode != "nfm":
        cmd += ["--demod", mode]
    cmd += list(entry.get("args", []))
    env = dict(os.environ, JAX_PLATFORMS=os.environ.get("JAX_PLATFORMS", "cpu"))
    result = subprocess.run(
        cmd, capture_output=True, text=True, check=False, cwd=REPO, env=env
    )
    assert result.returncode == 0, result.stderr[-2000:]

    produced = sorted(tmp_path.glob("audio*.wav"))
    assert produced, "CLI reported success but wrote no audio file"
    stats = _audio_stats(produced[0])
    if mode != "none":
        assert stats["sample_rate"] == 48_000.0
    assert stats["rms"] >= entry.get("min_rms", 0.005), stats
    assert stats["peak"] >= entry.get("min_peak", 0.02), stats
    assert stats["nonzero_frac"] >= entry.get("min_nonzero_frac", 0.25), stats


def test_fixture_plumbing_self_check(tmp_path, monkeypatch):
    """The fixture tier itself works: a synthetic capture dropped into a
    fixture dir with a manifest runs through the same code path."""
    sys.path.insert(0, str(REPO / "tests"))
    from conftest import make_nfm_iq

    from iq_to_audio_tpu.io.writer import write_stereo_wav

    fdir = tmp_path / "fixtures"
    fdir.mkdir()
    iq = make_nfm_iq(250_000.0, 0.5, 25_000.0)
    write_stereo_wav(
        fdir / "baseband_145000000Hz_synth.wav",
        np.column_stack([iq.real, iq.imag]).astype(np.float32),
        250_000,
        codec="pcm_f32le",
    )
    (fdir / "fixtures.json").write_text(
        json.dumps(
            [
                {
                    "file": "baseband_145000000Hz_synth.wav",
                    "target_freq": 145_025_000,
                    "mode": "nfm",
                    "min_rms": 0.01,
                }
            ]
        )
    )
    monkeypatch.setattr(
        sys.modules[__name__], "FIXTURE_DIR", fdir, raising=True
    )
    entries = json.loads((fdir / "fixtures.json").read_text())
    test_real_capture_demod(entries[0], tmp_path)
