"""Sample-rate probing.

Same preference triple as the reference (``probe.py:14-37``): the reference
asks ffprobe, libsndfile and the stdlib ``wave`` module; here the primary
source is the first-party RIFF parser, with ``wave`` as an independent
cross-check.  The ``ffprobe`` slot is kept for API parity and is always
None (there is no external prober to shell out to).
"""

from __future__ import annotations

import logging
from dataclasses import dataclass
from pathlib import Path

from .riff import WavFormatError, parse_wav_header

LOG = logging.getLogger(__name__)


@dataclass
class SampleRateProbe:
    ffprobe: float | None
    header: float | None
    wave: float | None = None

    @property
    def value(self) -> float:
        """Return the best available sample rate measurement."""
        if self.ffprobe:
            return self.ffprobe
        if self.header:
            return self.header
        if self.wave:
            return self.wave
        raise RuntimeError("Unable to determine sample rate from header.")


def probe_sample_rate(path: Path) -> SampleRateProbe:
    header_rate = _header_sample_rate(path)
    wave_rate = _wave_sample_rate(path)
    return SampleRateProbe(ffprobe=None, header=header_rate, wave=wave_rate)


def _header_sample_rate(path: Path) -> float | None:
    try:
        info = parse_wav_header(path)
    except (WavFormatError, OSError):
        return None
    return float(info.sample_rate) if info.sample_rate else None


def _wave_sample_rate(path: Path) -> float | None:
    import wave

    try:
        with wave.open(str(path), "rb") as wf:
            return float(wf.getframerate())
    except (wave.Error, EOFError, FileNotFoundError, OSError):
        return None
