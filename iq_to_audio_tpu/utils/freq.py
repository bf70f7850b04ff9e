"""Center-frequency detection from metadata tags and filename heuristics.

Capability match with the reference ``utils.py:24-199``: metadata keys are
checked first (tags come from the first-party RIFF INFO parser instead of
libsndfile/ffprobe), then filename patterns like ``baseband_145500000Hz...``
(SDR++) or ``HH-MM-SS_..145500kHz..`` (SDR#), picking the **largest**
candidate >= 1 kHz.
"""

from __future__ import annotations

import logging
import re
from dataclasses import dataclass
from pathlib import Path

LOG = logging.getLogger(__name__)

_FREQ_PATTERN = re.compile(r"(?P<value>[-+]?\d+(?:\.\d+)?)(?P<unit>\s*[kKmMgG]?)\s*(?:[Hh][Zz])?")
_FILENAME_FREQ_PATTERN = re.compile(r"(?i)(\d+(?:\.\d+)?)([kmg]?)(?:hz)")
_METADATA_KEYS = [
    "center_frequency",
    "centerfrequency",
    "frequency",
    "tuner_frequency",
    "tunerfrequency",
    "carrier_frequency",
    "rx_frequency",
    "hz",
]

_UNIT_MULTIPLIER = {"": 1.0, "k": 1e3, "m": 1e6, "g": 1e9}


@dataclass
class CenterFrequencyResult:
    value: float | None
    source: str = "unavailable"


def detect_center_frequency(path: Path) -> CenterFrequencyResult:
    """Detect center frequency (Hz) via metadata first, then filename."""
    metadata = _from_metadata(path)
    if metadata is not None:
        return metadata
    filename = _from_filename(path)
    if filename is not None:
        return filename
    return CenterFrequencyResult(value=None, source="unavailable")


def parse_center_frequency(path: Path) -> float | None:
    """Backwards-compatible shim returning only the detected value."""
    return detect_center_frequency(path).value


def _file_tags(path: Path) -> dict[str, str]:
    from ..io.riff import WavFormatError, parse_wav_header

    try:
        info = parse_wav_header(path)
    except (WavFormatError, OSError):
        return {}
    tags = {k.lower(): v for k, v in info.tags.items()}
    # SDR software often packs "key=value" pairs inside a comment/title tag
    # (libsndfile surfaces those lines too — reference utils.py:203-223)
    for value in list(tags.values()):
        for piece in value.replace(";", "\n").splitlines():
            if "=" in piece:
                key, sub = piece.split("=", 1)
                tags.setdefault(key.strip().lower(), sub.strip())
    return tags


def _from_metadata(path: Path) -> CenterFrequencyResult | None:
    tags = _file_tags(path)
    for key in _METADATA_KEYS:
        if key in tags:
            freq = _parse_frequency_text(tags[key])
            if freq:
                return CenterFrequencyResult(freq, f"metadata:{key}")
    for key, raw in tags.items():
        if key in _METADATA_KEYS:
            continue
        lowered = key.lower()
        if "freq" not in lowered and "hz" not in lowered:
            continue
        freq = _parse_frequency_text(raw)
        if freq:
            return CenterFrequencyResult(freq, f"metadata:{key}")
    return None


def _from_filename(path: Path) -> CenterFrequencyResult | None:
    name = path.name
    matches = []
    for match in _FILENAME_FREQ_PATTERN.finditer(name):
        value = _apply_unit(match.group(1), match.group(2))
        if value and value >= 1_000.0:
            matches.append((value, match.start()))
    if not matches:
        return None
    matches.sort(key=lambda item: item[0], reverse=True)
    value, _ = matches[0]

    stem = path.stem.lower()
    if stem.startswith("baseband_"):
        source = "filename:sdrpp"
    elif re.match(r"\d{2}-\d{2}-\d{2}_", stem):
        source = "filename:sdrsharp"
    else:
        source = "filename"
    return CenterFrequencyResult(value, source)


def _parse_frequency_text(text: str | None) -> float | None:
    if text is None:
        return None
    stripped = text.strip()
    if not stripped:
        return None
    cleaned = stripped.replace(",", "").replace("_", "")
    try:
        value = float(cleaned)
        if value > 0:
            return value
    except ValueError:
        pass
    match = _FREQ_PATTERN.search(cleaned)
    if not match:
        return None
    magnitude = float(match.group("value"))
    unit = match.group("unit").strip().lower()
    value = magnitude * _UNIT_MULTIPLIER.get(unit, 1.0)
    return value if value > 0 else None


def _apply_unit(raw_value: str, unit: str) -> float | None:
    try:
        magnitude = float(raw_value)
    except ValueError:
        return None
    value = magnitude * _UNIT_MULTIPLIER.get(unit.lower(), 1.0)
    return value if value > 0 else None
