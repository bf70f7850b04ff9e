"""Center-frequency detection (reference tests/test_utils.py analogue)."""

from __future__ import annotations

import struct
from pathlib import Path

import numpy as np
import pytest

from iq_to_audio_tpu.io.writer import write_stereo_wav
from iq_to_audio_tpu.utils.freq import detect_center_frequency, parse_center_frequency


class TestFilenameDetection:
    @pytest.mark.parametrize(
        "name,expected,source",
        [
            ("baseband_145500000Hz_2024.wav", 145_500_000.0, "filename:sdrpp"),
            ("baseband_868300000Hz.wav", 868_300_000.0, "filename:sdrpp"),
            ("12-34-56_145500kHz.wav", 145_500_000.0, "filename:sdrsharp"),
            ("capture_446.00625MHz.wav", 446_006_250.0, "filename"),
            ("rec_1.2GHz.wav", 1_200_000_000.0, "filename"),
            ("tone_455KHZ.wav", 455_000.0, "filename"),
        ],
    )
    def test_patterns(self, tmp_path, name, expected, source):
        path = tmp_path / name
        result = detect_center_frequency(path)
        assert result.value == pytest.approx(expected)
        assert result.source == source

    def test_largest_candidate_wins(self, tmp_path):
        # multiple frequency candidates: picks the largest (utils.py:194-199)
        path = tmp_path / "baseband_145500000Hz_12kHz.wav"
        result = detect_center_frequency(path)
        assert result.value == pytest.approx(145_500_000.0)

    def test_below_1khz_ignored(self, tmp_path):
        assert parse_center_frequency(tmp_path / "capture_500Hz.wav") is None

    def test_no_match(self, tmp_path):
        assert parse_center_frequency(tmp_path / "capture.wav") is None


class TestMetadataDetection:
    def _write_with_tag(self, path: Path, key_value: bytes):
        write_stereo_wav(path, np.zeros((8, 2), np.float32), 96_000)
        pad = b"\0" if len(key_value) % 2 else b""
        info = b"ICMT" + struct.pack("<I", len(key_value)) + key_value + pad
        with path.open("ab") as f:
            f.write(b"LIST" + struct.pack("<I", 4 + len(info)) + b"INFO" + info)

    def test_metadata_preferred_over_filename(self, tmp_path):
        path = tmp_path / "baseband_100000000Hz.wav"
        self._write_with_tag(path, b"center_frequency=145500000")
        result = detect_center_frequency(path)
        assert result.value == pytest.approx(145_500_000.0)
        assert result.source == "metadata:center_frequency"

    def test_unit_suffix_in_metadata(self, tmp_path):
        path = tmp_path / "plain.wav"
        self._write_with_tag(path, b"tuner_frequency=145.5MHz")
        result = detect_center_frequency(path)
        assert result.value == pytest.approx(145_500_000.0)
        assert result.source == "metadata:tuner_frequency"

    def test_colon_separated_packed_tag(self, tmp_path):
        # SDR recorders also pack "key: value" lines into comment tags
        # (reference utils.py:216-218 splits on ':' as well as '=')
        path = tmp_path / "plain.wav"
        self._write_with_tag(path, b"recorder: acme\ncenter_frequency: 433920000")
        result = detect_center_frequency(path)
        assert result.value == pytest.approx(433_920_000.0)
        assert result.source == "metadata:center_frequency"

    def test_semicolon_packed_and_comment_lines(self, tmp_path):
        # ';' acts as a line separator for packed tags; a line reduced to a
        # bare comment must not poison parsing of the rest
        path = tmp_path / "plain.wav"
        self._write_with_tag(path, b"gain=21.5;frequency=96500000")
        result = detect_center_frequency(path)
        assert result.value == pytest.approx(96_500_000.0)
        assert result.source == "metadata:frequency"

    def test_comment_line_cannot_shadow_real_tag(self, tmp_path):
        # a ';'-opened COMMENT line must be ignored entirely, even when its
        # content looks like a key=value pair (the reference skips such
        # lines outright, utils.py:213-214)
        path = tmp_path / "plain.wav"
        self._write_with_tag(path, b"; frequency=off\nfrequency=96500000")
        result = detect_center_frequency(path)
        assert result.value == pytest.approx(96_500_000.0)
        assert result.source == "metadata:frequency"

    def test_grouped_digits_parse_whole_number(self, tmp_path):
        # space-grouped digits must not truncate to the leading group
        # (a 145 Hz "center" would outrank the correct filename candidate)
        path = tmp_path / "baseband_145500000Hz.wav"
        self._write_with_tag(path, b"frequency=145 500 000")
        result = detect_center_frequency(path)
        assert result.value == pytest.approx(145_500_000.0)

    def test_dot_grouped_digits_rejected_not_truncated(self, tmp_path):
        # ambiguous dot-grouping can't be trusted: reject the tag so the
        # filename candidate (the correct value) wins
        path = tmp_path / "baseband_145500000Hz.wav"
        self._write_with_tag(path, b"frequency=145.500.000")
        result = detect_center_frequency(path)
        assert result.value == pytest.approx(145_500_000.0)
        assert result.source.startswith("filename")

    def test_trailing_words_after_frequency_ok(self, tmp_path):
        path = tmp_path / "plain.wav"
        self._write_with_tag(path, b"frequency=145.5 MHz USB dial")
        result = detect_center_frequency(path)
        assert result.value == pytest.approx(145_500_000.0)

    @pytest.mark.parametrize(
        "tag,expected",
        [
            # search() semantics (reference utils.py:280): leading tokens
            # and trailing annotations must not drop the tag
            (b"frequency=RX 145.5 MHz", 145_500_000.0),
            (b"frequency=~145.5MHz", 145_500_000.0),
            (b"frequency=145.5 MHz ch 2", 145_500_000.0),
            (b"frequency=96.5M 2024-01-01", 96_500_000.0),
            (b"frequency=145 kHz backup 7", 145_000.0),
        ],
    )
    def test_decorated_tag_values_parse(self, tmp_path, tag, expected):
        path = tmp_path / "plain.wav"
        self._write_with_tag(path, tag)
        result = detect_center_frequency(path)
        assert result.value == pytest.approx(expected)
        assert result.source == "metadata:frequency"

    def test_hz_unit_terminates_number(self, tmp_path):
        # an explicit Hz ends the number even when digit-leading text
        # follows (the grouped-digit reparse must not reject it)
        path = tmp_path / "plain.wav"
        self._write_with_tag(path, b"frequency=145500000 Hz 2024-01-01")
        result = detect_center_frequency(path)
        assert result.value == pytest.approx(145_500_000.0)
