"""Input format detection and override parsing (reference
tests/test_input_formats.py analogue)."""

from __future__ import annotations

import numpy as np
import pytest

from iq_to_audio_tpu.io.formats import (
    deduce_container,
    detect_input_format,
    get_format,
    list_supported_formats,
    parse_user_format,
    resolve_input_format,
)
from iq_to_audio_tpu.io.writer import write_stereo_wav


class TestParseUserFormat:
    @pytest.mark.parametrize(
        "value,expected",
        [
            ("wav-s16", ("wav", "pcm_s16le")),
            ("wav:u8", ("wav", "pcm_u8")),
            ("wav-f32", ("wav", "pcm_f32le")),
            ("raw-cu8", ("raw", "pcm_u8")),
            ("raw:cs16", ("raw", "pcm_s16le")),
            ("raw-cf32", ("raw", "pcm_f32le")),
            ("cu8", ("raw", "pcm_u8")),
            ("cs16", ("raw", "pcm_s16le")),
            ("cf32", ("raw", "pcm_f32le")),
            ("f32", ("wav", "pcm_f32le")),
            ("s16", ("wav", "pcm_s16le")),
            ("pcm16", ("wav", "pcm_s16le")),
            ("FLOAT32", ("wav", "pcm_f32le")),
        ],
    )
    def test_valid(self, value, expected):
        assert parse_user_format(value) == expected

    @pytest.mark.parametrize("value", ["", "auto", "wav-s24", "ogg-s16", "raw:s24"])
    def test_invalid(self, value):
        with pytest.raises(ValueError):
            parse_user_format(value)

    def test_default_container(self):
        assert parse_user_format("s16", default_container="raw") == ("raw", "pcm_s16le")


class TestDetection:
    @pytest.mark.parametrize(
        "suffix,codec",
        [(".cu8", "pcm_u8"), (".cs16", "pcm_s16le"), (".cf32", "pcm_f32le"), (".iq", "pcm_s16le")],
    )
    def test_raw_extension(self, tmp_path, suffix, codec):
        path = tmp_path / f"capture{suffix}"
        path.write_bytes(bytes(64))
        det = detect_input_format(path)
        assert det.ok
        assert det.spec.container == "raw"
        assert det.spec.codec == codec
        assert det.spec.requires_sample_rate

    def test_bare_raw_needs_manual(self, tmp_path):
        path = tmp_path / "capture.raw"
        path.write_bytes(bytes(64))
        det = detect_input_format(path)
        assert not det.ok
        assert "manual" in det.error

    @pytest.mark.parametrize("codec", ["pcm_u8", "pcm_s16le", "pcm_f32le"])
    def test_wav_header_detection(self, tmp_path, codec):
        path = tmp_path / "cap.wav"
        write_stereo_wav(path, np.zeros((16, 2), np.float32), 96_000, codec=codec)
        det = detect_input_format(path)
        assert det.ok
        assert det.spec.codec == codec
        assert det.spec.container == "wav"

    def test_unsupported_suffix(self, tmp_path):
        path = tmp_path / "x.mp3"
        path.write_bytes(bytes(16))
        det = detect_input_format(path)
        assert not det.ok

    def test_s32_wav_rejected(self, tmp_path):
        import struct

        path = tmp_path / "cap32.wav"
        # hand-build a 32-bit PCM WAV header
        data = bytes(64)
        hdr = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        hdr += b"fmt " + struct.pack("<IHHIIHH", 16, 1, 2, 96_000, 96_000 * 8, 8, 32)
        hdr += b"data" + struct.pack("<I", len(data))
        path.write_bytes(hdr + data)
        det = detect_input_format(path)
        assert not det.ok
        assert "not supported" in det.error or "Export" in det.error


class TestResolve:
    def test_manual_override_wins(self, tmp_path):
        path = tmp_path / "cap.wav"
        write_stereo_wav(path, np.zeros((16, 2), np.float32), 96_000, codec="pcm_s16le")
        spec, source = resolve_input_format(path, requested="wav-f32")
        assert spec.codec == "pcm_f32le"
        assert source == "manual"

    def test_auto_detects(self, tmp_path):
        path = tmp_path / "cap.wav"
        write_stereo_wav(path, np.zeros((16, 2), np.float32), 96_000, codec="pcm_u8")
        spec, source = resolve_input_format(path, requested=None)
        assert spec.codec == "pcm_u8"
        assert source.startswith("wav")

    def test_deduce_container(self):
        from pathlib import Path

        assert deduce_container(Path("a.wav")) == "wav"
        assert deduce_container(Path("a.rf64")) == "wav"
        assert deduce_container(Path("a.cs16")) == "raw"
        assert deduce_container(Path("a.bin")) == "wav"

    def test_registry_complete(self):
        specs = list(list_supported_formats())
        assert len(specs) == 6
        assert get_format("raw", "pcm_u8").bytes_per_frame == 2
        assert get_format("wav", "pcm_f32le").bytes_per_frame == 8
