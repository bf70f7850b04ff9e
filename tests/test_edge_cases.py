"""Robustness edge cases: malformed inputs, extreme geometries."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from conftest import make_nfm_iq, make_tone_iq

from iq_to_audio_tpu import ProcessingConfig, ProcessingPipeline
from iq_to_audio_tpu.io.riff import WavFormatError, parse_wav_header
from iq_to_audio_tpu.io.writer import read_wav, write_stereo_wav

FS = 250_000.0
CENTER = 145_000_000.0


def _capture(tmp_path, iq, name=f"baseband_{int(CENTER)}Hz_e.wav"):
    path = tmp_path / name
    write_stereo_wav(path, np.column_stack([iq.real, iq.imag]), int(FS))
    return path


class TestMalformedInputs:
    def test_empty_file(self, tmp_path):
        path = tmp_path / "empty.wav"
        path.write_bytes(b"")
        with pytest.raises((WavFormatError, ValueError)):
            parse_wav_header(path)

    def test_truncated_header(self, tmp_path):
        path = tmp_path / "trunc.wav"
        path.write_bytes(b"RIFF\x00\x00\x00\x00WAV")
        with pytest.raises((WavFormatError, ValueError)):
            parse_wav_header(path)

    def test_zero_length_data_pipeline_errors_cleanly(self, tmp_path):
        path = tmp_path / f"baseband_{int(CENTER)}Hz_z.wav"
        write_stereo_wav(path, np.zeros((0, 2), np.float32), int(FS))
        cfg = ProcessingConfig(
            in_path=path, target_freq=CENTER + 25_000.0, output_path=tmp_path / "o.wav"
        )
        with pytest.raises(RuntimeError, match="no samples"):
            ProcessingPipeline(cfg).run()

    def test_garbage_bytes_after_data(self, tmp_path):
        iq = make_tone_iq(FS, 0.05, 1000.0)
        path = _capture(tmp_path, iq)
        # append a trailing junk chunk; data size field is still correct
        with path.open("ab") as f:
            f.write(b"JUNK" + struct.pack("<I", 8) + b"ABCDEFGH")
        info = parse_wav_header(path)
        assert info.num_frames == iq.size  # declared size honoured

    def test_odd_payload_truncated_to_frames(self, tmp_path):
        iq = make_tone_iq(FS, 0.02, 1000.0)
        path = _capture(tmp_path, iq)
        with path.open("ab") as f:
            f.write(b"\x01\x02\x03")  # 3 stray bytes, not a full frame
        from iq_to_audio_tpu.io.formats import get_format
        from iq_to_audio_tpu.io.reader import IQReader

        with IQReader(path, 4096, "iq", get_format("wav", "pcm_s16le")) as r:
            got = np.concatenate(list(r))
        assert got.size == iq.size


class TestExtremeGeometries:
    def test_bandwidth_wider_than_channel_rate(self, tmp_path):
        """Cutoff clamps to 0.9*fs/(2*decim) like the reference."""
        iq = make_nfm_iq(FS, 0.3, 25_000.0)
        path = _capture(tmp_path, iq)
        out = tmp_path / "wide.wav"
        cfg = ProcessingConfig(
            in_path=path,
            target_freq=CENTER + 25_000.0,
            bandwidth=500_000.0,  # wider than fs_channel
            output_path=out,
        )
        result = ProcessingPipeline(cfg).run()
        assert result.audio_peak > 0
        assert read_wav(out)[0].shape[0] > 1000

    def test_target_at_capture_edge(self, tmp_path):
        iq = make_tone_iq(FS, 0.3, FS * 0.45)
        path = _capture(tmp_path, iq)
        out = tmp_path / "edge.wav"
        cfg = ProcessingConfig(
            in_path=path,
            target_freq=CENTER + FS * 0.45,
            output_path=out,
            mix_sign_override=1,
        )
        result = ProcessingPipeline(cfg).run()
        assert result.freq_offset == pytest.approx(FS * 0.45)

    def test_tiny_capture_smaller_than_one_chunk(self, tmp_path):
        iq = make_nfm_iq(FS, 0.02, 25_000.0)  # 5000 samples
        path = _capture(tmp_path, iq)
        out = tmp_path / "tiny.wav"
        cfg = ProcessingConfig(
            in_path=path, target_freq=CENTER + 25_000.0, output_path=out
        )
        ProcessingPipeline(cfg).run()
        audio, rate = read_wav(out)
        assert rate == 48_000
        expected = 0.02 * 48_000
        assert abs(audio.shape[0] - expected) <= 400

    def test_fs_ch_equal_to_input_rate(self, tmp_path):
        """decimation == 1 (no rate change before demod)."""
        fs = 96_000.0
        iq = make_nfm_iq(fs, 0.3, 10_000.0)
        path = tmp_path / f"baseband_{int(CENTER)}Hz_d1.wav"
        write_stereo_wav(path, np.column_stack([iq.real, iq.imag]), int(fs))
        out = tmp_path / "d1out.wav"
        cfg = ProcessingConfig(
            in_path=path,
            target_freq=CENTER + 10_000.0,
            fs_ch_target=96_000.0,
            output_path=out,
        )
        result = ProcessingPipeline(cfg).run()
        assert result.decimation == 1
        assert read_wav(out)[1] == 48_000

    def test_identity_resampler(self, tmp_path):
        """fs_channel == 48 kHz: the resampler is a pass-through."""
        fs = 96_000.0
        iq = make_nfm_iq(fs, 0.3, 10_000.0)
        path = tmp_path / f"baseband_{int(CENTER)}Hz_i.wav"
        write_stereo_wav(path, np.column_stack([iq.real, iq.imag]), int(fs))
        out = tmp_path / "iout.wav"
        cfg = ProcessingConfig(
            in_path=path,
            target_freq=CENTER + 10_000.0,
            fs_ch_target=48_000.0,
            output_path=out,
        )
        result = ProcessingPipeline(cfg).run()
        assert result.decimation == 2
        audio, rate = read_wav(out)
        assert rate == 48_000
        assert abs(audio.shape[0] - 0.3 * 48_000) <= 4

    def test_negative_offset_channel(self, tmp_path):
        iq = make_nfm_iq(FS, 0.3, -60_000.0)
        path = _capture(tmp_path, iq)
        out = tmp_path / "neg.wav"
        cfg = ProcessingConfig(
            in_path=path,
            target_freq=CENTER - 60_000.0,
            output_path=out,
            mix_sign_override=1,
        )
        result = ProcessingPipeline(cfg).run()
        assert result.freq_offset == pytest.approx(-60_000.0)
        assert result.audio_peak > 0.01
