"""IO layer: RIFF parser/writer round-trips, reader streaming, raw formats."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from conftest import make_tone_iq

from iq_to_audio_tpu.io.formats import get_format
from iq_to_audio_tpu.io.reader import IQReader, convert_to_complex
from iq_to_audio_tpu.io.riff import WavStreamWriter, parse_wav_header
from iq_to_audio_tpu.io.writer import (
    AudioWriter,
    IQSliceWriter,
    read_wav,
    write_stereo_wav,
)
from iq_to_audio_tpu.io.probe import probe_sample_rate


class TestRiff:
    @pytest.mark.parametrize("codec", ["pcm_u8", "pcm_s16le", "pcm_f32le"])
    def test_write_parse_roundtrip(self, tmp_path, codec):
        path = tmp_path / "x.wav"
        rng = np.random.default_rng(0)
        frames = rng.uniform(-0.5, 0.5, size=(1000, 2)).astype(np.float32)
        write_stereo_wav(path, frames, 48_000, codec=codec)
        info = parse_wav_header(path)
        assert info.sample_rate == 48_000
        assert info.channels == 2
        assert info.codec == codec
        assert info.num_frames == 1000
        data, rate = read_wav(path)
        assert rate == 48_000
        # u8 encodes with 127.5 scale but decodes with 128 (ffmpeg parity):
        # half-step quantisation plus ~0.4% scale skew
        tol = {"pcm_u8": 0.012, "pcm_s16le": 1e-4, "pcm_f32le": 1e-7}[codec]
        np.testing.assert_allclose(data, frames, atol=tol)

    def test_streaming_header_patched_on_close(self, tmp_path):
        path = tmp_path / "s.wav"
        w = WavStreamWriter(path, 48_000, 1, "pcm_s16le")
        w.write_float(np.zeros(100, np.float32))
        w.write_float(np.ones(50, np.float32) * 0.5)
        w.close()
        info = parse_wav_header(path)
        assert info.num_frames == 150
        assert info.declared_data_size == 300

    def test_broken_length_reads_to_eof(self, tmp_path):
        """SDR++-style placeholder data size (ffmpeg -ignore_length parity)."""
        path = tmp_path / "b.wav"
        write_stereo_wav(path, np.zeros((500, 2), np.float32), 96_000)
        raw = bytearray(path.read_bytes())
        # zero out the data chunk size field (offset 40 for canonical layout)
        assert raw[36:40] == b"data"
        raw[40:44] = struct.pack("<I", 0)
        path.write_bytes(bytes(raw))
        info = parse_wav_header(path)
        assert info.num_frames == 500

    def test_oversized_declared_length_clamped(self, tmp_path):
        path = tmp_path / "c.wav"
        write_stereo_wav(path, np.zeros((100, 2), np.float32), 96_000)
        raw = bytearray(path.read_bytes())
        raw[40:44] = struct.pack("<I", 10_000_000)
        path.write_bytes(bytes(raw))
        info = parse_wav_header(path)
        assert info.num_frames == 100

    @pytest.mark.parametrize("magic", [b"RF64", b"BW64"])
    def test_rf64_ds64_size_honoured(self, tmp_path, magic):
        """RF64/BW64: data csize 0xFFFFFFFF defers to the ds64 64-bit size
        (riff.py module doc bullet 'RF64/BW64 64-bit sizes')."""
        path = tmp_path / "r.wav"
        frames = 300
        payload = np.zeros(frames * 2, np.float32).tobytes()
        fmt = struct.pack("<HHIIHH", 3, 2, 96_000, 96_000 * 8, 8, 32)
        # ds64: riffSize(8) dataSize(8) sampleCount(8) tableLength(4)
        ds64 = struct.pack("<QQQI", 0, len(payload), frames, 0)
        body = (
            b"WAVE"
            + b"ds64" + struct.pack("<I", len(ds64)) + ds64
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", 0xFFFFFFFF) + payload
        )
        path.write_bytes(magic + struct.pack("<I", len(body)) + body)
        info = parse_wav_header(path)
        assert info.sample_rate == 96_000
        assert info.codec == "pcm_f32le"
        assert info.num_frames == frames
        # the streaming reader consumes it like any WAV
        spec = get_format("wav", "pcm_f32le")
        with IQReader(path, 128, "iq", spec, sample_rate=96_000.0) as r:
            total = 0
            while (blk := r.read_block()) is not None:
                total += blk.size
        assert total == frames

    def test_rf64_ds64_with_trailing_chunk(self, tmp_path):
        """When data is not the final chunk the ds64 size (not EOF) bounds
        the stream — a trailing LIST must not be read as samples."""
        path = tmp_path / "r2.wav"
        frames = 64
        payload = np.zeros(frames * 2, np.float32).tobytes()
        fmt = struct.pack("<HHIIHH", 3, 2, 96_000, 96_000 * 8, 8, 32)
        ds64 = struct.pack("<QQQI", 0, len(payload), frames, 0)
        comment = b"x" * 32
        info_chunk = b"ICMT" + struct.pack("<I", len(comment)) + comment
        body = (
            b"WAVE"
            + b"ds64" + struct.pack("<I", len(ds64)) + ds64
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", 0xFFFFFFFF) + payload
            + b"LIST" + struct.pack("<I", 4 + len(info_chunk)) + b"INFO" + info_chunk
        )
        path.write_bytes(b"RF64" + struct.pack("<I", len(body)) + body)
        info = parse_wav_header(path)
        assert info.num_frames == frames
        # the scan advanced by the ds64 size (not the 32-bit placeholder),
        # so the trailing INFO tags were found and parsed
        assert info.tags.get("comment") == "x" * 32

    def test_append_preserves_noncanonical_layout(self, tmp_path):
        """Appending to a WAV whose data chunk is NOT at offset 44 (e.g. a
        LIST/INFO chunk first) must patch sizes in place, not rewrite a
        canonical header over the tag chunk."""
        path = tmp_path / "tagged.wav"
        fmt = struct.pack("<HHIIHH", 1, 1, 48_000, 48_000 * 2, 2, 16)
        comment = b"center_frequency=145000000"
        info_chunk = b"ICMT" + struct.pack("<I", len(comment)) + comment
        list_chunk = b"LIST" + struct.pack("<I", 4 + len(info_chunk)) + b"INFO" + info_chunk
        first = np.arange(10, dtype="<i2").tobytes()
        body = (
            b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + list_chunk
            + b"data" + struct.pack("<I", len(first)) + first
        )
        path.write_bytes(b"RIFF" + struct.pack("<I", len(body)) + body)
        before = parse_wav_header(path)
        assert before.data_offset > 44
        w = WavStreamWriter(path, 48_000, 1, "pcm_s16le", append=True)
        w.write_raw(np.arange(10, 16, dtype="<i2").tobytes())
        w.close()
        after = parse_wav_header(path)
        assert after.data_offset == before.data_offset
        assert after.num_frames == 16
        assert after.tags.get("comment") == "center_frequency=145000000"
        payload = path.read_bytes()[after.data_offset :]
        assert np.frombuffer(payload[:32], "<i2").tolist() == list(range(16))

    def test_huge_payload_gets_placeholder_sizes(self, tmp_path):
        """Past the 32-bit RIFF limit the close writes placeholder sizes
        (readers treat the data chunk as running to EOF) instead of
        crashing in struct.pack."""
        path = tmp_path / "huge.wav"
        w = WavStreamWriter(path, 48_000, 1, "pcm_s16le")
        w.write_raw(np.zeros(100, "<i2").tobytes())
        w._data_bytes = 0x1_0000_0001  # simulate >4 GiB written
        w.close()  # must not raise
        info = parse_wav_header(path)
        assert info.declared_data_size == 0xFFFFFFFF
        assert info.num_frames == 100  # effective size: data to EOF

    def test_info_tags_parsed(self, tmp_path):
        path = tmp_path / "t.wav"
        write_stereo_wav(path, np.zeros((10, 2), np.float32), 96_000)
        comment = b"center_frequency=145000000"
        pad = b"\0" if len(comment) % 2 else b""
        info_chunk = b"ICMT" + struct.pack("<I", len(comment)) + comment + pad
        list_chunk = b"LIST" + struct.pack("<I", 4 + len(info_chunk)) + b"INFO" + info_chunk
        with path.open("ab") as f:
            f.write(list_chunk)
        # RIFF size field no longer matters (data not last chunk now needs
        # its true size honoured)
        info = parse_wav_header(path)
        assert info.tags.get("comment") == "center_frequency=145000000"
        assert info.num_frames == 10


class TestReader:
    def test_wav_streaming_chunks(self, tmp_path):
        fs = 96_000
        iq = make_tone_iq(fs, 0.25, 1000.0)
        path = tmp_path / "cap.wav"
        write_stereo_wav(path, np.column_stack([iq.real, iq.imag]), fs)
        spec = get_format("wav", "pcm_s16le")
        with IQReader(path, 4096, "iq", spec) as reader:
            assert reader.total_frames == iq.size
            blocks = list(reader)
        got = np.concatenate(blocks)
        assert got.size == iq.size
        assert np.abs(got - iq).max() < 1e-3  # s16 quantisation

    def test_read_block_raw_idempotent_at_eof(self, tmp_path):
        """With prefetch enabled the EOF sentinel is consumed once; later
        calls must keep returning None instead of blocking forever."""
        fs = 96_000
        iq = make_tone_iq(fs, 0.05, 1000.0)
        path = tmp_path / "eof.wav"
        write_stereo_wav(path, np.column_stack([iq.real, iq.imag]), fs)
        spec = get_format("wav", "pcm_s16le")
        with IQReader(path, 1024, "iq", spec, prefetch_depth=2) as reader:
            while reader.read_block_raw() is not None:
                pass
            assert reader.read_block_raw() is None  # used to hang here
            assert reader.read_block_raw() is None

    @pytest.mark.parametrize(
        "codec,suffix,dtype,encode",
        [
            ("pcm_u8", ".cu8", np.uint8, lambda f: np.round((np.clip(f, -1, 1) + 1) * 127.5)),
            ("pcm_s16le", ".cs16", "<i2", lambda f: np.clip(f, -1, 0.999) * 32767),
            ("pcm_f32le", ".cf32", "<f4", lambda f: f),
        ],
    )
    def test_raw_formats(self, tmp_path, codec, suffix, dtype, encode):
        fs = 48_000.0
        iq = make_tone_iq(fs, 0.1, 500.0, amplitude=0.5)
        inter = np.empty(iq.size * 2, np.float32)
        inter[0::2], inter[1::2] = iq.real, iq.imag
        payload = encode(inter).astype(dtype).tobytes()
        path = tmp_path / f"cap{suffix}"
        path.write_bytes(payload)
        spec = get_format("raw", codec)
        with IQReader(path, 1024, "iq", spec, sample_rate=fs) as reader:
            got = np.concatenate(list(reader))
        assert got.size == iq.size
        # complex error combines both components' u8 quantisation + skew
        tol = {"pcm_u8": 0.015, "pcm_s16le": 1e-3, "pcm_f32le": 1e-7}[codec]
        assert np.abs(got - iq).max() < tol

    def test_raw_requires_sample_rate(self, tmp_path):
        path = tmp_path / "x.cu8"
        path.write_bytes(bytes(100))
        spec = get_format("raw", "pcm_u8")
        with pytest.raises(ValueError, match="sample rate"):
            IQReader(path, 64, "iq", spec).__enter__()

    @pytest.mark.parametrize("order", ["iq", "qi", "iq_inv", "qi_inv"])
    def test_iq_order_conversion(self, order):
        raw = np.arange(8, dtype=np.float32) / 10.0
        got = convert_to_complex(raw, "pcm_f32le", order)
        a, b = raw[0::2], raw[1::2]
        i, q = (a, b) if order.startswith("iq") else (b, a)
        if order.endswith("_inv"):
            q = -q
        np.testing.assert_allclose(got, (i + 1j * q).astype(np.complex64))

    def test_mono_wav_rejected(self, tmp_path):
        path = tmp_path / "mono.wav"
        with WavStreamWriter(path, 48_000, 1, "pcm_s16le") as w:
            w.write_float(np.zeros(64, np.float32))
        spec = get_format("wav", "pcm_s16le")
        with pytest.raises(ValueError, match="stereo"):
            IQReader(path, 64, "iq", spec).__enter__()


class TestWriters:
    def test_audio_writer_peak_and_output(self, tmp_path):
        path = tmp_path / "a.wav"
        w = AudioWriter(path)
        x = np.sin(2 * np.pi * np.arange(4800) * 1000 / 48_000).astype(np.float32) * 0.8
        w.write(x)
        w.close()
        assert abs(w.peak - 0.8) < 1e-3
        data, rate = read_wav(path)
        assert rate == 48_000
        assert data.shape[0] == 4800

    def test_slice_writer_wav_roundtrip(self, tmp_path):
        spec = get_format("wav", "pcm_f32le")
        path = tmp_path / "s.wav"
        w = IQSliceWriter(path, 96_000.0, spec)
        iq = make_tone_iq(96_000.0, 0.01, 100.0)
        w.write(iq)
        w.close()
        data, rate = read_wav(path)
        np.testing.assert_allclose(data[:, 0] + 1j * data[:, 1], iq, atol=1e-6)

    def test_slice_writer_raw_cs16(self, tmp_path):
        spec = get_format("raw", "pcm_s16le")
        path = tmp_path / "s.cs16"
        w = IQSliceWriter(path, 96_000.0, spec)
        iq = make_tone_iq(96_000.0, 0.01, 100.0, amplitude=0.5)
        w.write(iq)
        w.close()
        raw = np.frombuffer(path.read_bytes(), "<i2").astype(np.float32) / 32767.0
        got = raw[0::2] + 1j * raw[1::2]
        assert np.abs(got - iq).max() < 2e-3


class TestProbe:
    def test_probe_prefers_header(self, tmp_path):
        path = tmp_path / "p.wav"
        write_stereo_wav(path, np.zeros((10, 2), np.float32), 2_500_000)
        probe = probe_sample_rate(path)
        assert probe.value == 2_500_000.0
        assert probe.header == 2_500_000.0
        assert probe.wave == 2_500_000.0
        assert probe.override is None
        assert probe.consistent


class TestRiffRobustness:
    """The parser must terminate on arbitrary garbage and fail only with
    WavFormatError (the reader's probe layer catches exactly that plus
    OSError — any other exception type would crash format detection)."""

    @staticmethod
    def _valid_wav_bytes(tmp_path) -> bytes:
        path = tmp_path / "seed.wav"
        frames = np.zeros((64, 2), np.float32)
        write_stereo_wav(path, frames, 48_000)
        return path.read_bytes()

    def test_every_truncation_parses_or_raises(self, tmp_path):
        from iq_to_audio_tpu.io.riff import WavFormatError

        blob = self._valid_wav_bytes(tmp_path)
        target = tmp_path / "t.wav"
        for cut in range(0, len(blob), 7):
            target.write_bytes(blob[:cut])
            try:
                info = parse_wav_header(target)
            except WavFormatError:
                continue
            # a successful parse of a truncated file must stay in-bounds
            assert info.data_offset + info.data_size <= cut

    def test_byte_mutations_never_hang_or_crash(self, tmp_path):
        from iq_to_audio_tpu.io.riff import WavFormatError

        blob = bytearray(self._valid_wav_bytes(tmp_path))
        target = tmp_path / "m.wav"
        rng = np.random.default_rng(7)
        for _ in range(300):
            mutated = bytearray(blob)
            for _ in range(rng.integers(1, 4)):
                mutated[int(rng.integers(0, len(mutated)))] = int(rng.integers(0, 256))
            target.write_bytes(mutated)
            try:
                info = parse_wav_header(target)
            except WavFormatError:
                continue
            assert info.data_offset >= 12
            assert info.data_size >= 0

    def test_zero_size_chunk_chain_terminates(self, tmp_path):
        # a pathological file of back-to-back zero-size chunks must not
        # loop forever and must still fail cleanly (no fmt/data found)
        from iq_to_audio_tpu.io.riff import WavFormatError

        target = tmp_path / "z.wav"
        body = b"".join(struct.pack("<4sI", b"JUNK", 0) for _ in range(500))
        target.write_bytes(b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body)
        with pytest.raises(WavFormatError):
            parse_wav_header(target)

    def test_corrupt_info_subchunk_size(self, tmp_path):
        # an INFO sub-chunk whose declared size runs past the LIST body
        # must clamp, keep whatever decoded, and never raise
        target = tmp_path / "i.wav"
        fmt = struct.pack("<HHIIHH", 1, 2, 48_000, 48_000 * 4, 4, 16)
        info = struct.pack("<4sI", b"ICMT", 0xFFFF) + b"frequency=96500000\0"
        lst = b"INFO" + info
        data = b"\0\0\0\0"
        blob = (
            b"RIFF" + struct.pack("<I", 0) + b"WAVE"
            + struct.pack("<4sI", b"fmt ", len(fmt)) + fmt
            + struct.pack("<4sI", b"LIST", len(lst)) + lst + b"\0" * (len(lst) & 1)
            + struct.pack("<4sI", b"data", len(data)) + data
        )
        target.write_bytes(blob)
        info_parsed = parse_wav_header(target)
        assert info_parsed.sample_rate == 48_000


class TestIoReviewRegressions:
    """Round-3 review fixes (io/utils/analysis pass)."""

    def test_rf64_zero_data_size_placeholder(self, tmp_path):
        # a crashed RF64 writer can leave csize==0: with a ds64 present the
        # true size wins; without one, data runs to EOF — the scan must not
        # walk into the payload either way
        frames = 100
        payload = np.zeros(frames * 2, np.float32).tobytes()
        fmt = struct.pack("<HHIIHH", 3, 2, 96_000, 96_000 * 8, 8, 32)
        ds64 = struct.pack("<QQQI", 0, len(payload), frames, 0)
        with_ds64 = (
            b"WAVE"
            + b"ds64" + struct.pack("<I", len(ds64)) + ds64
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", 0) + payload
        )
        path = tmp_path / "z64.wav"
        path.write_bytes(b"RF64" + struct.pack("<I", len(with_ds64)) + with_ds64)
        info = parse_wav_header(path)
        assert info.num_frames == frames and info.rf64
        without_ds64 = (
            b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", 0) + payload
        )
        path2 = tmp_path / "z64b.wav"
        path2.write_bytes(b"RF64" + struct.pack("<I", len(without_ds64)) + without_ds64)
        info2 = parse_wav_header(path2)
        assert info2.num_frames == frames  # to-EOF semantics

    def test_rf64_append_rejected(self, tmp_path):
        frames = 16
        payload = np.zeros(frames * 2, np.float32).tobytes()
        fmt = struct.pack("<HHIIHH", 3, 2, 48_000, 48_000 * 8, 8, 32)
        ds64 = struct.pack("<QQQI", 0, len(payload), frames, 0)
        body = (
            b"WAVE"
            + b"ds64" + struct.pack("<I", len(ds64)) + ds64
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", 0xFFFFFFFF) + payload
        )
        path = tmp_path / "app64.wav"
        path.write_bytes(b"RF64" + struct.pack("<I", len(body)) + body)
        with pytest.raises(ValueError, match="RF64"):
            WavStreamWriter(path, 48_000, 2, "pcm_f32le", append=True)

    def test_read_wav_drops_truncated_final_frame(self, tmp_path):
        from iq_to_audio_tpu.io.writer import read_wav

        path = tmp_path / "cut.wav"
        frames = np.linspace(-0.5, 0.5, 64, dtype=np.float32).reshape(-1, 2)
        write_stereo_wav(path, frames, 48_000, codec="pcm_s16le")
        blob = path.read_bytes()
        path.write_bytes(blob[:-3])  # cut mid-frame (odd byte count too)
        data, rate = read_wav(path)
        assert rate == 48_000
        assert data.shape == (31, 2)  # partial final frame dropped

    def test_reader_reenter_clean_after_pass(self, tmp_path):
        path = tmp_path / "twice.wav"
        write_stereo_wav(path, np.zeros((500, 2), np.float32), 48_000)
        spec = get_format("wav", "pcm_s16le")
        reader = IQReader(path, 128, "iq", spec, prefetch_depth=2)
        for _ in range(2):  # a second pass must start fresh (EOF/queue reset)
            with reader:
                total = sum(b.size for b in reader)
            assert total == 500
