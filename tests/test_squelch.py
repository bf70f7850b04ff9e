"""Squelch / audio post (reference tests/test_squelch.py analogue)."""

from __future__ import annotations

import numpy as np
import pytest

from iq_to_audio_tpu.io.riff import WavStreamWriter
from iq_to_audio_tpu.io.writer import read_wav
from iq_to_audio_tpu.post.squelch import (
    AudioPostOptions,
    SquelchConfig,
    apply_squelch,
    gather_audio_targets,
    process_audio_batch,
)


def make_burst_audio(sample_rate=16_000, seconds=2.0, seed=3):
    """Quiet noise with a loud tone burst in the middle."""
    n = int(sample_rate * seconds)
    rng = np.random.default_rng(seed)
    audio = rng.normal(scale=0.003, size=n).astype(np.float32)
    t0, t1 = int(n * 0.4), int(n * 0.6)
    t = np.arange(t1 - t0) / sample_rate
    audio[t0:t1] += (0.5 * np.sin(2 * np.pi * 800 * t)).astype(np.float32)
    return audio


class TestApplySquelch:
    def test_adaptive_estimates_floor(self):
        audio = make_burst_audio()
        cleaned, floor_db, threshold_db = apply_squelch(
            audio, 16_000.0, SquelchConfig(method="adaptive")
        )
        assert -70.0 < floor_db < -30.0
        assert threshold_db == pytest.approx(floor_db + 6.0)
        # trimmed output keeps the burst but drops most silence
        assert 0 < cleaned.shape[0] < audio.size

    def test_static_mask_zeroes_silence(self):
        audio = make_burst_audio()
        cfg = SquelchConfig(method="static", trim_silence=False)
        cleaned, floor_db, thr = apply_squelch(audio, 16_000.0, cfg)
        assert cleaned.shape[0] == audio.size
        # energy outside the burst should be mostly removed
        head = cleaned[: int(0.2 * 16_000)]
        assert np.abs(head).max() < 0.01

    def test_transient_active_ratio(self):
        audio = make_burst_audio()
        cfg = SquelchConfig(method="transient", trim_silence=False)
        cleaned, *_ = apply_squelch(audio, 16_000.0, cfg)
        active = np.mean(np.abs(cleaned[:, 0]) > 1e-5)
        assert active < 0.6

    def test_manual_floor(self):
        audio = make_burst_audio()
        cfg = SquelchConfig(method="static", auto_noise_floor=False, manual_noise_floor_db=-40.0)
        _, floor_db, thr = apply_squelch(audio, 16_000.0, cfg)
        assert floor_db == -40.0
        assert thr == -34.0

    def test_all_silence_trims_to_empty(self):
        audio = np.full(16_000, 1e-6, dtype=np.float32)
        cfg = SquelchConfig(method="static", auto_noise_floor=False, manual_noise_floor_db=-30.0)
        cleaned, *_ = apply_squelch(audio, 16_000.0, cfg)
        assert cleaned.shape[0] == 0


class TestBatch:
    def test_batch_roundtrip(self, tmp_path):
        paths = []
        for k in range(3):
            p = tmp_path / f"rec{k}.wav"
            with WavStreamWriter(p, 16_000, 1, "pcm_s16le") as w:
                w.write_float(make_burst_audio(seed=k))
            paths.append(p)
        (tmp_path / "ignore.txt").write_text("x")
        options = AudioPostOptions(config=SquelchConfig())
        targets = gather_audio_targets(tmp_path, options)
        assert targets == sorted(paths)
        calls = []
        summary = process_audio_batch(
            targets, options, progress_cb=lambda done, total, p: calls.append((done, total))
        )
        assert summary.processed == 3
        assert summary.failed == 0
        for res in summary.results:
            assert res.output_path.name.endswith("-cleaned.wav")
            out, rate = read_wav(res.output_path)
            assert rate == 16_000
            assert res.retained_ratio <= 1.0
            assert res.samples_out == out.shape[0]
        assert summary.aggregate_duration_delta() < 0  # trimming shortens
        assert calls[0] == (0, 3) and calls[-1] == (3, 3)

    def test_overwrite_mode(self, tmp_path):
        p = tmp_path / "rec.wav"
        with WavStreamWriter(p, 16_000, 1, "pcm_s16le") as w:
            w.write_float(make_burst_audio())
        options = AudioPostOptions(config=SquelchConfig(), overwrite=True)
        summary = process_audio_batch([p], options)
        assert summary.results[0].output_path == p

    def test_overwrite_reports_true_input_size(self, tmp_path):
        """bytes_in must be captured BEFORE overwrite mode rewrites the
        file, or every size delta reports zero."""
        p = tmp_path / "rec.wav"
        with WavStreamWriter(p, 16_000, 1, "pcm_s16le") as w:
            w.write_float(make_burst_audio())
        size_before = p.stat().st_size
        options = AudioPostOptions(config=SquelchConfig(), overwrite=True)
        summary = process_audio_batch([p], options)
        r = summary.results[0]
        assert r.bytes_in == size_before
        assert r.bytes_out == p.stat().st_size
        assert r.bytes_out < r.bytes_in  # trimming removed silence

    def test_short_clip_does_not_crash(self, tmp_path):
        """Clips shorter than the envelope smoothing window (40 ms default)
        must process, not die on a gain/frames broadcast error."""
        from iq_to_audio_tpu.post.squelch import apply_squelch

        clip = np.full(1000, 0.5, np.float32)  # ~21 ms at 48 kHz
        cleaned, floor_db, thr_db = apply_squelch(clip, 48_000.0, SquelchConfig())
        assert cleaned.shape[0] <= clip.shape[0]
        assert np.isfinite(floor_db) and np.isfinite(thr_db)

    def test_missing_path_raises(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            gather_audio_targets(tmp_path / "nope", AudioPostOptions(config=SquelchConfig()))

    def test_non_wav_skip_is_loud(self, tmp_path, caplog, monkeypatch):
        """A flac in the batch without the optional soundfile dependency is
        skipped with a WARNING naming the missing package — never silently
        (VERDICT round-2 item 5; reference reads it via libsndfile,
        squelch.py:272-289)."""
        import logging as _logging

        import iq_to_audio_tpu.post.squelch as sq

        monkeypatch.setattr(sq, "_soundfile", lambda: None)
        p = tmp_path / "rec.wav"
        with WavStreamWriter(p, 16_000, 1, "pcm_s16le") as w:
            w.write_float(make_burst_audio())
        (tmp_path / "rec.flac").write_bytes(b"fLaC junk")
        with caplog.at_level(_logging.WARNING, logger="iq_to_audio_tpu.post.squelch"):
            targets = gather_audio_targets(tmp_path, AudioPostOptions(config=SquelchConfig()))
        assert targets == [p]
        assert any(
            "soundfile" in r.getMessage() and "rec.flac" in r.getMessage()
            for r in caplog.records
        )

    def test_flac_batch_roundtrip(self, tmp_path):
        """With soundfile installed, non-WAV formats flow through the batch
        end-to-end (reference parity: anything libsndfile reads)."""
        sf = pytest.importorskip("soundfile")
        import iq_to_audio_tpu.post.squelch as sq

        p = tmp_path / "rec.flac"
        sf.write(str(p), make_burst_audio(), 16_000)
        assert ".flac" in sq.supported_suffixes()
        options = AudioPostOptions(config=SquelchConfig())
        targets = gather_audio_targets(tmp_path, options)
        assert targets == [p]
        summary = process_audio_batch(targets, options)
        assert summary.failed == 0
        out = summary.results[0].output_path
        assert out.suffix == ".flac" and out.exists()
        frames, rate = sf.read(str(out), always_2d=True)
        assert rate == 16_000
        assert frames.shape[0] == summary.results[0].samples_out


class TestBatchRerunHygiene:
    def test_directory_rerun_skips_cleaned_outputs(self, tmp_path, caplog):
        import logging

        p = tmp_path / "rec.wav"
        with WavStreamWriter(p, 16_000, 1, "pcm_s16le") as w:
            w.write_float(make_burst_audio())
        options = AudioPostOptions(config=SquelchConfig())
        summary = process_audio_batch(gather_audio_targets(tmp_path, options), options)
        assert summary.processed == 1
        # second directory pass must not reprocess rec-cleaned.wav
        with caplog.at_level(logging.INFO):
            targets2 = gather_audio_targets(tmp_path, options)
        assert targets2 == [p]
        assert any("output suffix" in r.message for r in caplog.records)
        # but an explicitly-passed cleaned file is honoured verbatim
        cleaned = tmp_path / "rec-cleaned.wav"
        assert gather_audio_targets(cleaned, options) == [cleaned]

    def test_empty_audio_does_not_crash(self):
        cleaned, floor_db, thr_db = apply_squelch(
            np.zeros(0, np.float32), 16_000.0, SquelchConfig()
        )
        assert cleaned.shape[0] == 0
        assert floor_db <= -120.0

    def test_high_depth_wav_written_as_f32(self, tmp_path, caplog):
        import logging
        import struct

        # hand-roll a pcm_s32le WAV (the streaming writer can't produce one)
        frames = (np.linspace(-0.4, 0.4, 400) * 2**31).astype("<i4")
        fmt = struct.pack("<HHIIHH", 1, 1, 16_000, 16_000 * 4, 4, 32)
        body = (
            b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", frames.nbytes) + frames.tobytes()
        )
        p = tmp_path / "deep.wav"
        p.write_bytes(b"RIFF" + struct.pack("<I", len(body)) + body)
        options = AudioPostOptions(config=SquelchConfig(trim_silence=False))
        with caplog.at_level(logging.WARNING):
            summary = process_audio_batch([p], options)
        assert summary.failed == 0
        assert any("pcm_f32le" in r.message for r in caplog.records)
        from iq_to_audio_tpu.io.riff import parse_wav_header

        out = p.with_name("deep-cleaned.wav")
        assert parse_wav_header(out).codec == "pcm_f32le"
