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


class TestStreamingSquelch:
    """Bounded-memory streaming engine vs the whole-file path: outputs must
    be BYTE-IDENTICAL (VERDICT round-4 item 7; the reference loads whole
    files, squelch.py:272-279)."""

    import itertools

    _run_ids = itertools.count()

    @staticmethod
    def _write_wav(path, frames, rate=16_000, codec="pcm_s16le"):
        frames = np.atleast_2d(np.asarray(frames, np.float32).T).T
        with WavStreamWriter(path, rate, frames.shape[1], codec) as w:
            w.write_float(frames)

    def _run_both(self, tmp_path, monkeypatch, audio, cfg, *, rate=16_000,
                  codec="pcm_s16le", env_block=2048):
        import iq_to_audio_tpu.post.squelch as sq

        # a small canonical grid exercises many block boundaries in BOTH
        # paths (the in-memory _box_mean shares the grid, so outputs stay
        # bit-identical by construction)
        monkeypatch.setattr(sq, "_ENV_BLOCK", env_block)
        run_id = next(self._run_ids)
        src = tmp_path / f"src{run_id}.wav"
        self._write_wav(src, audio, rate=rate, codec=codec)
        results = {}
        for tag, threshold in (("mem", 10**15), ("stream", 1)):
            d = tmp_path / f"{tag}{run_id}"
            d.mkdir()
            p = d / "rec.wav"
            p.write_bytes(src.read_bytes())
            opts = AudioPostOptions(
                config=cfg, stream_threshold_bytes=threshold
            )
            results[tag] = sq.process_audio_file(p, opts)
        mem, stream = results["mem"], results["stream"]
        assert mem.output_path.read_bytes() == stream.output_path.read_bytes()
        assert mem.samples_in == stream.samples_in
        assert mem.samples_out == stream.samples_out
        assert mem.noise_floor_db == stream.noise_floor_db
        assert mem.threshold_db == stream.threshold_db
        assert mem.bytes_out == stream.bytes_out
        return mem, stream

    @pytest.mark.parametrize("method", ["static", "adaptive", "transient"])
    @pytest.mark.parametrize("trim", [True, False])
    def test_stream_matches_inmemory(self, tmp_path, monkeypatch, method, trim):
        audio = make_burst_audio(seconds=2.0)
        cfg = SquelchConfig(method=method, trim_silence=trim)
        mem, stream = self._run_both(tmp_path, monkeypatch, audio, cfg)
        if method != "transient":  # a steady tone is not a transient
            assert stream.samples_out > 0

    def test_stream_matches_inmemory_stereo_f32(self, tmp_path, monkeypatch):
        mono = make_burst_audio(seconds=1.5)
        audio = np.stack([mono, np.roll(mono, 500)], axis=1)
        cfg = SquelchConfig(method="adaptive")
        self._run_both(tmp_path, monkeypatch, audio, cfg, codec="pcm_f32le")

    def test_stream_matches_inmemory_all_quiet_adaptive(self, tmp_path, monkeypatch):
        """Adaptive early-return parity: no sample clears the coarse
        threshold -> empty output when trimming, full zeros otherwise."""
        quiet = np.full(20_000, 1e-6, np.float32)
        cfg = SquelchConfig(
            method="adaptive", auto_noise_floor=False, manual_noise_floor_db=-30.0
        )
        mem, stream = self._run_both(tmp_path, monkeypatch, quiet, cfg)
        assert stream.samples_out == 0
        cfg2 = SquelchConfig(
            method="adaptive", auto_noise_floor=False,
            manual_noise_floor_db=-30.0, trim_silence=False,
        )
        mem2, stream2 = self._run_both(tmp_path, monkeypatch, quiet, cfg2)
        assert stream2.samples_out == stream2.samples_in

    def test_stream_overwrite_mode(self, tmp_path, monkeypatch):
        import iq_to_audio_tpu.post.squelch as sq

        monkeypatch.setattr(sq, "_ENV_BLOCK", 2048)
        audio = make_burst_audio(seconds=1.0)
        p = tmp_path / "rec.wav"
        self._write_wav(p, audio)
        ref = tmp_path / "ref.wav"
        ref.write_bytes(p.read_bytes())
        mem = sq.process_audio_file(
            ref, AudioPostOptions(config=SquelchConfig(), overwrite=True,
                                  stream_threshold_bytes=10**15)
        )
        stream = sq.process_audio_file(
            p, AudioPostOptions(config=SquelchConfig(), overwrite=True,
                                stream_threshold_bytes=1)
        )
        assert stream.output_path == p
        assert p.read_bytes() == ref.read_bytes()
        assert not list(tmp_path.glob("*tmp*"))  # temp file cleaned up

    def test_stream_gate_env_var(self, tmp_path, monkeypatch):
        """IQ2A_POST_BLOCK_BYTES routes large WAVs to the streaming engine
        when no explicit threshold is configured."""
        import iq_to_audio_tpu.post.squelch as sq

        called = []
        orig = sq._process_wav_streaming

        def spy(path, options, bytes_in):
            called.append(path)
            return orig(path, options, bytes_in)

        monkeypatch.setattr(sq, "_process_wav_streaming", spy)
        monkeypatch.setenv("IQ2A_POST_BLOCK_BYTES", "100")
        p = tmp_path / "rec.wav"
        self._write_wav(p, make_burst_audio(seconds=0.5))
        sq.process_audio_file(p, AudioPostOptions(config=SquelchConfig()))
        assert called == [p]
        # default 256 MiB threshold: small files stay on the in-memory path
        called.clear()
        monkeypatch.delenv("IQ2A_POST_BLOCK_BYTES")
        p2 = tmp_path / "rec2.wav"
        self._write_wav(p2, make_burst_audio(seconds=0.5))
        sq.process_audio_file(p2, AudioPostOptions(config=SquelchConfig()))
        assert called == []

    def test_stream_percentile_matches_numpy(self):
        """The streaming order-stat selector must replicate np.percentile's
        float32 'linear' path bit-for-bit (it feeds resolve_noise_floor and
        the adaptive rel-lift normalisation)."""
        from iq_to_audio_tpu.post.squelch import _stream_percentile_f32

        qs = [0.0, 5.0, 20.0, 50.0, 95.0, 100.0]
        for seed in range(20):
            rng = np.random.default_rng(seed)
            n = int(rng.integers(1, 30_000))
            x = rng.uniform(-160.0, 60.0, size=n).astype(np.float32)
            if seed % 3 == 0:
                x[: n // 2] = np.float32(-160.0)  # floor-clamp tie block
            blocks = max(1, n // 777)
            got = _stream_percentile_f32(
                lambda: iter(np.array_split(x, blocks)), n, qs, -200.0, 800.0
            )
            for q in qs:
                ref = np.float32(np.percentile(x, q))
                assert got[q].view(np.uint32) == ref.view(np.uint32), (seed, n, q)
