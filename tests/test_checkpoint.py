"""Checkpoint/resume: an interrupted run resumed from its checkpoint must
produce byte-identical audio to an uninterrupted run (the carried-state
tuple + input offset is the complete resume story, SURVEY §5)."""

from __future__ import annotations

import numpy as np
import pytest

from conftest import make_nfm_iq

from iq_to_audio_tpu import ProcessingCancelled, ProcessingConfig, ProcessingPipeline
from iq_to_audio_tpu.io.writer import read_wav, write_stereo_wav
from iq_to_audio_tpu.pipeline.progress import ProgressSink

FS = 250_000.0
CENTER = 145_000_000.0
TARGET = CENTER + 25_000.0


class _CancelAfter(ProgressSink):
    """Cancel once the ingest phase passes a sample threshold."""

    def __init__(self, threshold):
        self.threshold = threshold
        self._cb = None
        self._seen = 0.0

    def start(self, phases, *, overall_total):
        pass

    def advance(self, phase, delta, *, overall_completed, overall_total):
        if phase.key == "ingest":
            self._seen += delta
            if self._seen >= self.threshold and self._cb:
                self._cb()

    def status(self, message):
        pass

    def close(self):
        pass

    def cancel(self):
        pass

    def set_cancel_callback(self, callback):
        self._cb = callback


@pytest.fixture
def capture(tmp_path):
    iq = make_nfm_iq(FS, 2.0, 25_000.0)
    path = tmp_path / f"baseband_{int(CENTER)}Hz_long.wav"
    write_stereo_wav(path, np.column_stack([iq.real, iq.imag]), int(FS))
    return path


def test_resume_produces_identical_audio(tmp_path, capture):
    # uninterrupted reference run
    ref_out = tmp_path / "ref.wav"
    ProcessingPipeline(
        ProcessingConfig(
            in_path=capture, target_freq=TARGET, output_path=ref_out, chunk_size=32_768
        )
    ).run()
    ref, _ = read_wav(ref_out)

    # interrupted run with frequent checkpoints (cancel mid-stream)
    out = tmp_path / "resumable.wav"
    cfg = dict(
        in_path=capture,
        target_freq=TARGET,
        output_path=out,
        chunk_size=32_768,
        checkpoint_secs=0.4,
        mix_sign_override=1,
    )
    with pytest.raises(ProcessingCancelled):
        ProcessingPipeline(ProcessingConfig(**cfg)).run(_CancelAfter(FS * 1.2))
    ckpt = tmp_path / "resumable.wav.ckpt"
    assert ckpt.exists(), "checkpoint must survive cancellation"
    assert out.exists(), "partial output must survive cancellation when checkpointing"

    # resume to completion
    result = ProcessingPipeline(ProcessingConfig(**cfg, resume=True)).run()
    assert not ckpt.exists(), "checkpoint removed after successful completion"
    got, rate = read_wav(out)
    assert rate == 48_000
    assert got.shape == ref.shape
    np.testing.assert_array_equal(got[:, 0], ref[:, 0])
    assert result.audio_peak > 0.01
    # capture-level RMS must cover the WHOLE capture, not post-resume only
    # (the accumulator is checkpointed and reseeded on resume)
    whole_rms_db = 20.0 * np.log10(
        np.sqrt(np.mean(got[:, 0].astype(np.float64) ** 2))
    )
    assert result.stats and abs(result.stats[0].rms_dbfs - whole_rms_db) < 0.1


def test_resume_respects_input_window(tmp_path, capture):
    """A resumed run with a sample-precise input window must stop at the
    window end, not overread by the resumed amount (segmented workers
    interrupted mid-segment)."""
    start, num = 93_750, 375_000  # frame-aligned; window ends inside the file
    ref_out = tmp_path / "win_ref.wav"
    base = dict(
        in_path=capture,
        target_freq=TARGET,
        chunk_size=32_768,
        mix_sign_override=1,
        input_start_sample=start,
        input_num_samples=num,
    )
    ProcessingPipeline(
        ProcessingConfig(**base, output_path=ref_out)
    ).run()
    ref, _ = read_wav(ref_out)

    out = tmp_path / "win_res.wav"
    cfg = dict(base, output_path=out, checkpoint_secs=0.4)
    with pytest.raises(ProcessingCancelled):
        ProcessingPipeline(ProcessingConfig(**cfg)).run(_CancelAfter(FS * 0.6))
    assert (tmp_path / "win_res.wav.ckpt").exists()
    result = ProcessingPipeline(ProcessingConfig(**cfg, resume=True)).run()
    got, _ = read_wav(out)
    assert got.shape == ref.shape, "resumed window overran the segment end"
    # input_samples is cumulative across resume: exactly the window, no overread
    assert result.input_samples == num
    np.testing.assert_array_equal(got[:, 0], ref[:, 0])


def test_resume_rejects_mismatched_config(tmp_path, capture):
    out = tmp_path / "a.wav"
    cfg = dict(
        in_path=capture,
        target_freq=TARGET,
        output_path=out,
        chunk_size=32_768,
        checkpoint_secs=0.2,
        mix_sign_override=1,
    )
    with pytest.raises(ProcessingCancelled):
        ProcessingPipeline(ProcessingConfig(**cfg)).run(_CancelAfter(FS * 0.8))
    bad = dict(cfg, bandwidth=25_000.0, resume=True)
    with pytest.raises(ValueError, match="does not match"):
        ProcessingPipeline(ProcessingConfig(**bad)).run()


def test_resume_rejects_different_input(tmp_path, capture):
    """The fingerprint carries input identity: resuming against a
    different capture (same geometry, same output path) must be rejected,
    not silently spliced."""
    out = tmp_path / "b.wav"
    cfg = dict(
        in_path=capture,
        target_freq=TARGET,
        output_path=out,
        chunk_size=32_768,
        checkpoint_secs=0.2,
        mix_sign_override=1,
    )
    with pytest.raises(ProcessingCancelled):
        ProcessingPipeline(ProcessingConfig(**cfg)).run(_CancelAfter(FS * 0.8))
    other = tmp_path / f"baseband_{int(CENTER)}Hz_other.wav"
    iq2 = make_nfm_iq(FS, 2.5, 25_000.0)
    write_stereo_wav(other, np.column_stack([iq2.real, iq2.imag]), int(FS))
    bad = dict(cfg, in_path=other, resume=True)
    with pytest.raises(ValueError, match="does not match"):
        ProcessingPipeline(ProcessingConfig(**bad)).run()
    # a changed de-emphasis also invalidates the checkpoint
    bad2 = dict(cfg, deemph_us=75.0, resume=True)
    with pytest.raises(ValueError, match="does not match"):
        ProcessingPipeline(ProcessingConfig(**bad2)).run()


def test_pass_through_checkpoint_warns_and_skips(tmp_path, capture, caplog):
    """--demod none + --checkpoint-secs: loud warning, no .ckpt written,
    run completes normally (was: silently inert checkpointing)."""
    import logging

    out = tmp_path / "slice.wav"
    cfg = ProcessingConfig(
        in_path=capture,
        target_freq=TARGET,
        demod_mode="none",
        output_path=out,
        checkpoint_secs=0.2,
        mix_sign_override=1,
    )
    with caplog.at_level(logging.WARNING):
        ProcessingPipeline(cfg).run()
    assert out.exists()
    assert not list(tmp_path.glob("*.ckpt"))
    assert any("pass-through" in r.message for r in caplog.records)


def test_resume_with_supersteps(tmp_path, capture, monkeypatch):
    """Checkpoint/resume must also hold when S chunks dispatch per call."""
    monkeypatch.setenv("IQ2A_SUPER", "4")
    ref_out = tmp_path / "ref_s.wav"
    ProcessingPipeline(
        ProcessingConfig(
            in_path=capture,
            target_freq=TARGET,
            output_path=ref_out,
            chunk_size=32_768,
            mix_sign_override=1,
        )
    ).run()
    ref, _ = read_wav(ref_out)

    out = tmp_path / "res_s.wav"
    cfg = dict(
        in_path=capture,
        target_freq=TARGET,
        output_path=out,
        chunk_size=32_768,
        checkpoint_secs=0.5,
        mix_sign_override=1,
    )
    with pytest.raises(ProcessingCancelled):
        ProcessingPipeline(ProcessingConfig(**cfg)).run(_CancelAfter(FS * 1.1))
    assert (tmp_path / "res_s.wav.ckpt").exists()
    ProcessingPipeline(ProcessingConfig(**cfg, resume=True)).run()
    got, _ = read_wav(out)
    assert got.shape == ref.shape
    # single-step vs scan-compiled executables may differ by 1 s16 LSB at
    # quantiser boundaries (XLA f32 reassociation inside lax.scan)
    diff = np.abs(got[:, 0] - ref[:, 0])
    assert diff.max() <= 1.5 / 32767.0
    assert float(np.mean(diff > 0)) < 1e-3
