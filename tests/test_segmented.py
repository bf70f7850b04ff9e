"""Segmented (burst-mode) processing: plan properties and segment-vs-serial
equivalence.

The segmented mode (:mod:`iq_to_audio_tpu.pipeline.segmented`) splits one
capture into frame-aligned windows that independent pipeline streams
process, each with a discarded lead-in while the exponentially-convergent
carries (FIR tails, IIRs, AGC gain) settle; the NCO is phase-seeded
exactly from the absolute sample index.  The spliced result must match a
serial run of the same pipeline to far below the -60 dB golden contract.
"""

from __future__ import annotations

import numpy as np
import pytest

from conftest import error_db, make_nfm_iq, make_tone_iq

from iq_to_audio_tpu import ProcessingConfig, ProcessingPipeline
from iq_to_audio_tpu.io.writer import read_wav, write_stereo_wav
from iq_to_audio_tpu.ops.resample import ResamplePlan
from iq_to_audio_tpu.pipeline.filters import compute_decimation
from iq_to_audio_tpu.pipeline.segmented import (
    Segment,
    plan_segments,
    splice_audio,
)

FS = 250_000.0
CENTER = 145_000_000.0
OFFSET = 25_000.0


def test_plan_segments_tiles_the_capture():
    decim, fs_ch = compute_decimation(FS, 96_000.0)
    plan = ResamplePlan.create(fs_ch, 48_000.0, 1)
    total = 1_234_567
    segs = plan_segments(total, FS, decim, plan.up, plan.down, 4,
                         warm_seconds=0.1)
    frame = decim * plan.down
    assert segs[0].start == 0 and segs[0].lead == 0
    assert segs[-1].start + segs[-1].length == total
    for a, b in zip(segs, segs[1:]):
        assert a.start + a.length == b.start  # gapless, non-overlapping
    for s in segs:
        assert s.start % frame == 0
        assert s.lead % frame == 0
        if s.index:
            assert s.lead >= 0.1 * FS  # at least the requested warm-up
            assert s.read_start == s.start - s.lead
        assert s.audio_skip == (s.lead // frame) * plan.up


def test_plan_segments_clamps_worker_count():
    decim, fs_ch = compute_decimation(FS, 96_000.0)
    plan = ResamplePlan.create(fs_ch, 48_000.0, 1)
    # a capture only ~6 lead-ins long cannot productively use 8 workers
    total = int(0.6 * FS)
    segs = plan_segments(total, FS, decim, plan.up, plan.down, 8,
                         warm_seconds=0.1)
    assert len(segs) < 8
    assert segs[-1].start + segs[-1].length == total


@pytest.mark.parametrize(
    "mode,agc,limit_db",
    [
        ("nfm", True, -70.0),
        # the feedback AGC amplifies f32 summation ulps at its
        # zero-crossing gain spikes (docs/performance.md "Cross-backend
        # determinism"), so ssb+AGC sits near -69 dB — still inside the
        # -60 dB golden contract
        ("usb", True, -60.0),
    ],
)
def test_segmented_matches_serial(tmp_path, mode, agc, limit_db):
    """Segment runs spliced together == the serial run of the same engine,
    inside the -60 dB contract (the residual is the lead-in's
    exponentially-decayed state mismatch plus s16 rounding ties)."""
    seconds = 4.0
    if mode == "nfm":
        iq = make_nfm_iq(FS, seconds, OFFSET)
    else:
        iq = make_tone_iq(FS, seconds, OFFSET + 1_000.0)
    cap = tmp_path / f"baseband_{int(CENTER)}Hz_cap.wav"
    write_stereo_wav(cap, np.column_stack([iq.real, iq.imag]), int(FS))

    def config(out, **kw):
        return ProcessingConfig(
            in_path=cap,
            target_freq=CENTER + OFFSET,
            demod_mode=mode,
            agc_enabled=agc,
            output_path=out,
            mix_sign_override=1,
            chunk_size=65_536,
            **kw,
        )

    serial_out = tmp_path / "serial.wav"
    ProcessingPipeline(config(serial_out)).run(None)

    decim, fs_ch = compute_decimation(FS, 96_000.0)
    plan = ResamplePlan.create(fs_ch, 48_000.0, 1)
    total = len(iq)
    segs = plan_segments(total, FS, decim, plan.up, plan.down, 3,
                         warm_seconds=0.25)
    assert len(segs) == 3
    seg_paths = []
    for s in segs:
        out = tmp_path / f"seg_{s.index}.wav"
        ProcessingPipeline(
            config(
                out,
                input_start_sample=s.read_start,
                input_num_samples=s.read_samples,
            )
        ).run(None)
        seg_paths.append(out)

    spliced_out = tmp_path / "spliced.wav"
    peak, n, rms_dbfs = splice_audio(seg_paths, [s.audio_skip for s in segs],
                                     spliced_out)
    assert -60.0 < rms_dbfs < 0.0  # capture-level RMS surfaced for stats

    a, sr_a = read_wav(serial_out)
    b, sr_b = read_wav(spliced_out)
    assert sr_a == sr_b == 48_000
    assert a.shape == b.shape
    assert n == len(b)
    err = error_db(b[:, 0], a[:, 0])
    assert err < limit_db, f"segmented-vs-serial error {err:.1f} dB"
    # the splice's written-sample peak matches the stream peak (within the
    # 1/32767-vs-1/32768 scaling conventions of writer and reader)
    assert peak == pytest.approx(float(np.max(np.abs(b))), abs=1.0 / 32000)


def test_segment_read_window_is_exact(tmp_path):
    """input_start_sample/input_num_samples consume exactly the requested
    window: a windowed pass-through run equals the matching slice of a
    full-capture run once the FIR tail has converged (lead-in >= taps)."""
    from iq_to_audio_tpu.pipeline.filters import design_channel_filter

    iq = make_tone_iq(FS, 0.4, OFFSET)
    cap = tmp_path / f"baseband_{int(CENTER)}Hz_win.wav"
    write_stereo_wav(cap, np.column_stack([iq.real, iq.imag]), int(FS),
                     codec="pcm_f32le")

    def config(out, **kw):
        return ProcessingConfig(
            in_path=cap,
            target_freq=CENTER + OFFSET,
            demod_mode="none",
            output_path=out,
            mix_sign_override=1,
            chunk_size=8_192,
            fs_ch_target=FS,  # decimation 1: output index == input index
            **kw,
        )

    full_out = tmp_path / "full.wav"
    ProcessingPipeline(config(full_out)).run(None)

    taps = design_channel_filter(FS, 12_500.0, 1)
    lead = len(taps)
    start, num = 40_000, 30_000
    win_out = tmp_path / "win.wav"
    result = ProcessingPipeline(
        config(win_out, input_start_sample=start - lead,
               input_num_samples=num + lead)
    ).run(None)
    assert result.input_samples == num + lead

    full, _ = read_wav(full_out)
    win, _ = read_wav(win_out)
    assert len(win) == num + lead
    err = error_db(
        win[lead:, 0] + 1j * win[lead:, 1],
        full[start : start + num, 0] + 1j * full[start : start + num, 1],
    )
    assert err < -80.0, f"windowed-vs-full slice error {err:.1f} dB"


class TestModeAwareLead:
    """segmented.warm_seconds_for: the shortest safe lead per mode."""

    def test_ordering_and_ceiling(self):
        from iq_to_audio_tpu.pipeline.segmented import (
            WARM_SECONDS,
            warm_seconds_for,
        )

        fs_ch, taps, fs = 96_153.8, 1601, 2_500_000.0
        w_pt = warm_seconds_for("none", False, fs_ch, taps, fs)
        w_nfm = warm_seconds_for("nfm", True, fs_ch, taps, fs,
                                 deemph_us=300.0)
        w_am = warm_seconds_for("am", False, fs_ch, taps, fs)
        w_ssb = warm_seconds_for("usb", True, fs_ch, taps, fs)
        w_ssb_noagc = warm_seconds_for("lsb", False, fs_ch, taps, fs)
        assert w_pt <= w_nfm <= w_ssb <= WARM_SECONDS
        assert w_am == w_nfm  # same DC-blocker-bounded class
        assert w_ssb_noagc < w_ssb  # the AGC pole is what costs
        # pass-through still covers the channel filter's input history
        assert w_pt >= 2 * taps / fs
        # a huge de-emphasis time constant scales the lead (capped)
        w_slow = warm_seconds_for("nfm", True, fs_ch, taps, fs,
                                  deemph_us=50_000.0)
        assert w_nfm < w_slow <= WARM_SECONDS

    @pytest.mark.parametrize(
        "mode,agc,limit_db",
        [("nfm", True, -60.0), ("usb", True, -60.0)],
    )
    def test_auto_lead_matches_serial(self, tmp_path, mode, agc, limit_db):
        """Segment splice at the MODE-AWARE (much shorter) lead still meets
        the golden contract -- the lead sizing math is load-bearing."""
        from iq_to_audio_tpu.pipeline.segmented import warm_seconds_for

        seconds = 4.0
        if mode == "nfm":
            iq = make_nfm_iq(FS, seconds, OFFSET)
        else:
            iq = make_tone_iq(FS, seconds, OFFSET + 1_000.0)
        cap = tmp_path / f"baseband_{int(CENTER)}Hz_auto.wav"
        write_stereo_wav(cap, np.column_stack([iq.real, iq.imag]), int(FS))

        def config(out, **kw):
            return ProcessingConfig(
                in_path=cap,
                target_freq=CENTER + OFFSET,
                demod_mode=mode,
                agc_enabled=agc,
                output_path=out,
                mix_sign_override=1,
                chunk_size=65_536,
                **kw,
            )

        serial_out = tmp_path / "serial.wav"
        ProcessingPipeline(config(serial_out)).run(None)

        decim, fs_ch = compute_decimation(FS, 96_000.0)
        plan = ResamplePlan.create(fs_ch, 48_000.0, 1)
        warm = warm_seconds_for(mode, agc, fs_ch, 0, FS, deemph_us=300.0)
        assert warm < 0.5
        segs = plan_segments(len(iq), FS, decim, plan.up, plan.down, 3,
                             warm_seconds=warm)
        assert len(segs) == 3
        seg_paths = []
        for s in segs:
            out = tmp_path / f"aseg_{s.index}.wav"
            ProcessingPipeline(
                config(
                    out,
                    input_start_sample=s.read_start,
                    input_num_samples=s.read_samples,
                )
            ).run(None)
            seg_paths.append(out)
        spliced_out = tmp_path / "aspliced.wav"
        splice_audio(seg_paths, [s.audio_skip for s in segs], spliced_out)
        a, _ = read_wav(serial_out)
        b, _ = read_wav(spliced_out)
        assert a.shape == b.shape
        err = error_db(b[:, 0], a[:, 0])
        assert err < limit_db, f"auto-lead splice error {err:.1f} dB"


def test_plan_segments_front_split_tiles_and_reindexes():
    """front_split subdivides the FIRST segment into frame-aligned pieces
    (the hetero executor's fractional-claim granularity) while the plan
    still tiles the capture gaplessly with sequential indices."""
    decim, fs_ch = compute_decimation(FS, 96_000.0)
    plan = ResamplePlan.create(fs_ch, 48_000.0, 1)
    total = int(4.0 * FS)
    base = plan_segments(total, FS, decim, plan.up, plan.down, 4,
                         warm_seconds=0.05)
    segs = plan_segments(total, FS, decim, plan.up, plan.down, 4,
                         warm_seconds=0.05, front_split=4)
    assert len(segs) == len(base) + 3  # first segment became 4 pieces
    frame = decim * plan.down
    assert segs[0].start == 0 and segs[0].lead == 0
    assert segs[-1].start + segs[-1].length == total
    for i, s in enumerate(segs):
        assert s.index == i
        assert s.start % frame == 0
        if s.index:
            assert s.lead > 0
        assert s.audio_skip == (s.lead // frame) * plan.up
    for a, b in zip(segs, segs[1:]):
        assert a.start + a.length == b.start
    # the sub-segments are genuinely finer than a full segment
    assert segs[0].length < base[0].length
    # pieces keep at least two lead-ins of owned length
    lead = max(s.lead for s in segs)
    assert all(s.length >= 2 * lead for s in segs[:3])


def test_plan_segments_front_split_clamps_on_short_segments():
    """A first segment too short to hold several 2-lead-in pieces reduces
    the split instead of planning sliver segments."""
    decim, fs_ch = compute_decimation(FS, 96_000.0)
    plan = ResamplePlan.create(fs_ch, 48_000.0, 1)
    total = int(1.2 * FS)
    segs = plan_segments(total, FS, decim, plan.up, plan.down, 4,
                         warm_seconds=0.1, front_split=8)
    # first segment is ~0.3 s = 3 lead-ins -> at most 1 piece (no split)
    assert segs[-1].start + segs[-1].length == total
    for a, b in zip(segs, segs[1:]):
        assert a.start + a.length == b.start
    lead = max(s.lead for s in segs)
    assert all(s.length >= 2 * lead or s is segs[-1] for s in segs)
