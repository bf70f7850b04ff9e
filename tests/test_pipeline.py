"""End-to-end pipeline golden tests: every demod mode against the float64
reference twin at -60 dB, plus the streaming-control behaviors (cancel,
preview, probe-only, pass-through, dump, multi-target).

This is the analogue of the reference's test_processing.py +
test_cli_integration.py quantitative audio checks (RMS windows, sample
counts).
"""

from __future__ import annotations

import numpy as np
import pytest

from conftest import error_db, make_am_iq, make_nfm_iq, make_tone_iq

from iq_to_audio_tpu import ProcessingCancelled, ProcessingConfig, ProcessingPipeline
from iq_to_audio_tpu.io.riff import parse_wav_header
from iq_to_audio_tpu.io.writer import read_wav, write_stereo_wav
from iq_to_audio_tpu.ops.resample import ResamplePlan
from iq_to_audio_tpu.pipeline.filters import compute_decimation, design_channel_filter
from iq_to_audio_tpu.pipeline.progress import ProgressSink
from iq_to_audio_tpu.ref.chain import RefResampler, ref_demod_chain

FS = 250_000.0
CENTER = 145_000_000.0
OFFSET = 25_000.0


def _write_capture(tmp_path, iq, name=f"baseband_{int(CENTER)}Hz_cap.wav", codec="pcm_s16le"):
    path = tmp_path / name
    write_stereo_wav(path, np.column_stack([iq.real, iq.imag]), int(FS), codec=codec)
    return path


def _golden_audio(iq, mode, *, bandwidth=12_500.0, agc=True, mix_sign=1):
    decim, fs_ch = compute_decimation(FS, 96_000.0)
    taps = design_channel_filter(FS, bandwidth, decim)
    audio_ch, _ = ref_demod_chain(
        iq.astype(np.complex128),
        sample_rate=FS,
        freq_offset=OFFSET,
        taps=taps,
        decimation=decim,
        mode=mode,
        agc_enabled=agc,
        mix_sign=mix_sign,
    )
    plan = ResamplePlan.create(fs_ch, 48_000.0, 1)
    audio48 = RefResampler(plan.up, plan.down).resample_all(audio_ch)
    # the writer clips to +-0.99 before the s16 encode (reference
    # processing.py:449-452) — mirror it for the comparison
    return np.clip(audio48, -0.99, 0.99)


def test_golden_u8_unaligned_tail(tmp_path):
    """pcm_u8 capture whose length is NOT chunk-aligned: the raw-domain
    pad must decode to silence (offset-binary 128), not full-scale -1-1j
    DC — the float64 twin pads the COMPLEX domain with zeros, so a wrong
    pad corrupts the EOF resampler flush and shows up as tail error."""
    iq = make_nfm_iq(FS, 0.7, OFFSET)  # 175k samples: not a chunk multiple
    path = _write_capture(tmp_path, iq, codec="pcm_u8")
    out = tmp_path / "audio_u8.wav"
    cfg = ProcessingConfig(
        in_path=path,
        target_freq=CENTER + OFFSET,
        demod_mode="nfm",
        output_path=out,
    )
    result = ProcessingPipeline(cfg).run()
    got, rate = read_wav(out)
    got = got[:, 0]
    assert rate == 48_000
    # compare against the twin fed the u8-quantised IQ (isolates the
    # padding behavior from u8 quantisation noise); encode/decode mirror
    # the writer (round((x+1)*127.5)) and reader ((u8-128)/128) exactly
    enc_i = np.round((np.clip(iq.real, -1, 1) + 1.0) * 127.5)
    enc_q = np.round((np.clip(iq.imag, -1, 1) + 1.0) * 127.5)
    iq_q = ((enc_i - 128.0) / 128.0) + 1j * ((enc_q - 128.0) / 128.0)
    ref = _golden_audio(iq_q, "nfm", mix_sign=result.mix_sign)
    n = min(got.size, ref.size)
    assert abs(got.size - ref.size) <= 2
    # whole-signal error AND tail-only error: the tail is where a wrong
    # EOF pad turns into demodulated garbage
    assert error_db(got[:n], ref[:n]) < -55.0
    tail = slice(max(0, n - 2400), n)  # final 50 ms
    assert error_db(got[tail], ref[tail]) < -50.0


@pytest.mark.parametrize(
    "mode,agc,gen",
    [
        ("nfm", True, lambda: make_nfm_iq(FS, 1.0, OFFSET)),
        ("am", True, lambda: make_am_iq(FS, 1.0, OFFSET)),
        # AGC-off for the exact SSB comparison: the feedback AGC divides by
        # |x| near zero crossings, chaotically amplifying f32-vs-f64
        # differences (AGC correctness is covered exactly at op level in
        # test_ops.py and behaviourally in test_ssb_agc_tracks_target below)
        ("usb", False, lambda: make_tone_iq(FS, 1.0, OFFSET + 1_000.0)),
        ("lsb", False, lambda: make_tone_iq(FS, 1.0, OFFSET - 1_000.0)),
    ],
)
def test_golden_all_modes(tmp_path, mode, agc, gen):
    """Device pipeline audio within -60 dB of the float64 twin chain."""
    iq = gen()
    path = _write_capture(tmp_path, iq, codec="pcm_f32le")
    out = tmp_path / f"audio_{mode}.wav"
    cfg = ProcessingConfig(
        in_path=path,
        target_freq=CENTER + OFFSET,
        demod_mode=mode,
        agc_enabled=agc,
        output_path=out,
    )
    result = ProcessingPipeline(cfg).run()
    got, rate = read_wav(out)
    got = got[:, 0]
    assert rate == 48_000
    ref = _golden_audio(iq, mode, agc=agc, mix_sign=result.mix_sign)
    n = min(got.size, ref.size)
    assert abs(got.size - ref.size) <= 2
    err = error_db(got[:n], ref[:n])
    assert err < -60.0, (mode, err)
    # quantitative audio stats like the reference CLI suite
    assert result.audio_peak > 0.01
    rms = float(np.sqrt(np.mean(got[4800:43200] ** 2)))
    assert rms > 0.005
    # capture-level RMS surfaced via DecoderStats (reference base.py:9-13)
    whole_rms_db = 20.0 * np.log10(np.sqrt(np.mean(got.astype(np.float64) ** 2)))
    assert result.stats and abs(result.stats[0].rms_dbfs - whole_rms_db) < 0.1


@pytest.mark.parametrize("mode,toneoff", [("usb", 1_000.0), ("lsb", -1_000.0)])
def test_golden_ssb_agc_on(tmp_path, mode, toneoff):
    """End-to-end AGC-ON golden: the device SSB pipeline (multi-chunk, gain
    carried across chunks) within -60 dB of the float64 AGC chain.

    The twin consumes the device's own dumped channel IQ (cf32) rather than
    rerunning the full f64 front-end: the AGC's ``target/|x|`` update
    amplifies any upstream f32-vs-f64 difference by 25-40 dB near audio
    zero crossings (measured: a -60 dB AGC-off chain lands at only -21 dB
    after AGC), so a full-chain comparison cannot isolate the AGC.  Sharing
    the bit-exact channel stream pins the comparison to what this test is
    for: the scan-based gain recurrence, its cross-chunk carry, and the
    resampler behind it.  See PARITY.md (AGC numerics)."""
    from iq_to_audio_tpu.ref.chain import RefAGC, RefDCBlocker

    iq = make_tone_iq(FS, 2.0, OFFSET + toneoff)
    path = _write_capture(tmp_path, iq, codec="pcm_f32le")
    out = tmp_path / "audio.wav"
    dump = tmp_path / "chan.cf32"
    cfg = ProcessingConfig(
        in_path=path,
        target_freq=CENTER + OFFSET,
        demod_mode=mode,
        agc_enabled=True,
        output_path=out,
        chunk_size=32_768,  # several chunks: the carried gain matters
        dump_iq_path=dump,
    )
    result = ProcessingPipeline(cfg).run()
    got = read_wav(out)[0][:, 0]
    raw = np.fromfile(dump, dtype=np.complex64)
    analytic = np.conj(raw) if mode == "lsb" else raw
    audio = RefDCBlocker().process(analytic.real.astype(np.float64))
    audio = RefAGC().process(audio)
    fs_ch = FS / result.decimation
    plan = ResamplePlan.create(fs_ch, 48_000.0, 1)
    ref = np.clip(RefResampler(plan.up, plan.down).resample_all(audio), -0.99, 0.99)
    n = min(got.size, ref.size)
    assert abs(got.size - ref.size) <= 2
    err = error_db(got[:n], ref[:n])
    assert err < -60.0, (mode, err)


def test_ssb_agc_tracks_target(tmp_path):
    """With AGC on, quiet SSB audio is pulled toward the -12 dBFS target and
    the device gain trajectory matches the float64 twin's RMS closely."""
    iq = make_tone_iq(FS, 1.0, OFFSET + 1_000.0, amplitude=0.08, noise_std=0.002)
    path = _write_capture(tmp_path, iq, codec="pcm_f32le")
    out = tmp_path / "agc.wav"
    cfg = ProcessingConfig(
        in_path=path, target_freq=CENTER + OFFSET, demod_mode="usb", output_path=out
    )
    result = ProcessingPipeline(cfg).run()
    got = read_wav(out)[0][:, 0]
    ref = _golden_audio(iq, "usb", agc=True, mix_sign=result.mix_sign)
    n = min(got.size, ref.size)
    rms_got = float(np.sqrt(np.mean(got[n // 2 : n] ** 2)))
    rms_ref = float(np.sqrt(np.mean(ref[n // 2 : n] ** 2)))
    assert abs(rms_got / rms_ref - 1.0) < 0.05
    # pulled from ~0.04 toward the -12 dBFS (0.25) target
    assert rms_got > 0.1


def test_nfm_recovers_tone(tmp_path):
    """Demodulated NFM audio must be a clean 1 kHz tone (spectral check)."""
    iq = make_nfm_iq(FS, 1.0, OFFSET, audio_freq=1_000.0)
    path = _write_capture(tmp_path, iq)
    out = tmp_path / "audio.wav"
    cfg = ProcessingConfig(in_path=path, target_freq=CENTER + OFFSET, output_path=out)
    ProcessingPipeline(cfg).run()
    got, _ = read_wav(out)
    x = got[9600:38400, 0].astype(np.float64)
    spec = np.abs(np.fft.rfft(x * np.hanning(x.size)))
    freqs = np.fft.rfftfreq(x.size, 1 / 48_000.0)
    peak_freq = freqs[np.argmax(spec)]
    assert abs(peak_freq - 1_000.0) < 5.0
    # tone-to-everything-else ratio
    mask = np.abs(freqs - 1_000.0) < 30.0
    tone = np.sqrt(np.sum(spec[mask] ** 2))
    rest = np.sqrt(np.sum(spec[~mask] ** 2))
    assert tone / (rest + 1e-12) > 3.0


def test_superstep_equals_single_step(tmp_path, monkeypatch):
    """Scanning S chunks per dispatch must produce identical audio to the
    one-chunk-per-dispatch path (including the padded final group)."""
    iq = make_nfm_iq(FS, 1.3, OFFSET)
    path = _write_capture(tmp_path, iq)
    outputs = {}
    for label, super_env in (("single", "1"), ("super4", "4")):
        monkeypatch.setenv("IQ2A_SUPER", super_env)
        out = tmp_path / f"audio_{label}.wav"
        cfg = ProcessingConfig(
            in_path=path,
            target_freq=CENTER + OFFSET,
            output_path=out,
            chunk_size=32_768,
            mix_sign_override=1,
        )
        ProcessingPipeline(cfg).run()
        outputs[label] = read_wav(out)[0][:, 0]
    monkeypatch.delenv("IQ2A_SUPER")
    assert outputs["single"].shape == outputs["super4"].shape
    # XLA may reorder f32 inside lax.scan: allow 1-LSB flips at s16
    # quantiser boundaries on a vanishing fraction of samples
    diff = np.abs(outputs["single"] - outputs["super4"])
    assert diff.max() <= 1.5 / 32767.0
    assert float(np.mean(diff > 0)) < 1e-3


def test_overlap_schedule_matches_phased(tmp_path, monkeypatch):
    """The overlapped hot-loop schedule (group k+1's upload issued behind
    group k's dispatch, previous window drained after this window's
    submits) must write byte-identical audio to the strict phased
    schedule — same dispatch groups, same executable, different host
    ordering only."""
    iq = make_nfm_iq(FS, 1.3, OFFSET)
    path = _write_capture(tmp_path, iq)
    outputs = {}
    monkeypatch.setenv("IQ2A_SUPER", "2")  # 2-chunk groups
    monkeypatch.setenv("IQ2A_ACC", "4")  # 2 groups per window, ~3 windows
    for label, env in (("phased", "0"), ("overlap", "1")):
        monkeypatch.setenv("IQ2A_OVERLAP", env)
        out = tmp_path / f"audio_{label}.wav"
        cfg = ProcessingConfig(
            in_path=path,
            target_freq=CENTER + OFFSET,
            output_path=out,
            chunk_size=32_768,
            mix_sign_override=1,
        )
        ProcessingPipeline(cfg).run()
        outputs[label] = read_wav(out)[0][:, 0]
    assert np.array_equal(outputs["phased"], outputs["overlap"])


def test_overlap_auto_calibration(tmp_path, monkeypatch, caplog):
    """On captures spanning >=4 accumulation windows the default (auto)
    schedule runs a phased-vs-overlapped A/B on windows 1-2, logs the
    decision, and still writes byte-identical audio."""
    import logging as _logging

    # the planner tunes chunk_size to ~65536 here: 3.5 s -> ~14 chunks,
    # 7 two-chunk windows — enough for the >=4-window A/B gate
    iq = make_nfm_iq(FS, 3.5, OFFSET)
    path = _write_capture(tmp_path, iq)
    monkeypatch.setenv("IQ2A_SUPER", "2")
    monkeypatch.setenv("IQ2A_ACC", "2")  # 1 group per window
    monkeypatch.setenv("IQ2A_OVERLAP", "0")
    out_phased = tmp_path / "audio_phased.wav"
    cfg = ProcessingConfig(
        in_path=path,
        target_freq=CENTER + OFFSET,
        output_path=out_phased,
        chunk_size=32_768,
        mix_sign_override=1,
    )
    ProcessingPipeline(cfg).run()
    monkeypatch.delenv("IQ2A_OVERLAP")
    out_auto = tmp_path / "audio_auto.wav"
    cfg = ProcessingConfig(
        in_path=path,
        target_freq=CENTER + OFFSET,
        output_path=out_auto,
        chunk_size=32_768,
        mix_sign_override=1,
    )
    with caplog.at_level(_logging.INFO, logger="iq_to_audio_tpu.pipeline.pipeline"):
        ProcessingPipeline(cfg).run()
    assert any(
        "overlap auto-calibration" in r.getMessage() for r in caplog.records
    )
    assert np.array_equal(
        read_wav(out_phased)[0][:, 0], read_wav(out_auto)[0][:, 0]
    )


def test_build_chunk_step_explicit_super_on_accelerator(monkeypatch):
    """Regression (round-1 VERDICT weak #4): ``build_chunk_step`` with an
    explicit ``super_chunks`` on a non-CPU backend raised NameError ('os'
    was only imported inside the ``super_chunks is None`` branch), crashing
    every ``--plot-stages`` / unaligned-geometry run on the accelerator."""
    import iq_to_audio_tpu.pipeline.step as step_mod
    from iq_to_audio_tpu.demod import create_decoder
    from iq_to_audio_tpu.ops.ddc import DDCPlan, bandpass_kernel
    from iq_to_audio_tpu.ops.nco import nco_increment_fixed
    from iq_to_audio_tpu.ops.resample import design_resampler_kernel

    monkeypatch.setattr(step_mod.jax, "default_backend", lambda: "tpu")
    decim, fs_ch = compute_decimation(FS, 96_000.0)
    taps = design_channel_filter(FS, 12_500.0, decim)
    ddc_plan = DDCPlan.create(len(taps), decim, target_chunk=32_768)
    rs_plan = ResamplePlan.create(fs_ch, 48_000.0, ddc_plan.out_size)
    decoder = create_decoder("nfm", deemph_us=300.0, agc_enabled=True)
    decoder.setup(fs_ch)
    inc = nco_increment_fixed(OFFSET, FS)
    step = step_mod.build_chunk_step(
        ddc_plan=ddc_plan,
        rs_plan=rs_plan,
        ddc_kernel_np=bandpass_kernel(taps, [inc]),
        rs_kernel_np=design_resampler_kernel(rs_plan.up, rs_plan.down),
        incs_fixed=[inc],
        codec="pcm_s16le",
        iq_order="iq",
        decoder=decoder,
        pass_through=False,
        dump_iq=False,
        super_chunks=1,  # the branch that skipped the os import
    )
    assert step.super_chunks == 1


def test_accumulation_window_default_and_exact_override(monkeypatch):
    """Round-5 measured finding promoted to product behavior: accelerator
    backends default to shallow (<=8-chunk) accumulation windows whose
    per-window drains keep the upload queue shallow (2.6x -> 4.4x realtime
    device-only on a slow tunneled wire, docs/probes/perf_probe_r5b.py),
    and ``IQ2A_ACC`` is an EXACT override — a value above the cap restores
    the wide single-window geometry the bench A/Bs against."""
    import iq_to_audio_tpu.pipeline.step as step_mod
    from iq_to_audio_tpu.demod import create_decoder
    from iq_to_audio_tpu.ops.ddc import DDCPlan, bandpass_kernel
    from iq_to_audio_tpu.ops.nco import nco_increment_fixed
    from iq_to_audio_tpu.ops.resample import design_resampler_kernel

    monkeypatch.setattr(step_mod.jax, "default_backend", lambda: "tpu")
    for env in ("IQ2A_ACC", "IQ2A_SUPER", "IQ2A_GROUPS"):
        monkeypatch.delenv(env, raising=False)
    decim, fs_ch = compute_decimation(FS, 96_000.0)
    taps = design_channel_filter(FS, 12_500.0, decim)
    ddc_plan = DDCPlan.create(len(taps), decim, target_chunk=32_768)
    rs_plan = ResamplePlan.create(fs_ch, 48_000.0, ddc_plan.out_size)
    inc = nco_increment_fixed(OFFSET, FS)
    total = 18  # flagship-bench-like capture length in chunks

    def build():
        decoder = create_decoder("nfm", deemph_us=300.0, agc_enabled=True)
        decoder.setup(fs_ch)
        return step_mod.build_chunk_step(
            ddc_plan=ddc_plan,
            rs_plan=rs_plan,
            ddc_kernel_np=bandpass_kernel(taps, [inc]),
            rs_kernel_np=design_resampler_kernel(rs_plan.up, rs_plan.down),
            incs_fixed=[inc],
            codec="pcm_s16le",
            iq_order="iq",
            decoder=decoder,
            pass_through=False,
            dump_iq=False,
            est_total_chunks=total,
        )

    # default: shallow windows — several drains across the capture
    step = build()
    assert step.acc_chunks <= 8
    assert step.acc_chunks % step.super_chunks == 0
    # exact override above the cap: wide geometry, one window spanning the
    # whole (group-padded) capture
    monkeypatch.setenv("IQ2A_ACC", "64")
    wide = build()
    assert wide.acc_chunks > 8
    padded = -(-total // wide.super_chunks) * wide.super_chunks
    assert wide.acc_chunks == padded
    # exact override below the cap still narrows the window
    monkeypatch.setenv("IQ2A_ACC", "4")
    narrow = build()
    assert narrow.acc_chunks <= 4


def test_convj_env_forces_j_conv_on_cpu(monkeypatch):
    """An explicit ``IQ2A_CONVJ=1`` selects the lane-filling J-conv even on
    the CPU backend (where the plain conv is the default) so cross-backend
    determinism probes can pin matching kernels on both sides."""
    from iq_to_audio_tpu.demod import create_decoder
    from iq_to_audio_tpu.ops.ddc import DDCPlan, bandpass_kernel
    from iq_to_audio_tpu.ops.nco import nco_increment_fixed
    from iq_to_audio_tpu.ops.resample import design_resampler_kernel
    from iq_to_audio_tpu.pipeline.step import build_chunk_step

    decim, fs_ch = compute_decimation(FS, 96_000.0)
    taps = design_channel_filter(FS, 12_500.0, decim)
    ddc_plan = DDCPlan.create(len(taps), decim, target_chunk=32_768)
    rs_plan = ResamplePlan.create(fs_ch, 48_000.0, ddc_plan.out_size)
    inc = nco_increment_fixed(OFFSET, FS)

    def build():
        decoder = create_decoder("nfm", deemph_us=300.0, agc_enabled=True)
        decoder.setup(fs_ch)
        return build_chunk_step(
            ddc_plan=ddc_plan,
            rs_plan=rs_plan,
            ddc_kernel_np=bandpass_kernel(taps, [inc]),
            rs_kernel_np=design_resampler_kernel(rs_plan.up, rs_plan.down),
            incs_fixed=[inc],
            codec="pcm_s16le",
            iq_order="iq",
            decoder=decoder,
            pass_through=False,
            dump_iq=False,
        )

    monkeypatch.setenv("IQ2A_CHANNELIZER", "conv")
    monkeypatch.delenv("IQ2A_CONVJ", raising=False)
    assert build().j_lanes == 1  # CPU default: plain conv
    monkeypatch.setenv("IQ2A_CONVJ", "1")
    assert build().j_lanes > 1  # explicit force
    monkeypatch.setenv("IQ2A_CONVJ", "0")
    assert build().j_lanes == 1

    # formulation pick within the lane-filling family (IQ2A_MM):
    # a convj force without IQ2A_MM keeps the J-CONV kernel (cross-backend
    # determinism probes pin matching conv kernels on both sides)
    monkeypatch.setenv("IQ2A_CONVJ", "1")
    monkeypatch.delenv("IQ2A_MM", raising=False)
    s = build()
    assert s._j_kernel is not None and s._mm_kernel is None
    # IQ2A_MM=1 selects the shifted-dense-matmul even on CPU
    monkeypatch.setenv("IQ2A_MM", "1")
    s = build()
    assert s._mm_kernel is not None and s._j_kernel is None
    assert s.j_lanes > 1
    # ... and alone (no convj force) it also enables the lane-filling family
    monkeypatch.delenv("IQ2A_CONVJ", raising=False)
    s = build()
    assert s._mm_kernel is not None and s.j_lanes > 1
    # pretend-accelerator default is the matmul; IQ2A_MM=0 restores J-conv
    import iq_to_audio_tpu.pipeline.step as step_mod

    monkeypatch.delenv("IQ2A_MM", raising=False)
    monkeypatch.setattr(step_mod.jax, "default_backend", lambda: "tpu")
    s = build()
    assert s._mm_kernel is not None and s._j_kernel is None
    monkeypatch.setenv("IQ2A_MM", "0")
    s = build()
    assert s._j_kernel is not None and s._mm_kernel is None


def test_chunk_size_invariance(tmp_path):
    """Chunked streaming must be invariant to the chunk size choice."""
    iq = make_nfm_iq(FS, 0.8, OFFSET)
    path = _write_capture(tmp_path, iq)
    outputs = []
    for chunk in (65_536, 524_288):
        out = tmp_path / f"audio_{chunk}.wav"
        cfg = ProcessingConfig(
            in_path=path, target_freq=CENTER + OFFSET, output_path=out, chunk_size=chunk
        )
        ProcessingPipeline(cfg).run()
        outputs.append(read_wav(out)[0][:, 0])
    n = min(map(len, outputs))
    assert abs(len(outputs[0]) - len(outputs[1])) <= 1
    assert error_db(outputs[0][:n], outputs[1][:n]) < -70.0


def test_mix_sign_autodetect_inverted(tmp_path):
    """Spectrally-inverted capture (qi order) should flip the mixer sign."""
    iq = make_tone_iq(FS, 0.5, OFFSET)
    inv = np.conj(iq)  # inverted spectrum: tone now at -OFFSET
    path = _write_capture(tmp_path, inv)
    cfg = ProcessingConfig(in_path=path, target_freq=CENTER + OFFSET, probe_only=True)
    result = ProcessingPipeline(cfg).run()
    assert result.mix_sign == -1


def test_pass_through_slice(tmp_path):
    iq = make_tone_iq(FS, 0.5, OFFSET)
    path = _write_capture(tmp_path, iq)
    out = tmp_path / "slice.wav"
    cfg = ProcessingConfig(
        in_path=path, target_freq=CENTER + OFFSET, demod_mode="none", output_path=out
    )
    result = ProcessingPipeline(cfg).run()
    info = parse_wav_header(out)
    assert info.channels == 2
    assert info.codec == "pcm_s16le"  # container/codec preserved
    assert info.sample_rate == round(result.fs_channel)
    assert info.num_frames == -(-iq.size // result.decimation)
    # tone should sit near DC after the shift: strong energy
    data, _ = read_wav(out)
    assert float(np.abs(data).max()) > 0.3


def test_dump_iq_and_plot_stages(tmp_path):
    iq = make_nfm_iq(FS, 0.5, OFFSET)
    path = _write_capture(tmp_path, iq)
    out = tmp_path / "a.wav"
    dump = tmp_path / "d.cf32"
    plot = tmp_path / "stages.png"
    cfg = ProcessingConfig(
        in_path=path,
        target_freq=CENTER + OFFSET,
        output_path=out,
        dump_iq_path=dump,
        plot_stages_path=plot,
    )
    result = ProcessingPipeline(cfg).run()
    raw = np.fromfile(dump, dtype=np.float32)
    assert raw.size == 2 * (-(-iq.size // result.decimation))
    assert plot.exists() and plot.stat().st_size > 10_000


def test_preview_and_probe_only(tmp_path):
    iq = make_nfm_iq(FS, 1.0, OFFSET)
    path = _write_capture(tmp_path, iq)
    out = tmp_path / "p.wav"
    cfg = ProcessingConfig(
        in_path=path, target_freq=CENTER + OFFSET, output_path=out, max_input_seconds=0.3
    )
    ProcessingPipeline(cfg).run()
    data, _ = read_wav(out)
    assert abs(data.shape[0] - 0.3 * 48_000) < 400

    probe_cfg = ProcessingConfig(in_path=path, target_freq=CENTER + OFFSET, probe_only=True)
    result = ProcessingPipeline(probe_cfg).run()
    assert result.audio_peak == 0.0
    assert result.decimation >= 1


def test_multi_target_batching(tmp_path):
    f1, f2 = CENTER + OFFSET, CENTER - 40_000.0
    iq = make_nfm_iq(FS, 0.5, OFFSET) + make_nfm_iq(
        FS, 0.5, -40_000.0, audio_freq=700.0, seed=9
    )
    path = _write_capture(tmp_path, (iq / 2).astype(np.complex64))
    out = tmp_path / "multi.wav"
    cfg = ProcessingConfig(
        in_path=path,
        target_freq=f1,
        extra_target_freqs=[f2],
        output_path=out,
        mix_sign_override=1,
    )
    result = ProcessingPipeline(cfg).run()
    assert len(result.output_paths) == 2
    assert result.output_paths[0].name == f"multi_{int(f1)}.wav"
    assert result.output_paths[1].name == f"multi_{int(f2)}.wav"
    for p, peak in zip(result.output_paths, result.audio_peaks):
        data, rate = read_wav(p)
        assert rate == 48_000 and data.shape[0] > 20_000
        assert peak > 0.01


class _CancelOnFirstAdvance(ProgressSink):
    def __init__(self):
        self._cb = None

    def start(self, phases, *, overall_total):
        pass

    def advance(self, phase, delta, *, overall_completed, overall_total):
        if self._cb:
            self._cb()

    def status(self, message):
        pass

    def close(self):
        pass

    def cancel(self):
        pass

    def set_cancel_callback(self, callback):
        self._cb = callback


def test_cancellation_removes_partial_output(tmp_path):
    iq = make_nfm_iq(FS, 1.0, OFFSET)
    path = _write_capture(tmp_path, iq)
    out = tmp_path / "c.wav"
    cfg = ProcessingConfig(
        in_path=path, target_freq=CENTER + OFFSET, output_path=out, chunk_size=32_768
    )
    pipeline = ProcessingPipeline(cfg)
    with pytest.raises(ProcessingCancelled):
        pipeline.run(_CancelOnFirstAdvance())
    assert not out.exists()


def test_cancellation_under_overlapped_schedule(tmp_path, monkeypatch):
    """Cooperative cancel mid-run must clean partial outputs identically
    under the overlapped hot-loop schedule (the drain point moves after
    the dispatches, so the cleanup path crosses a pending flush)."""
    monkeypatch.setenv("IQ2A_OVERLAP", "1")
    monkeypatch.setenv("IQ2A_SUPER", "2")
    monkeypatch.setenv("IQ2A_ACC", "4")
    iq = make_nfm_iq(FS, 1.0, OFFSET)
    path = _write_capture(tmp_path, iq)
    out = tmp_path / "c.wav"
    cfg = ProcessingConfig(
        in_path=path, target_freq=CENTER + OFFSET, output_path=out, chunk_size=32_768
    )
    pipeline = ProcessingPipeline(cfg)
    with pytest.raises(ProcessingCancelled):
        pipeline.run(_CancelOnFirstAdvance())
    assert not out.exists()


def test_preview_under_overlapped_schedule(tmp_path, monkeypatch):
    """--preview (max_input_seconds) byte-identical across schedules."""
    iq = make_nfm_iq(FS, 1.3, OFFSET)
    path = _write_capture(tmp_path, iq)
    monkeypatch.setenv("IQ2A_SUPER", "2")
    monkeypatch.setenv("IQ2A_ACC", "4")
    outs = {}
    for label, env in (("phased", "0"), ("overlap", "1")):
        monkeypatch.setenv("IQ2A_OVERLAP", env)
        out = tmp_path / f"p_{label}.wav"
        cfg = ProcessingConfig(
            in_path=path,
            target_freq=CENTER + OFFSET,
            output_path=out,
            chunk_size=32_768,
            max_input_seconds=0.6,
            mix_sign_override=1,
        )
        ProcessingPipeline(cfg).run()
        outs[label] = read_wav(out)[0][:, 0]
    assert np.array_equal(outs["phased"], outs["overlap"])


def test_agc_off_changes_ssb_output(tmp_path):
    iq = make_tone_iq(FS, 0.5, OFFSET + 1_000.0, amplitude=0.1)
    path = _write_capture(tmp_path, iq)
    outs = []
    for agc in (True, False):
        out = tmp_path / f"ssb_{agc}.wav"
        cfg = ProcessingConfig(
            in_path=path,
            target_freq=CENTER + OFFSET,
            demod_mode="usb",
            agc_enabled=agc,
            output_path=out,
        )
        ProcessingPipeline(cfg).run()
        outs.append(read_wav(out)[0][:, 0])
    rms_on = np.sqrt(np.mean(outs[0][10_000:] ** 2))
    rms_off = np.sqrt(np.mean(outs[1][10_000:] ** 2))
    assert rms_on > 2.0 * rms_off  # AGC pulls the quiet tone toward -12 dBFS


def test_fft_channelizer_matches_conv(tmp_path, monkeypatch):
    """IQ2A_CHANNELIZER=fft end-to-end audio must match the conv default
    (VERDICT round-1 item 9: osfir wired as a selectable backend)."""
    iq = make_nfm_iq(FS, 0.6, OFFSET)
    path = _write_capture(tmp_path, iq)
    outs = {}
    for label in ("conv", "fft"):
        monkeypatch.setenv("IQ2A_CHANNELIZER", label)
        out = tmp_path / f"ch_{label}.wav"
        cfg = ProcessingConfig(
            in_path=path,
            target_freq=CENTER + OFFSET,
            output_path=out,
            chunk_size=32_768,
            mix_sign_override=1,
        )
        ProcessingPipeline(cfg).run()
        outs[label] = read_wav(out)[0][:, 0].astype(np.float64)
    monkeypatch.delenv("IQ2A_CHANNELIZER")
    assert outs["conv"].shape == outs["fft"].shape
    assert error_db(outs["fft"], outs["conv"]) < -60.0


@pytest.mark.parametrize("order", ["qi", "iq_inv", "qi_inv"])
def test_iq_order_end_to_end(tmp_path, order):
    """Full-pipeline IQ-order handling: a capture stored in each alternate
    channel convention, demodulated with the matching --iq-order, must
    reproduce the canonical run's audio.  The conventions now live in the
    interleaved channelizer taps (ops/ddc.py::interleave_kernel), so this
    guards the end-to-end wiring, not just the op."""
    iq = make_nfm_iq(FS, 0.5, OFFSET)
    i, q = iq.real.copy(), iq.imag.copy()
    if order.endswith("_inv"):
        q = -q
    cols = np.column_stack([i, q] if order.startswith("iq") else [q, i])
    path = tmp_path / f"baseband_{int(CENTER)}Hz_{order}.wav"
    write_stereo_wav(path, cols.astype(np.float32), int(FS), codec="pcm_f32le")
    out = tmp_path / f"audio_{order}.wav"
    cfg = ProcessingConfig(
        in_path=path,
        target_freq=CENTER + OFFSET,
        demod_mode="nfm",
        output_path=out,
        iq_order=order,
    )
    ProcessingPipeline(cfg).run()
    got, rate = read_wav(out)
    got = got[:, 0]
    assert rate == 48_000

    base = _write_capture(tmp_path, iq, codec="pcm_f32le")
    out_ref = tmp_path / "audio_canonical.wav"
    ProcessingPipeline(
        ProcessingConfig(
            in_path=base,
            target_freq=CENTER + OFFSET,
            demod_mode="nfm",
            output_path=out_ref,
        )
    ).run()
    ref, _ = read_wav(out_ref)
    ref = ref[:, 0]
    n = min(got.size, ref.size)
    assert error_db(got[:n], ref[:n]) < -80.0


def test_sync_fetch_knob_equivalence(tmp_path, monkeypatch):
    """IQ2A_SYNC_FETCH=1 (skip the async accumulator-fetch start) must not
    change any output byte — it only reroutes the window flush D2H."""
    iq = make_nfm_iq(FS, 0.5, OFFSET)
    path = _write_capture(tmp_path, iq, codec="pcm_f32le")

    def run(tag):
        out = tmp_path / f"audio_{tag}.wav"
        ProcessingPipeline(
            ProcessingConfig(
                in_path=path,
                target_freq=CENTER + OFFSET,
                demod_mode="nfm",
                output_path=out,
            )
        ).run()
        audio, _ = read_wav(out)
        return audio[:, 0]

    base = run("async")
    monkeypatch.setenv("IQ2A_SYNC_FETCH", "1")
    synced = run("sync")
    np.testing.assert_array_equal(base, synced)


def test_channelizer_auto_selection(monkeypatch):
    """On CPU (complex/FFT-capable) the FFT bank is auto-selected (~4x
    faster end-to-end, measured); stage-snapshot runs and explicit
    IQ2A_CHANNELIZER pins keep the conv path; non-CPU backends default to
    conv (minimal-backend safe, Pallas-eligible)."""
    from iq_to_audio_tpu.demod import create_decoder
    from iq_to_audio_tpu.ops.ddc import DDCPlan, bandpass_kernel
    from iq_to_audio_tpu.ops.nco import nco_increment_fixed
    from iq_to_audio_tpu.pipeline import step as step_mod

    decim, fs_ch = compute_decimation(FS, 96_000.0)
    taps = design_channel_filter(FS, 12_500.0, decim)
    ddc_plan = DDCPlan.create(len(taps), decim, target_chunk=1 << 15)
    decoder = create_decoder("nfm", deemph_us=300.0, agc_enabled=True)
    decoder.setup(fs_ch)
    inc = nco_increment_fixed(OFFSET, FS)

    def build(**kw):
        return step_mod.build_chunk_step(
            ddc_plan=ddc_plan, rs_plan=None, rs_kernel_np=None,
            ddc_kernel_np=bandpass_kernel(taps, [inc]), incs_fixed=[inc],
            codec="pcm_s16le", iq_order="iq", decoder=decoder,
            pass_through=False, dump_iq=False, **kw,
        )

    monkeypatch.delenv("IQ2A_CHANNELIZER", raising=False)
    assert build().channelizer == "fft"            # CPU default
    assert build(want_stages=True).channelizer == "conv"
    monkeypatch.setenv("IQ2A_CHANNELIZER", "conv")
    assert build().channelizer == "conv"           # explicit pin wins
    monkeypatch.setenv("IQ2A_CHANNELIZER", "fft")
    assert build(want_stages=True).channelizer == "fft"  # pin outranks auto


def test_usb_lsb_share_compiled_executable():
    """Sideband is excluded from the decoder cache key: process() is
    sideband-invariant, so usb and lsb must not recompile the chunk step."""
    from iq_to_audio_tpu.demod import create_decoder

    usb = create_decoder("usb", deemph_us=300.0, agc_enabled=True)
    lsb = create_decoder("lsb", deemph_us=300.0, agc_enabled=True)
    assert usb.cache_key() == lsb.cache_key()
    assert hash(usb) == hash(lsb) and usb == lsb
    # but different parameters still split executables
    off = create_decoder("usb", deemph_us=300.0, agc_enabled=False)
    assert usb.cache_key() != off.cache_key()


def test_preclip_peak_survives_window_double_buffering(tmp_path, monkeypatch):
    """The reported audio peak must be the PRE-clip amplitude even when the
    clipper engages and the capture spans several accumulation windows
    under the overlapped schedule: the running peak rides the donated
    stream state (step.py), not the double-buffered window accumulators,
    so no window parity can lose it."""
    fs = FS
    seconds = 1.3
    t = np.arange(int(fs * seconds)) / fs
    # 30 kHz deviation at 96 kHz channel rate -> discriminator output
    # amplitude ~2*pi*30e3/96.15e3 = 1.96, far past the +-0.99 clipper
    phase = 2 * np.pi * np.cumsum(30_000.0 / fs * np.sin(2 * np.pi * 400.0 * t))
    iq = 0.9 * np.exp(1j * (2 * np.pi * OFFSET * t + phase)).astype(np.complex64)
    path = _write_capture(tmp_path, iq)
    monkeypatch.setenv("IQ2A_SUPER", "2")
    monkeypatch.setenv("IQ2A_ACC", "4")  # ~3 windows -> both buffers cycle
    monkeypatch.setenv("IQ2A_OVERLAP", "1")
    out = tmp_path / "clipped.wav"
    cfg = ProcessingConfig(
        in_path=path,
        target_freq=CENTER + OFFSET,
        output_path=out,
        chunk_size=32_768,
        mix_sign_override=1,
        deemph_us=1.0,  # keep the deviation amplitude (no 300 us rolloff)
    )
    result = ProcessingPipeline(cfg).run()
    # the written payload is clipped...
    audio, _sr = read_wav(out)
    assert np.abs(audio[:, 0]).max() <= 0.9901
    # ...but the reported peak is the device-carried pre-clip amplitude
    assert result.audio_peak > 1.2, result.audio_peak


def test_dump_iq_identical_across_schedules_and_windows(tmp_path, monkeypatch):
    """--dump-iq across several accumulation windows: the donated iq
    accumulators recycle between window buffers, and both hot-loop
    schedules must produce byte-identical cf32 dumps."""
    iq = make_nfm_iq(FS, 1.3, OFFSET)
    path = _write_capture(tmp_path, iq)
    monkeypatch.setenv("IQ2A_SUPER", "2")
    monkeypatch.setenv("IQ2A_ACC", "4")
    dumps = {}
    for label, env in (("phased", "0"), ("overlap", "1")):
        monkeypatch.setenv("IQ2A_OVERLAP", env)
        out = tmp_path / f"a_{label}.wav"
        dump = tmp_path / f"d_{label}.cf32"
        cfg = ProcessingConfig(
            in_path=path,
            target_freq=CENTER + OFFSET,
            output_path=out,
            dump_iq_path=dump,
            chunk_size=32_768,
            mix_sign_override=1,
        )
        ProcessingPipeline(cfg).run()
        dumps[label] = dump.read_bytes()
    assert dumps["phased"] == dumps["overlap"]
    assert len(dumps["phased"]) == 8 * (-(-iq.size // 3))  # decim 3 at 250k
