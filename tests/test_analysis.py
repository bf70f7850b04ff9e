"""Spectrum/waterfall analysis and the headless GUI worker functions."""

from __future__ import annotations

import numpy as np
import pytest

from conftest import make_tone_iq, write_wav_iq

from iq_to_audio_tpu.analysis.spectrum import compute_psd, streaming_waterfall
from iq_to_audio_tpu.interactive.state import InteractiveState
from iq_to_audio_tpu.interactive.workers import compute_full_psd, gather_snapshot
from iq_to_audio_tpu.io.formats import get_format


class TestComputePsd:
    def test_tone_peak_at_offset(self):
        fs, f = 96_000.0, 12_000.0
        iq = make_tone_iq(fs, 0.5, f, noise_std=0.001)
        freqs, psd = compute_psd(iq, fs, nfft=1 << 14)
        assert freqs.size == psd.size == 1 << 14
        peak_freq = freqs[np.argmax(psd)]
        assert abs(peak_freq - f) < fs / (1 << 14) * 2
        # tone should tower over the noise floor
        floor = np.median(psd)
        assert psd.max() - floor > 30.0

    def test_empty_raises(self):
        with pytest.raises(ValueError):
            compute_psd(np.empty(0, np.complex64), 96_000.0)

    def test_jax_backend_matches_numpy(self):
        iq = make_tone_iq(48_000.0, 0.2, 5_000.0)
        f1, p1 = compute_psd(iq, 48_000.0, nfft=4096, backend="numpy")
        f2, p2 = compute_psd(iq, 48_000.0, nfft=4096, backend="jax")
        np.testing.assert_allclose(f1, f2)
        np.testing.assert_allclose(p1, p2, atol=0.2)  # f32 vs f64 FFT

    def test_matmul_backend_matches_numpy(self):
        """The FFT-free device path (for runtimes without an FFT HLO)."""
        iq = make_tone_iq(48_000.0, 0.2, 5_000.0)
        f1, p1 = compute_psd(iq, 48_000.0, nfft=4096, backend="numpy")
        f2, p2 = compute_psd(iq, 48_000.0, nfft=4096, backend="matmul")
        np.testing.assert_allclose(f1, f2)
        # compare where the spectrum carries energy; deep-floor bins are
        # dominated by f32 rounding of near-zero power
        hot = p1 > p1.max() - 80.0
        assert hot.sum() > 100
        np.testing.assert_allclose(p1[hot], p2[hot], atol=0.3)
        assert f2[np.argmax(p2)] == f1[np.argmax(p1)]

    def test_matmul_backend_large_nfft_falls_back(self):
        """Above the basis cap the matmul backend must defer to the host
        FFT rather than materialise a multi-GB DFT matrix."""
        iq = make_tone_iq(48_000.0, 0.4, 5_000.0)
        f1, p1 = compute_psd(iq, 48_000.0, nfft=1 << 14, backend="numpy")
        f2, p2 = compute_psd(iq, 48_000.0, nfft=1 << 14, backend="matmul")
        np.testing.assert_allclose(p1, p2, atol=1e-9)


class TestWaterfall:
    def test_shapes_and_cap(self):
        fs = 96_000.0
        iq = make_tone_iq(fs, 1.0, 10_000.0)
        chunks = [iq[i : i + 8192] for i in range(0, iq.size, 8192)]
        freqs, avg, wf, frames = streaming_waterfall(
            iter(chunks), fs, nfft=2048, max_slices=40
        )
        assert freqs.size == avg.size == 2048
        assert wf.matrix.shape[0] <= 40
        assert wf.matrix.shape[1] == 2048
        assert frames > 100
        peak_freq = freqs[np.argmax(avg)]
        assert abs(peak_freq - 10_000.0) < 200.0

    def test_too_short_raises(self):
        with pytest.raises(ValueError):
            streaming_waterfall(iter([np.ones(10, np.complex64)]), 96e3, nfft=2048)

    def test_matmul_backend_waterfall(self):
        fs = 96_000.0
        iq = make_tone_iq(fs, 0.5, 10_000.0)
        chunks = [iq[i : i + 8192] for i in range(0, iq.size, 8192)]
        ref = streaming_waterfall(iter(chunks), fs, nfft=2048, max_slices=40)
        dev = streaming_waterfall(
            iter(chunks), fs, nfft=2048, max_slices=40, backend="matmul"
        )
        assert ref[3] == dev[3]
        hot = ref[1] > ref[1].max() - 80.0
        np.testing.assert_allclose(ref[1][hot], dev[1][hot], atol=0.3)

    def test_window_starts_exact_across_chunks(self):
        """Every yielded window's claimed start index must be the true
        global position of its samples, whatever the chunk boundaries —
        the old cursor accounting drifted earlier by carry.size per block
        and stamped non-monotonic waterfall times."""
        from iq_to_audio_tpu.analysis.spectrum import _windowed_blocks

        nfft, hop = 8, 2
        sig = (np.arange(100) + 1j * np.arange(100)).astype(np.complex64)
        chunks = [sig[0:20], sig[20:45], sig[45:100]]
        starts = []
        for start, batch in _windowed_blocks(iter(chunks), nfft=nfft, hop=hop):
            for k, win in enumerate(batch):
                s = start + k * hop
                starts.append(s)
                np.testing.assert_array_equal(win, sig[s : s + nfft])
        assert starts == list(range(0, starts[-1] + 1, hop))  # exact + monotonic
        assert starts[-1] == 100 - nfft  # nothing lost at the tail

    def test_tail_carry_across_chunks(self):
        """Windows spanning chunk boundaries must be produced."""
        fs = 48_000.0
        iq = make_tone_iq(fs, 0.3, 1_000.0)
        whole = streaming_waterfall(iter([iq]), fs, nfft=1024, max_slices=10_000)
        tiny = [iq[i : i + 700] for i in range(0, iq.size, 700)]
        chunked = streaming_waterfall(iter(tiny), fs, nfft=1024, max_slices=10_000)
        assert whole[3] == chunked[3]  # same frame count
        np.testing.assert_allclose(whole[1], chunked[1], atol=1e-9)


class TestSnapshotWorkers:
    def test_gather_snapshot(self, tmp_path):
        fs = 96_000.0
        iq = make_tone_iq(fs, 1.0, 20_000.0)
        path = write_wav_iq(tmp_path / "snap.wav", iq, int(fs))
        spec = get_format("wav", "pcm_s16le")
        progress = []
        snap = gather_snapshot(
            path, spec, fs, 0.5, nfft=4096, progress_cb=progress.append
        )
        assert snap.frames > 5
        assert abs(snap.seconds - 0.5) < 0.05
        assert snap.retained.size == int(fs * 0.5)
        peak_freq = snap.freqs[np.argmax(snap.psd_db)]
        assert abs(peak_freq - 20_000.0) < 100.0
        assert progress and progress[-1] == pytest.approx(1.0)

    def test_gather_snapshot_cancel(self, tmp_path):
        fs = 96_000.0
        iq = make_tone_iq(fs, 1.0, 20_000.0)
        path = write_wav_iq(tmp_path / "snap2.wav", iq, int(fs))
        spec = get_format("wav", "pcm_s16le")
        with pytest.raises(ValueError):  # cancelled before one FFT frame
            gather_snapshot(path, spec, fs, 1.0, nfft=4096, cancelled=lambda: True)

    def test_compute_full_psd(self, tmp_path):
        fs = 96_000.0
        iq = make_tone_iq(fs, 0.5, -15_000.0)
        path = write_wav_iq(tmp_path / "full.wav", iq, int(fs))
        spec = get_format("wav", "pcm_s16le")
        freqs, psd, frames = compute_full_psd(path, spec, fs, nfft=4096)
        assert frames >= 1
        peak_freq = freqs[np.argmax(psd)]
        assert abs(peak_freq + 15_000.0) < 100.0


class TestInteractiveStateConfigs:
    def test_build_configs_respects_overrides(self, tmp_path):
        from pathlib import Path

        s = InteractiveState(base_kwargs={"fs_ch_target": 48_000.0, "deemph_us": 75.0})
        s.input_path = Path(tmp_path / "x.cs16")
        s.center_freq = 433_900_000.0
        s.sample_rate_override = 2_400_000.0
        s.input_format_override = "raw-cs16"
        s.bandwidth = 25_000.0
        s.add_target(433_920_000.0)
        (cfg,) = s.build_configs()
        assert cfg.fs_ch_target == 48_000.0
        assert cfg.deemph_us == 75.0
        assert cfg.input_sample_rate == 2_400_000.0
        assert cfg.input_format == "pcm_s16le"
        assert cfg.input_container == "raw"
        assert cfg.bandwidth == 25_000.0
