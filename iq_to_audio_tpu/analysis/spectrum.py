"""PSD and bounded-memory streaming waterfall.

Same math as the reference (reference ``spectrum.py``): Hann window,
``10*log10(|X|^2 / (N*fs*win_power))`` scaling, fftshift, hop = nfft/4
sliding windows with pending-tail carry, and a pairwise time-averaging
aggregator that caps the number of waterfall slices.

The FFTs run through a pluggable backend: NumPy (default — snapshot sizes
are small) or JAX for device-accelerated batched sweeps over large captures
(``backend="jax"`` batches every window of a chunk into one device FFT).
"""

from __future__ import annotations

import logging
from collections.abc import Iterable, Iterator
from dataclasses import dataclass

import numpy as np

LOG = logging.getLogger(__name__)

_EPS = 1e-18


def compute_psd(
    samples: np.ndarray,
    sample_rate: float,
    nfft: int = 1 << 18,
    *,
    fft_workers: int | None = None,  # accepted for parity; unused
    backend: str = "numpy",
) -> tuple[np.ndarray, np.ndarray]:
    """Single-shot PSD (dBFS/Hz) of complex samples."""
    if samples.size == 0:
        raise ValueError("Cannot compute PSD for an empty signal.")
    use = samples
    if use.size > nfft:
        use = use[:nfft]
    window = np.hanning(use.size).astype(np.float64)
    win_power = np.sum(window**2) / use.size
    windowed = np.asarray(use, dtype=np.complex128) * window
    spectrum = _fft(windowed, nfft, backend)
    spectrum = np.fft.fftshift(spectrum)
    freqs = np.fft.fftshift(np.fft.fftfreq(nfft, d=1.0 / sample_rate)).astype(np.float64)
    scale = (use.size * sample_rate * win_power) + _EPS
    psd = spectrum * np.conj(spectrum) / scale
    psd_db = 10.0 * np.log10(np.abs(psd) + _EPS)
    return freqs, psd_db.astype(np.float64)


def _fft(x: np.ndarray, nfft: int, backend: str) -> np.ndarray:
    if backend == "jax":
        import jax.numpy as jnp

        if x.shape[-1] < nfft:
            pad = [(0, 0)] * (x.ndim - 1) + [(0, nfft - x.shape[-1])]
            x = np.pad(x, pad)
        return np.asarray(jnp.fft.fft(jnp.asarray(x, dtype=jnp.complex64), axis=-1))
    from scipy.fft import fft as sfft

    return np.asarray(sfft(x, n=nfft))


@dataclass
class WaterfallResult:
    freqs: np.ndarray
    times: np.ndarray
    matrix: np.ndarray


def streaming_waterfall(
    chunks: Iterable[np.ndarray | None],
    sample_rate: float,
    *,
    nfft: int,
    hop: int | None = None,
    max_slices: int = 400,
    fft_workers: int | None = None,  # parity; unused
    backend: str = "numpy",
) -> tuple[np.ndarray, np.ndarray, WaterfallResult, int]:
    """Averaged PSD + capped waterfall from a stream of sample blocks.

    Returns ``(freqs, avg_psd_db, WaterfallResult, frames)``.
    """
    hop = max(1, hop or nfft // 4)
    window = np.hanning(nfft).astype(np.float64)
    win_power = np.sum(window**2) / nfft
    freqs = np.fft.fftshift(np.fft.fftfreq(nfft, d=1.0 / sample_rate)).astype(np.float64)
    scale = (nfft * sample_rate * win_power) + _EPS
    aggregator = _WaterfallAggregator(max_slices=max_slices)
    psd_sum: np.ndarray | None = None
    frames = 0

    # batch all windows that start inside one incoming block into a single
    # (num_windows, nfft) FFT — one device call per block with backend="jax"
    for start_index, windows in _sliding_window_batches(chunks, nfft=nfft, hop=hop):
        windowed = windows.astype(np.complex128) * window
        spectra = _fft(windowed, nfft, backend)
        spectra = np.fft.fftshift(np.asarray(spectra), axes=-1)
        psd = np.abs(spectra * np.conj(spectra)) / scale
        psd_db = 10.0 * np.log10(psd + _EPS)
        for k in range(psd_db.shape[0]):
            if psd_sum is None:
                psd_sum = psd_db[k].astype(np.float64, copy=True)
            else:
                psd_sum += psd_db[k]
            aggregator.add(psd_db[k], (start_index + k * hop) / sample_rate)
            frames += 1
        if frames and frames % 200 == 0:
            LOG.debug("Accumulated %d FFT frames for waterfall preview.", frames)

    if frames == 0 or psd_sum is None:
        raise ValueError("Input did not contain enough samples for one FFT frame.")

    avg_psd = psd_sum / frames
    times, matrix = aggregator.finalize()
    waterfall = WaterfallResult(freqs=freqs.copy(), times=times, matrix=matrix)
    return freqs.copy(), avg_psd.astype(np.float64), waterfall, frames


def _sliding_window_batches(
    chunks: Iterable[np.ndarray | None],
    *,
    nfft: int,
    hop: int,
) -> Iterator[tuple[int, np.ndarray]]:
    """Yield (start_index, (num_windows, nfft)) batches with tail carry."""
    pending = np.empty(0, dtype=np.complex64)
    offset = 0
    for chunk in chunks:
        if chunk is None:
            continue
        block = np.asarray(chunk, dtype=np.complex64)
        if block.size == 0:
            continue
        if pending.size:
            block = np.concatenate((pending, block))
            offset -= pending.size
        total = block.size
        if total < nfft:
            pending = block
            offset += total
            continue
        num = (total - nfft) // hop + 1
        idx = np.arange(num)[:, None] * hop + np.arange(nfft)[None, :]
        yield offset, block[idx]
        consumed = num * hop
        pending = block[consumed:]
        offset += total - pending.size
        if pending.size > nfft:
            pending = pending[-nfft:]


class _WaterfallAggregator:
    """Bounded-memory accumulator: pairwise time-averages slices when the
    count exceeds ``max_slices`` (reference ``spectrum.py:172-208``)."""

    def __init__(self, *, max_slices: int):
        self.max_slices = max(1, int(max_slices))
        self._slices: list[np.ndarray] = []
        self._times: list[float] = []

    def add(self, psd: np.ndarray, time_seconds: float) -> None:
        self._slices.append(np.asarray(psd, dtype=np.float32))
        self._times.append(float(time_seconds))
        self._maybe_reduce()

    def finalize(self) -> tuple[np.ndarray, np.ndarray]:
        if not self._slices:
            return np.empty(0, dtype=np.float32), np.empty((0, 0), dtype=np.float32)
        matrix = np.stack(self._slices, axis=0).astype(np.float32, copy=False)
        times = np.asarray(self._times, dtype=np.float32)
        return times, matrix

    def _maybe_reduce(self) -> None:
        while len(self._slices) > self.max_slices:
            new_slices: list[np.ndarray] = []
            new_times: list[float] = []
            for idx in range(0, len(self._slices), 2):
                first = self._slices[idx]
                if idx + 1 < len(self._slices):
                    second = self._slices[idx + 1]
                    avg = (first.astype(np.float64) + second.astype(np.float64)) / 2.0
                    new_slices.append(avg.astype(np.float32))
                else:
                    new_slices.append(first)
                new_times.append(self._times[idx])
            self._slices = new_slices
            self._times = new_times
