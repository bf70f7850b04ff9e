"""Spectral analysis: one-shot PSD and a bounded-memory waterfall.

Numerically matches the reference implementation (reference
``spectrum.py``): Hann window, ``10*log10(|X|^2 / (N*fs*win_power))``
scaling, fftshifted bins, hop = nfft/4 sliding windows with a carried
tail between blocks, and pairwise time-averaging so the waterfall never
holds more than ``max_slices`` rows.

FFTs go through a pluggable backend. The default is NumPy (pocketfft) —
snapshot sizes are small and host FFTs avoid a device round-trip — while
``backend="jax"`` batches every window of a block into one device FFT
for accelerated sweeps over large captures (on accelerators whose
runtime supports complex FFT HLOs). ``backend="matmul"`` is the
TPU-native route for runtimes without an FFT HLO or complex dtype (the
axon relay): each block's window batch becomes four real f32 matmuls
against a cached cos/sin DFT basis, which XLA tiles straight onto the
MXU (capped at nfft=4096; larger transforms fall back to the host FFT).
"""

from __future__ import annotations

import logging
from collections.abc import Iterable, Iterator
from dataclasses import dataclass

import numpy as np

LOG = logging.getLogger(__name__)

_EPS = 1e-18


@dataclass
class WaterfallResult:
    freqs: np.ndarray
    times: np.ndarray
    matrix: np.ndarray


# matmul-DFT basis cache and the largest transform it is allowed to build
# (an nfft x nfft f32 cos/sin pair; 4096 -> 2 x 64 MB is the sane ceiling,
# larger transforms silently fall back to the host FFT)
_DFT_BASIS_MAX = 4096
_dft_cache: dict[int, tuple] = {}


def _dft_basis(nfft: int):
    """(cos, sin) of the symmetric DFT matrix W[n,k] = exp(-2πi·nk/N),
    cached as DEVICE arrays so streaming callers upload the basis once per
    nfft, not once per block."""
    hit = _dft_cache.get(nfft)
    if hit is None:
        import jax.numpy as jnp

        k = np.arange(nfft, dtype=np.float64)
        # reduce n·k mod N before scaling so the trig arguments stay small
        ang = (-2.0 * np.pi / nfft) * (np.outer(k, k) % nfft)
        hit = (
            jnp.asarray(np.cos(ang).astype(np.float32)),
            jnp.asarray(np.sin(ang).astype(np.float32)),
        )
        _dft_cache[nfft] = hit
    return hit


_dft_apply = None  # module-level so jax's jit cache persists across blocks


def _dft_matmul(x: np.ndarray, nfft: int) -> np.ndarray:
    """DFT along the last axis as four real matmuls on the default jax
    device. The TPU path the axon runtime can actually compile: it has no
    FFT HLO and no complex dtype, but (num_windows, nfft) @ (nfft, nfft)
    f32 matmuls land straight on the MXU.
    """
    import jax
    import jax.numpy as jnp
    from jax import lax

    cos_b, sin_b = _dft_basis(nfft)

    global _dft_apply
    if _dft_apply is None:
        # defined ONCE: a fresh closure per call would miss jax's jit cache
        # (keyed on the function object) and retrace every block
        @jax.jit
        def _apply(xr, xi, c, s):
            hi = lax.Precision.HIGHEST
            # (xr + j·xi) @ (c + j·s), expanded into real arithmetic
            re = jnp.dot(xr, c, precision=hi) - jnp.dot(xi, s, precision=hi)
            im = jnp.dot(xr, s, precision=hi) + jnp.dot(xi, c, precision=hi)
            return re, im

        _dft_apply = _apply

    re, im = _dft_apply(
        jnp.asarray(np.real(x), dtype=jnp.float32),
        jnp.asarray(np.imag(x), dtype=jnp.float32),
        cos_b,
        sin_b,
    )
    return np.asarray(re).astype(np.float64) + 1j * np.asarray(im).astype(np.float64)


def _run_fft(x: np.ndarray, nfft: int, backend: str) -> np.ndarray:
    """FFT along the last axis, zero-padding to nfft when needed."""
    if backend in ("jax", "matmul"):
        short = nfft - x.shape[-1]
        if short > 0:
            x = np.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, short)])
        if backend == "matmul":
            if nfft > _DFT_BASIS_MAX:
                return np.fft.fft(x, n=nfft)
            return _dft_matmul(x, nfft)
        import jax.numpy as jnp

        return np.asarray(jnp.fft.fft(jnp.asarray(x, dtype=jnp.complex64), axis=-1))
    return np.fft.fft(x, n=nfft)


def _hann_scale(length: int, sample_rate: float) -> tuple[np.ndarray, float]:
    """Hann window of ``length`` and the matching PSD denominator."""
    window = np.hanning(length).astype(np.float64)
    win_power = np.sum(window**2) / length
    return window, length * sample_rate * win_power + _EPS


def _psd_db(spectra: np.ndarray, scale: float) -> np.ndarray:
    shifted = np.fft.fftshift(np.asarray(spectra), axes=-1)
    # |X|^2 as real^2 + imag^2: no complex product / magnitude temporaries
    # on the streaming-waterfall hot path
    power = (np.square(shifted.real) + np.square(shifted.imag)) / scale
    return 10.0 * np.log10(power + _EPS)


def _bin_freqs(nfft: int, sample_rate: float) -> np.ndarray:
    return np.fft.fftshift(np.fft.fftfreq(nfft, d=1.0 / sample_rate)).astype(np.float64)


def compute_psd(
    samples: np.ndarray,
    sample_rate: float,
    nfft: int = 1 << 18,
    *,
    fft_workers: int | None = None,  # accepted for parity; unused
    backend: str = "numpy",
) -> tuple[np.ndarray, np.ndarray]:
    """One-shot PSD (dBFS/Hz) of up to ``nfft`` complex samples."""
    if samples.size == 0:
        raise ValueError("Cannot compute PSD for an empty signal.")
    use = samples[:nfft] if samples.size > nfft else samples
    window, scale = _hann_scale(use.size, sample_rate)
    spectra = _run_fft(np.asarray(use, dtype=np.complex128) * window, nfft, backend)
    return _bin_freqs(nfft, sample_rate), _psd_db(spectra, scale).astype(np.float64)


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
    """Averaged PSD plus capped waterfall over a stream of sample blocks.

    Returns ``(freqs, avg_psd_db, WaterfallResult, frames)``; raises if the
    stream is shorter than one FFT frame.
    """
    hop = max(1, hop or nfft // 4)
    window, scale = _hann_scale(nfft, sample_rate)
    freqs = _bin_freqs(nfft, sample_rate)
    store = _SliceStore(max_slices)
    running: np.ndarray | None = None
    frames = 0

    # all windows starting inside one block form a single (num, nfft) FFT
    # batch — with backend="jax" that is one device call per block
    for start, batch in _windowed_blocks(chunks, nfft=nfft, hop=hop):
        rows = _psd_db(_run_fft(batch.astype(np.complex128) * window, nfft, backend), scale)
        for k, row in enumerate(rows):
            running = row.astype(np.float64, copy=True) if running is None else running + row
            store.push(row, (start + k * hop) / sample_rate)
            frames += 1
        if frames and frames % 200 == 0:
            LOG.debug("Accumulated %d FFT frames for waterfall preview.", frames)

    if frames == 0 or running is None:
        raise ValueError("Input did not contain enough samples for one FFT frame.")

    times, matrix = store.collect()
    result = WaterfallResult(freqs=freqs.copy(), times=times, matrix=matrix)
    return freqs.copy(), (running / frames).astype(np.float64), result, frames


def _windowed_blocks(
    chunks: Iterable[np.ndarray | None],
    *,
    nfft: int,
    hop: int,
) -> Iterator[tuple[int, np.ndarray]]:
    """Yield ``(start_sample, (num_windows, nfft))`` arrays, carrying the
    unconsumed tail of each block into the next so no window is lost at
    block boundaries."""
    # invariant: ``cursor`` is the GLOBAL sample index of block[0] (and of
    # carry[0] between iterations) — each yielded window w therefore starts
    # at cursor + w*hop, which is what the waterfall time axis stamps
    carry = np.empty(0, dtype=np.complex64)
    cursor = 0
    for chunk in chunks:
        if chunk is None:
            continue
        block = np.asarray(chunk, dtype=np.complex64)
        if block.size == 0:
            continue
        if carry.size:
            block = np.concatenate((carry, block))
        if block.size < nfft:
            carry = block  # still starts at cursor
            continue
        num = (block.size - nfft) // hop + 1
        gather = np.arange(num)[:, None] * hop + np.arange(nfft)[None, :]
        yield cursor, block[gather]
        consumed = num * hop
        carry = block[consumed:]  # keeps the (nfft - hop)-sample overlap
        cursor += consumed


class _SliceStore:
    """Waterfall rows with bounded memory: once the row count passes the
    cap, adjacent pairs are averaged in time (halving the count), exactly
    like the reference aggregator (reference ``spectrum.py:172-208``)."""

    def __init__(self, max_slices: int):
        self._cap = max(1, int(max_slices))
        self._rows: list[np.ndarray] = []
        self._stamps: list[float] = []

    def push(self, psd_row: np.ndarray, t: float) -> None:
        self._rows.append(np.asarray(psd_row, dtype=np.float32))
        self._stamps.append(float(t))
        while len(self._rows) > self._cap:
            self._halve()

    def _halve(self) -> None:
        rows, stamps = self._rows, self._stamps
        kept_rows: list[np.ndarray] = []
        kept_stamps: list[float] = []
        for i in range(0, len(rows), 2):
            if i + 1 < len(rows):
                merged = (rows[i].astype(np.float64) + rows[i + 1].astype(np.float64)) / 2.0
                kept_rows.append(merged.astype(np.float32))
            else:
                kept_rows.append(rows[i])
            kept_stamps.append(stamps[i])
        self._rows, self._stamps = kept_rows, kept_stamps

    def collect(self) -> tuple[np.ndarray, np.ndarray]:
        if not self._rows:
            return np.empty(0, dtype=np.float32), np.empty((0, 0), dtype=np.float32)
        return (
            np.asarray(self._stamps, dtype=np.float32),
            np.stack(self._rows, axis=0).astype(np.float32, copy=False),
        )
