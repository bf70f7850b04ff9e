"""Streaming overlap-save FFT FIR filtering fused with decimation.

TPU-native redesign of the reference's ``OverlapSaveFIR`` + ``Decimator``
(reference ``processing.py:300-360``):

* All FFT frames of a chunk are batched into a single ``(K, F)`` complex64
  FFT instead of a Python ``while`` loop over blocks — XLA maps the batch
  straight onto the chip.
* The frame hop ``B`` is chosen as the largest multiple of the decimation
  factor ``D`` that fits the FFT (``B = D * ((F - L + 1) // D)``), so every
  chunk produces exactly ``N/D`` channel samples with a phase-0 stride:
  **static shapes** under ``jit``, and the decimator needs no carried offset
  (the reference carries one at ``processing.py:357-359`` only because its
  chunk sizes are not decimation-aligned).
* The reference wastes (taps-1) samples of every FFT frame by fixing the hop
  to ``filter_block``; we use the maximal valid hop, ~25-50% fewer FFTs for
  typical narrowband filters.

Chunked output is bit-identical to whole-signal filtering because the
(L-1)-sample input tail is carried between chunks, exactly like the
reference's ``state`` (``processing.py:341-345``).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

import jax.numpy as jnp


def _next_pow2(n: int) -> int:
    return 1 << max(0, math.ceil(math.log2(max(1, n))))


@dataclass(frozen=True)
class OverlapSavePlan:
    """Static (hashable) geometry of one streaming filter configuration."""

    num_taps: int  # L
    fft_size: int  # F (power of two)
    block: int  # B: hop per frame, multiple of decimation
    decimation: int  # D
    num_frames: int  # K frames per chunk
    chunk_size: int  # N = K * B input samples per chunk

    @property
    def overlap(self) -> int:
        return self.num_taps - 1

    @property
    def out_size(self) -> int:
        return self.chunk_size // self.decimation

    @staticmethod
    def create(
        num_taps: int,
        decimation: int,
        *,
        target_chunk: int = 1 << 22,
        fft_size: int | None = None,
        max_chunk: int = 1 << 22,
    ) -> "OverlapSavePlan":
        """Pick FFT size / hop / frame count for a filter+decimation pair.

        ``fft_size=None`` auto-selects the power-of-two F minimising FFT work
        per output sample, ``F*log2(F) / (F - L + 1)``, within VMEM-friendly
        bounds.  ``target_chunk`` requests roughly that many input samples
        per chunk (reference auto-tunes to 0.25-0.5 s, capped 4Mi samples,
        ``processing.py:65-81``).
        """
        L = int(num_taps)
        D = max(1, int(decimation))
        if fft_size is not None:
            F = _next_pow2(fft_size)
            if F < _next_pow2(L - 1 + D):
                F = _next_pow2(L - 1 + D)
        else:
            lo = _next_pow2(max(2 * L, 4096, L - 1 + D))
            hi = max(lo, 1 << 18)
            best, best_cost = lo, float("inf")
            F = lo
            while F <= hi:
                b = D * ((F - L + 1) // D)
                if b >= 1:
                    cost = F * math.log2(F) / b
                    if cost < best_cost:
                        best, best_cost = F, cost
                F <<= 1
            F = best
        B = D * ((F - L + 1) // D)
        while B < 1:
            F <<= 1
            B = D * ((F - L + 1) // D)
        K = max(1, min(max_chunk // B, int(round(target_chunk / B)) or 1))
        return OverlapSavePlan(
            num_taps=L,
            fft_size=F,
            block=B,
            decimation=D,
            num_frames=K,
            chunk_size=K * B,
        )

    @staticmethod
    def for_chunk(
        num_taps: int,
        decimation: int,
        chunk_size: int,
        *,
        fft_size: int | None = None,
    ) -> "OverlapSavePlan":
        """Frame geometry for an EXTERNALLY fixed chunk size (e.g. one shared
        with the conv-DDC planner).  ``chunk_size`` must be a multiple of the
        decimation; the final frame zero-pads past the chunk and the excess
        outputs are sliced away (``K*B >= chunk_size``)."""
        L = int(num_taps)
        D = max(1, int(decimation))
        N = int(chunk_size)
        if N % D:
            raise ValueError(f"chunk {N} must be a multiple of decimation {D}")
        base = OverlapSavePlan.create(
            L, D, target_chunk=N, fft_size=fft_size, max_chunk=max(N, 1 << 22)
        )
        B = base.block
        K = -(-N // B)
        return OverlapSavePlan(
            num_taps=L,
            fft_size=base.fft_size,
            block=B,
            decimation=D,
            num_frames=K,
            chunk_size=N,
        )


def taps_fft(taps: np.ndarray, fft_size: int) -> np.ndarray:
    """Host-side (float64) frequency response of the padded taps."""
    padded = np.zeros(fft_size, dtype=np.float64)
    padded[: len(taps)] = np.asarray(taps, dtype=np.float64)
    return np.fft.fft(padded).astype(np.complex64)


def os_fir_decimate(
    plan: OverlapSavePlan,
    h_fft: jnp.ndarray,
    x: jnp.ndarray,
    tail: jnp.ndarray,
    *,
    return_filtered: bool = False,
):
    """Filter + decimate one chunk.

    Parameters
    ----------
    h_fft: complex64 ``(F,)`` — FFT of zero-padded taps.
    x: complex64 ``(..., N)`` — chunk (N = plan.chunk_size).
    tail: complex64 ``(..., L-1)`` — carried input tail.

    Returns ``(decimated, new_tail)`` with ``decimated`` of shape
    ``(..., N // D)``; with ``return_filtered=True`` additionally returns the
    full-rate filtered chunk (used for stage snapshots only).
    """
    L, F, B, D, K, N = (
        plan.num_taps,
        plan.fft_size,
        plan.block,
        plan.decimation,
        plan.num_frames,
        plan.chunk_size,
    )
    assert x.shape[-1] == N, (x.shape, N)
    x_ext = jnp.concatenate([tail, x], axis=-1)
    pad = (K - 1) * B + F - x_ext.shape[-1]
    if pad > 0:
        widths = [(0, 0)] * (x_ext.ndim - 1) + [(0, pad)]
        x_ext = jnp.pad(x_ext, widths)
    idx = jnp.arange(K, dtype=jnp.int32)[:, None] * B + jnp.arange(F, dtype=jnp.int32)[None, :]
    frames = jnp.take(x_ext, idx, axis=-1)  # (..., K, F)
    spec = jnp.fft.fft(frames, axis=-1)
    y = jnp.fft.ifft(spec * h_fft, axis=-1)[..., L - 1 : L - 1 + B]
    y = y.reshape(*x.shape[:-1], K * B)[..., :N].astype(jnp.complex64)
    dec = y[..., ::D]
    new_tail = x[..., N - (L - 1) :] if L > 1 else x[..., :0]
    if return_filtered:
        return dec, new_tail, y
    return dec, new_tail


def os_fir_bank(
    plan: OverlapSavePlan,
    h_bank: jnp.ndarray,
    x: jnp.ndarray,
    tail: jnp.ndarray,
):
    """Filter ONE stream through a bank of C frequency responses.

    The input spectrum is computed once (``K`` frames) and multiplied by all
    ``C`` responses — the FFT-channelizer analogue of the conv-DDC's shared
    input pass (``ddc.py``: "up to five channels ride the conv's
    output-feature axis").

    Parameters
    ----------
    h_bank: complex64 ``(C, F)`` — FFTs of the per-channel (bandpass) taps.
    x: complex64 ``(N,)``; tail: complex64 ``(L-1,)``.

    Returns ``(dec, new_tail)`` with ``dec`` of shape ``(C, N // D)``.
    """
    L, F, B, D, K, N = (
        plan.num_taps,
        plan.fft_size,
        plan.block,
        plan.decimation,
        plan.num_frames,
        plan.chunk_size,
    )
    assert x.shape == (N,), (x.shape, N)
    x_ext = jnp.concatenate([tail, x])
    pad = (K - 1) * B + F - x_ext.shape[-1]
    if pad > 0:
        x_ext = jnp.pad(x_ext, (0, pad))
    idx = (
        jnp.arange(K, dtype=jnp.int32)[:, None] * B
        + jnp.arange(F, dtype=jnp.int32)[None, :]
    )
    frames = jnp.take(x_ext, idx, axis=-1)  # (K, F)
    spec = jnp.fft.fft(frames, axis=-1)
    prod = spec[None, :, :] * h_bank[:, None, :]  # (C, K, F)
    y = jnp.fft.ifft(prod, axis=-1)[..., L - 1 : L - 1 + B]  # (C, K, B)
    y = y.reshape(h_bank.shape[0], K * B)[:, :N]
    dec = y[:, ::D].astype(jnp.complex64)
    new_tail = x[N - (L - 1) :] if L > 1 else x[:0]
    return dec, new_tail
