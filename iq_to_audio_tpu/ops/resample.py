"""Interpolated-polyphase rational resampler (device-side, static shapes).

Replaces the reference's second ffmpeg subprocess, which resamples the
channel-rate audio to 48 kHz with swresample (reference
``processing.py:399-418``).  Design:

* The conversion ratio is the exact rational ``up/down`` between 48000 and
  the integer-rounded channel rate (the reference also rounds — ``AudioWriter``
  ``processing.py:390-391``).
* A single windowed-sinc prototype is tabulated at ``num_phases`` fractional
  offsets per input sample; per-output coefficients are linearly interpolated
  between adjacent phases (soxr-style), so arbitrary ratios need no
  giant-L polyphase bank.
* Output sample ``n`` sits at input position ``(r + n*down)/up``.  The
  integer position state ``r`` (0 <= r < down) lives on the HOST as an exact
  Python int (:meth:`ResamplePlan.out_count` / :meth:`ResamplePlan.advance`)
  and is fed to the device as a traced scalar each chunk; the host therefore
  always knows the number of valid output samples per chunk *without* a
  device sync — the device writes a fixed-capacity padded buffer (static
  shapes under ``jit``) and the host slices.
* Position arithmetic must not overflow int32 (TPU has no native int64
  here): a ``lax.scan`` over fixed-width output blocks keeps every
  intermediate bounded by ``block * down``, and ``block`` is sized so that
  bound stays inside int32 even for extreme channel rates.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np

import jax.numpy as jnp
from jax import lax

NUM_PHASES = 512
TAPS_PER_PHASE = 32
_INT32_SAFE = (1 << 31) - (1 << 24)


def _pick_block(up: int, down: int) -> int:
    block = 2048
    while block > 64 and block * down + up >= _INT32_SAFE:
        block //= 2
    return block


@dataclass(frozen=True)
class ResamplePlan:
    """Static geometry for one rational resampling configuration."""

    up: int  # output rate / gcd
    down: int  # input rate / gcd
    in_size: int  # input samples per chunk (static)
    num_phases: int = NUM_PHASES
    taps_per_phase: int = TAPS_PER_PHASE
    block: int = field(default=2048)

    @property
    def identity(self) -> bool:
        return self.up == self.down

    @property
    def out_capacity(self) -> int:
        """Padded per-chunk output size (multiple of the scan block)."""
        if self.identity:
            return self.in_size
        cap = (self.in_size * self.up + self.down - 1) // self.down + 1
        return ((cap + self.block - 1) // self.block) * self.block

    @staticmethod
    def create(input_rate: float, output_rate: float, in_size: int) -> "ResamplePlan":
        in_int = max(1, int(round(float(input_rate))))
        out_int = max(1, int(round(float(output_rate))))
        g = math.gcd(in_int, out_int)
        up, down = out_int // g, in_int // g
        return ResamplePlan(
            up=up, down=down, in_size=int(in_size), block=_pick_block(up, down)
        )

    def out_count(self, r: int, valid_in: int | None = None) -> int:
        """Exact host-side count of valid outputs for this chunk.

        Valid outputs are those whose base input index floor((r+n*down)/up)
        references a sample < ``valid_in``.
        """
        n_in = self.in_size if valid_in is None else min(valid_in, self.in_size)
        if n_in <= 0:
            return 0
        if self.identity:
            return n_in
        return max(0, (n_in * self.up - r + self.down - 1) // self.down)

    def advance(self, r: int, valid_in: int | None = None) -> int:
        """Exact host-side position-state update after one full chunk."""
        if self.identity:
            return 0
        count = self.out_count(r, valid_in)
        n_in = self.in_size if valid_in is None else min(valid_in, self.in_size)
        return r + count * self.down - n_in * self.up


def design_resampler_table(
    up: int,
    down: int,
    num_phases: int = NUM_PHASES,
    taps_per_phase: int = TAPS_PER_PHASE,
    *,
    rolloff: float = 0.9125,
    beta: float = 9.5,
) -> np.ndarray:
    """Host-side float64 windowed-sinc table, phase-normalised to unity DC.

    Table layout: ``H[j*num_phases + p]`` is tap ``j`` for fractional offset
    ``p/num_phases``; one extra entry supports linear interpolation at p==NP.
    """
    K, NP = taps_per_phase, num_phases
    n = np.arange(K * NP + 1, dtype=np.float64) / NP  # in input-sample units
    center = K / 2.0
    cutoff = rolloff * min(1.0, up / down)  # relative to input Nyquist
    h = cutoff * np.sinc(cutoff * (n - center))
    h *= np.kaiser(K * NP + 1, beta)
    # normalise each phase so sum_j H[j*NP + p] == 1 (unity DC gain)
    for p in range(NP + 1):
        idx = p + NP * np.arange(K)
        idx = idx[idx < h.size]
        s = h[idx].sum()
        if abs(s) > 1e-12:
            h[idx] /= s
    return h.astype(np.float32)


def polyphase_resample(
    plan: ResamplePlan,
    table: jnp.ndarray,
    x: jnp.ndarray,
    tail: jnp.ndarray,
    r0: jnp.ndarray,
):
    """Resample one chunk.

    Parameters
    ----------
    table: float32 ``(K*NP + 1,)`` from :func:`design_resampler_table`.
    x: float32 ``(..., in_size)`` — chunk of channel-rate audio.
    tail: float32 ``(..., K-1)`` — carried input history.
    r0: int32 scalar — host-tracked position numerator, ``0 <= r0 < down``.

    Returns ``(y, new_tail)`` with ``y`` of shape ``(..., out_capacity)``;
    entries past the host-computed valid count are garbage by contract.
    """
    K, NP, up, down = plan.taps_per_phase, plan.num_phases, plan.up, plan.down
    n_in = plan.in_size
    assert x.shape[-1] == n_in
    if plan.identity:
        # ratio 1: pure pass-through (ffmpeg also skips the resample here)
        return x, tail

    x_ext = jnp.concatenate([tail, x], axis=-1)  # (..., n_in + K - 1)
    batch_shape = x.shape[:-1]
    blk = plan.block
    n_blocks = plan.out_capacity // blk
    n0 = jnp.arange(blk, dtype=jnp.int32)
    j = jnp.arange(K, dtype=jnp.int32)

    def block_fn(carry, _):
        ip_base, rem = carry  # rem in [0, up)
        t = rem + n0 * jnp.int32(down)  # < up + blk*down: int32-safe
        ip = ip_base + t // jnp.int32(up)  # base input index per output
        rem_n = t % jnp.int32(up)
        un = rem_n * jnp.int32(NP)  # < up * NP: int32-safe for up <= 4M
        u0 = un // jnp.int32(up)
        w = (un % jnp.int32(up)).astype(jnp.float32) / jnp.float32(up)
        tap_idx = j[None, :] * jnp.int32(NP) + u0[:, None]  # (blk, K)
        c0 = jnp.take(table, tap_idx)
        c1 = jnp.take(table, tap_idx + 1)
        coeff = (1.0 - w[:, None]) * c0 + w[:, None] * c1
        src = jnp.clip(ip[:, None] + (K - 1) - j[None, :], 0, n_in + K - 2)
        gathered = jnp.take(x_ext, src, axis=-1)  # (..., blk, K)
        out = jnp.sum(gathered * coeff, axis=-1)  # (..., blk)
        t_end = rem + jnp.int32(blk) * jnp.int32(down)
        carry = (ip_base + t_end // jnp.int32(up), t_end % jnp.int32(up))
        return carry, out

    r0 = jnp.asarray(r0, jnp.int32)
    init = (r0 // jnp.int32(up), r0 % jnp.int32(up))
    _, blocks = lax.scan(block_fn, init, None, length=n_blocks)
    # blocks: (n_blocks, ..., blk) -> (..., n_blocks*blk)
    perm = tuple(range(1, 1 + len(batch_shape))) + (0, 1 + len(batch_shape))
    y = jnp.transpose(blocks, perm).reshape(*batch_shape, plan.out_capacity)
    new_tail = x[..., n_in - (K - 1) :]
    return y, new_tail
