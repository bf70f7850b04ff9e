"""Phase-continuous complex NCO (numerically-controlled oscillator).

TPU-native design note
----------------------
The reference implementation (reference ``processing.py:282-297``,
``ComplexOscillator``) accumulates oscillator phase in float64.  TPUs have no
native float64, and float32 phase accumulation drifts by ~0.03 rad across a
4M-sample chunk — far above the -60 dB audio-error budget.  Instead we track
phase in **uint32 fixed point** (1 cycle == 2**32 counts).  Integer multiply
wraps mod 2**32 in XLA, so ``phase[n] = phase0 + inc * n`` is *exact* modular
arithmetic: per-sample phase error is bounded by the frequency quantisation of
2**-32 cycles/sample (~0.6 mHz at 2.5 MS/s) plus the 2**-24 rounding of the
final float32 angle — both orders of magnitude below the budget, and better
than the float64 accumulator for very long captures (no accumulation at all).

The host carries the authoritative phase as a Python int mirror when needed;
the device state carries the same uint32 scalar and advances it exactly.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp
from jax import lax

_TWO32 = 1 << 32
_RAD_PER_COUNT = float(2.0 * np.pi / _TWO32)


def nco_increment_fixed(freq_offset_hz: float, sample_rate: float, sign: int = 1) -> int:
    """uint32 fixed-point phase increment for mixing ``freq_offset_hz`` down.

    Matches the reference convention ``increment = -2*pi*f_off/fs`` with the
    probe ``sign`` multiplier (reference ``processing.py:287-289``): positive
    ``sign`` translates the target down to DC.
    """
    cycles_per_sample = (-float(sign) * float(freq_offset_hz) / float(sample_rate)) % 1.0
    inc = int(round(cycles_per_sample * _TWO32)) % _TWO32
    return inc


def nco_phase_advance(phase_fixed: int, inc_fixed: int, num_samples: int) -> int:
    """Exact host-side phase advance mirror (Python ints, mod 2**32)."""
    return (int(phase_fixed) + int(inc_fixed) * int(num_samples)) % _TWO32


def nco_mix(samples: jnp.ndarray, phase0_fixed: jnp.ndarray, inc_fixed: jnp.ndarray):
    """Mix ``samples`` with ``exp(j * 2*pi * (phase0 + inc*n) / 2**32)``.

    Parameters
    ----------
    samples: complex64 ``(..., N)``
    phase0_fixed: uint32 ``(...)`` — per-batch starting phase (broadcasts)
    inc_fixed: uint32 ``(...)`` — per-batch fixed-point increment

    Returns
    -------
    (mixed, phase_next) where ``phase_next`` is the exact uint32 phase after
    consuming ``N`` samples.
    """
    n = jnp.arange(samples.shape[-1], dtype=jnp.uint32)
    phase0 = jnp.asarray(phase0_fixed, dtype=jnp.uint32)[..., None]
    inc = jnp.asarray(inc_fixed, dtype=jnp.uint32)[..., None]
    ph = phase0 + inc * n  # exact mod 2**32
    angle = ph.astype(jnp.float32) * jnp.float32(_RAD_PER_COUNT)
    osc = lax.complex(jnp.cos(angle), jnp.sin(angle))
    mixed = samples * osc
    n_total = jnp.uint32(samples.shape[-1])
    phase_next = jnp.asarray(phase0_fixed, jnp.uint32) + jnp.asarray(
        inc_fixed, jnp.uint32
    ) * n_total
    return mixed, phase_next
