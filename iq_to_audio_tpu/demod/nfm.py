"""Narrowband FM: quadrature discriminator + de-emphasis scan.

Reference semantics: ``decoders/nfm.py`` — polar discriminator
``angle(x[n]*conj(x[n-1]))`` with previous-sample carry, then the
single-pole de-emphasis IIR.  Both are fully vectorised here; the IIR is an
associative scan (see :mod:`iq_to_audio_tpu.ops.iir`).
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from ..ops.iir import deemphasis
from ..ops.trig import atan2_fast
from .base import Decoder


def polar_discriminant(yr, yi, sr, si):
    """``angle(x[n] * conj(x[n-1]))`` in real pairs (reference
    ``decoders/nfm.py:11-24``), with the shifted sequence ``(sr, si)``
    supplied by the caller — the serial decoder shifts by the carried
    previous sample, the sharded step by the cross-shard halo.  Single
    source of the discriminator formula for both paths.

    The angle is the polynomial :func:`~iq_to_audio_tpu.ops.trig.atan2_fast`
    (~1e-7 rad of exact; XLA:CPU's ``atan2`` is a scalar libm call measured
    10x slower, and sharing one formula across backends removes a
    cross-backend divergence source)."""
    pr = yr * sr + yi * si
    pi = yi * sr - yr * si
    return atan2_fast(pi, pr)


class NFMDecoder(Decoder):
    name = "narrowband_fm"

    def __init__(self, deemph_us: float):
        self.deemph_us = deemph_us
        self.alpha: float | None = None

    def cache_key(self) -> tuple:
        return ("nfm", self.deemph_us, self.alpha)

    def setup(self, sample_rate: float) -> None:
        tau_sec = max(self.deemph_us * 1e-6, 1e-6)
        self.alpha = math.exp(-1.0 / (sample_rate * tau_sec))

    def init_state(self, batch_shape: tuple[int, ...]):
        return {
            "prev_r": jnp.ones(batch_shape, dtype=jnp.float32),
            "prev_i": jnp.zeros(batch_shape, dtype=jnp.float32),
            "deemph_y": jnp.zeros(batch_shape, dtype=jnp.float32),
        }

    def process(self, state, yr, yi):
        assert self.alpha is not None, "setup() must run before process()"
        sr = jnp.concatenate([state["prev_r"][..., None], yr[..., :-1]], axis=-1)
        si = jnp.concatenate([state["prev_i"][..., None], yi[..., :-1]], axis=-1)
        demod = polar_discriminant(yr, yi, sr, si)
        audio, y_last = deemphasis(demod, self.alpha, state["deemph_y"])
        new_state = {"prev_r": yr[..., -1], "prev_i": yi[..., -1], "deemph_y": y_last}
        inter = {"demod": demod, "deemph": audio, "audio": audio}
        return audio, new_state, inter
