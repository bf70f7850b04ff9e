"""SSB (USB/LSB) demodulator with DC blocking and scan-based feedback AGC.

Reference semantics: ``decoders/ssb.py`` — the channel filter has already
band-limited the complex baseband, so USB audio is ``real(x)`` and LSB is
``real(conj(x))``; then the one-pole DC blocker and (optionally) the
feedback AGC.  Both per-sample Python loops of the reference become
associative scans here.  Unlike the reference, the AGC gain is carried
across chunks (chunked == whole invariant).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops.iir import dc_blocker, feedback_agc
from .base import Decoder

#: reference AGC defaults (``decoders/ssb.py:67-80``) — the sharded step
#: (parallel/sharded.py) derives its AGC from these same names so the two
#: paths cannot drift apart
AGC_TARGET_DBFS = -12.0
AGC_DECAY = 0.001
DC_RADIUS = 0.995


class SSBDecoder(Decoder):
    name = "ssb"

    def __init__(
        self,
        sideband: str,
        agc_enabled: bool,
        dc_radius: float = DC_RADIUS,
        agc_target_dbfs: float = AGC_TARGET_DBFS,
        agc_decay: float = AGC_DECAY,
    ):
        sideband = sideband.lower()
        if sideband not in {"usb", "lsb"}:
            raise ValueError("sideband must be 'usb' or 'lsb'")
        self.sideband = sideband
        self.agc_enabled = agc_enabled
        self.dc_radius = dc_radius
        self.agc_target = 10.0 ** (agc_target_dbfs / 20.0)
        self.agc_decay = agc_decay

    def cache_key(self) -> tuple:
        # sideband deliberately excluded: process() is sideband-invariant
        # (real(conj(x)) == real(x)), so usb and lsb share one compiled
        # executable — recompiles are expensive on tunneled runtimes
        return (
            "ssb",
            self.agc_enabled,
            self.dc_radius,
            self.agc_target,
            self.agc_decay,
        )

    def setup(self, sample_rate: float) -> None:
        return

    def init_state(self, batch_shape: tuple[int, ...]):
        state = {
            "dc_x": jnp.zeros(batch_shape, dtype=jnp.float32),
            "dc_y": jnp.zeros(batch_shape, dtype=jnp.float32),
        }
        if self.agc_enabled:
            state["agc_gain"] = jnp.ones(batch_shape, dtype=jnp.float32)
        return state

    def process(self, state, yr, yi):
        # real(conj(x)) == real(x): the LSB conjugate is a no-op on the real
        # part, faithfully matching the reference (decoders/ssb.py:42-43)
        baseband = yr.astype(jnp.float32)
        dc_audio, (x_last, y_last) = dc_blocker(
            baseband, self.dc_radius, state["dc_x"], state["dc_y"]
        )
        new_state = {"dc_x": x_last, "dc_y": y_last}
        inter = {"analytic": baseband, "dc_block": dc_audio}
        if self.agc_enabled:
            audio, gain_last = feedback_agc(
                dc_audio, self.agc_target, self.agc_decay, state["agc_gain"]
            )
            new_state["agc_gain"] = gain_last
            inter["agc"] = audio
        else:
            audio = dc_audio
        inter["audio"] = audio
        return audio, new_state, inter
