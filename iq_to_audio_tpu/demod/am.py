"""AM envelope detector with DC blocking (reference ``decoders/am.py``)."""

from __future__ import annotations

import jax.numpy as jnp

from ..ops.iir import dc_blocker
from .base import Decoder
from .ssb import DC_RADIUS


class AMDecoder(Decoder):
    name = "am"

    def __init__(self, dc_radius: float = DC_RADIUS):
        if not 0.0 < dc_radius < 1.0:
            raise ValueError("radius must be between 0 and 1")
        self.dc_radius = dc_radius

    def cache_key(self) -> tuple:
        return ("am", self.dc_radius)

    def setup(self, sample_rate: float) -> None:
        return

    def init_state(self, batch_shape: tuple[int, ...]):
        return {
            "dc_x": jnp.zeros(batch_shape, dtype=jnp.float32),
            "dc_y": jnp.zeros(batch_shape, dtype=jnp.float32),
        }

    def process(self, state, yr, yi):
        envelope = jnp.sqrt(yr * yr + yi * yi).astype(jnp.float32)
        audio, (x_last, y_last) = dc_blocker(
            envelope, self.dc_radius, state["dc_x"], state["dc_y"]
        )
        new_state = {"dc_x": x_last, "dc_y": y_last}
        inter = {"envelope": envelope, "dc_block": audio, "audio": audio}
        return audio, new_state, inter
