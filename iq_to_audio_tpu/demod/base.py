"""Functional decoder interface.

The reference decoder ABC (reference ``decoders/base.py:16-37``) is
imperative: ``setup -> process -> finalize`` with hidden state.  On TPU the
state must be an explicit pytree threaded through the jitted chunk step, so
the interface splits into:

* ``setup(sample_rate)``      — host-side constant precomputation
* ``init_state(batch_shape)`` — build the carried state pytree
* ``process(state, x)``       — jax-traceable; returns
  ``(audio, new_state, intermediates)`` where intermediates is a dict of
  stage-name -> array used only for stage-PSD snapshots (traced away when
  unused).
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from dataclasses import dataclass


@dataclass
class DecoderStats:
    """Runtime statistics from a decoder stage (reference ``decoders/base.py:9-13``)."""

    rms_dbfs: float


class Decoder(ABC):
    name: str = "decoder"
    #: sample-rate multiplier of the audio output relative to input (1 here)
    audio_rate_ratio: float = 1.0

    @abstractmethod
    def setup(self, sample_rate: float) -> None:
        """Precompute host constants for the given channel sample rate."""

    @abstractmethod
    def init_state(self, batch_shape: tuple[int, ...]):
        """Return the carried state pytree for ``batch_shape`` channels."""

    @abstractmethod
    def process(self, state, x):
        """jax-traceable: ``(audio, new_state, intermediates)``."""

    def finalize(self) -> None:
        """Flush pending state (no decoder currently buffers output)."""
        return
