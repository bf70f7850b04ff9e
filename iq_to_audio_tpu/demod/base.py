"""Functional decoder interface.

The reference decoder ABC (reference ``decoders/base.py:16-37``) is
imperative: ``setup -> process -> finalize`` with hidden state.  On TPU the
state must be an explicit pytree threaded through the jitted chunk step, so
the interface splits into:

* ``setup(sample_rate)``      — host-side constant precomputation
* ``init_state(batch_shape)`` — build the carried state pytree
* ``process(state, yr, yi)``  — jax-traceable; consumes the baseband as a
  float32 (re, im) pair (some TPU backends have no complex dtype, so the
  whole device path is real-pair arithmetic) and returns
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
    """Decoders are used as *static* arguments of the jitted chunk step, so
    they hash/compare by their configuration key: two decoders with the same
    parameters share one compiled executable."""

    name: str = "decoder"

    def cache_key(self) -> tuple:
        """Hashable configuration identity (override per decoder)."""
        return (type(self).__name__,)

    def __hash__(self) -> int:
        return hash(self.cache_key())

    def __eq__(self, other) -> bool:
        return type(other) is type(self) and other.cache_key() == self.cache_key()

    @abstractmethod
    def setup(self, sample_rate: float) -> None:
        """Precompute host constants for the given channel sample rate."""

    @abstractmethod
    def init_state(self, batch_shape: tuple[int, ...]):
        """Return the carried state pytree for ``batch_shape`` channels."""

    @abstractmethod
    def process(self, state, yr, yi):
        """jax-traceable: ``(audio, new_state, intermediates)``."""

    def finalize(self) -> None:
        """Flush pending state (no decoder currently buffers output)."""
        return
