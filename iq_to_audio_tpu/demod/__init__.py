"""Demodulator registry (the framework's "model families").

Mirrors the reference factory (reference ``decoders/__init__.py:9-24``):
``nfm``/``fm``, ``am``, ``usb``/``ssb``, ``lsb``.  Decoders here are *pure
functions over state pytrees* so they trace into the single jitted chunk
step; ``setup`` precomputes host-side constants, ``init_state`` builds the
carried pytree, ``process(state, x)`` is jax-traceable.
"""

from .base import Decoder, DecoderStats
from .nfm import NFMDecoder
from .am import AMDecoder
from .ssb import SSBDecoder


def create_decoder(mode: str, *, deemph_us: float, agc_enabled: bool) -> Decoder:
    mode = mode.lower()
    if mode in {"nfm", "fm"}:
        return NFMDecoder(deemph_us=deemph_us)
    if mode == "am":
        return AMDecoder()
    if mode in {"usb", "ssb"}:
        return SSBDecoder(sideband="usb", agc_enabled=agc_enabled)
    if mode == "lsb":
        return SSBDecoder(sideband="lsb", agc_enabled=agc_enabled)
    raise ValueError(f"Unsupported demod mode '{mode}'.")


__all__ = [
    "Decoder",
    "DecoderStats",
    "create_decoder",
    "NFMDecoder",
    "AMDecoder",
    "SSBDecoder",
]
