"""Demodulator registry (the framework's "model families").

Same mode set as the reference factory (reference
``decoders/__init__.py:9-24``): ``nfm``/``fm``, ``am``, ``usb``/``ssb``,
``lsb``. Unlike the reference's stateful decoder objects, decoders here
are *pure functions over state pytrees* so they trace into the single
jitted chunk step: ``setup`` precomputes host-side constants,
``init_state`` builds the carried pytree, and ``process(state, yr, yi)``
is jax-traceable over the float32 (re, im) baseband pair (see
``base.Decoder`` for the full contract).
"""

from .am import AMDecoder
from .base import Decoder, DecoderStats
from .nfm import NFMDecoder
from .ssb import SSBDecoder

__all__ = [
    "AMDecoder",
    "Decoder",
    "DecoderStats",
    "NFMDecoder",
    "SSBDecoder",
    "create_decoder",
]

_FACTORIES = {
    "nfm": lambda deemph_us, agc: NFMDecoder(deemph_us=deemph_us),
    "fm": lambda deemph_us, agc: NFMDecoder(deemph_us=deemph_us),
    "am": lambda deemph_us, agc: AMDecoder(),
    "usb": lambda deemph_us, agc: SSBDecoder(sideband="usb", agc_enabled=agc),
    "ssb": lambda deemph_us, agc: SSBDecoder(sideband="usb", agc_enabled=agc),
    "lsb": lambda deemph_us, agc: SSBDecoder(sideband="lsb", agc_enabled=agc),
}


def create_decoder(mode: str, *, deemph_us: float, agc_enabled: bool) -> Decoder:
    try:
        make = _FACTORIES[mode.lower()]
    except KeyError:
        raise ValueError(f"Unsupported demod mode '{mode}'.") from None
    return make(deemph_us, agc_enabled)
