"""ctypes bindings for the native host IO kernels (native/iqio.cpp).

The library is optional: everything has a NumPy fallback, and the loader
builds the .so on demand with g++ when it is missing (no pybind11 — the C
ABI keeps the binding dependency-free).
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from pathlib import Path

import numpy as np

LOG = logging.getLogger(__name__)

_CODEC_IDS = {"pcm_u8": 0, "pcm_s16le": 1, "pcm_f32le": 2}
_ORDER_IDS = {"iq": 0, "qi": 1, "iq_inv": 2, "qi_inv": 3}

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "libiqio.so"

_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_tried = False


def _build() -> bool:
    src = _NATIVE_DIR / "iqio.cpp"
    if not src.exists():
        return False
    # build to a temp name and rename: glibc dlopen dedups by (dev, ino), so
    # rewriting an already-mapped .so in place would make the stale-ABI
    # reload return the OLD mapping (and in-place truncation of a mapped
    # object is hazardous anyway) — a fresh inode guarantees a fresh load
    tmp = _LIB_PATH.with_suffix(f".so.build{os.getpid()}")
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-fPIC", "-shared", "-std=c++17",
             "-o", str(tmp), str(src)],
            check=True,
            capture_output=True,
            timeout=120,
        )
        os.replace(tmp, _LIB_PATH)
        return True
    except (OSError, subprocess.SubprocessError) as exc:
        LOG.debug("native iqio build failed: %s", exc)
        tmp.unlink(missing_ok=True)
        return False


_ABI_VERSION = 2


def _load() -> ctypes.CDLL | None:
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.iqio_abi_version.restype = ctypes.c_int32
        if lib.iqio_abi_version() != _ABI_VERSION:
            return None
        lib.iqio_convert_deinterleave.argtypes = [
            ctypes.c_void_p, ctypes.c_int32, ctypes.c_int32, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib.iqio_encode_s16.restype = ctypes.c_float
        lib.iqio_encode_s16.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_float, ctypes.c_void_p,
        ]
        lib.iqio_interleave_encode.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32,
            ctypes.c_void_p,
        ]
        return lib
    except (OSError, AttributeError) as exc:
        LOG.debug("native iqio load failed: %s", exc)
        return None


def get_lib() -> ctypes.CDLL | None:
    """Load (building on demand) the native library, or None.

    A stale .so from an older source revision (ABI mismatch) is rebuilt
    once; if the rebuild fails too, everything stays on the NumPy paths.
    """
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not _LIB_PATH.exists() and not _build():
            return None
        lib = _load()
        if lib is None and _build():
            lib = _load()
        if lib is None:
            LOG.warning("native iqio unusable (stale ABI and rebuild "
                        "failed); using NumPy fallback")
        _lib = lib
        return _lib


def convert_deinterleave(raw: np.ndarray, codec: str, iq_order: str):
    """(i, q) float32 arrays from raw interleaved samples, or None if the
    native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    raw = np.ascontiguousarray(raw)
    frames = raw.size // 2
    i_out = np.empty(frames, dtype=np.float32)
    q_out = np.empty(frames, dtype=np.float32)
    lib.iqio_convert_deinterleave(
        raw.ctypes.data_as(ctypes.c_void_p),
        _CODEC_IDS[codec],
        _ORDER_IDS[iq_order],
        frames,
        i_out.ctypes.data_as(ctypes.c_void_p),
        q_out.ctypes.data_as(ctypes.c_void_p),
    )
    return i_out, q_out


def encode_s16(samples: np.ndarray, clip: float = 0.99):
    """(payload_bytes, peak) for float32 mono audio, or None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    samples = np.ascontiguousarray(samples, dtype=np.float32)
    out = np.empty(samples.size, dtype=np.int16)
    peak = lib.iqio_encode_s16(
        samples.ctypes.data_as(ctypes.c_void_p),
        samples.size,
        ctypes.c_float(clip),
        out.ctypes.data_as(ctypes.c_void_p),
    )
    return out, float(peak)


def interleave_encode(samples: np.ndarray, codec: str):
    """Raw interleaved payload bytes for complex64 IQ, or None.

    Semantics match ``io.writer._encode_iq_raw`` exactly (s16 truncates
    after the asymmetric clip, u8 rounds half-to-even — reference
    ``processing.py:527-539``).
    """
    lib = get_lib()
    if lib is None:
        return None
    i = np.ascontiguousarray(samples.real, dtype=np.float32)
    q = np.ascontiguousarray(samples.imag, dtype=np.float32)
    frames = i.size
    dtype = {"pcm_u8": np.uint8, "pcm_s16le": np.int16,
             "pcm_f32le": np.float32}[codec]
    out = np.empty(2 * frames, dtype=dtype)
    lib.iqio_interleave_encode(
        i.ctypes.data_as(ctypes.c_void_p),
        q.ctypes.data_as(ctypes.c_void_p),
        frames,
        _CODEC_IDS[codec],
        out.ctypes.data_as(ctypes.c_void_p),
    )
    return out.tobytes()
