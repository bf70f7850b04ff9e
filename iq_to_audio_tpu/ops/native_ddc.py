"""Native host channelizer bindings (native/ddc.cpp + native/ddc_ffi.cpp).

On CPU backends the channelizer dominates the chunk step (the polyphase
overlap-save FFT chain measures ~10 ns/input-sample at the headline
geometry — docs/probes/perf_probe_r3k.py), and its cost is mostly memory
choreography XLA cannot restructure: framing relayouts and FFT twiddle
passes.  The C++ kernel computes the same decimated channel samples
directly — fused convert -> separable-oscillator mix -> phase-split
decimating FIR (native/ddc.cpp) — at ~3.4 ns/sample, agreeing with
``ops.ddc.ddc_apply_il`` at the -120 dB level
(docs/probes/perf_probe_r3l.py, tests/test_native_ddc.py).

The kernel enters the jitted chunk step as an XLA CPU custom call via
``jax.ffi`` — the step's graph shape, carried-state pytree and checkpoint
layout are unchanged (conv-path interleaved ``fir_tail``); only the
convert+DDC subgraph is swapped.  Like the other native helpers
(io/native.py) the library is OPTIONAL: it builds on demand with g++
(XLA FFI headers ship inside jax), and every caller falls back to the
FFT-bank channelizer when the build or registration fails.
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

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "libddc.so"
_SOURCES = ("ddc.cpp", "ddc_ffi.cpp")

_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_registered = False
_tried = False

_CODEC_IDS = {"pcm_u8": 0, "pcm_s16le": 1, "pcm_f32le": 2}
# reference input_formats.py semantics: re = pair[re_idx],
# im = im_sign * pair[1 - re_idx]  (ops/ddc.py::complex_from_interleaved)
_ORDERS = {
    "iq": (0, 1.0),
    "iq_inv": (0, -1.0),
    "qi": (1, 1.0),
    "qi_inv": (1, -1.0),
}

FFI_TARGET = "iq2a_ddc"


def _build() -> bool:
    srcs = [_NATIVE_DIR / s for s in _SOURCES]
    if not all(s.exists() for s in srcs):
        return False
    try:
        import jax.ffi

        include = jax.ffi.include_dir()
    except Exception:  # pragma: no cover - jax always present in practice
        return False
    # fresh inode so a stale mapped .so can never be returned by dlopen
    # (same rationale as io/native.py::_build)
    tmp = _LIB_PATH.with_suffix(f".so.build{os.getpid()}")
    objs = [
        _LIB_PATH.with_suffix(f".{s.stem}.o.build{os.getpid()}") for s in srcs
    ]
    base = ["g++", "-O3", "-march=native", "-fPIC", "-std=c++17"]
    try:
        # COMPILE the kernel with -ffast-math (libmvec-vectorized sincos)
        # but LINK the .so WITHOUT it: gcc otherwise links crtfastmath.o
        # into the shared object, whose constructor enables FTZ/DAZ in the
        # MXCSR for the WHOLE PROCESS on dlopen — silently changing
        # subnormal float behavior for numpy/XLA everywhere (observed as
        # FloatingPointError in unrelated code).  The kernel itself never
        # depends on -ffast-math semantics: the FIR reduction order is
        # fixed by explicit intrinsics.
        subprocess.run(
            [*base, "-ffast-math", "-c", str(srcs[0]), "-o", str(objs[0])],
            check=True, capture_output=True, timeout=180,
        )
        subprocess.run(
            [*base, f"-I{include}", "-c", str(srcs[1]), "-o", str(objs[1])],
            check=True, capture_output=True, timeout=180,
        )
        subprocess.run(
            ["g++", "-shared", "-o", str(tmp), *[str(o) for o in objs]],
            check=True, capture_output=True, timeout=180,
        )
        os.replace(tmp, _LIB_PATH)
        return True
    except (subprocess.SubprocessError, OSError) as exc:
        LOG.debug("native DDC build failed: %s", exc)
        tmp.unlink(missing_ok=True)
        return False
    finally:
        for o in objs:
            o.unlink(missing_ok=True)


def _newer_than_lib() -> bool:
    try:
        lib_mtime = _LIB_PATH.stat().st_mtime
    except OSError:
        return True
    return any(
        (_NATIVE_DIR / s).stat().st_mtime > lib_mtime
        for s in _SOURCES
        if (_NATIVE_DIR / s).exists()
    )


def _load() -> ctypes.CDLL | None:
    global _lib, _registered, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("IQ2A_NATIVE_DDC", "1") == "0":
            return None
        if _newer_than_lib() and not _build():
            return None
        try:
            lib = ctypes.CDLL(str(_LIB_PATH))
            lib.iq2a_ddc_fast_path.restype = ctypes.c_int
        except OSError as exc:
            LOG.debug("native DDC load failed: %s", exc)
            return None
        try:
            import jax.ffi

            jax.ffi.register_ffi_target(
                FFI_TARGET,
                jax.ffi.pycapsule(lib.iq2a_ddc_handler),
                platform="cpu",
            )
        except Exception as exc:
            LOG.debug("native DDC FFI registration failed: %s", exc)
            return None
        _registered = True
        _lib = lib
        LOG.info(
            "Native channelizer: C++ %s path (native/ddc.cpp)",
            "phase-split AVX-512" if lib.iq2a_ddc_fast_path() else "portable",
        )
        return _lib


def available() -> bool:
    """Whether the FFI channelizer is built, loaded and registered."""
    return _load() is not None


def ddc_apply_native(
    plan,
    h_rev: np.ndarray,
    incs: np.ndarray,
    raw,
    itail,
    phase0_fixed,
    inc_lo_fixed,
    codec: str,
    iq_order: str,
):
    """Chunk through the native channelizer: custom call + JAX epilogue.

    Drop-in for :func:`ops.ddc.ddc_apply_il` (same returns, same carried
    state layout: INTERLEAVED scaled f32 tail).  ``h_rev``/``incs`` are
    host constants; ``raw`` is the UNSCALED interleaved chunk.
    """
    import jax
    import jax.numpy as jnp

    from .ddc import _RAD_PER_COUNT  # noqa: F401  (convention anchor)
    from ..pipeline.step import _device_scale

    n = plan.chunk_size
    m = plan.out_size
    c = int(incs.shape[0])
    re_idx, im_sign = _ORDERS[iq_order]
    out_t = jax.ShapeDtypeStruct((c, m), jnp.float32)
    yr, yi = jax.ffi.ffi_call(FFI_TARGET, (out_t, out_t))(
        raw,
        itail,
        jnp.asarray(h_rev, jnp.float32),
        jnp.asarray(phase0_fixed, jnp.uint32),
        jnp.asarray(incs, jnp.uint32),
        codec=np.int64(_CODEC_IDS[codec]),
        decim=np.int64(plan.decimation),
        re_idx=np.int64(re_idx),
        im_sign=np.float32(im_sign),
    )
    phase_next = jnp.asarray(phase0_fixed, jnp.uint32) + jnp.asarray(
        inc_lo_fixed, jnp.uint32
    ) * jnp.uint32(m)
    L = plan.num_taps
    if L > 1:
        new_itail = _device_scale(raw[2 * n - 2 * (L - 1) :], codec)
    else:
        new_itail = itail
    return yr, yi, new_itail, phase_next
