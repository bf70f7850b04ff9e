"""Digital downconverter: mix + channel filter + decimate as ONE strided
convolution on the MXU.

TPU-native redesign of the reference's mix -> overlap-save FFT -> decimate
chain (reference ``processing.py:282-360``).  Two insights drive it:

1. **Only 1/D of the filtered samples survive decimation.**  FFT overlap-save
   computes all of them (~4000 FLOPs/sample for typical geometries); a
   *decimating* time-domain FIR computes only the kept outputs
   (2L/D ~ 120 FLOPs/sample) — and a strided convolution is the single most
   MXU-friendly op XLA knows.

2. **Mixing commutes into the taps.**  With ``m[n] = x[n]*e^{j*theta*n}``,
   ``(h * m)[n] = e^{j*theta*n} * (g * x)[n]`` where
   ``g[j] = h[j]*e^{-j*theta*j}`` is a complex *bandpass* version of the
   lowpass taps.  So the full-rate NCO disappears: convolve the raw input
   with per-channel bandpass taps (stride D), then apply the oscillator only
   at the decimated rate (D times fewer sin/cos).

Everything is float32 real-pair arithmetic — this also keeps the op usable
on TPU backends without complex-number support.  Phase continuity across
chunks uses the same exact uint32 fixed-point bookkeeping as
:mod:`iq_to_audio_tpu.ops.nco`: the low-rate increment ``inc*D (mod 2^32)``
is exact, so chunked == whole to the last bit of phase.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

import jax.numpy as jnp
from jax import lax

_TWO32 = 1 << 32
_RAD_PER_COUNT = float(2.0 * np.pi / _TWO32)


@dataclass(frozen=True)
class DDCPlan:
    """Static geometry: chunk length N (multiple of D), taps L, decimation D."""

    num_taps: int
    decimation: int
    chunk_size: int

    @property
    def overlap(self) -> int:
        return self.num_taps - 1

    @property
    def out_size(self) -> int:
        return self.chunk_size // self.decimation

    @staticmethod
    def create(
        num_taps: int,
        decimation: int,
        *,
        target_chunk: int,
        max_chunk: int = 1 << 22,
        out_align: int = 1,
    ):
        """``out_align`` forces the decimated per-chunk count to a multiple
        (e.g. the resampler's ``down``) so downstream block geometry repeats
        identically every chunk."""
        d = max(1, int(decimation))
        unit = d * max(1, int(out_align))
        if unit > max_chunk:
            unit = d  # pathological alignment: fall back to plain D-alignment
        n = max(unit, min(max_chunk // unit, max(1, round(target_chunk / unit))) * unit)
        # the carried tail requires chunk >= L-1
        min_units = -(-(int(num_taps) - 1) // unit)
        n = max(n, min_units * unit)
        return DDCPlan(num_taps=int(num_taps), decimation=d, chunk_size=n)


def bandpass_kernel(taps: np.ndarray, incs_fixed: list[int]) -> np.ndarray:
    """Per-channel complex bandpass taps as a conv kernel.

    Returns float32 ``(2C, 2, L)`` for ``lax.conv_general_dilated`` with
    dimension numbers ("NCH", "OIH", "NCH"): input features are (xr, xi),
    output features are (yr_0, yi_0, yr_1, yi_1, ...).

    ``g[j] = h[j] * e^{-j*theta*j}`` with theta from the uint32 fixed-point
    increment (exact modular phase, float64 trig on host), and the tap axis
    reversed because XLA convolution is correlation.
    """
    taps64 = np.asarray(taps, dtype=np.float64)
    L = taps64.size
    C = len(incs_fixed)
    kernel = np.empty((2 * C, 2, L), dtype=np.float64)
    j = np.arange(L, dtype=np.uint64)
    for c, inc in enumerate(incs_fixed):
        phase_counts = (np.uint64(inc) * j) % np.uint64(_TWO32)  # exact
        theta_j = phase_counts.astype(np.float64) * _RAD_PER_COUNT
        # g = h * e^{-i theta j}
        gr = taps64 * np.cos(theta_j)
        gi = -taps64 * np.sin(theta_j)
        gr_rev, gi_rev = gr[::-1], gi[::-1]
        # yr = gr*xr - gi*xi ; yi = gi*xr + gr*xi
        kernel[2 * c, 0] = gr_rev
        kernel[2 * c, 1] = -gi_rev
        kernel[2 * c + 1, 0] = gi_rev
        kernel[2 * c + 1, 1] = gr_rev
    return kernel.astype(np.float32)


def lowrate_osc(phase0_fixed: jnp.ndarray, inc_lo_fixed: jnp.ndarray, m: int):
    """(cos, sin) of the decimated-rate oscillator, shapes ``(..., m)``.

    ``phase0_fixed``/``inc_lo_fixed`` are uint32 per-channel scalars;
    ``inc_lo = inc * D (mod 2^32)`` is computed exactly by the caller.
    """
    n = jnp.arange(m, dtype=jnp.uint32)
    ph = jnp.asarray(phase0_fixed, jnp.uint32)[..., None] + jnp.asarray(
        inc_lo_fixed, jnp.uint32
    )[..., None] * n
    angle = ph.astype(jnp.float32) * jnp.float32(_RAD_PER_COUNT)
    return jnp.cos(angle), jnp.sin(angle)


def ddc_apply(
    plan: DDCPlan,
    kernel: jnp.ndarray,
    xr: jnp.ndarray,
    xi: jnp.ndarray,
    tail: jnp.ndarray,
    phase0_fixed: jnp.ndarray,
    inc_lo_fixed: jnp.ndarray,
    *,
    poly_w: jnp.ndarray | None = None,
):
    """One chunk through the fused mix+filter+decimate stage.

    Parameters
    ----------
    kernel: ``(2C, 2, L)`` from :func:`bandpass_kernel`.
    xr, xi: ``(N,)`` raw input pair (N = plan.chunk_size).
    tail: ``(2, L-1)`` carried raw-input tail (rows: re, im).
    phase0_fixed: ``(C,)`` uint32 oscillator phase at this chunk's first
        decimated sample;  inc_lo_fixed: ``(C,)`` uint32 low-rate increment.
    poly_w: optional ``(K, F, 2C)`` polyphase tensor — when given, the FIR
        runs through the hand-written Pallas kernel
        (:mod:`iq_to_audio_tpu.ops.pallas_ddc`; measured ~4x the XLA conv on
        v5e at -130 dB agreement) instead of ``lax.conv``.

    Returns ``(yr, yi, new_tail, phase_next)`` with ``yr/yi`` of shape
    ``(C, N/D)`` — the mixed+filtered+decimated baseband.
    """
    L, D, N = plan.num_taps, plan.decimation, plan.chunk_size
    assert xr.shape[-1] == N
    m = plan.out_size
    x_pair = jnp.stack(
        [
            jnp.concatenate([tail[0], xr]),
            jnp.concatenate([tail[1], xi]),
        ]
    )  # (2, L-1+N)
    if poly_w is not None:
        from .pallas_ddc import pallas_poly_fir

        bb = pallas_poly_fir(x_pair, poly_w, D, m).reshape(-1, 2, m)
    else:
        out = lax.conv_general_dilated(
            x_pair[None],
            kernel,
            window_strides=(D,),
            padding="VALID",
            dimension_numbers=("NCH", "OIH", "NCH"),
            precision=lax.Precision.HIGHEST,  # full f32: bf16 is ~-48 dB
            preferred_element_type=jnp.float32,
        )  # (1, 2C, N/D)
        bb = out[0].reshape(-1, 2, m)  # (C, 2, m)
    br, bi = bb[:, 0], bb[:, 1]
    cos, sin = lowrate_osc(phase0_fixed, inc_lo_fixed, m)
    yr = br * cos - bi * sin
    yi = br * sin + bi * cos
    if L > 1:
        new_tail = jnp.stack([xr[N - (L - 1) :], xi[N - (L - 1) :]])
    else:
        new_tail = tail
    phase_next = jnp.asarray(phase0_fixed, jnp.uint32) + jnp.asarray(
        inc_lo_fixed, jnp.uint32
    ) * jnp.uint32(m)
    return yr, yi, new_tail, phase_next


def ddc_fullrate_stages(
    plan: DDCPlan,
    kernel: jnp.ndarray,
    xr: jnp.ndarray,
    xi: jnp.ndarray,
    tail: jnp.ndarray,
    phase0_fixed: jnp.ndarray,
    inc_fixed: jnp.ndarray,
):
    """Full-rate mixed/filtered stages (stride-1 conv + full-rate NCO).

    Only used for the first-chunk stage-PSD snapshots; costs D times the
    normal step, so it never runs in the hot loop.
    Returns (mixed_r, mixed_i, filtered_r, filtered_i), each ``(C, N)``.
    """
    L, N = plan.num_taps, plan.chunk_size
    x_full = jnp.stack(
        [jnp.concatenate([tail[0], xr]), jnp.concatenate([tail[1], xi])]
    )[None]
    out = lax.conv_general_dilated(
        x_full,
        kernel,
        window_strides=(1,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        precision=lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )[0].reshape(-1, 2, N)
    br, bi = out[:, 0], out[:, 1]
    n = jnp.arange(N, dtype=jnp.uint32)
    ph = jnp.asarray(phase0_fixed, jnp.uint32)[..., None] + jnp.asarray(
        inc_fixed, jnp.uint32
    )[..., None] * n
    angle = ph.astype(jnp.float32) * jnp.float32(_RAD_PER_COUNT)
    cos, sin = jnp.cos(angle), jnp.sin(angle)
    filt_r = br * cos - bi * sin
    filt_i = br * sin + bi * cos
    mix_r = xr[None] * cos - xi[None] * sin
    mix_i = xr[None] * sin + xi[None] * cos
    return mix_r, mix_i, filt_r, filt_i
