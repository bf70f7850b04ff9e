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


def interleave_kernel(kernel_np: np.ndarray, iq_order: str = "iq") -> np.ndarray:
    """Repack the pair conv kernel ``(2C, 2, L)`` into the interleaved-domain
    kernel ``(2C, 1, 2L)`` that convolves the scaled RAW sample stream
    (I/Q interleaved, as stored in the capture) with window stride ``2D``.

    Motivation (measured, docs/performance.md): materialising the
    de-interleaved (re, im) pair on TPU — whether as strided slices or as a
    real transpose — compiles into code whose size grows with the chunk
    length (~17 MB / ~270 s for a 4Mi chunk on v5e vs 0.7 MB / 4 s for this
    kernel), because the backend unrolls the (N, 2) -> (2, N) relayout
    per tile.  Convolving the interleaved stream directly makes the layout
    change part of the convolution's own im2col, which the backend handles
    natively.

    The IQ-order convention (reference ``input_formats.py`` semantics:
    ``iq``/``qi`` slot order, ``*_inv`` negates Q) is folded into the taps:
    output ``sum_q ki[o, 0, q] * raw[2tD + q]`` with ``q = 2j + s`` equals the
    pair conv's ``sum_j k[o, 0, j]*xr[tD+j] + k[o, 1, j]*xi[tD+j]`` when the
    channel-0 taps land on the raw slot holding I and the channel-1 taps
    (sign-adjusted) on the slot holding Q.
    """
    out_ch, in_ch, L = kernel_np.shape
    assert in_ch == 2, kernel_np.shape
    if iq_order not in {"iq", "qi", "iq_inv", "qi_inv"}:
        raise ValueError(f"Unsupported iq_order '{iq_order}'")
    first, second = (0, 1) if iq_order.startswith("iq") else (1, 0)
    qsign = -1.0 if iq_order.endswith("_inv") else 1.0
    ki = np.zeros((out_ch, 1, 2 * L), dtype=np.float32)
    ki[:, 0, first::2] = kernel_np[:, 0, :]
    ki[:, 0, second::2] = qsign * kernel_np[:, 1, :]
    return ki


def j_lanes_kernel(
    kernel_il: np.ndarray, decimation: int, j_lanes: int
) -> np.ndarray:
    """Output-channel-augmented interleaved conv kernel.

    The plain interleaved kernel has only ``2C`` output channels (2 for a
    single-target run) while the MXU pads the channel axis to 128 lanes —
    measured ~0.6% lane efficiency, 0.21 s per 4Mi chunk
    (docs/probes/perf_probe_r3f.py).  Packing ``J`` consecutive decimated
    outputs into the channel axis (stride ``J*2D``, width
    ``2L + (J-1)*2D``) fills the lanes: channel ``o*J + j`` of output
    block ``r`` is plain-conv output ``(o, r*J + j)``.

    Channel-major row layout (``o * J + j``) so a multi-channel kernel
    still shards cleanly over a ``dp`` mesh axis: each channel's J block
    stays contiguous.
    """
    out_ch, in_ch, width = kernel_il.shape
    assert in_ch == 1, kernel_il.shape
    d2 = 2 * decimation
    wj = np.zeros(
        (out_ch * j_lanes, 1, width + (j_lanes - 1) * d2), np.float32
    )
    for o in range(out_ch):
        for j in range(j_lanes):
            wj[o * j_lanes + j, 0, j * d2 : j * d2 + width] = kernel_il[o, 0, :]
    return wj


def shift_matmul_kernel(
    kernel_il: np.ndarray, decimation: int, j_lanes: int
) -> np.ndarray:
    """Shifted-dense-matmul repack of the lane-filling J-conv kernel.

    The J-conv (:func:`j_lanes_kernel`) is a banded matmul whose window
    stride (``J*2D`` raw floats) typically exceeds half its window width
    (``2L + (J-1)*2D``), so splitting the tap axis at stride boundaries
    turns it into ``n_shift = ceil(width/stride)`` DENSE matmuls over the
    free contiguous reshape ``A = x.reshape(rows, stride)``:

        Y[r] = sum_s  A[r + s] @ W_s        # (R, stride) @ (stride, J*2C)

    No im2col, no conv op — exactly the MXU's preferred shape.  Measured
    5259 Msps in full f32 at the flagship geometry (139.8 dB SNR vs the
    float64 host reference) vs the J-conv's 302 Msps — the XLA conv
    LOWERING, not MXU flops, bounds the conv formulation
    (docs/probes/perf_probe_r5c.py, perf_probe_r5d.py).

    Returns float32 ``(n_shift, stride, J*2C)``; columns are channel-major
    (``o*J + j``) exactly like :func:`j_lanes_kernel`'s rows, so the
    output relayout in :func:`ddc_apply_il` is shared.
    """
    wj = j_lanes_kernel(kernel_il, decimation, j_lanes)  # (J*2C, 1, width)
    out_rows, _, width = wj.shape
    stride = j_lanes * 2 * decimation
    n_shift = -(-width // stride)
    w = np.zeros((n_shift, stride, out_rows), np.float32)
    for s in range(n_shift):
        seg = wj[:, 0, s * stride : (s + 1) * stride]  # (J*2C, <=stride)
        w[s, : seg.shape[1], :] = seg.T
    return w


def lane_formulation() -> str:
    """Which lane-filling channelizer formulation production selects:
    ``"mm"`` (shifted-dense-matmul, :func:`shift_matmul_kernel` — the
    accelerator default) or ``"jconv"`` (:func:`j_lanes_kernel`).

    Used by the sharded-path callers (``parallel/dp_runner.py``) and
    mirrors the single-device step builder's default (``pipeline/step.py``
    implements the same policy inline, where it additionally interacts
    with ``IQ2A_CONVJ``); ``IQ2A_MM=1`` forces the matmul (even on CPU),
    ``IQ2A_MM=0`` keeps the J-conv.
    """
    import os

    import jax

    mm_env = os.environ.get("IQ2A_MM", "")
    if mm_env == "1":
        return "mm"
    if mm_env == "0":
        return "jconv"
    return "mm" if jax.default_backend() != "cpu" else "jconv"


def ddc_apply_il(
    plan: DDCPlan,
    kernel_il: jnp.ndarray,
    f: jnp.ndarray,
    itail: jnp.ndarray,
    phase0_fixed: jnp.ndarray,
    inc_lo_fixed: jnp.ndarray,
    *,
    poly_w: jnp.ndarray | None = None,
    j_kernel: jnp.ndarray | None = None,
    j_lanes: int = 1,
    mm_kernel: jnp.ndarray | None = None,
):
    """Interleaved-domain DDC: mix+filter+decimate straight off the scaled
    raw stream — no de-interleave, no transpose (see
    :func:`interleave_kernel` for why that matters on TPU).

    Parameters
    ----------
    kernel_il: ``(2C, 1, 2L)`` from :func:`interleave_kernel`.
    f: float32 ``(2N,)`` scaled raw interleaved samples.
    itail: float32 ``(2(L-1),)`` carried raw-domain tail.
    poly_w: optional ``(K, 2D, 2C)`` polyphase tensor built from the
        interleaved kernel (``build_poly_kernel(kernel_il, 2*D)``) — selects
        the Pallas MXU kernel.
    j_kernel/j_lanes: optional output-channel-augmented kernel from
        :func:`j_lanes_kernel` — the lane-filling XLA conv formulation.
    mm_kernel: optional ``(n_shift, stride, J*2C)`` tensor from
        :func:`shift_matmul_kernel` (requires ``j_lanes > 1``) — the
        shifted-dense-matmul formulation, the accelerator default.

    Returns ``(yr, yi, new_itail, phase_next)``; ``yr/yi`` shaped ``(C, m)``
    exactly as :func:`ddc_apply`.
    """
    L, D, N = plan.num_taps, plan.decimation, plan.chunk_size
    assert f.shape[-1] == 2 * N
    m = plan.out_size
    x = jnp.concatenate([itail, f])  # (2(L-1) + 2N,)
    if poly_w is not None:
        from .pallas_ddc import pallas_poly_fir_il

        bb = pallas_poly_fir_il(x, poly_w, D, m).reshape(-1, 2, m)
    elif mm_kernel is not None and j_lanes > 1:
        # shifted-dense-matmul formulation (shift_matmul_kernel): each
        # n_shift term is one (R, stride) @ (stride, J*2C) dense matmul of
        # the contiguous row reshape.  Real outputs (i < m) read exactly
        # x[i*2D : i*2D + 2L] through nonzero weights — the zero-padded
        # columns beyond the banded width carry zero taps, and only
        # discarded tail lanes (i >= m) can touch the zero pad.
        n_shift, stride, rows = mm_kernel.shape
        r_blocks = -(-m // j_lanes)
        need = (r_blocks + n_shift) * stride
        pad = need - x.shape[-1]
        xp = jnp.pad(x, (0, pad)) if pad > 0 else x[:need]
        a = xp.reshape(r_blocks + n_shift, stride)
        y = jnp.zeros((r_blocks, rows), jnp.float32)
        for s in range(n_shift):
            y = y + lax.dot_general(
                lax.dynamic_slice_in_dim(a, s, r_blocks, 0),
                mm_kernel[s],
                (((1,), (0,)), ((), ())),
                precision=lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )
        # (R, J*2C) cols channel-major (o*J + j) -> (2C, m)
        cdim = rows // j_lanes
        yt = (
            y.reshape(r_blocks, cdim, j_lanes)
            .transpose(1, 0, 2)
            .reshape(cdim, r_blocks * j_lanes)
        )
        bb = yt[:, :m].reshape(-1, 2, m)
    elif j_kernel is not None and j_lanes > 1:
        # lane-filling formulation: J consecutive decimated outputs ride
        # the output-channel axis; real outputs never read the zero pad
        # (output i reads x[i*2D : i*2D + 2L] and (m-1)*2D + 2L <= need)
        d2 = 2 * D
        r_blocks = -(-m // j_lanes)
        need = (r_blocks * j_lanes - 1) * d2 + 2 * L
        pad = need - x.shape[-1]
        xj = jnp.pad(x, (0, pad)) if pad > 0 else x[:need]
        out = lax.conv_general_dilated(
            xj[None, None],
            j_kernel,
            window_strides=(j_lanes * d2,),
            padding="VALID",
            dimension_numbers=("NCH", "OIH", "NCH"),
            precision=lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )  # (1, J*2C, R)
        yj = out[0]  # (2C*J, R), channel-major rows (o*J + j)
        cdim = yj.shape[0] // j_lanes
        y = (
            yj.reshape(cdim, j_lanes, r_blocks)
            .transpose(0, 2, 1)
            .reshape(cdim, r_blocks * j_lanes)
        )
        bb = y[:, :m].reshape(-1, 2, m)
    else:
        out = lax.conv_general_dilated(
            x[None, None],
            kernel_il,
            window_strides=(2 * D,),
            padding="VALID",
            dimension_numbers=("NCH", "OIH", "NCH"),
            precision=lax.Precision.HIGHEST,  # full f32: bf16 is ~-48 dB
            preferred_element_type=jnp.float32,
        )  # (1, 2C, m)
        bb = out[0].reshape(-1, 2, m)
    yr, yi, phase_next = mix_and_advance(
        bb[:, 0], bb[:, 1], phase0_fixed, inc_lo_fixed, m
    )
    new_itail = f[2 * N - 2 * (L - 1) :] if L > 1 else itail
    return yr, yi, new_itail, phase_next


def bank_from_kernel(kernel_np: np.ndarray, os_plan) -> np.ndarray:
    """Recover the complex bandpass bank from a conv kernel built by
    :func:`bandpass_kernel` (undo the correlation tap-reversal), FFT'd to
    ``(C, fft_size)`` complex64 for the overlap-save channelizer — or to
    the ``(C, fold, fft_size/fold)`` combine gains when the plan uses the
    polyphase forward.

    ``os_plan`` is the :class:`~.osfir.OverlapSavePlan` the bank feeds (its
    fold shift/scale are baked in); a bare ``int`` FFT size yields the
    plain fold-free responses.
    """
    from .osfir import taps_fft

    C = kernel_np.shape[0] // 2
    rows = []
    for c in range(C):
        g = (
            kernel_np[2 * c, 0][::-1].astype(np.float64)
            + 1j * kernel_np[2 * c + 1, 0][::-1].astype(np.float64)
        )
        # taps_fft owns the fold convention (shift/scale phase ramp, the
        # polyphase combine-gain shape) — one source of truth for both
        # channelizers' frequency responses
        rows.append(taps_fft(g, os_plan))
    # (C, F) flat responses, or (C, fold, F/fold) combine gains (poly plan)
    return np.stack(rows)


def complex_from_interleaved(f: jnp.ndarray, iq_order: str) -> jnp.ndarray:
    """The ordered complex stream as a zero-copy VIEW of the scaled
    interleaved float32 stream.

    A complex64 array's memory layout IS ``[re, im]`` pairs, i.e. exactly the
    interleaved ``IQIQ...`` stream — so ``f.view(complex64)`` reinterprets in
    place and the reference's four IQ-order conventions
    (``processing.py:268-279``) become unit elementwise transforms XLA fuses
    into the consumer (no de-interleave relayout, no pair materialisation):

    ========  ===================  =======================
    order     stream pairs (a,b)   wanted i + 1j*q
    ========  ===================  =======================
    iq        (i, q)               v
    iq_inv    (i, -q)... (i, q) with q negated -> conj(v)
    qi        (q, i)               1j * conj(v)
    qi_inv    (q, i), q negated    -1j * v
    ========  ===================  =======================
    """
    v = f.view(jnp.complex64)
    if iq_order == "iq":
        return v
    if iq_order == "iq_inv":
        return jnp.conj(v)
    if iq_order == "qi":
        return jnp.complex64(1j) * jnp.conj(v)
    if iq_order == "qi_inv":
        return jnp.complex64(-1j) * v
    raise ValueError(f"Unknown IQ order '{iq_order}'")


def ddc_apply_fft_il(
    plan: DDCPlan,
    os_plan,
    h_bank: jnp.ndarray,
    f: jnp.ndarray,
    tail: jnp.ndarray,
    phase0_fixed: jnp.ndarray,
    inc_lo_fixed: jnp.ndarray,
    iq_order: str = "iq",
):
    """:func:`ddc_apply_fft` fed the scaled raw INTERLEAVED stream directly
    (the production fft-channelizer path): the complex input is a zero-copy
    view (:func:`complex_from_interleaved`), so the convert/de-interleave
    passes over the full-rate data disappear into the overlap-save frame
    gather.  State pytree is identical to :func:`ddc_apply_fft` (the
    ``(2, L-1)`` pair tail — it is tiny, and keeping it preserves
    checkpoint layout).
    """
    from .osfir import os_fir_bank

    L, D, N = plan.num_taps, plan.decimation, plan.chunk_size
    assert f.shape[-1] == 2 * N
    m = plan.out_size
    x = complex_from_interleaved(f, iq_order)
    tail_c = (tail[0] + 1j * tail[1]).astype(jnp.complex64)
    dec, _ = os_fir_bank(os_plan, h_bank, x, tail_c)  # (C, m) complex
    yr, yi, phase_next = mix_and_advance(
        jnp.real(dec), jnp.imag(dec), phase0_fixed, inc_lo_fixed, m
    )
    if L > 1:
        tail_x = x[N - (L - 1) :]
        new_tail = jnp.stack([jnp.real(tail_x), jnp.imag(tail_x)])
    else:
        new_tail = tail
    return yr, yi, new_tail, phase_next


def ddc_apply_fft(
    plan: DDCPlan,
    os_plan,
    h_bank: jnp.ndarray,
    xr: jnp.ndarray,
    xi: jnp.ndarray,
    tail: jnp.ndarray,
    phase0_fixed: jnp.ndarray,
    inc_lo_fixed: jnp.ndarray,
):
    """FFT-channelizer variant of :func:`ddc_apply` (same inputs, same state
    pytree, same outputs at FFT numerics): batched overlap-save filtering with
    the per-channel bandpass bank, then the identical low-rate mix.

    For backends with native complex/FFT support (the reference's own kernel
    shape, ``processing.py:300-346``); selected via ``IQ2A_CHANNELIZER=fft``.
    """
    from .osfir import os_fir_bank

    L, D, N = plan.num_taps, plan.decimation, plan.chunk_size
    assert xr.shape[-1] == N
    m = plan.out_size
    x = (xr + 1j * xi).astype(jnp.complex64)
    tail_c = (tail[0] + 1j * tail[1]).astype(jnp.complex64)
    dec, _ = os_fir_bank(os_plan, h_bank, x, tail_c)  # (C, m) complex
    yr, yi, phase_next = mix_and_advance(
        jnp.real(dec), jnp.imag(dec), phase0_fixed, inc_lo_fixed, m
    )
    if L > 1:
        new_tail = jnp.stack([xr[N - (L - 1) :], xi[N - (L - 1) :]])
    else:
        new_tail = tail
    return yr, yi, new_tail, phase_next


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


def mix_and_advance(
    br: jnp.ndarray,
    bi: jnp.ndarray,
    phase0_fixed: jnp.ndarray,
    inc_lo_fixed: jnp.ndarray,
    m: int,
):
    """Low-rate mix epilogue shared by every channelizer backend (conv,
    interleaved conv, Pallas, FFT bank): rotate the decimated baseband by
    the per-channel oscillator and advance the uint32 phase by exactly
    ``m`` low-rate steps (exact modular arithmetic).  One implementation so
    the backends cannot drift numerically.

    Returns ``(yr, yi, phase_next)``.
    """
    cos, sin = lowrate_osc(phase0_fixed, inc_lo_fixed, m)
    yr = br * cos - bi * sin
    yi = br * sin + bi * cos
    phase_next = jnp.asarray(phase0_fixed, jnp.uint32) + jnp.asarray(
        inc_lo_fixed, jnp.uint32
    ) * jnp.uint32(m)
    return yr, yi, phase_next


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
    yr, yi, phase_next = mix_and_advance(
        bb[:, 0], bb[:, 1], phase0_fixed, inc_lo_fixed, m
    )
    if L > 1:
        new_tail = jnp.stack([xr[N - (L - 1) :], xi[N - (L - 1) :]])
    else:
        new_tail = tail
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
