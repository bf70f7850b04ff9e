"""Sequence-parallel pipeline step over a device mesh (shard_map).

Distribution strategy (see package docstring): within a chunk,

* the decimated-rate NCO needs **no communication** — each shard derives its
  starting phase from the carried uint32 phase plus ``inc_lo * shard_offset``
  (exact modular arithmetic, no drift);
* the decimating bandpass conv (see :mod:`iq_to_audio_tpu.ops.ddc`) needs an
  (L-1)-sample **halo** of raw input from the left neighbour, moved with one
  ``lax.ppermute`` over ICI (the reference's carried ``state`` tail,
  reference ``processing.py:341-345``, generalised across space instead of
  time);
* the quadrature discriminator needs a 1-sample halo (same trick);
* the de-emphasis / DC-block / AGC first-order recurrences use a
  **distributed scan**: local associative scan with zero init, an all-gather
  of per-shard (cumprod, last) summaries, a replicated prefix fold, then a
  local correction — O(N/n) work per chip plus O(n) stitch;
* the audio-rate tail (48 kHz polyphase-conv resampler) is all-gathered and
  computed replicated: at 1/decimation of the input rate it is too small to
  be worth sharding.

Channels ride the ``dp`` axis with no cross-talk.
"""

from __future__ import annotations

import math
from dataclasses import replace

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..demod.nfm import polar_discriminant
from ..demod.ssb import AGC_DECAY, AGC_TARGET_DBFS, DC_RADIUS
from ..ops.ddc import DDCPlan, ddc_apply_il
from ..ops.iir import agc_coefficients, first_order_combine, first_order_scan_const
from ..ops.resample import ResamplePlan, polyphase_resample
from ..pipeline.step import _device_scale

try:  # jax >= 0.7 exports it top-level
    from jax import shard_map as _sm
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map as _sm

# probe the replication-check kwarg by signature — a call-time TypeError
# could never reach the except above (check_vma on current jax, check_rep
# on the experimental/older API)
import inspect as _inspect

_SM_KW = (
    {"check_vma": False}
    if "check_vma" in _inspect.signature(_sm).parameters
    else {"check_rep": False}
)


def _shard_map(f, mesh, in_specs, out_specs):
    return _sm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs, **_SM_KW)


def _left_halo(x: jnp.ndarray, width: int, fallback: jnp.ndarray, axis_name: str):
    """Every shard receives the last ``width`` samples of its left neighbour;
    shard 0 receives ``fallback`` (the carried cross-chunk state)."""
    n = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)
    tail = x[..., -width:] if width > 0 else x[..., :0]
    if n == 1:
        return fallback
    perm = [(i, i + 1) for i in range(n - 1)]
    received = lax.ppermute(tail, axis_name, perm)
    return jnp.where(idx == 0, fallback, received)


def _prefix_fold(a_tot, b_tot, y0, axis_name: str):
    """Replicated O(n_shards) stitch of a distributed first-order scan:
    fold the per-shard ``(a_tot, b_tot)`` summaries into each shard's
    incoming state ``y_in`` and the global last value."""
    gathered_a = lax.all_gather(a_tot, axis_name)  # (n, ...)
    gathered_b = lax.all_gather(b_tot, axis_name)

    def fold(carry, ab):
        ai, bi = ab
        nxt = ai * carry + bi
        return nxt, nxt

    y_last, y_after = lax.scan(fold, jnp.asarray(y0), (gathered_a, gathered_b))
    idx = lax.axis_index(axis_name)
    prev = lax.dynamic_index_in_dim(
        y_after, jnp.maximum(idx - 1, 0), axis=0, keepdims=False
    )
    y_in = jnp.where(idx == 0, jnp.asarray(y0), prev)
    return y_in, y_last


def distributed_first_order_scan(a, b, y0, axis_name: str):
    """``y[n] = a[n]*y[n-1] + b[n]`` across shards of the last axis.

    ``y0`` is the global initial state (replicated).  Returns
    ``(y_local, y_global_last)`` with ``y_global_last`` replicated.
    The combine is :func:`iq_to_audio_tpu.ops.iir.first_order_combine` —
    the same element the serial scans use.
    """
    cum_a, cum_b = lax.associative_scan(first_order_combine, (a, b), axis=-1)
    if lax.axis_size(axis_name) == 1:
        y = cum_a * jnp.asarray(y0)[..., None] + cum_b
        return y, y[..., -1]
    y_in, y_last = _prefix_fold(cum_a[..., -1], cum_b[..., -1], y0, axis_name)
    y = cum_a * y_in[..., None] + cum_b
    return y, y_last


def distributed_first_order_scan_const(alpha: float, b, y0, axis_name: str):
    """Constant-coefficient distributed scan.

    The local segment runs :func:`~iq_to_audio_tpu.ops.iir.first_order_scan_const`
    (MXU block matmuls — ``associative_scan``'s recursive halving compiles
    shard-length-proportional executables on TPU, the exact pathology
    ops/iir.py:29-47 documents); only the O(n_shards) prefix stitch is
    distributed.  ``cum_a`` has the closed form ``alpha**(k+1)``, so no
    coefficient array is materialised at all.
    """
    n_loc = b.shape[-1]
    alpha_t = jnp.asarray(alpha, b.dtype)
    zero = jnp.zeros(b.shape[:-1], b.dtype)
    y_local, b_tot = first_order_scan_const(alpha, b, zero)  # y with y_in = 0
    ramp = alpha_t ** jnp.arange(1, n_loc + 1, dtype=b.dtype)  # alpha^(k+1)
    if lax.axis_size(axis_name) == 1:
        y = y_local + ramp * jnp.asarray(y0)[..., None]
        return y, y[..., -1]
    a_tot = jnp.broadcast_to(alpha_t**n_loc, b_tot.shape)
    y_in, y_last = _prefix_fold(a_tot, b_tot, y0, axis_name)
    y = y_local + ramp * y_in[..., None]
    return y, y_last


def _dist_deemph(x, alpha: float, y0, axis_name: str):
    b = (jnp.float32(1.0) - jnp.float32(alpha)) * x
    return distributed_first_order_scan_const(alpha, b, y0, axis_name)


def _dist_dc_blocker(x, radius: float, x_prev, y_prev, axis_name: str):
    prev = _left_halo(x, 1, jnp.asarray(x_prev)[..., None], axis_name)
    u = x - jnp.concatenate([prev[..., -1:], x[..., :-1]], axis=-1)
    y, y_last = distributed_first_order_scan_const(radius, u, y_prev, axis_name)
    n = lax.axis_size(axis_name)
    x_last = lax.all_gather(x[..., -1], axis_name)[n - 1]
    return y, (x_last, y_last)


def _dist_agc(x, target: float, decay: float, gain0, axis_name: str, eps=1e-6):
    # same coefficient construction as the serial feedback_agc (ops/iir.py)
    a, b = agc_coefficients(x, target, decay, eps)
    g, g_last = distributed_first_order_scan(a, b, gain0, axis_name)
    return x * g, g_last


def build_sharded_step(
    mesh: Mesh,
    *,
    ddc_plan: DDCPlan,
    rs_plan: ResamplePlan | None,
    num_channels: int,
    codec: str = "pcm_f32le",
    iq_order: str = "iq",
    mode: str = "nfm",
    deemph_alpha: float = 0.9659,
    agc_enabled: bool = True,
    # defaults imported from the serial SSB decoder so the two paths
    # share one source of truth (demod/ssb.py)
    dc_radius: float = DC_RADIUS,
    agc_target: float = 10.0 ** (AGC_TARGET_DBFS / 20.0),
    agc_decay: float = AGC_DECAY,
    captures: int = 1,
    j_lanes: int = 1,
    lane_form: str = "jconv",
):
    """Build a pjit-compiled full pipeline step sharded over ``mesh``.

    Returns ``(fn, init_state)`` where
    ``fn(state, raw, rs_offset, incs, ddc_kernel, rs_kernel)
    -> (state, audio)``.  ``raw`` is the interleaved chunk, sharded along
    ``seq``; channel-indexed state/outputs shard along ``dp``.
    ``ddc_kernel`` must be the INTERLEAVED-domain kernel
    (``ddc.interleave_kernel(bandpass_kernel(...), iq_order)``) — the
    ``iq_order`` argument here only documents the convention the caller
    folded into those taps; ``codec`` alone drives the on-device scaling.

    ``j_lanes > 1`` selects a lane-filling channelizer; ``lane_form``
    picks the formulation the caller packed into ``ddc_kernel``:
    ``"jconv"`` (ops/ddc.py::j_lanes_kernel — channel-major ROWS, shard
    ``P("dp", None, None)``) or ``"mm"`` (the shifted-dense-matmul
    accelerator default, ops/ddc.py::shift_matmul_kernel — channel-major
    COLUMNS, shard ``P(None, None, "dp")``).  Pick
    ``j_lanes = max(1, 128 // (2C // dp))`` to fill each shard's lanes.

    ``captures > 1`` runs **data-parallel multi-capture** mode: each ``dp``
    row processes its own independent recording (SURVEY §2d DP row —
    multi-capture batches over chips).  ``raw`` then has shape
    ``(captures, 2N)`` sharded ``P("dp", "seq")``, the carried FIR tail
    becomes per-capture, and the ``num_channels`` total must pack
    capture-major so channel block ``g`` rides dp row ``g``.  Requires
    ``captures == dp``.
    """
    dp, seq = mesh.devices.shape
    C, N, D = num_channels, ddc_plan.chunk_size, ddc_plan.decimation
    if captures > 1 and captures != dp:
        raise ValueError(f"multi-capture DP needs captures ({captures}) == dp ({dp})")
    if C % dp != 0:
        raise ValueError(f"channels {C} must divide over dp={dp}")
    if N % seq != 0 or (N // seq) % D != 0:
        raise ValueError(f"chunk {N} must split into decimation-aligned seq={seq} shards")
    local_plan = replace(ddc_plan, chunk_size=N // seq)
    n_local = local_plan.chunk_size
    L = ddc_plan.num_taps
    if L - 1 > n_local:
        raise ValueError("shard length must cover the filter halo (L-1).")
    m_local = local_plan.out_size
    mode = mode.lower()

    def local_step(state, raw, rs_offset, incs, ddc_kernel, rs_kernel):
        # raw: local slice of the interleaved chunk — (2*n_local,) in
        # single-capture mode, (1, 2*n_local) per-dp-row in multi-capture DP
        raw_local = raw[0] if captures > 1 else raw
        tail_state = state["fir_tail"][0] if captures > 1 else state["fir_tail"]
        # interleaved-domain channelizer (ops/ddc.py::ddc_apply_il): the halo
        # and carried tail stay in the RAW interleaved domain — 2(L-1)
        # samples over ICI instead of a de-interleaved pair, and no
        # transpose in the per-shard program (the TPU backend compiles that
        # relayout into shard-length-proportional code)
        f = _device_scale(raw_local, codec)
        sidx = lax.axis_index("seq").astype(jnp.uint32)
        inc_lo = incs * jnp.uint32(D)
        phase0 = state["phase"] + inc_lo * (sidx * jnp.uint32(m_local))
        halo = _left_halo(f, 2 * (L - 1), tail_state, "seq")
        yr, yi, _, _ = ddc_apply_il(
            local_plan, ddc_kernel, f, halo, phase0, inc_lo,
            j_kernel=(
                ddc_kernel if j_lanes > 1 and lane_form != "mm" else None
            ),
            mm_kernel=(
                ddc_kernel if j_lanes > 1 and lane_form == "mm" else None
            ),
            j_lanes=j_lanes,
        )
        nseq = lax.axis_size("seq")
        phase_next = state["phase"] + inc_lo * jnp.uint32(N // D)
        # L == 1 means an empty tail — f[..., -0:] would be the WHOLE shard
        # (same guard as ddc_apply_il's own tail slice, ops/ddc.py)
        tail_src = f[..., -2 * (L - 1) :] if L > 1 else f[..., :0]
        fir_tail_next = lax.all_gather(tail_src, "seq", axis=0)[nseq - 1]
        if captures > 1:
            fir_tail_next = fir_tail_next[None]
        new_state = {"phase": phase_next, "fir_tail": fir_tail_next}

        if mode in {"nfm", "fm"}:
            y_pair = jnp.stack([yr, yi])  # (2, c_local, m_local)
            prev_pair = _left_halo(
                y_pair,
                1,
                jnp.stack([state["demod_prev_r"], state["demod_prev_i"]])[..., None],
                "seq",
            )
            sr = jnp.concatenate([prev_pair[0][..., -1:], yr[..., :-1]], axis=-1)
            si = jnp.concatenate([prev_pair[1][..., -1:], yi[..., :-1]], axis=-1)
            demod = polar_discriminant(yr, yi, sr, si)
            audio_ch, y_last = _dist_deemph(demod, deemph_alpha, state["deemph_y"], "seq")
            new_state["demod_prev_r"] = lax.all_gather(yr[..., -1], "seq")[nseq - 1]
            new_state["demod_prev_i"] = lax.all_gather(yi[..., -1], "seq")[nseq - 1]
            new_state["deemph_y"] = y_last
        elif mode == "am":
            env = jnp.sqrt(yr * yr + yi * yi).astype(jnp.float32)
            audio_ch, (x_last, y_last) = _dist_dc_blocker(
                env, dc_radius, state["dc_x"], state["dc_y"], "seq"
            )
            new_state["dc_x"] = x_last
            new_state["dc_y"] = y_last
        elif mode in {"usb", "lsb", "ssb"}:
            base = yr.astype(jnp.float32)
            audio_ch, (x_last, y_last) = _dist_dc_blocker(
                base, dc_radius, state["dc_x"], state["dc_y"], "seq"
            )
            new_state["dc_x"] = x_last
            new_state["dc_y"] = y_last
            if agc_enabled:
                audio_ch, g_last = _dist_agc(
                    audio_ch, agc_target, agc_decay, state["agc_gain"], "seq"
                )
                new_state["agc_gain"] = g_last
        else:
            raise ValueError(f"Unsupported demod mode '{mode}'")

        # audio-rate tail: gather the channel-rate audio and resample
        # replicated (1/decimation of input rate — not worth sharding)
        full_audio = lax.all_gather(audio_ch, "seq", axis=-1, tiled=True)
        if rs_plan is not None and not rs_plan.identity:
            audio48, rs_tail = polyphase_resample(
                rs_plan, rs_kernel, full_audio, state["rs_tail"], rs_offset
            )
            new_state["rs_tail"] = rs_tail
        else:
            audio48 = full_audio
        return new_state, audio48

    state_specs = {
        "phase": P("dp"),
        # single capture: one shared tail (replicated); multi-capture DP:
        # one carried tail per capture, sharded with its dp row.  Raw-domain
        # interleaved, (2(L-1),) per capture.
        "fir_tail": P("dp", None) if captures > 1 else P(None),
    }
    if mode in {"nfm", "fm"}:
        state_specs["demod_prev_r"] = P("dp")
        state_specs["demod_prev_i"] = P("dp")
        state_specs["deemph_y"] = P("dp")
    else:
        state_specs["dc_x"] = P("dp")
        state_specs["dc_y"] = P("dp")
        if mode in {"usb", "lsb", "ssb"} and agc_enabled:
            state_specs["agc_gain"] = P("dp")
    if rs_plan is not None and not rs_plan.identity:
        state_specs["rs_tail"] = P("dp", None)

    in_specs = (
        state_specs,
        # raw interleaved chunk(s): (2N,) over seq, or (captures, 2N) over
        # (dp, seq) when each dp row streams its own recording
        P("dp", "seq") if captures > 1 else P("seq"),
        P(),  # rs_offset
        P("dp"),  # incs
        # interleaved-domain bandpass kernel — callers build it with
        # ddc.interleave_kernel(bandpass_kernel(...), iq_order); the
        # IQ-order convention lives in the taps.  Plain (2C, 1, 2L) and
        # J-conv (J*2C, 1, width) kernels carry channels on ROWS; the
        # shifted-matmul repack (n_shift, stride, J*2C) carries them on
        # COLUMNS (ops/ddc.py::shift_matmul_kernel)
        P(None, None, "dp") if lane_form == "mm" and j_lanes > 1
        else P("dp", None, None),
        P(),  # resampler kernel
    )
    out_specs = (state_specs, P("dp", None))

    fn = jax.jit(_shard_map(local_step, mesh, in_specs, out_specs))

    def init_state():
        tail_shape = (captures, 2 * (L - 1)) if captures > 1 else (2 * (L - 1),)
        state = {
            "phase": jnp.zeros((C,), jnp.uint32),
            "fir_tail": jnp.zeros(tail_shape, jnp.float32),
        }
        if mode in {"nfm", "fm"}:
            state["demod_prev_r"] = jnp.ones((C,), jnp.float32)
            state["demod_prev_i"] = jnp.zeros((C,), jnp.float32)
            state["deemph_y"] = jnp.zeros((C,), jnp.float32)
        else:
            state["dc_x"] = jnp.zeros((C,), jnp.float32)
            state["dc_y"] = jnp.zeros((C,), jnp.float32)
            if mode in {"usb", "lsb", "ssb"} and agc_enabled:
                state["agc_gain"] = jnp.ones((C,), jnp.float32)
        if rs_plan is not None and not rs_plan.identity:
            state["rs_tail"] = jnp.zeros((C, rs_plan.tail_len), jnp.float32)
        return jax.tree_util.tree_map(
            lambda arr, spec: jax.device_put(arr, NamedSharding(mesh, spec)),
            state,
            state_specs,
        )

    return fn, init_state


def plan_for_mesh(
    *,
    num_taps: int,
    decimation: int,
    seq: int,
    target_chunk: int = 1 << 20,
) -> DDCPlan:
    """A DDCPlan whose chunk splits into decimation-aligned seq shards."""
    unit = decimation * seq
    n = max(unit, int(math.ceil(target_chunk / unit)) * unit)
    # each shard must cover the filter halo
    while (n // seq) < num_taps - 1:
        n += unit
    return DDCPlan(num_taps=num_taps, decimation=decimation, chunk_size=n)
