"""The single jitted chunk step: convert -> DDC (mix+filter+decimate as one
strided conv) -> demod scans -> polyphase-conv resample, all on device,
static shapes, state threaded as a pytree.

This is the TPU-native core that replaces the reference's per-chunk Python
orchestration (reference ``processing.py:1070-1154``).  Key properties:

* Raw file bytes (u8/s16/f32 interleaved) are uploaded as-is and converted
  on device — an s16 capture moves 4 bytes per complex sample over PCIe
  instead of 8.
* The hot path is pure float32 real-pair arithmetic built from strided
  convolutions (MXU), trig/elementwise (VPU) and associative scans — no
  complex dtype, no FFT, no gathers: it runs on minimal TPU backends and
  does ~30x fewer FLOPs than the reference's FFT overlap-save because only
  the 1-in-D decimation survivors are ever computed (see ops/ddc.py).
* Up to five channels ride the conv's output-feature axis through one
  shared pass; per-channel mixing lives in pre-rotated bandpass taps.
* The step is a module-level jit with hashable static arguments (plans +
  decoder), so identical configurations share one compiled executable, and
  the warm-up mixer-sign probe runs on the host float64 twin: exactly one
  compile per configuration.
* The carried state is donated, so XLA reuses its buffers in place.
"""

from __future__ import annotations

import logging
import os
from dataclasses import dataclass

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from ..demod.base import Decoder
from ..ops.ddc import (
    DDCPlan,
    ddc_apply_fft_il,
    ddc_apply_il,
    ddc_fullrate_stages,
    interleave_kernel,
)
from ..ops.resample import ResamplePlan, polyphase_resample

LOG = logging.getLogger(__name__)

_STATIC_ARGNAMES = (
    "ddc_plan",
    "rs_plan",
    "decoder",
    "codec",
    "iq_order",
    "pass_through",
    "dump_iq",
    "with_stages",
    "num_channels",
    "acc_chunks",
    "channelizer",
    "os_plan",
    "j_lanes",
)


def chunk_step_impl(
    state,
    accs,
    raw,
    rs_offset,
    slot,
    incs,
    ddc_kernel,
    rs_kernel,
    poly_w,
    ddc_kernel_pair=None,
    j_kernel=None,
    mm_kernel=None,
    *,
    ddc_plan: DDCPlan,
    rs_plan: ResamplePlan | None,
    decoder: Decoder | None,
    codec: str,
    iq_order: str,
    pass_through: bool,
    dump_iq: bool,
    with_stages: bool,
    num_channels: int,
    acc_chunks: int,
    channelizer: str = "conv",
    os_plan=None,
    j_lanes: int = 1,
):
    """One chunk.

    ``state`` (donated) carries the small DSP stream state; ``accs`` (NOT
    donated) carries output accumulators that fill slot-by-slot over
    ``acc_chunks`` chunks.  Each call returns fresh accumulator buffers, so
    the host can hold a window's handle and fetch it a full window later —
    one D2H round-trip per window, overlapped with compute.  Audio is
    s16-encoded on device (the WAV payload format): half the D2H bytes, and
    peak tracking stays on-chip (clip +-0.99 / scale 32767 / round —
    reference processing.py:449-452 semantics).
    """
    n = ddc_plan.chunk_size
    m = ddc_plan.out_size
    inc_lo = incs * jnp.uint32(ddc_plan.decimation)  # exact mod 2**32
    if channelizer == "native":
        # C++ phase-split channelizer as an XLA CPU custom call
        # (ops/native_ddc.py): consumes the UNSCALED raw chunk directly
        # (convert fused into the kernel); carried state is the conv-path
        # interleaved tail, so checkpoints interchange with the conv
        # channelizer.
        if with_stages:
            raise ValueError(
                "stage snapshots need the conv channelizer "
                "(unset IQ2A_CHANNELIZER or use 'conv' with --plot-stages)"
            )
        from ..ops.native_ddc import ddc_apply_native

        yr, yi, fir_tail, phase_next = ddc_apply_native(
            ddc_plan, ddc_kernel, incs, raw, state["fir_tail"],
            state["phase"], inc_lo, codec, iq_order,
        )
    elif channelizer == "fft":
        # overlap-save FFT channelizer (the reference's own kernel shape,
        # processing.py:300-346) for complex/FFT-capable backends; the
        # ddc_kernel slot carries the complex (C, F) bandpass bank
        if with_stages:
            raise ValueError(
                "stage snapshots need the conv channelizer "
                "(unset IQ2A_CHANNELIZER or use 'conv' with --plot-stages)"
            )
        f = _device_scale(raw, codec)
        yr, yi, fir_tail, phase_next = ddc_apply_fft_il(
            ddc_plan, os_plan, ddc_kernel, f,
            state["fir_tail"], state["phase"], inc_lo, iq_order,
        )
    else:
        # interleaved-domain conv: the scaled raw stream goes straight into
        # the channelizer — NO de-interleave/transpose (on TPU that relayout
        # compiles into chunk-length-proportional code, ~17 MB / ~270 s per
        # executable for a 4Mi chunk; the interleaved conv is ~0.7 MB / ~4 s
        # — measured, docs/performance.md).  IQ order + scaling conventions
        # live in the interleaved taps (ops/ddc.py::interleave_kernel).
        f = _device_scale(raw, codec)
        yr, yi, fir_tail, phase_next = ddc_apply_il(
            ddc_plan, ddc_kernel, f, state["fir_tail"], state["phase"], inc_lo,
            poly_w=poly_w, j_kernel=j_kernel, j_lanes=j_lanes,
            mm_kernel=mm_kernel,
        )
    new_state = {"phase": phase_next, "fir_tail": fir_tail}
    new_accs = {}
    slot = jnp.asarray(slot, jnp.int32)
    zero = jnp.int32(0)
    out = {}
    stages = {}
    if with_stages:
        # cold path (first-chunk PSD snapshots): materialise the pair view
        # and run the full-rate stages off the PAIR kernel
        xr, xi = _deinterleave_pair(f, iq_order, n)
        tr, ti = _deinterleave_pair(state["fir_tail"], iq_order, ddc_plan.overlap)
        tail_pair = jnp.stack([tr, ti])
        mix_r, mix_i, filt_r, filt_i = ddc_fullrate_stages(
            ddc_plan, ddc_kernel_pair, xr, xi, tail_pair, state["phase"], incs
        )
        stages["input"] = (xr, xi)
        stages["mixed"] = (mix_r, mix_i)
        stages["filtered"] = (filt_r, filt_i)
        stages["decimated"] = (yr, yi)
    if dump_iq or pass_through:
        new_accs["iq_r"] = lax.dynamic_update_slice(
            accs["iq_r"], yr, (zero, slot * jnp.int32(m))
        )
        new_accs["iq_i"] = lax.dynamic_update_slice(
            accs["iq_i"], yi, (zero, slot * jnp.int32(m))
        )
    if not pass_through:
        audio_ch, demod_state, inter = decoder.process(state["demod"], yr, yi)
        new_state["demod"] = demod_state
        if rs_plan is None or rs_plan.identity:
            audio48 = audio_ch
            cap = m
        else:
            audio48, rs_tail = polyphase_resample(
                rs_plan, rs_kernel, audio_ch, state["rs_tail"], rs_offset
            )
            new_state["rs_tail"] = rs_tail
            cap = rs_plan.out_capacity
        # the running pre-clip peak is STREAM STATE (monotone across the
        # whole run), not window output: carrying it in the donated state
        # keeps it exact while the window accumulators double-buffer
        new_state["peak"] = jnp.maximum(
            state["peak"], jnp.max(jnp.abs(audio48), axis=-1)
        )
        encoded = jnp.round(
            jnp.clip(audio48, -0.99, 0.99) * jnp.float32(32767.0)
        ).astype(jnp.int16)
        new_accs["audio"] = lax.dynamic_update_slice(
            accs["audio"], encoded, (zero, slot * jnp.int32(cap))
        )
        if with_stages:
            stages.update(inter)
    if with_stages:
        out["stages"] = stages
    return new_state, new_accs, out


# Both the stream state AND the window accumulators are donated: XLA
# writes the slot updates in place instead of copying the whole window
# every dispatch (the accumulator copy dominated dump-iq/pass-through
# windows).  The host side double-buffers the accumulators so a window
# handle parked for a deferred flush is never passed back in while its
# D2H is outstanding (pipeline.py hot loop).
_chunk_step = jax.jit(
    chunk_step_impl,
    static_argnames=_STATIC_ARGNAMES,
    donate_argnames=("state", "accs"),
)

# per-backend int32 scalar cache shared across ChunkStep instances
_SCALAR_CACHE: dict[str, dict[int, jnp.ndarray]] = {}


def superstep_impl(
    state,
    accs,
    raw_stack,
    rs_offset,
    slot_base,
    incs,
    ddc_kernel,
    rs_kernel,
    poly_w,
    ddc_kernel_pair=None,
    j_kernel=None,
    mm_kernel=None,
    **static,
):
    """Process ``S`` chunks in ONE dispatch: ``lax.scan`` over the stacked
    raw blocks, filling accumulator slots ``slot_base..slot_base+S-1``.

    On runtimes with high per-call host<->device latency this divides the
    fixed per-dispatch and per-upload costs by S.  Output metadata (rms) is
    not returned — the host computes all counts exactly anyway.

    A single ``rs_offset`` serves every scanned chunk, which is only valid
    when the resampler alignment repeats chunk-to-chunk — enforced here so
    any caller (not just the pipeline's ``rs_aligned`` gate) trips loudly.
    """
    rs_plan = static.get("rs_plan")
    ddc_plan = static["ddc_plan"]
    if (
        rs_plan is not None
        and not rs_plan.identity
        and ddc_plan.out_size % rs_plan.down != 0
    ):
        raise ValueError(
            "superstep requires decimated chunk size to be a multiple of the "
            f"resampler 'down' ({ddc_plan.out_size} % {rs_plan.down} != 0); "
            "dispatch chunks individually instead (super_chunks=1)"
        )

    def body(carry, raw):
        st, ac, k = carry
        st, ac, _ = chunk_step_impl(
            st, ac, raw, rs_offset, slot_base + k, incs, ddc_kernel, rs_kernel,
            poly_w, ddc_kernel_pair, j_kernel, mm_kernel, **static
        )
        return (st, ac, k + jnp.int32(1)), None

    (state, accs, _), _ = lax.scan(body, (state, accs, jnp.int32(0)), raw_stack)
    return state, accs


_superstep = jax.jit(
    superstep_impl,
    static_argnames=_STATIC_ARGNAMES,
    donate_argnames=("state", "accs"),
)


def _device_scale(raw: jnp.ndarray, codec: str) -> jnp.ndarray:
    """On-device sample scaling to float32 (ffmpeg-compatible), keeping the
    stream INTERLEAVED — a contiguous elementwise op the TPU backend compiles
    compactly, unlike any de-interleave/transpose (see chunk_step_impl)."""
    if codec == "pcm_u8":
        return (raw.astype(jnp.float32) - jnp.float32(128.0)) * jnp.float32(
            1.0 / 128.0
        )
    if codec == "pcm_s16le":
        return raw.astype(jnp.float32) * jnp.float32(1.0 / 32768.0)
    if codec == "pcm_f32le":
        return raw.astype(jnp.float32)
    raise ValueError(f"Unsupported codec '{codec}'")


def _deinterleave_pair(f: jnp.ndarray, iq_order: str, n: int):
    """Split a scaled interleaved stream into the (re, im) pair with the
    reference IQ-order semantics (``processing.py:268-279``).  COLD paths
    only (FFT channelizer on CPU, first-chunk stage snapshots): on TPU this
    relayout compiles into chunk-length-proportional code."""
    pairs = f.reshape(n, 2)
    if iq_order.startswith("iq"):
        i, q = pairs[:, 0], pairs[:, 1]
    else:
        q, i = pairs[:, 0], pairs[:, 1]
    if iq_order.endswith("_inv"):
        q = -q
    return i, q


def _device_convert(raw: jnp.ndarray, codec: str, iq_order: str, n: int):
    """Scale + de-interleave to the float32 (re, im) pair (cold paths)."""
    return _deinterleave_pair(_device_scale(raw, codec), iq_order, n)


@dataclass
class ChunkStep:
    """Host handle for one streaming configuration."""

    ddc_plan: DDCPlan
    rs_plan: ResamplePlan | None
    num_channels: int
    codec: str
    iq_order: str
    pass_through: bool
    dump_iq: bool
    decoder: Decoder | None
    acc_chunks: int
    super_chunks: int
    _ddc_kernel: jnp.ndarray
    _rs_kernel: jnp.ndarray | None
    _incs: jnp.ndarray
    _poly_w: jnp.ndarray | None = None
    _ddc_kernel_pair: jnp.ndarray | None = None  # stage-snapshot path only
    channelizer: str = "conv"
    os_plan: object = None
    _j_kernel: jnp.ndarray | None = None  # lane-filling conv (j_lanes > 1)
    _mm_kernel: jnp.ndarray | None = None  # shifted-dense-matmul (j_lanes > 1)
    j_lanes: int = 1

    @property
    def chunk_size(self) -> int:
        return self.ddc_plan.chunk_size

    @property
    def audio_capacity(self) -> int:
        """Per-chunk audio slot size inside the accumulator."""
        if self.pass_through:
            return 0
        if self.rs_plan is None or self.rs_plan.identity:
            return self.ddc_plan.out_size
        return self.rs_plan.out_capacity

    def init_state(self, start_sample: int = 0):
        """Fresh stream state, optionally seeded for an absolute position.

        ``start_sample`` is the absolute complex-sample index of the first
        input sample this stream will see (segmented/burst mode).  The NCO
        phase at input sample ``n`` is exactly ``inc * n mod 2**32`` (uint32
        arithmetic, so every stream computes bit-identical oscillator values
        regardless of where it starts); all other carries start fresh and the
        caller discards a lead-in while they converge (:mod:`.segmented`).
        """
        plan = self.ddc_plan
        c = self.num_channels
        if self.channelizer == "fft":
            tail = jnp.zeros((2, plan.overlap), dtype=jnp.float32)
        else:
            # conv path carries the RAW-domain interleaved tail (ddc_apply_il)
            tail = jnp.zeros((2 * plan.overlap,), dtype=jnp.float32)
        incs_np = np.asarray(self._incs, dtype=np.uint64)
        phase0 = (incs_np * np.uint64(start_sample % (1 << 32))) % (1 << 32)
        state = {
            "phase": jnp.asarray(phase0.astype(np.uint32)),
            "fir_tail": tail,
        }
        if not self.pass_through:
            state["demod"] = self.decoder.init_state((c,))
            state["peak"] = jnp.zeros((c,), dtype=jnp.float32)
            if self.rs_plan is not None and not self.rs_plan.identity:
                state["rs_tail"] = jnp.zeros(
                    (c, self.rs_plan.tail_len), dtype=jnp.float32
                )
        return state

    def init_accs(self):
        plan = self.ddc_plan
        c = self.num_channels
        k = self.acc_chunks
        accs = {}
        if self.pass_through or self.dump_iq:
            accs["iq_r"] = jnp.zeros((c, k * plan.out_size), dtype=jnp.float32)
            accs["iq_i"] = jnp.zeros((c, k * plan.out_size), dtype=jnp.float32)
        if not self.pass_through:
            accs["audio"] = jnp.zeros((c, k * self.audio_capacity), dtype=jnp.int16)
        return accs

    def _scalar(self, value: int):
        """Cached int32 device scalars: rs_offset/slot repeat every chunk, so
        re-uploading them would add two host->device RPCs per chunk.  The
        cache is PROCESS-global (keyed by backend): every pipeline run
        builds a fresh ChunkStep, and re-creating the ~acc_chunks slot
        scalars per run measured ~90 ms/pass on the CPU backend
        (docs/probes cProfile, round 3)."""
        key = jax.default_backend()
        cache = _SCALAR_CACHE.setdefault(key, {})
        arr = cache.get(value)
        if arr is None:
            arr = jnp.int32(value)
            cache[value] = arr
        return arr

    def _call(self, state, accs, raw, rs_offset, slot, with_stages: bool):
        return _chunk_step(
            state,
            accs,
            raw,
            self._scalar(int(rs_offset)),
            self._scalar(int(slot)),
            self._incs,
            self._ddc_kernel,
            self._rs_kernel,
            self._poly_w,
            self._ddc_kernel_pair if with_stages else None,
            self._j_kernel,
            self._mm_kernel,
            ddc_plan=self.ddc_plan,
            rs_plan=self.rs_plan,
            decoder=self.decoder,
            codec=self.codec,
            iq_order=self.iq_order,
            pass_through=self.pass_through,
            dump_iq=self.dump_iq,
            with_stages=with_stages,
            num_channels=self.num_channels,
            acc_chunks=self.acc_chunks,
            channelizer=self.channelizer,
            os_plan=self.os_plan,
            j_lanes=self.j_lanes,
        )

    def fn(self, state, accs, raw, rs_offset, slot):
        return self._call(state, accs, raw, rs_offset, slot, with_stages=False)

    def fn_stages(self, state, accs, raw, rs_offset, slot):
        return self._call(state, accs, raw, rs_offset, slot, with_stages=True)

    def fn_super(self, state, accs, raw_stack, rs_offset, slot_base):
        """One dispatch over a stack of ``raw_stack.shape[0]`` chunks."""
        return _superstep(
            state,
            accs,
            raw_stack,
            self._scalar(int(rs_offset)),
            self._scalar(int(slot_base)),
            self._incs,
            self._ddc_kernel,
            self._rs_kernel,
            self._poly_w,
            None,
            self._j_kernel,
            self._mm_kernel,
            ddc_plan=self.ddc_plan,
            rs_plan=self.rs_plan,
            decoder=self.decoder,
            codec=self.codec,
            iq_order=self.iq_order,
            pass_through=self.pass_through,
            dump_iq=self.dump_iq,
            with_stages=False,
            num_channels=self.num_channels,
            acc_chunks=self.acc_chunks,
            channelizer=self.channelizer,
            os_plan=self.os_plan,
            j_lanes=self.j_lanes,
        )


def build_chunk_step(
    *,
    ddc_plan: DDCPlan,
    rs_plan: ResamplePlan | None,
    ddc_kernel_np: np.ndarray,
    rs_kernel_np: np.ndarray | None,
    incs_fixed: list[int],
    codec: str,
    iq_order: str,
    decoder: Decoder | None,
    pass_through: bool,
    dump_iq: bool,
    acc_bytes_budget: int = 96 << 20,
    acc_chunks_cap: int | None = None,
    super_chunks: int | None = None,
    est_total_chunks: int | None = None,
    want_stages: bool = False,
    taps_np: np.ndarray | None = None,
) -> ChunkStep:
    c = len(incs_fixed)
    # accumulation window: batch as many chunks as fit the budget (>=1)
    per_chunk = 0
    if not pass_through:
        cap = (
            ddc_plan.out_size
            if (rs_plan is None or rs_plan.identity)
            else rs_plan.out_capacity
        )
        per_chunk += c * cap * 2
    if pass_through or dump_iq:
        per_chunk += c * ddc_plan.out_size * 8
    acc_chunks = max(1, min(64, acc_bytes_budget // max(per_chunk, 1)))
    if est_total_chunks is not None and est_total_chunks > 0:
        # never allocate (and later FETCH) more window slots than the whole
        # capture can fill — the final D2H reads every slot.  Quantised to a
        # power of two so the set of compiled executables stays tiny on
        # runtimes where each new shape costs a fresh (expensive) compile.
        pow2 = 1 << max(0, (est_total_chunks - 1).bit_length())
        acc_chunks = max(1, min(acc_chunks, pow2))
    if jax.default_backend() == "cpu":
        # accumulator windows exist for tunneled-accelerator fetch
        # economics (one D2H per window); on CPU a "fetch" is a memcpy,
        # while every chunk step COPIES the whole non-donated accumulator
        # (~2 x window bytes of traffic per chunk).  Small windows win.
        acc_chunks = min(acc_chunks, 8)
    else:
        # Accelerators get the same 8-chunk default cap, for a different
        # reason: each window's (deferred) drain acts as backpressure that
        # keeps the async upload queue shallow, so H2D and D2H interleave
        # instead of the EOF fetch queueing behind every outstanding
        # upload.  Measured on a slow tunneled wire: single-window 2.6x ->
        # 3-window 4.4x realtime device-only (docs/probes/perf_probe_r5b.py
        # and the bench per-pass A/B).  On a fast wire the deferred drains
        # ride behind the next window's upload+compute, so the cap costs at
        # most the final window's sync at EOF.
        acc_chunks = min(acc_chunks, 8)
    acc_env = os.environ.get("IQ2A_ACC")
    if acc_env:
        # exact override (not a cap): values ABOVE the default cap restore
        # the wide single-window geometry — the bench A/Bs both per pass to
        # let the day's wire pick the winner.  Still clamped below to the
        # capture's padded dispatch length so slots never outrun the data,
        # and bounded here so a stray huge value cannot size an allocation.
        acc_chunks = max(1, min(int(acc_env), 1024))
    if acc_chunks_cap is not None:
        # caller cap applies AFTER the env override: it is correctness-
        # relevant (checkpoints land on window boundaries, so windows must
        # not exceed the checkpoint cadence — pipeline.py), not a tuning.
        acc_chunks = max(1, min(acc_chunks, acc_chunks_cap))
    # superstep size: scan S chunks per dispatch; accumulation windows must
    # be a whole number of supersteps
    if super_chunks is None:
        env = os.environ.get("IQ2A_SUPER")
        if env:
            super_chunks = int(env)
        elif jax.default_backend() != "cpu":
            # one dispatch per accumulation window: the scan length is free
            # at compile time (one body) and each extra executable on the
            # EOF fetch's critical path costs a server-side load on
            # tunneled runtimes.  Capping at the capture length keeps the
            # final group full so the superstep path (not per-chunk
            # singles) handles it.
            super_chunks = acc_chunks
            if est_total_chunks is not None and est_total_chunks > 0:
                # Split the capture into ~IQ2A_GROUPS dispatch groups so the
                # hot loop can slide group k+1's upload behind group k's
                # compute (pipeline.py hot-loop schedule).  The phased and
                # overlapped schedules share this grouping — and therefore
                # ONE compiled executable (the final group is zero-padded to
                # the superstep length), which matters on tunneled runtimes
                # where every distinct executable pays a server-side load.
                groups_target = max(1, int(os.environ.get("IQ2A_GROUPS", "6")))
                super_chunks = min(
                    super_chunks, max(1, -(-est_total_chunks // groups_target))
                )
            else:
                # unbounded length (fixed-geometry burst claims, unknown-
                # length streams): the final group zero-pads to the
                # superstep, so a window-sized superstep would make a short
                # claim pay a FULL accumulator of upload+compute (measured:
                # a 3-chunk probe padded to a ~49-chunk group — hundreds of
                # MB of padding on the wire).  Keep dispatch groups small;
                # padding waste is then <= super-1 chunks per claim.
                super_chunks = min(
                    super_chunks,
                    max(1, int(os.environ.get("IQ2A_SUPER_UNBOUNDED", "2"))),
                )
        else:
            super_chunks = 1
    if (
        rs_plan is not None
        and not rs_plan.identity
        and ddc_plan.out_size % rs_plan.down != 0
    ):
        super_chunks = 1  # per-chunk rs_offset required (see superstep_impl)
    super_chunks = max(1, min(super_chunks, acc_chunks))
    acc_chunks = (acc_chunks // super_chunks) * super_chunks
    if est_total_chunks is not None and est_total_chunks > 0:
        # the final D2H reads every window slot: never allocate more slots
        # than the capture can dispatch (incl. the zero-padded final group)
        padded_total = -(-est_total_chunks // super_chunks) * super_chunks
        acc_chunks = max(super_chunks, min(acc_chunks, padded_total))

    # channelizer backend selection, three interchangeable kernels:
    #   conv   — decimating strided conv (minimal TPU backends, MXU);
    #            accelerator default, and the only stage-snapshot path.
    #   fft    — overlap-save FFT bank (the reference's own kernel shape,
    #            processing.py:300-346) for complex/FFT-capable backends.
    #   native — C++ phase-split custom call (ops/native_ddc.py): ~2x the
    #            FFT bank's CPU throughput at the headline geometry,
    #            -120 dB agreement with the conv path; CPU default when
    #            the library builds.  Needs the real lowpass taps
    #            (taps_np) and cannot produce stage snapshots.
    # IQ2A_CHANNELIZER pins one explicitly.
    env_choice = os.environ.get("IQ2A_CHANNELIZER", "").lower()
    native_ok = False
    if taps_np is not None and not want_stages and (
        env_choice == "native"
        or (env_choice == "" and jax.default_backend() == "cpu")
    ):
        from ..ops.native_ddc import available as native_available

        native_ok = native_available()
        if env_choice == "native" and not native_ok:
            LOG.warning(
                "IQ2A_CHANNELIZER=native requested but the native library "
                "is unavailable; falling back to the FFT bank"
            )
    if env_choice in ("conv", "fft"):
        channelizer = env_choice
    elif native_ok:
        channelizer = "native"
    elif jax.default_backend() == "cpu" and not want_stages:
        channelizer = "fft"
    else:
        channelizer = "conv"
    os_plan = None
    # the pair kernel feeds ONLY the stage-snapshot path (conv channelizer +
    # --plot-stages); skip the device upload for every other run
    pair_kernel_dev = (
        jnp.asarray(ddc_kernel_np, dtype=jnp.float32)
        if want_stages and channelizer != "fft"
        else None
    )
    if channelizer == "native":
        # the custom call takes the REVERSED real lowpass taps; the
        # per-channel bandpass rotation is the separable oscillator inside
        # the kernel (native/ddc.cpp), driven by the traced `incs` buffer
        kernel_dev = jnp.asarray(
            np.asarray(taps_np, dtype=np.float32)[::-1].copy()
        )
        kernel_il_np = None
    elif channelizer == "fft":
        from ..ops.ddc import bank_from_kernel
        from ..ops.osfir import OverlapSavePlan

        os_plan = OverlapSavePlan.for_chunk(
            ddc_plan.num_taps, ddc_plan.decimation, ddc_plan.chunk_size
        )
        kernel_dev = jnp.asarray(bank_from_kernel(ddc_kernel_np, os_plan))
        kernel_il_np = None
    else:
        # the hot path convolves the raw interleaved stream (IQ order and
        # Q-inversion folded into the taps) — see ops/ddc.py::interleave_kernel
        kernel_il_np = interleave_kernel(ddc_kernel_np, iq_order)
        kernel_dev = jnp.asarray(kernel_il_np)

    # Hand-written Pallas FIR — OPT-IN (IQ2A_PALLAS=1).  The honest A/B at
    # the bench geometry (loop-VARYING inputs; docs/probes/perf_probe_r3g.py)
    # measured it fastest (332 Msps) but only 13% ahead of the lane-filling
    # J-conv below (293 Msps) at 2500x the generated-code size (84 MB vs
    # 0.03 MB, 505 s compile) — and executable size is load-time poison on
    # tunneled runtimes.  It remains available (tap-axis tiled, so any
    # filter length works) for backends where the conv lowering is weak.
    poly_w_arr = None
    if (
        channelizer == "conv"
        and jax.default_backend() != "cpu"
        and os.environ.get("IQ2A_PALLAS", "0") == "1"
    ):
        from ..ops.pallas_ddc import (
            build_poly_kernel,
            choose_k_block,
            pallas_available,
        )

        if pallas_available():
            # generic polyphase repack of the INTERLEAVED kernel with window
            # stride 2D: features become the contiguous (T, 2D) reshape of
            # the raw stream (pallas_ddc.pallas_poly_fir_il)
            poly_np = build_poly_kernel(kernel_il_np, 2 * ddc_plan.decimation)
            k_taps, feat, out_ch_n = poly_np.shape
            f_pad = -(-feat // 128) * 128
            o_pad = -(-out_ch_n // 128) * 128
            kb = choose_k_block(k_taps, f_pad, o_pad)
            LOG.info(
                "Pallas poly FIR: %d taps x %d features -> %d-tap resident "
                "block (%.1f MiB VMEM%s)",
                k_taps,
                feat,
                kb,
                kb * f_pad * o_pad * 4 / 2**20,
                ", tap axis tiled" if kb < k_taps else "",
            )
            poly_w_arr = jnp.asarray(poly_np)

    # Lane-filling J-conv (ops/ddc.py::j_lanes_kernel): the plain conv's
    # 2C-wide output-channel axis uses ~0.6% of the MXU's 128 lanes
    # (measured 0.21 s per 4Mi chunk, docs/probes/perf_probe_r3f.py);
    # packing J = 128//2C consecutive decimated outputs into the channel
    # axis fills them.  Default on accelerators; IQ2A_CONVJ=0 disables,
    # and an *explicit* IQ2A_CONVJ=1 forces it even on CPU (where the plain
    # conv is the default) so cross-backend determinism can be checked with
    # matching kernels on both sides (docs/probes/perf_probe_r3d.py).
    convj_env = os.environ.get("IQ2A_CONVJ", "")
    mm_env = os.environ.get("IQ2A_MM", "")
    j_kernel_arr = None
    mm_kernel_arr = None
    j_lanes = 1
    if (
        channelizer == "conv"
        and poly_w_arr is None
        and (
            jax.default_backend() != "cpu"
            or convj_env == "1"
            or mm_env == "1"
        )
        and convj_env != "0"
    ):
        from ..ops.ddc import j_lanes_kernel, shift_matmul_kernel

        out_rows = kernel_il_np.shape[0]  # 2C
        j = max(1, 128 // out_rows)
        j = min(j, ddc_plan.out_size)
        if j > 1:
            j_lanes = j
            # Same banded product, two lowerings.  The shifted-dense-matmul
            # (ops/ddc.py::shift_matmul_kernel) is the accelerator default:
            # 5259 Msps vs the J-conv's 302 at the flagship geometry in full
            # f32 (the XLA conv LOWERING, not MXU flops, bounds the conv —
            # docs/probes/perf_probe_r5c/r5d.py), 139.8 dB SNR vs the
            # float64 host reference.  IQ2A_MM=0 restores the J-conv;
            # IQ2A_MM=1 forces the matmul even where convj was forced on
            # CPU (cross-backend determinism checks want matching kernels).
            use_mm = mm_env == "1" or (
                mm_env != "0"
                and convj_env != "1"
                and jax.default_backend() != "cpu"
            )
            if use_mm:
                mm_np = shift_matmul_kernel(kernel_il_np, ddc_plan.decimation, j)
                mm_kernel_arr = jnp.asarray(mm_np)
                LOG.info(
                    "Channelizer: shifted-dense-matmul (J=%d, %d lanes, "
                    "%d shifts x stride %d)",
                    j,
                    j * out_rows,
                    mm_np.shape[0],
                    mm_np.shape[1],
                )
            else:
                j_kernel_arr = jnp.asarray(
                    j_lanes_kernel(kernel_il_np, ddc_plan.decimation, j)
                )
                LOG.info(
                    "Channelizer: lane-filling J-conv (J=%d, %d output lanes, "
                    "kernel width %d)",
                    j,
                    j * out_rows,
                    j_kernel_arr.shape[-1],
                )
    return ChunkStep(
        ddc_plan=ddc_plan,
        rs_plan=rs_plan,
        num_channels=c,
        codec=codec,
        iq_order=iq_order,
        pass_through=pass_through,
        dump_iq=dump_iq,
        decoder=decoder,
        acc_chunks=acc_chunks,
        super_chunks=super_chunks,
        _ddc_kernel=kernel_dev,
        _rs_kernel=(
            jnp.asarray(rs_kernel_np, dtype=jnp.float32)
            if rs_kernel_np is not None
            else None
        ),
        _incs=jnp.asarray(np.asarray(incs_fixed, dtype=np.uint32)),
        _poly_w=poly_w_arr,
        _j_kernel=j_kernel_arr,
        _mm_kernel=mm_kernel_arr,
        j_lanes=j_lanes,
        _ddc_kernel_pair=pair_kernel_dev,
        channelizer=channelizer,
        os_plan=os_plan,
    )
