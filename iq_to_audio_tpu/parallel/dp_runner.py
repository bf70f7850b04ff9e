"""Multi-capture data-parallel front end.

Streams N independent recordings through ONE sharded pipeline step, one
capture per ``dp`` mesh row (SURVEY §2d DP row: "shard_map/pjit over chips
for multi-capture batches").  The per-device program is identical to the
single-capture sequence-parallel step (:func:`build_sharded_step`); this
module supplies the host side: per-capture probing, aligned chunk feeding,
exact output bookkeeping, and per-channel WAV writers.

Scope: same demod configuration and capture geometry (sample rate, codec,
IQ order) across captures — that is what makes them batchable into one
compiled executable.  Heterogeneous runs fall back to sequential
:class:`~iq_to_audio_tpu.pipeline.pipeline.ProcessingPipeline` loops (the
reference's behaviour for everything, ``cli.py:683-710``).
"""

from __future__ import annotations

import contextlib
import logging
import math
import threading
from dataclasses import dataclass, field
from pathlib import Path

import numpy as np

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from ..io.formats import resolve_input_format
from ..io.probe import probe_sample_rate
from ..io.reader import IQReader
from ..io.writer import AudioWriter
from ..ops.ddc import bandpass_kernel, interleave_kernel
from ..ops.nco import nco_increment_fixed
from ..ops.resample import ResamplePlan, design_resampler_kernel
from ..pipeline.progress import PhaseState, ProgressSink, ProgressTracker
from ..ref.chain import choose_mix_sign
from ..utils.freq import detect_center_frequency
from .mesh import make_mesh
from .sharded import build_sharded_step, plan_for_mesh

LOG = logging.getLogger(__name__)

_OUTPUT_RATE = 48_000.0


@dataclass
class CaptureJob:
    """One recording and its channel targets."""

    in_path: Path
    target_freqs: list[float]
    output_paths: list[Path] = field(default_factory=list)
    center_freq: float | None = None
    input_format: str | None = None
    input_sample_rate: float | None = None


@dataclass
class DPResult:
    sample_rate: float
    decimation: int
    fs_channel: float
    num_captures: int
    channels_per_capture: int
    audio_peaks: list[list[float]]  # [capture][channel]
    frames_processed: int


def _annotate(path: Path, freq: float) -> Path:
    return path.with_name(f"{path.stem}_{int(round(freq))}{path.suffix}")


def run_captures_dp(
    jobs: list[CaptureJob],
    *,
    bandwidth: float = 12_500.0,
    demod_mode: str = "nfm",
    fs_ch_target: float = 96_000.0,
    deemph_us: float = 300.0,
    agc_enabled: bool = True,
    iq_order: str = "iq",
    mix_sign_override: int | None = None,
    mesh=None,
    target_chunk: int = 1 << 18,
    progress_sink: ProgressSink | None = None,
) -> DPResult:
    """Process ``len(jobs)`` captures data-parallel over the device mesh.

    Every capture must share sample rate / codec; every job must list the
    same number of targets (the dp rows run one compiled program).

    ``progress_sink`` receives one "chunks" phase and may request
    cooperative cancellation through its cancel callback (same contract
    as the serial pipeline, reference ``processing.py:690,1205-1211``):
    the run stops at the next chunk boundary, every partial output file
    is deleted, and :class:`~..pipeline.pipeline.ProcessingCancelled`
    is raised.
    """
    from ..pipeline.filters import compute_decimation, design_channel_filter

    G = len(jobs)
    if G < 1:
        raise ValueError("run_captures_dp needs at least one capture")
    K = len(jobs[0].target_freqs)
    if K < 1 or any(len(j.target_freqs) != K for j in jobs):
        raise ValueError("every capture must list the same number of targets")

    # --- per-capture probing ------------------------------------------------
    specs, rates, centers = [], [], []
    for job in jobs:
        spec, _src = resolve_input_format(
            Path(job.in_path), requested=job.input_format
        )
        specs.append(spec)
        if job.input_sample_rate:
            rates.append(float(job.input_sample_rate))
        else:
            probe = probe_sample_rate(Path(job.in_path))
            if probe.value is None:
                raise ValueError(f"Cannot determine sample rate of {job.in_path}")
            rates.append(float(probe.value))
        if job.center_freq is not None:
            centers.append(float(job.center_freq))
        else:
            det = detect_center_frequency(Path(job.in_path))
            if det.value is None:
                raise ValueError(f"Cannot determine center frequency of {job.in_path}")
            centers.append(float(det.value))
    sample_rate = rates[0]
    codec = specs[0].codec
    if any(abs(r - sample_rate) > 1e-6 for r in rates) or any(
        s.codec != codec for s in specs
    ):
        raise ValueError(
            "multi-capture DP requires identical sample rate and codec across "
            "captures; run heterogeneous captures sequentially"
        )

    # --- shared DSP geometry --------------------------------------------------
    decimation, fs_channel = compute_decimation(sample_rate, fs_ch_target)
    taps = design_channel_filter(sample_rate, bandwidth, decimation)
    if mesh is None:
        n_dev = len(jax.devices())
        if n_dev % G != 0:
            raise ValueError(
                f"{n_dev} devices cannot host dp={G} captures evenly"
            )
        mesh = make_mesh(n_dev, dp=G)
    dp, seq = mesh.devices.shape
    if dp != G:
        raise ValueError(f"mesh dp axis ({dp}) must equal capture count ({G})")
    rate_plan = ResamplePlan.create(fs_channel, _OUTPUT_RATE, 1)
    align = decimation * (1 if rate_plan.identity else rate_plan.down)
    ddc_plan = plan_for_mesh(
        num_taps=len(taps),
        decimation=decimation,
        seq=seq * (align // math.gcd(align, decimation * seq)),
        target_chunk=target_chunk,
    )
    # plan_for_mesh aligns to decimation*seq; re-check the resampler alignment
    n = ddc_plan.chunk_size
    unit = decimation * seq
    lcm = unit * align // math.gcd(unit, align)
    if n % lcm:
        from dataclasses import replace

        n = ((n + lcm - 1) // lcm) * lcm
        ddc_plan = replace(ddc_plan, chunk_size=n)
    rs_plan = ResamplePlan.create(fs_channel, _OUTPUT_RATE, ddc_plan.out_size)

    offsets = [
        [f - c for f in job.target_freqs] for job, c in zip(jobs, centers)
    ]

    # --- per-capture mixer sign (host float64 probe) -------------------------
    signs = []
    chunk = ddc_plan.chunk_size
    # the probe needs only a snippet (same cap as the serial warm-up,
    # pipeline.py) — not a full converted chunk held for the whole run
    probe_len = min(chunk, max(int(sample_rate * 0.05), 4 * len(taps), 131_072))
    for g, job in enumerate(jobs):
        if mix_sign_override is not None:
            signs.append(int(mix_sign_override))
            continue
        with IQReader(
            Path(job.in_path), probe_len, iq_order, specs[g],
            sample_rate=sample_rate if specs[g].container == "raw" else None,
            prefetch_depth=0,
        ) as r:
            warm = r.read_block()
        if warm is None or warm.size == 0:
            raise ValueError(f"Input {job.in_path} contains no samples.")
        signs.append(
            choose_mix_sign(warm, sample_rate, offsets[g][0], taps, decimation)
        )

    incs = [
        nco_increment_fixed(off, sample_rate, sign=signs[g])
        for g in range(G)
        for off in offsets[g]
    ]
    ddc_kernel = interleave_kernel(bandpass_kernel(taps, incs), iq_order)
    rs_kernel = (
        None if rs_plan.identity else design_resampler_kernel(rs_plan.up, rs_plan.down)
    )
    # lane-filling channelizer per dp shard (same rationale as the
    # single-device default): the shifted-dense-matmul on accelerators,
    # the J-conv elsewhere (ops/ddc.py::lane_formulation).  Channel-major
    # layout (rows for jconv, columns for mm) keeps each capture's J
    # blocks on its dp row.
    dp = mesh.devices.shape[0]
    local_rows = max(1, (2 * G * K) // dp)
    j_lanes = max(1, 128 // local_rows)
    lane_form = "jconv"
    if j_lanes > 1:
        from ..ops.ddc import (
            j_lanes_kernel,
            lane_formulation,
            shift_matmul_kernel,
        )

        lane_form = lane_formulation()
        if lane_form == "mm":
            ddc_kernel = shift_matmul_kernel(
                ddc_kernel, ddc_plan.decimation, j_lanes
            )
        else:
            ddc_kernel = j_lanes_kernel(ddc_kernel, ddc_plan.decimation, j_lanes)

    fn, init_state = build_sharded_step(
        mesh,
        ddc_plan=ddc_plan,
        rs_plan=rs_plan,
        num_channels=G * K,
        codec=codec,
        iq_order=iq_order,
        mode=demod_mode,
        # same tau guard as the serial decoder (demod/nfm.py::setup)
        deemph_alpha=math.exp(-1.0 / (fs_channel * max(deemph_us * 1e-6, 1e-6))),
        agc_enabled=agc_enabled,
        captures=G if G > 1 else 1,
        j_lanes=j_lanes,
        lane_form=lane_form,
    )
    state = init_state()
    incs_sh = jax.device_put(
        np.asarray(incs, np.uint32), NamedSharding(mesh, P("dp"))
    )
    ddc_k_sh = jax.device_put(
        ddc_kernel,
        NamedSharding(
            mesh,
            P(None, None, "dp")
            if (lane_form == "mm" and j_lanes > 1)
            else P("dp", None, None),
        ),
    )
    rs_k_sh = (
        jax.device_put(rs_kernel, NamedSharding(mesh, P()))
        if rs_kernel is not None
        else jax.device_put(np.zeros((1, 1, 1), np.float32), NamedSharding(mesh, P()))
    )
    raw_spec = NamedSharding(mesh, P("dp", "seq") if G > 1 else P("seq"))

    # --- writers --------------------------------------------------------------
    writers: list[list[AudioWriter]] = []
    for job in jobs:
        outs = job.output_paths
        if not outs:
            outs = [
                _annotate(Path(job.in_path).with_suffix(".wav"), f)
                for f in job.target_freqs
            ]
        elif len(outs) == 1 and K > 1:
            outs = [_annotate(Path(outs[0]), f) for f in job.target_freqs]
        if len(outs) != K:
            raise ValueError(
                f"{job.in_path}: {len(outs)} output path(s) for {K} target "
                "frequencies — supply one shared path or one per target."
            )
        ws = [AudioWriter(Path(p)) for p in outs]
        writers.append(ws)

    # --- aligned streaming loop ------------------------------------------------
    # readers enter inside the try: a failed __enter__ (mono WAV, vanished
    # file) must still close the already-open writers and earlier readers
    readers = [
        IQReader(
            Path(job.in_path), chunk, iq_order, specs[g],
            sample_rate=sample_rate if specs[g].container == "raw" else None,
            prefetch_depth=0,
        )
        for g, job in enumerate(jobs)
    ]
    entered: list[IQReader] = []
    tracker = ProgressTracker(progress_sink)
    cancel_requested = threading.Event()
    with contextlib.suppress(AttributeError):
        if progress_sink is not None:
            progress_sink.set_cancel_callback(cancel_requested.set)

    def _close_writers_quietly() -> None:
        for ws in writers:
            for w in ws:
                with contextlib.suppress(Exception):
                    w.close()

    try:
        for r in readers:
            r.__enter__()
            entered.append(r)
        total_frames = min(r.total_frames for r in readers)
        if len({r.total_frames for r in readers}) > 1:
            LOG.warning(
                "Captures differ in length; processing the common %d frames.",
                total_frames,
            )
        n_chunks = max(1, -(-int(total_frames) // chunk))
        tracker.start(
            [PhaseState("chunks", "Process chunks", float(n_chunks),
                        unit="chunks")]
        )
        n_dec = ddc_plan.out_size
        rs_in = 0
        rs_emitted = 0
        dec_emitted = 0
        processed = 0
        chunks_done = 0
        last_audio = None
        last_count = 0
        while processed < total_frames:
            if cancel_requested.is_set():
                from ..pipeline.pipeline import ProcessingCancelled

                raise ProcessingCancelled("Processing cancelled by request.")
            valid = min(chunk, total_frames - processed)
            stack = np.zeros((G, 2 * chunk), dtype=readers[0].raw_dtype)
            for g, r in enumerate(readers):
                blk = r.read_block_raw()
                if blk is None:
                    blk = np.zeros(0, dtype=stack.dtype)
                stack[g, : min(blk.size, 2 * chunk)] = blk[: 2 * chunk]
            raw_dev = jax.device_put(stack if G > 1 else stack[0], raw_spec)
            rs_offset = 0 if rs_plan.identity else rs_plan.chunk_offset(rs_in)
            state, audio = fn(
                state, raw_dev, np.int32(rs_offset), incs_sh, ddc_k_sh, rs_k_sh
            )
            processed += valid
            dec_total = -(-processed // decimation)
            dec_valid = dec_total - dec_emitted
            dec_emitted = dec_total
            if rs_plan.identity:
                count = dec_valid
            else:
                count = rs_plan.out_count(rs_in, dec_valid)
                rs_in += n_dec
            audio_np = np.asarray(audio)  # (G*K, cap)
            for g in range(G):
                for k in range(K):
                    w = writers[g][k]
                    raw_seg = audio_np[g * K + k, :count]
                    # pre-clip peak (the single-capture path's contract:
                    # the report must show the amplitude the clipper cost)
                    w.peak = max(w.peak, float(np.abs(raw_seg).max(initial=0.0)))
                    seg = np.clip(raw_seg, -0.99, 0.99)
                    w.write_s16(
                        np.round(seg * 32767.0).astype(np.int16)
                    )
            rs_emitted += count
            last_audio, last_count = audio_np, count
            chunks_done += 1
            tracker.advance("chunks", 1.0)
            tracker.status(
                f"chunk {chunks_done}/{n_chunks} "
                f"({len(jobs)} capture(s) x {K} channel(s))"
            )
        if not rs_plan.identity and last_audio is not None:
            rs_valid = dec_emitted
            extra = rs_plan.final_flush_count(rs_valid, rs_emitted)
            if extra > 0:
                for g in range(G):
                    for k in range(K):
                        raw_seg = last_audio[
                            g * K + k, last_count : last_count + extra
                        ]
                        writers[g][k].peak = max(
                            writers[g][k].peak,
                            float(np.abs(raw_seg).max(initial=0.0)),
                        )
                        seg = np.clip(raw_seg, -0.99, 0.99)
                        writers[g][k].write_s16(
                            np.round(seg * 32767.0).astype(np.int16)
                        )
    except BaseException as exc:
        from ..pipeline.pipeline import ProcessingCancelled

        if isinstance(exc, ProcessingCancelled):
            # serial-pipeline parity (pipeline.py run loop): delete the
            # partial per-channel outputs on cancel — close first so the
            # unlink cannot race an open handle (Windows refuses it)
            _close_writers_quietly()
            for ws in writers:
                for w in ws:
                    with contextlib.suppress(OSError):
                        Path(w.output_path).unlink(missing_ok=True)
        raise
    finally:
        for r in entered:
            r.close()
        _close_writers_quietly()
        tracker.close()

    return DPResult(
        sample_rate=sample_rate,
        decimation=decimation,
        fs_channel=fs_channel,
        num_captures=G,
        channels_per_capture=K,
        audio_peaks=[[w.peak for w in ws] for ws in writers],
        frames_processed=processed,
    )
