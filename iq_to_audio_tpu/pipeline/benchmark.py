"""Self-contained synthetic throughput benchmark.

Mirrors the reference's built-in benchmark (reference ``benchmark.py``):
synthesise a capture (carrier at a known offset plus Gaussian noise,
seeded rng, PCM_16 WAV), push it through the full pipeline, and report
elapsed wall time, realtime factor and audio peak.

XLA compiles the chunk step on first use, so when ``warmup=True`` an
untimed pass runs first and the steady-state pass is what gets timed;
the compile-inclusive cold time is reported separately in
``results_out["cold_elapsed"]``.
"""

from __future__ import annotations

import logging
import math
import tempfile
import time
from collections.abc import Mapping
from pathlib import Path
from typing import Any

import numpy as np

from ..io.writer import write_stereo_wav
from .config import ProcessingConfig
from .pipeline import ProcessingPipeline

LOG = logging.getLogger(__name__)

__all__ = [
    "run_benchmark",
    "generate_synthetic_iq",
    "measure_step_resident_msps",
]


def measure_step_resident_msps(
    sample_rate: float = 2_500_000.0,
    *,
    offset_hz: float = 25_000.0,
    target_chunk: int = 1 << 22,
    t_fetch: float | None = None,
    seconds_target: float = 1.0,
    reps_cap: int = 2048,
) -> dict | None:
    """Measure the FULL pipeline step's resident-compute rate, input Msps.

    The channelizer-only resident probe (``hetero.py
    measure_resident_compute``) stopped representing the pipeline once the
    shifted-dense-matmul channelizer landed (~5200 Msps at the flagship
    geometry — docs/probes/perf_probe_r5d.py): the demod scans, resampler
    and s16 encode now bound what the chip delivers per chunk.  This
    measurement runs the PRODUCTION superstep — ``build_chunk_step`` with
    its real formulation selection (mm kernel, J-lanes, superstep scan) at
    the flagship NFM geometry (taps/decimation/deemph/AGC/48 kHz out) —
    over resident int16 input, ``reps`` supersteps chained inside ONE
    executable (``lax.fori_loop`` carrying the stream state, so dispatch
    latency and the tunneled relay's per-fetch toll stay off the clock;
    same methodology as the channelizer probe).

    Returns ``{"msps", "x_realtime", "reps", "super_chunks",
    "chunk_size"}`` or None when unavailable (CPU backend without
    ``IQ2A_MEASURE_MSPS=1``, or the probe failed).  The rate divides the
    measured wall time (minus one small-fetch ``t_fetch``) into
    ``reps * super_chunks * chunk_size`` complex input samples.
    """
    import os

    import jax

    if (
        jax.default_backend() == "cpu"
        and os.environ.get("IQ2A_MEASURE_MSPS") != "1"
    ):
        return None
    try:
        from functools import partial

        import jax.numpy as jnp
        from jax import lax

        from ..demod import create_decoder
        from ..ops.ddc import DDCPlan, bandpass_kernel
        from ..ops.nco import nco_increment_fixed
        from ..ops.resample import ResamplePlan, design_resampler_kernel
        from .filters import compute_decimation, design_channel_filter
        from .step import build_chunk_step, superstep_impl

        decim, fs_ch = compute_decimation(sample_rate, 96_000.0)
        taps = design_channel_filter(sample_rate, 12_500.0, decim)
        align_probe = ResamplePlan.create(fs_ch, 48_000.0, 1)
        ddc_plan = DDCPlan.create(
            len(taps),
            decim,
            target_chunk=target_chunk,
            out_align=align_probe.down,
            max_chunk=max(target_chunk, 1 << 22),
        )
        rs_plan = ResamplePlan.create(fs_ch, 48_000.0, ddc_plan.out_size)
        decoder = create_decoder("nfm", deemph_us=300.0, agc_enabled=True)
        decoder.setup(fs_ch)
        inc = nco_increment_fixed(offset_hz, sample_rate)
        step = build_chunk_step(
            ddc_plan=ddc_plan,
            rs_plan=rs_plan,
            ddc_kernel_np=bandpass_kernel(taps, [inc]),
            rs_kernel_np=design_resampler_kernel(rs_plan.up, rs_plan.down),
            incs_fixed=[inc],
            codec="pcm_s16le",
            iq_order="iq",
            decoder=decoder,
            pass_through=False,
            dump_iq=False,
            est_total_chunks=8,
            taps_np=taps,
        )
        S = step.super_chunks
        static = dict(
            ddc_plan=step.ddc_plan,
            rs_plan=step.rs_plan,
            decoder=step.decoder,
            codec=step.codec,
            iq_order=step.iq_order,
            pass_through=False,
            dump_iq=False,
            with_stages=False,
            num_channels=1,
            acc_chunks=step.acc_chunks,
            channelizer=step.channelizer,
            os_plan=step.os_plan,
            j_lanes=step.j_lanes,
        )
        rng = np.random.default_rng(0)
        raw = jnp.asarray(
            (
                rng.normal(scale=0.05, size=(S, 2 * ddc_plan.chunk_size))
                * 8000.0
            ).astype("<i2")
        )
        rs_offset = jnp.int32(rs_plan.chunk_offset(0))
        slot0 = jnp.int32(0)

        def _probe(state, accs, raw_stack, *, reps: int):
            def body(_, carry):
                st, ac = carry
                st, ac = superstep_impl(
                    st, ac, raw_stack, rs_offset, slot0,
                    step._incs, step._ddc_kernel, step._rs_kernel,
                    step._poly_w, None, step._j_kernel, step._mm_kernel,
                    **static,
                )
                return (st, ac)

            st, ac = lax.fori_loop(0, reps, body, (state, accs))
            # a tiny reduction: the fetched payload must not ride the clock
            return (
                ac["audio"][..., -1].astype(jnp.int32).sum()
                + jnp.asarray(st["phase"], jnp.int32).sum()
            )

        def _timed(reps: int) -> float:
            fn = jax.jit(partial(_probe, reps=reps))
            np.asarray(fn(step.init_state(), step.init_accs(), raw))  # warm
            t0 = time.perf_counter()
            np.asarray(fn(step.init_state(), step.init_accs(), raw))
            return time.perf_counter() - t0

        if t_fetch is None:
            small = np.zeros(1 << 18, np.float32)  # 1 MiB
            for _ in range(2):
                down = jax.device_put(small)
                down.block_until_ready()
                t0 = time.perf_counter()
                np.asarray(down)
                t_fetch = max(time.perf_counter() - t0, 1e-6)
                if t_fetch <= 30.0:
                    break  # else: that was the session toll — re-time
        per_rep = S * ddc_plan.chunk_size
        rough_elapsed = _timed(2)
        rough = 2 * per_rep / max(rough_elapsed - t_fetch, 1e-3)
        # size the real pass for ~seconds_target of execute: a pass much
        # shorter than the relay's oscillating per-fetch latency (0.1-1 s)
        # measures the fetch, not the engine
        reps = int(min(max(rough * seconds_target / per_rep, 2), reps_cap))
        elapsed = _timed(reps)
        msps = reps * per_rep / max(elapsed - t_fetch, 1e-3) / 1e6
        msps = min(max(msps, 0.1), 100_000.0)
        out = {
            "msps": msps,
            "x_realtime": msps * 1e6 / sample_rate,
            "reps": reps,
            "super_chunks": S,
            "chunk_size": ddc_plan.chunk_size,
        }
        LOG.info(
            "full-step resident: %.0f Msps = %.1fx realtime of the %.1f MS/s "
            "workload (%d reps x %d-chunk superstep, chunk %d, channelizer "
            "%s%s)",
            msps, out["x_realtime"], sample_rate / 1e6, reps, S,
            ddc_plan.chunk_size, step.channelizer,
            "/mm" if step._mm_kernel is not None else
            ("/jconv" if step._j_kernel is not None else ""),
        )
        return out
    except Exception:
        LOG.exception("full-step resident measurement failed")
        return None


def generate_synthetic_iq(
    path: Path,
    sample_rate: float,
    seconds: float,
    freq_offset: float,
    *,
    amplitude: float = 0.7,
    noise_std: float = 0.02,
    extra_offsets: tuple[float, ...] = (),
) -> None:
    """Write a synthetic IQ WAV: one carrier at ``freq_offset`` (plus one
    per entry of ``extra_offsets`` for multi-channel runs) over seeded
    Gaussian noise, clipped and stored as PCM_16 stereo.

    Behavior-matches the reference generator (reference
    ``benchmark.py:19-38``) with the multi-carrier extension.
    """
    n = int(round(sample_rate * seconds))
    if n <= 0:
        raise ValueError("Benchmark duration is too short to generate samples.")
    t = np.arange(n, dtype=np.float64) / sample_rate
    carriers = np.exp(2j * math.pi * freq_offset * t)
    for k, off in enumerate(extra_offsets):
        carriers = carriers + 0.6 * np.exp(1j * (2.0 * math.pi * off * t + 0.37 * (k + 1)))
    # normalise so the summed carriers still peak near `amplitude`
    gain = amplitude / (1.0 + 0.6 * len(extra_offsets))
    noise = np.random.default_rng(42).normal(scale=noise_std, size=(n, 2))
    frames = np.empty((n, 2), dtype=np.float32)
    frames[:, 0] = gain * carriers.real + noise[:, 0]
    frames[:, 1] = gain * carriers.imag + noise[:, 1]
    np.clip(frames, -0.999, 0.999, out=frames)
    write_stereo_wav(path, frames, int(sample_rate), codec="pcm_s16le")


def _resolve_freqs(
    center: float | None, target: float | None, offset: float
) -> tuple[float, float, float]:
    """Fill in whichever of (center, target) is missing; return
    (center, target, actual_offset)."""
    if center is not None and target is not None:
        return center, target, target - center
    if center is not None:
        return center, center + offset, offset
    if target is not None:
        return target - offset, target, offset
    center = 400_000_000.0
    return center, center + offset, offset


def _spread_channels(center: float, sample_rate: float, channels: int):
    """Extra carriers alternating above/below center across 35% of the band."""
    if channels <= 1:
        return (), []
    span = sample_rate * 0.35
    offsets = tuple(
        span * (k + 1) / channels * (1 if k % 2 == 0 else -1)
        for k in range(channels - 1)
    )
    return offsets, [center + o for o in offsets]


def run_benchmark(
    *,
    seconds: float,
    sample_rate: float,
    freq_offset: float,
    center_freq: float | None,
    target_freq: float | None,
    base_kwargs: Mapping[str, object] | None,
    warmup: bool = True,
    results_out: dict | None = None,
    channels: int = 1,
) -> int:
    """Generate a synthetic capture and time one full pipeline pass.

    ``channels > 1`` benchmarks the batched shared-channelizer path by
    spreading additional carriers across the capture bandwidth. Returns 0
    (CLI exit code); detailed numbers land in ``results_out`` if given.
    """
    if seconds <= 0:
        raise ValueError("Benchmark duration must be positive.")
    if sample_rate <= 0:
        raise ValueError("Benchmark sample rate must be positive.")

    overrides: dict[str, Any] = dict(base_kwargs) if base_kwargs else {}
    mode = overrides.get("demod_mode")
    demod = mode.lower() if isinstance(mode, str) else "nfm"
    center_freq, target_freq, offset = _resolve_freqs(
        center_freq, target_freq, freq_offset
    )
    # validate the RESOLVED offset: --fc/--ft can imply an out-of-band
    # tuning the raw freq_offset parameter never sees
    if abs(offset) >= sample_rate / 2.0:
        raise ValueError("Benchmark offset must be within half the sample rate.")
    LOG.info(
        "Running benchmark: %.2f s at %.2f MS/s, demod=%s, offset %.1f kHz",
        seconds,
        sample_rate / 1e6,
        demod.upper(),
        offset / 1e3,
    )

    with tempfile.TemporaryDirectory() as tmpdir:
        workdir = Path(tmpdir)
        capture = workdir / f"benchmark_fc-{int(center_freq)}Hz.wav"
        extra_offsets, extra_targets = _spread_channels(
            center_freq, sample_rate, channels
        )
        generate_synthetic_iq(
            capture,
            sample_rate=sample_rate,
            seconds=seconds,
            freq_offset=offset,
            extra_offsets=extra_offsets,
        )

        overrides.pop("target_freqs", None)
        overrides["target_freq"] = target_freq
        overrides["extra_target_freqs"] = extra_targets
        overrides["center_freq"] = center_freq
        overrides["center_freq_source"] = "benchmark"
        overrides["demod_mode"] = demod
        overrides["output_path"] = workdir / f"benchmark_audio_{demod}.wav"
        overrides["probe_only"] = False
        if channels > 1:
            overrides["mix_sign_override"] = 1

        def _one_pass() -> tuple[float, Any]:
            cfg = ProcessingConfig(in_path=capture, **overrides)
            t0 = time.perf_counter()
            res = ProcessingPipeline(cfg).run(progress_sink=None)
            return time.perf_counter() - t0, res

        cold_elapsed = None
        if warmup:
            cold_elapsed, _ = _one_pass()
            LOG.info("Warm-up (compile-inclusive) pass: %.2f s.", cold_elapsed)
        elapsed, result = _one_pass()

    iq_samples = sample_rate * seconds
    realtime = seconds / elapsed if elapsed > 0 else float("inf")
    peak_dbfs = 20.0 * math.log10(max(result.audio_peak, 1e-6))
    LOG.info(
        "Benchmark processed %.0f IQ samples in %.2f s (%.2f x realtime).",
        iq_samples,
        elapsed,
        realtime,
    )
    LOG.info(
        "Channel decimation %d -> %.1f Hz; audio peak %.2f dBFS.",
        result.decimation,
        result.fs_channel,
        peak_dbfs,
    )

    if results_out is not None:
        results_out.update(
            seconds=seconds,
            sample_rate=sample_rate,
            demod=demod,
            iq_samples=iq_samples,
            elapsed=elapsed,
            cold_elapsed=cold_elapsed,
            realtime_factor=realtime,
            loop_seconds=result.loop_seconds,
            msps=iq_samples / max(elapsed, 1e-12) / 1e6,
            audio_peak_dbfs=peak_dbfs,
            decimation=result.decimation,
            fs_channel=result.fs_channel,
        )
    return 0
