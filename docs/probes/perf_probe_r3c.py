"""Round-3 probe C: full-engine steady state with the conv default.

Measures, with the session toll paid on a background thread:

1. the complete superstep (convert -> conv channelizer -> NFM demod ->
   resample -> s16 encode) at the bench geometry, S=3 scan, data
   resident — the engine-side Msps that sets the fast-wire ceiling;
2. the same with the overlap-save FFT-bank channelizer
   (IQ2A_CHANNELIZER=fft) — is the conv still the right TPU default?
3. stage isolation: channelizer-only vs full chain, to locate remaining
   exec headroom.

Provenance: round 3, 2026-08-17.  Results -> docs/performance.md.
"""

from __future__ import annotations

import logging
import sys
import threading
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO))

logging.basicConfig(level=logging.INFO, stream=sys.stderr)
LOG = logging.getLogger("probe_r3c")

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def main() -> int:
    from iq_to_audio_tpu.demod import create_decoder
    from iq_to_audio_tpu.ops.ddc import DDCPlan, bandpass_kernel
    from iq_to_audio_tpu.ops.nco import nco_increment_fixed
    from iq_to_audio_tpu.ops.resample import ResamplePlan, design_resampler_kernel
    from iq_to_audio_tpu.pipeline.filters import compute_decimation, design_channel_filter
    from iq_to_audio_tpu.pipeline.step import build_chunk_step

    LOG.info("backend: %s", jax.default_backend())
    toll_done = threading.Event()

    def _pay_toll():
        t0 = time.perf_counter()
        np.asarray(jnp.ones((128, 128)) @ jnp.ones((128, 128)))
        LOG.info("session toll paid: %.1f s", time.perf_counter() - t0)
        toll_done.set()

    threading.Thread(target=_pay_toll, daemon=True).start()

    fs = 2_500_000.0
    decim, fs_ch = compute_decimation(fs, 96_000.0)
    taps = design_channel_filter(fs, 12_500.0, decim)
    rate_plan = ResamplePlan.create(fs_ch, 48_000.0, 1)
    ddc_plan = DDCPlan.create(
        len(taps), decim, target_chunk=1 << 22,
        out_align=rate_plan.down, max_chunk=1 << 22,
    )
    rs_plan = ResamplePlan.create(fs_ch, 48_000.0, ddc_plan.out_size)
    inc = nco_increment_fixed(25_000.0, fs)
    N = ddc_plan.chunk_size
    S = 3
    LOG.info("geometry: L=%d D=%d N=%d S=%d", len(taps), decim, N, S)

    rng = np.random.default_rng(0)
    raw_np = (rng.normal(scale=0.05, size=(S, 2 * N)) * 32767).astype("<i2")

    def build(channelizer_env):
        import os

        if channelizer_env:
            os.environ["IQ2A_CHANNELIZER"] = channelizer_env
        else:
            os.environ.pop("IQ2A_CHANNELIZER", None)
        decoder = create_decoder("nfm", deemph_us=300.0, agc_enabled=True)
        decoder.setup(fs_ch)
        return build_chunk_step(
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
            super_chunks=S,
            est_total_chunks=18,
        )

    cases = []
    # NOTE: the ("fft", "fft") variant was attempted and fails at upload
    # time with UNIMPLEMENTED on this relay backend — complex64 arrays are
    # not supported at all, confirming the conv-first design constraint
    # (docs/architecture.md "Why convolutions").
    for label, env in (("conv", "conv"),):
        step = build(env)
        raw_dev = jax.device_put(raw_np)
        state = step.init_state()
        accs = step.init_accs()
        t0 = time.perf_counter()
        state, accs = step.fn_super(state, accs, raw_dev, 0, 0)
        jax.block_until_ready(accs["audio"])
        LOG.info("%s: first call (compile+load) %.1f s", label, time.perf_counter() - t0)
        cases.append((label, step, raw_dev, state, accs))

    if not toll_done.is_set():
        LOG.info("waiting for toll...")
        toll_done.wait(timeout=2400)

    # per-dispatch scheduling cost on THIS connection: a trivial jitted
    # matmul chained the same way — if it costs what the superstep costs,
    # the connection throttles dispatches, not compute
    trivial = jax.jit(lambda a: (a @ a)[:2, :2])
    t_in = jnp.ones((128, 128))
    np.asarray(trivial(t_in))
    for ch in (1, 8):
        t0 = time.perf_counter()
        r = None
        for _ in range(ch):
            r = trivial(t_in)
        np.asarray(r)
        LOG.info("trivial dispatch x%d: %.4f s (%.4f s each)",
                 ch, time.perf_counter() - t0, (time.perf_counter() - t0) / ch)

    for label, step, raw_dev, state, accs in cases:
        np.asarray(accs["peak"])  # sync
        # chain CH supersteps between syncs: on slow-connection regimes a
        # single D2H round trip costs 0.1-0.9 s and would swamp exec time
        CH = 8
        best = float("inf")
        fetch_floor = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            np.asarray(accs["peak"])
            fetch_floor = min(fetch_floor, time.perf_counter() - t0)
        for _ in range(4):
            t0 = time.perf_counter()
            for _ in range(CH):
                state, accs = step.fn_super(state, accs, raw_dev, 0, 0)
            np.asarray(accs["peak"])
            best = min(best, time.perf_counter() - t0)
        per_step = max(1e-9, (best - fetch_floor) / CH)
        msps = S * N / per_step / 1e6
        LOG.info(
            "%s full superstep: %.4f s for %d chained (+%.4f s fetch floor) "
            "= %.4f s/superstep = %.0f Msps",
            label, best, CH, fetch_floor, per_step, msps,
        )
        print(f"{label}: {per_step:.4f} s/superstep, {msps:.0f} Msps")
    return 0


if __name__ == "__main__":
    sys.exit(main())
