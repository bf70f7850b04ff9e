"""Round-3 probe K: CPU-backend component timing of the fft-channelizer
chunk chain at the headline geometry.

Breaks the measured ~13 ns/input-sample full-step cost (bench.py CPU
passes) into: s16->f32 scale, polyphase branch framing gather, forward
FFTs, the complete channelizer (ddc_apply_fft_il), and the full chunk
step (demod + resample + encode + accumulate on top).  Drives the native-
channelizer decision: the gap between "FFT math" and "everything around
it" is what a C++ kernel could recover.

Usage: JAX_PLATFORMS=cpu python docs/probes/perf_probe_r3k.py
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO))

import numpy as np

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp

from iq_to_audio_tpu.demod import create_decoder
from iq_to_audio_tpu.ops.ddc import (
    DDCPlan,
    bandpass_kernel,
    bank_from_kernel,
    ddc_apply_fft_il,
)
from iq_to_audio_tpu.ops.osfir import OverlapSavePlan, _poly_branch_spectra
from iq_to_audio_tpu.ops.resample import ResamplePlan, design_resampler_kernel
from iq_to_audio_tpu.pipeline.filters import design_channel_filter
from iq_to_audio_tpu.pipeline.step import _device_scale, build_chunk_step

RATE = 2_500_000.0
BW = 12_500.0
DECIM = 26
REPS = 12
N_BUFS = 3


def bench(label, fn, args_list, n_samples):
    # warm: compile + one real call per distinct buffer
    for args in args_list:
        jax.block_until_ready(fn(*args))
    best = float("inf")
    for r in range(REPS):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args_list[r % len(args_list)]))
        best = min(best, time.perf_counter() - t0)
    print(f"{label:42s} {best * 1e9 / n_samples:7.2f} ns/sample "
          f"({best * 1e3:7.2f} ms)", flush=True)
    return best


def main() -> int:
    taps = design_channel_filter(RATE, BW, DECIM)
    fs_channel = RATE / DECIM
    rs_plan0 = ResamplePlan.create(fs_channel, 48_000.0, 1)
    ddc_plan = DDCPlan.create(
        len(taps), DECIM, target_chunk=1 << 20, out_align=rs_plan0.down
    )
    n = ddc_plan.chunk_size
    print(f"chunk={n} taps={len(taps)} decim={DECIM}")

    os_plan = OverlapSavePlan.for_chunk(len(taps), DECIM, n)
    print(f"os_plan: F={os_plan.fft_size} B={os_plan.block} "
          f"K={os_plan.num_frames} fold={os_plan.fold} poly={os_plan.poly}")

    # complex bandpass kernel for one channel at +25 kHz, like the pipeline
    inc = int(round(25_000.0 / RATE * 2**32))
    kernel_np = bandpass_kernel(np.asarray(taps), [inc])  # (2C, 2, L)
    h_bank = jnp.asarray(bank_from_kernel(kernel_np, os_plan))

    rng = np.random.default_rng(7)
    raws = [
        jnp.asarray(rng.integers(-2000, 2000, size=2 * n, dtype=np.int16))
        for _ in range(N_BUFS)
    ]
    tail_pair = jnp.zeros((2, len(taps) - 1), jnp.float32)
    tail_c = jnp.zeros(len(taps) - 1, jnp.complex64)
    phase0 = jnp.zeros((1,), jnp.uint32)
    inc_lo = jnp.asarray([np.uint32(inc * DECIM % 2**32)], jnp.uint32)

    scale = jax.jit(lambda r: _device_scale(r, "pcm_s16le"))
    bench("scale s16->f32", scale, [(r,) for r in raws], n)

    framed = jax.jit(
        lambda r: _poly_branch_spectra(
            os_plan, _device_scale(r, "pcm_s16le").view(jnp.complex64), tail_c
        )[0]
        if os_plan.poly
        else None
    )
    if os_plan.poly:
        bench("scale+frame+forward FFTs", framed, [(r,) for r in raws], n)

    chain = jax.jit(
        lambda r, t, p: ddc_apply_fft_il(
            ddc_plan, os_plan, h_bank, _device_scale(r, "pcm_s16le"), t, p, inc_lo
        )
    )
    bench("full channelizer (ddc_apply_fft_il)", chain,
          [(r, tail_pair, phase0) for r in raws], n)

    # full chunk step (fft channelizer), demod nfm, resample, encode
    decoder = create_decoder("nfm", deemph_us=300.0, agc_enabled=True)
    decoder.setup(fs_channel)
    step = build_chunk_step(
        ddc_plan=ddc_plan,
        rs_plan=ResamplePlan.create(fs_channel, 48_000.0, ddc_plan.out_size),
        ddc_kernel_np=kernel_np,
        rs_kernel_np=design_resampler_kernel(rs_plan0.up, rs_plan0.down),
        incs_fixed=[inc],
        codec="pcm_s16le",
        iq_order="iq",
        decoder=decoder,
        pass_through=False,
        dump_iq=False,
        est_total_chunks=18,
        taps_np=np.asarray(taps),
    )
    print(f"step channelizer: {step.channelizer}")
    state0 = step.init_state()
    accs0 = step.init_accs()
    rs_off = jnp.zeros((), jnp.int32)
    slot = jnp.zeros((), jnp.int32)

    def full(r, st, ac):
        st2, ac2, _ = step.fn(st, ac, r, rs_off, slot)
        return st2, ac2

    fulljit = full  # step.fn is already jitted via module-level jit
    # state is donated — rebuild per call to keep buffers alive
    for r in raws:
        jax.block_until_ready(fulljit(r, step.init_state(), step.init_accs()))
    best = float("inf")
    for r in range(REPS):
        st, ac = step.init_state(), step.init_accs()
        t0 = time.perf_counter()
        jax.block_until_ready(fulljit(raws[r % N_BUFS], st, ac))
        best = min(best, time.perf_counter() - t0)
    print(f"{'full chunk step (fn)':42s} {best * 1e9 / n:7.2f} ns/sample "
          f"({best * 1e3:7.2f} ms)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
