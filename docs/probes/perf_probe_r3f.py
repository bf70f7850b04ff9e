"""Round-3 probe F: isolate the 0.6 s/chunk raw-path cost.

Probe E showed scan{convert+concat+conv} costs 0.63 s/superstep while
probe B's scan{conv on resident f32} costs 0.027 s.  Variants:

  s16_sum      scan{ slice s16 row -> astype(f32) -> sum }      (convert only)
  s16_concat   scan{ convert -> concat(tail) -> sum }           (+concat)
  f32_conv     scan{ conv on PRE-CONVERTED resident f32 rows }  (conv, no convert)
  s16_conv     scan{ convert -> concat -> conv }                (probe E v_conv)
  u8_sum       scan{ slice u8 row -> convert -> sum }           (is it int16-specific?)
  f32_sum      scan{ slice f32 row -> sum }                     (pure slice/reduce)

Provenance: round 3, 2026-08-17.
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
LOG = logging.getLogger("probe_r3f")

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def main() -> int:
    from iq_to_audio_tpu.ops.ddc import DDCPlan, bandpass_kernel, ddc_apply_il, interleave_kernel
    from iq_to_audio_tpu.ops.nco import nco_increment_fixed
    from iq_to_audio_tpu.ops.resample import ResamplePlan
    from iq_to_audio_tpu.pipeline.filters import compute_decimation, design_channel_filter
    from iq_to_audio_tpu.pipeline.step import _device_scale

    LOG.info("backend: %s", jax.default_backend())
    toll_done = threading.Event()

    def _pay_toll():
        t0 = time.perf_counter()
        np.asarray(jnp.ones((128, 128)) @ jnp.ones((128, 128)))
        LOG.info("toll: %.1f s", time.perf_counter() - t0)
        toll_done.set()

    threading.Thread(target=_pay_toll, daemon=True).start()

    fs = 2_500_000.0
    decim, fs_ch = compute_decimation(fs, 96_000.0)
    taps = design_channel_filter(fs, 12_500.0, decim)
    rate_plan = ResamplePlan.create(fs_ch, 48_000.0, 1)
    plan = DDCPlan.create(len(taps), decim, target_chunk=1 << 22,
                          out_align=rate_plan.down, max_chunk=1 << 22)
    inc = nco_increment_fixed(25_000.0, fs)
    L, D, N = plan.num_taps, plan.decimation, plan.chunk_size
    S = 3
    LOG.info("geometry: L=%d D=%d N=%d S=%d", L, D, N, S)

    k_il = jnp.asarray(interleave_kernel(bandpass_kernel(taps, [inc]), "iq"))
    inc_lo = jnp.asarray(np.asarray([inc], np.uint32)) * jnp.uint32(D)

    rng = np.random.default_rng(0)
    raw_s16 = jax.device_put((rng.normal(scale=0.05, size=(S, 2 * N)) * 32767).astype("<i2"))
    raw_u8 = jax.device_put((rng.normal(scale=0.05, size=(S, 2 * N)) * 127 + 128).astype(np.uint8))
    raw_f32 = jax.device_put(rng.normal(scale=0.05, size=(S, 2 * N)).astype(np.float32))

    def scanner(body, xs):
        def run():
            _, outs = lax.scan(body, jnp.float32(0), xs)
            return outs.sum()

        return jax.jit(run)

    tail0 = jnp.zeros((2 * (L - 1),), jnp.float32)
    phase0 = jnp.zeros((1,), jnp.uint32)

    def b_s16_sum(c, raw):
        f = _device_scale(raw, "pcm_s16le")
        return c, f[:64].sum()

    def b_s16_concat(c, raw):
        f = _device_scale(raw, "pcm_s16le")
        x = jnp.concatenate([tail0, f])
        return c, x[:64].sum() + x[-64:].sum()

    def b_f32_conv(c, f):
        yr, yi, _, _ = ddc_apply_il(plan, k_il, f, tail0, phase0, inc_lo)
        return c, yr[..., :4].sum()

    def b_s16_conv(c, raw):
        f = _device_scale(raw, "pcm_s16le")
        yr, yi, _, _ = ddc_apply_il(plan, k_il, f, tail0, phase0, inc_lo)
        return c, yr[..., :4].sum()

    def b_u8_sum(c, raw):
        f = _device_scale(raw, "pcm_u8")
        return c, f[:64].sum()

    def b_f32_sum(c, f):
        return c, f[:64].sum()

    variants = [
        ("f32_sum", scanner(b_f32_sum, raw_f32)),
        ("s16_sum", scanner(b_s16_sum, raw_s16)),
        ("u8_sum", scanner(b_u8_sum, raw_u8)),
        ("s16_concat", scanner(b_s16_concat, raw_s16)),
        ("f32_conv", scanner(b_f32_conv, raw_f32)),
        ("s16_conv", scanner(b_s16_conv, raw_s16)),
    ]
    compiled = []
    for name, fn in variants:
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        LOG.info("%s: first call %.1f s", name, time.perf_counter() - t0)
        compiled.append((name, fn))

    if not toll_done.is_set():
        toll_done.wait(timeout=2400)

    for name, fn in compiled:
        np.asarray(fn())
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            last = None
            for _ in range(8):
                last = fn()
            np.asarray(last)
            best = min(best, (time.perf_counter() - t0) / 8)
        LOG.info("%s: %.4f s/scan (%.0f Msps)", name, best, S * N / best / 1e6)
        print(f"{name}: {best:.4f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
