"""Round-3 probe G: HONEST channelizer shootout (loop-varying inputs).

Probe B accidentally measured hoisted (loop-invariant) convs; probe F
showed the real XLA conv costs 0.21 s/chunk (20 Msps — the 2C-wide
output-channel axis wastes ~99% of MXU lanes, as predicted).  This probe
re-times all three kernels with the input VARYING per scan iteration
(rows of a resident (S, 2N) stack, as the production superstep consumes
them):

  conv_plain   stride-2D conv, 2C output channels
  conv_j       stride-J*2D conv, J*2C output channels + rearrange
  pallas       pallas_poly_fir_il (resident-block MXU matmuls)

Provenance: round 3, 2026-08-17.  Decides the production default.
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
LOG = logging.getLogger("probe_r3g")

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def main() -> int:
    from iq_to_audio_tpu.ops.ddc import DDCPlan, bandpass_kernel, interleave_kernel
    from iq_to_audio_tpu.ops.nco import nco_increment_fixed
    from iq_to_audio_tpu.ops.pallas_ddc import build_poly_kernel, pallas_poly_fir_il
    from iq_to_audio_tpu.ops.resample import ResamplePlan
    from iq_to_audio_tpu.pipeline.filters import compute_decimation, design_channel_filter

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
    L, D, N, m = plan.num_taps, plan.decimation, plan.chunk_size, plan.out_size
    S = 3
    LOG.info("geometry: L=%d D=%d N=%d m=%d S=%d", L, D, N, m, S)

    k_il_np = interleave_kernel(bandpass_kernel(taps, [inc]), "iq")
    out_ch, _, Wd = k_il_np.shape
    k_il = jnp.asarray(k_il_np)
    poly = jnp.asarray(build_poly_kernel(k_il_np, 2 * D))

    J = max(1, 128 // out_ch)
    Wj_np = np.zeros((J * out_ch, 1, Wd + (J - 1) * 2 * D), np.float32)
    for j in range(J):
        Wj_np[j * out_ch : (j + 1) * out_ch, 0, j * 2 * D : j * 2 * D + Wd] = k_il_np[:, 0, :]
    wj = jnp.asarray(Wj_np)
    R = -(-m // J)
    need = (R - 1) * J * 2 * D + Wj_np.shape[2]
    full_len = 2 * (L - 1) + 2 * N

    rng = np.random.default_rng(0)
    xs_f32 = jax.device_put(
        rng.normal(scale=0.1, size=(S, full_len)).astype(np.float32)
    )

    def scanner(body):
        def run():
            _, outs = lax.scan(body, jnp.float32(0), xs_f32)
            return outs.sum()

        return jax.jit(run)

    def b_plain(c, x):
        out = lax.conv_general_dilated(
            x[None, None], k_il, window_strides=(2 * D,), padding="VALID",
            dimension_numbers=("NCH", "OIH", "NCH"),
            precision=lax.Precision.HIGHEST, preferred_element_type=jnp.float32,
        )
        return c, out[0][..., :4].sum()

    def b_j(c, x):
        pad = need - x.shape[-1]
        xj = jnp.pad(x, (0, pad)) if pad > 0 else x[:need]
        out = lax.conv_general_dilated(
            xj[None, None], wj, window_strides=(J * 2 * D,), padding="VALID",
            dimension_numbers=("NCH", "OIH", "NCH"),
            precision=lax.Precision.HIGHEST, preferred_element_type=jnp.float32,
        )  # (1, J*2C, R)
        y = out[0].reshape(J, out_ch, R).transpose(1, 2, 0).reshape(out_ch, R * J)
        return c, y[:, :4].sum() + y[:, m - 4 : m].sum()

    def b_pallas(c, x):
        y = pallas_poly_fir_il(x, poly, D, m)
        return c, y[..., :4].sum()

    variants = [
        ("conv_plain", scanner(b_plain)),
        ("conv_j", scanner(b_j)),
        ("pallas", scanner(b_pallas)),
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
