"""Round-3 probe B: channelizer-variant shootout on the real chip.

The decimating conv's output-channel axis is 2C wide (2 for one channel)
but the MXU pads lanes to 128 — ~1-2% lane utilization.  The J-augmented
conv packs J consecutive decimated outputs into the channel axis
(stride J*2D, kernel width 2L + (J-1)*2D, J = 128//2C), filling the
lanes at the cost of a ~2x banded-zeros overhead — net ~30-60x less MXU
work at C=1.

Times, steady-state at the bench geometry (L=1601, D=26, 4Mi chunk,
S-chunk scan), with the session toll paid on a background thread:

  A. current default: Pallas poly FIR (K~63 resident block)
  B. XLA conv, 2C output channels (IQ2A_PALLAS=0 path)
  C. XLA J-augmented conv + (J,2C,R)->(2C,m) rearrange
  D. the rearrange alone (codegen-blowup check: compile wall + exec)

Provenance: round 3, 2026-08-17.  Results -> docs/performance.md.
"""

from __future__ import annotations

import logging
import sys
import threading
import time
from functools import partial
from pathlib import Path

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO))

logging.basicConfig(level=logging.INFO, stream=sys.stderr)
LOG = logging.getLogger("probe_r3b")

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
    from iq_to_audio_tpu.pipeline.filters import design_channel_filter

    LOG.info("backend: %s", jax.default_backend())
    toll_done = threading.Event()

    def _pay_toll():
        t0 = time.perf_counter()
        np.asarray(jnp.ones((128, 128)) @ jnp.ones((128, 128)))
        LOG.info("session toll paid: %.1f s", time.perf_counter() - t0)
        toll_done.set()

    threading.Thread(target=_pay_toll, daemon=True).start()

    fs, D = 2_500_000.0, 26
    taps = design_channel_filter(fs, 12_500.0, D)
    plan = DDCPlan.create(len(taps), D, target_chunk=1 << 22)
    L, N, m = plan.num_taps, plan.chunk_size, plan.out_size
    S = 3  # chunks per scan (the bench's superstep grouping)
    LOG.info("geometry: L=%d D=%d N=%d m=%d S=%d", L, D, N, m, S)

    incs = [nco_increment_fixed(25_000.0, fs)]
    k_il = interleave_kernel(bandpass_kernel(taps, incs), "iq")
    out_ch, _, Wd = k_il.shape
    poly = build_poly_kernel(k_il, 2 * D)

    J = max(1, 128 // out_ch)
    Wj_np = np.zeros((J * out_ch, 1, Wd + (J - 1) * 2 * D), np.float32)
    for j in range(J):
        Wj_np[j * out_ch : (j + 1) * out_ch, 0, j * 2 * D : j * 2 * D + Wd] = k_il[:, 0, :]
    R = -(-m // J)
    need = (R - 1) * J * 2 * D + Wj_np.shape[2]

    rng = np.random.default_rng(0)
    full_np = rng.normal(scale=0.1, size=2 * (L - 1) + 2 * N).astype(np.float32)
    pad = max(0, need - full_np.size)
    fullj_np = np.concatenate([full_np, np.zeros(pad, np.float32)])[:need]

    x_full = jnp.asarray(full_np)
    x_fullj = jnp.asarray(fullj_np)
    k_il_d = jnp.asarray(k_il)
    wj_d = jnp.asarray(Wj_np)
    poly_d = jnp.asarray(poly)

    def scan_of(fn, x):
        def body(c, _):
            y = fn(x)
            return c + y[..., :4].sum(), None

        def outer(x):
            c, _ = lax.scan(body, jnp.float32(0), None, length=S)
            return c

        return jax.jit(lambda: outer(x))

    def conv_plain(x):
        out = lax.conv_general_dilated(
            x[None, None], k_il_d, window_strides=(2 * D,), padding="VALID",
            dimension_numbers=("NCH", "OIH", "NCH"),
            precision=lax.Precision.HIGHEST, preferred_element_type=jnp.float32,
        )
        return out[0]

    def conv_j(x):
        out = lax.conv_general_dilated(
            x[None, None], wj_d, window_strides=(J * 2 * D,), padding="VALID",
            dimension_numbers=("NCH", "OIH", "NCH"),
            precision=lax.Precision.HIGHEST, preferred_element_type=jnp.float32,
        )  # (1, J*2C, R)
        y2 = out[0]
        y = y2.reshape(J, out_ch, R).transpose(1, 2, 0).reshape(out_ch, R * J)
        return y[:, :m]

    def pallas_fn(x):
        return pallas_poly_fir_il(x, poly_d, D, m)

    def rearrange_only(x):
        y2 = x[: J * out_ch * R].reshape(J, out_ch, R)
        return y2.transpose(1, 2, 0).reshape(out_ch, R * J)

    variants = [
        ("pallas_poly", scan_of(pallas_fn, x_full)),
        ("conv_plain", scan_of(conv_plain, x_full)),
        ("conv_j", scan_of(conv_j, x_fullj)),
        ("rearrange_only", scan_of(rearrange_only, x_fullj)),
    ]
    handles = []
    for name, fn in variants:
        t0 = time.perf_counter()
        lowered = fn.lower()
        compiled = lowered.compile()
        LOG.info("%s: client compile %.1f s", name, time.perf_counter() - t0)
        try:
            mem = compiled.memory_analysis()
            LOG.info("%s: generated code %.2f MB", name,
                     mem.generated_code_size_in_bytes / 2**20)
        except Exception:
            pass
        handles.append((name, compiled))
        compiled()  # start server-side load + first exec during the toll

    if not toll_done.is_set():
        LOG.info("waiting for toll (up to 40 min)...")
        toll_done.wait(timeout=2400)

    for name, compiled in handles:
        # sync once, then time steady state
        np.asarray(compiled())
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            r = compiled()
            np.asarray(r)
            best = min(best, time.perf_counter() - t0)
        msps = S * N / best / 1e6
        LOG.info("%s: best %.4f s for %d x %d samples = %.0f Msps (conv stage only)",
                 name, best, S, N, msps)
        print(f"{name}: {best:.4f} s, {msps:.0f} Msps")
    return 0


if __name__ == "__main__":
    sys.exit(main())
