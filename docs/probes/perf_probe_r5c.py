"""Round-5 probe C: resident channelizer rate — honest re-measurement.

Motivation: the bench's resident-compute probe (hetero.py
``_measure_compute_msps``) times the PLAIN interleaved conv with a
loop-INVARIANT input inside ``fori_loop``.  Probe r3b already showed XLA
hoists loop-invariant convs out of such loops, and probe r3g's honest
(loop-varying) shootout measured conv_plain far slower than the number
the resident probe reports — so the recorded ``device_resident_msps``
may be (a) inflated by hoisting and (b) measured on the wrong kernel
(production uses the lane-filling J-conv).

This probe settles it with one methodology for every arm:

  * input VARYING per scan step (rows of a resident (S, full) stack),
  * SWEEPS repetitions inside ONE dispatch (outer fori_loop whose carry
    perturbs the input by +c*1e-12 — defeats cross-sweep CSE for the
    cost of one vector add),
  * a deliberate HOISTED arm replicating the current resident probe's
    loop-invariant body, to quantify the inflation,
  * precision arms on the production J-conv: HIGHEST (fp32, today's
    default), HIGH (bf16x3 passes), DEFAULT (bf16) — with output SNR
    vs a float64 host reference so a faster arm's fidelity is known.

Provenance: round 5, 2026-08-20.  Decides whether to fix the resident
probe and whether a lower-precision channelizer arm is usable.
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
LOG = logging.getLogger("probe_r5c")

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def main() -> int:
    from iq_to_audio_tpu.ops.ddc import (
        DDCPlan,
        bandpass_kernel,
        interleave_kernel,
        j_lanes_kernel,
    )
    from iq_to_audio_tpu.ops.nco import nco_increment_fixed
    from iq_to_audio_tpu.ops.resample import ResamplePlan
    from iq_to_audio_tpu.pipeline.filters import (
        compute_decimation,
        design_channel_filter,
    )

    LOG.info("backend: %s", jax.default_backend())
    toll_done = threading.Event()

    def _pay_toll():
        t0 = time.perf_counter()
        np.asarray(jnp.ones((128, 128)) @ jnp.ones((128, 128)))
        LOG.info("toll: %.1f s", time.perf_counter() - t0)
        toll_done.set()

    threading.Thread(target=_pay_toll, daemon=True).start()

    fs = 2_500_000.0
    decim, _fs_ch = compute_decimation(fs, 96_000.0)
    taps = design_channel_filter(fs, 12_500.0, decim)
    rate_plan = ResamplePlan.create(_fs_ch, 48_000.0, 1)
    plan = DDCPlan.create(len(taps), decim, target_chunk=1 << 22,
                          out_align=rate_plan.down, max_chunk=1 << 22)
    inc = nco_increment_fixed(25_000.0, fs)
    L, D, N, m = plan.num_taps, plan.decimation, plan.chunk_size, plan.out_size
    S = 4
    LOG.info("geometry: L=%d D=%d N=%d m=%d S=%d", L, D, N, m, S)

    k_il_np = interleave_kernel(bandpass_kernel(taps, [inc]), "iq")
    out_ch, _, Wd = k_il_np.shape
    k_il = jnp.asarray(k_il_np)
    J = max(1, 128 // out_ch)
    wj_np = j_lanes_kernel(k_il_np, D, J)
    wj = jnp.asarray(wj_np)
    R = -(-m // J)
    need = (R - 1) * J * 2 * D + wj_np.shape[2]
    full_len = 2 * (L - 1) + 2 * N

    rng = np.random.default_rng(0)
    xs = jax.device_put(
        rng.normal(scale=0.1, size=(S, full_len)).astype(np.float32)
    )

    def conv_plain(x, prec):
        out = lax.conv_general_dilated(
            x[None, None], k_il, window_strides=(2 * D,), padding="VALID",
            dimension_numbers=("NCH", "OIH", "NCH"), precision=prec,
            preferred_element_type=jnp.float32,
        )
        return out[0]

    def conv_j(x, prec):
        pad = need - x.shape[-1]
        xj = jnp.pad(x, (0, pad)) if pad > 0 else x[:need]
        out = lax.conv_general_dilated(
            xj[None, None], wj, window_strides=(J * 2 * D,), padding="VALID",
            dimension_numbers=("NCH", "OIH", "NCH"), precision=prec,
            preferred_element_type=jnp.float32,
        )  # (1, 2C*J, R) channel-major rows (o*J + j)
        yj = out[0]
        y = (
            yj.reshape(out_ch, J, R).transpose(0, 2, 1).reshape(out_ch, R * J)
        )
        return y[:, :m]

    def sweeper(body, sweeps):
        # SWEEPS repetitions in ONE dispatch; carry-perturbed input defeats
        # cross-sweep CSE (the +c*1e-12 add is ~0.1% of one conv's time)
        def run():
            def outer(c, acc):
                def inner(a, x):
                    y = body(x + c.astype(jnp.float32) * jnp.float32(1e-12))
                    return a + y[..., -1].sum(), None

                a, _ = lax.scan(inner, acc, xs)
                return a

            return lax.fori_loop(0, sweeps, outer, jnp.float32(0.0))

        return jax.jit(run)

    def hoisted(sweeps):
        # replicate the CURRENT resident probe: loop-invariant input
        x0 = xs[0]

        def run():
            def body(_, s):
                y = conv_plain(x0, lax.Precision.HIGHEST)
                return s + y[..., -1].sum()

            return lax.fori_loop(0, sweeps, body, jnp.float32(0.0))

        return jax.jit(run)

    P = lax.Precision
    arms = [
        ("plain_f32 (honest)", sweeper(partial(conv_plain, prec=P.HIGHEST), 8), 8),
        ("j_f32 (production)", sweeper(partial(conv_j, prec=P.HIGHEST), 8), 8),
        ("j_high (bf16x3)", sweeper(partial(conv_j, prec=P.HIGH), 16), 16),
        ("j_default (bf16)", sweeper(partial(conv_j, prec=P.DEFAULT), 32), 32),
        ("plain_hoisted (current probe)", hoisted(32), 32),
    ]

    compiled = []
    for name, fn, sweeps in arms:
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        LOG.info("%s: first call %.1f s", name, time.perf_counter() - t0)
        compiled.append((name, fn, sweeps))

    if not toll_done.is_set():
        toll_done.wait(timeout=2400)

    results = {}
    for name, fn, sweeps in compiled:
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(fn())
            best = min(best, time.perf_counter() - t0)
        samples = sweeps * S * N
        msps = samples / best / 1e6
        results[name] = msps
        LOG.info("%-32s %7.3f s best -> %8.1f Msps", name, best, msps)

    # -- fidelity: J-conv precision arms vs float64 host reference ---------
    x1 = np.asarray(xs[0], dtype=np.float64)
    g = (
        k_il_np[0, 0].astype(np.float64)
        + 1j * k_il_np[1, 0].astype(np.float64)
    )
    # host reference: stride-2D correlation of the interleaved stream
    idx = np.arange(m)[:, None] * 2 * D + np.arange(Wd)[None, :]
    ref = (x1[idx] @ g.real) + 1j * (x1[idx] @ g.imag)
    for prec, tag in ((P.HIGHEST, "f32"), (P.HIGH, "bf16x3"),
                      (P.DEFAULT, "bf16")):
        y = np.asarray(jax.jit(partial(conv_j, prec=prec))(xs[0]))
        got = y[0].astype(np.float64) + 1j * y[1].astype(np.float64)
        err = got - ref
        snr = 10 * np.log10(
            (np.abs(ref) ** 2).mean() / max((np.abs(err) ** 2).mean(), 1e-300)
        )
        LOG.info("fidelity j_%s: SNR %.1f dB", tag, snr)

    inflation = results.get("plain_hoisted (current probe)", 0) / max(
        results.get("plain_f32 (honest)", 1e-9), 1e-9
    )
    LOG.info("hoisting inflation factor: %.2fx", inflation)
    return 0


if __name__ == "__main__":
    sys.exit(main())
