"""r5e: output-consumption A/B for the resident channelizer probe.

Cross-checks hetero.py's `measure_resident_compute` against the three
candidate ways its fori_loop body can consume the channelizer output —
last-column slice, full sum, full max — with the session toll explicitly
paid BEFORE the t_fetch estimate (two 1 MiB fetches, keep the second).

Findings (2026-08-20, v5e, mm channelizer, 1601 taps, decim 26, 4Mi
chunk, 256 reps/dispatch, t_fetch 0.048 s):

    max:   18 738 Msps
    slice: 15 217 Msps
    sum:   18 502 Msps

All three agree within ~20%: XLA performs NO slice-through-dot or
sum-reassociation elision on this program, so the bench campaign's
slice-consumed 14 258 Msps reading was honest.  The clamp-pinned
76 699/100 000 Msps standalone readings that prompted this probe were a
different corruption entirely: the first small fetch of a fresh
connection absorbs part of the per-connection session toll, a sub-30 s
toll slipped through the old break-on-first heuristic, and the inflated
t_fetch then swallowed the whole timed pass in the `elapsed - t_fetch`
subtraction.  The production probe now always pays the toll with a
throwaway first fetch, consumes via max (no algebraic path through a
dot, so it stays honest even if a future XLA adds those rewrites), and
refuses to report a pass the fetch estimate swallowed.
"""
import sys, time, logging
sys.path.insert(0, "/root/repo")
logging.basicConfig(level=logging.INFO)
import jax, jax.numpy as jnp, numpy as np
from jax import lax
from functools import partial
from iq_to_audio_tpu.ops.ddc import DDCPlan, ddc_apply_il, shift_matmul_kernel

L, D = 1601, 26
plan = DDCPlan.create(L, D, target_chunk=1 << 22)
rng = np.random.default_rng(0)
kernel_np = (rng.standard_normal((2, 1, 2 * L)).astype(np.float32) * 1e-2)
kernel = jnp.asarray(kernel_np)
phase0 = jnp.zeros((1,), jnp.uint32)
inc_lo = jnp.full((1,), 123_456_789, jnp.uint32)
j_lanes = min(max(1, 128 // 2), plan.out_size)
mm = jnp.asarray(shift_matmul_kernel(kernel_np, plan.decimation, j_lanes))
x = jnp.zeros(2 * plan.chunk_size, jnp.float32)
tail = jnp.zeros(2 * (L - 1), jnp.float32)

# pay the session toll + measure clean t_fetch
small = np.zeros(1 << 18, np.float32)
for _ in range(2):
    down = jax.device_put(small); down.block_until_ready()
    t0 = time.perf_counter(); np.asarray(down)
    t_fetch = time.perf_counter() - t0
print("t_fetch", round(t_fetch, 4), flush=True)

def probe(x, k, mm_k, tail, *, reps, consume):
    def body(i, s):
        xv = x + i.astype(jnp.float32) * jnp.float32(1e-12)
        yr, yi, _, _ = ddc_apply_il(plan, k, xv, tail, phase0, inc_lo,
                                    mm_kernel=mm_k, j_lanes=j_lanes)
        if consume == "slice":
            return s + yr[..., -1] + yi[..., -1]
        if consume == "sum":
            return s + yr.sum() + yi.sum()
        return s + jnp.max(yr) + jnp.max(yi)
    return lax.fori_loop(0, reps, body, jnp.zeros((1,), jnp.float32))

for consume in ("max", "slice", "sum"):
    for reps in (256,):
        fn = jax.jit(partial(probe, reps=reps, consume=consume))
        np.asarray(fn(x, kernel, mm, tail))  # compile+warm
        t0 = time.perf_counter(); np.asarray(fn(x, kernel, mm, tail))
        el = time.perf_counter() - t0
        msps = reps * plan.chunk_size / max(el - t_fetch, 1e-4) / 1e6
        print(f"{consume}: reps={reps} elapsed={el:.3f}s msps={msps:.0f}", flush=True)
