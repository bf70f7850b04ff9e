"""The single jitted chunk step: convert -> mix -> filter -> decimate ->
demod -> resample, all on device, static shapes, state threaded as a pytree.

This is the TPU-native core that replaces the reference's per-chunk Python
orchestration (reference ``processing.py:1070-1154``).  Key properties:

* Raw file bytes (u8/s16/f32 interleaved) are uploaded as-is and converted
  on device — an s16 capture moves 4 bytes per complex sample over PCIe
  instead of 8.
* Up to five channels ride a leading batch axis through one shared pass;
  each channel has its own NCO increment (folded in as a compile-time
  constant) and carried phase.
* The step compiles exactly once per run: the warm-up mixer-sign probe runs
  on the host float64 twin, so the chosen sign is already baked into the
  NCO increments when the first chunk is traced.
* The carried state is donated, so XLA reuses its buffers in place.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from ..demod.base import Decoder
from ..ops.nco import nco_mix
from ..ops.osfir import OverlapSavePlan, os_fir_decimate
from ..ops.resample import ResamplePlan, polyphase_resample

LOG = logging.getLogger(__name__)


@dataclass
class ChunkStep:
    """A compiled streaming step plus its host-side geometry."""

    os_plan: OverlapSavePlan
    rs_plan: ResamplePlan | None
    num_channels: int
    codec: str
    iq_order: str
    pass_through: bool
    dump_iq: bool
    decoder: Decoder | None
    fn: object  # jitted (state, raw, r0) -> (state, out)
    fn_stages: object | None  # variant that also returns stage intermediates

    @property
    def chunk_size(self) -> int:
        return self.os_plan.chunk_size

    def init_state(self):
        plan = self.os_plan
        c = self.num_channels
        state = {
            "phase": jnp.zeros((c,), dtype=jnp.uint32),
            "fir_tail": jnp.zeros((c, plan.overlap), dtype=jnp.complex64),
        }
        if not self.pass_through:
            state["demod"] = self.decoder.init_state((c,))
            if self.rs_plan is not None and not self.rs_plan.identity:
                state["rs_tail"] = jnp.zeros(
                    (c, self.rs_plan.taps_per_phase - 1), dtype=jnp.float32
                )
        return state


def _device_convert(raw: jnp.ndarray, codec: str, iq_order: str, n: int) -> jnp.ndarray:
    """On-device sample conversion + de-interleave (ffmpeg-compatible scaling,
    reference IQ-order semantics ``processing.py:268-279``)."""
    if codec == "pcm_u8":
        f = (raw.astype(jnp.float32) - jnp.float32(128.0)) * jnp.float32(1.0 / 128.0)
    elif codec == "pcm_s16le":
        f = raw.astype(jnp.float32) * jnp.float32(1.0 / 32768.0)
    elif codec == "pcm_f32le":
        f = raw.astype(jnp.float32)
    else:
        raise ValueError(f"Unsupported codec '{codec}'")
    pairs = f.reshape(n, 2)
    if iq_order.startswith("iq"):
        i, q = pairs[:, 0], pairs[:, 1]
    else:
        q, i = pairs[:, 0], pairs[:, 1]
    if iq_order.endswith("_inv"):
        q = -q
    return lax.complex(i, q)


def build_chunk_step(
    *,
    os_plan: OverlapSavePlan,
    rs_plan: ResamplePlan | None,
    taps_fft_np: np.ndarray,
    rs_table_np: np.ndarray | None,
    incs_fixed: list[int],
    codec: str,
    iq_order: str,
    decoder: Decoder | None,
    pass_through: bool,
    dump_iq: bool,
) -> ChunkStep:
    """Build (and lazily compile) the streaming chunk step."""
    c = len(incs_fixed)
    n = os_plan.chunk_size
    h_const = jnp.asarray(taps_fft_np, dtype=jnp.complex64)
    incs_const = jnp.asarray(np.asarray(incs_fixed, dtype=np.uint32))
    table_const = (
        jnp.asarray(rs_table_np, dtype=jnp.float32) if rs_table_np is not None else None
    )

    def _step(state, raw, r0, *, with_stages: bool):
        x = _device_convert(raw, codec, iq_order, n)
        xb = jnp.broadcast_to(x, (c, n))
        mixed, phase_next = nco_mix(xb, state["phase"], incs_const)
        if with_stages:
            dec, fir_tail, filtered = os_fir_decimate(
                os_plan, h_const, mixed, state["fir_tail"], return_filtered=True
            )
        else:
            dec, fir_tail = os_fir_decimate(os_plan, h_const, mixed, state["fir_tail"])
            filtered = None
        new_state = {"phase": phase_next, "fir_tail": fir_tail}
        out = {}
        stages = {}
        if with_stages:
            stages["input"] = x
            stages["mixed"] = mixed
            stages["filtered"] = filtered
            stages["decimated"] = dec
        if dump_iq or pass_through:
            out["iq"] = dec
        if not pass_through:
            audio_ch, demod_state, inter = decoder.process(state["demod"], dec)
            new_state["demod"] = demod_state
            power = jnp.mean(jnp.square(audio_ch.astype(jnp.float32)), axis=-1)
            out["rms_dbfs"] = 10.0 * jnp.log10(power + 1e-18)
            out["baseband_power"] = jnp.mean(jnp.square(jnp.abs(dec)), axis=-1)
            if rs_plan is None or rs_plan.identity:
                out["audio"] = audio_ch
            else:
                audio48, rs_tail = polyphase_resample(
                    rs_plan, table_const, audio_ch, state["rs_tail"], r0
                )
                new_state["rs_tail"] = rs_tail
                out["audio"] = audio48
            if with_stages:
                stages.update(inter)
        if with_stages:
            out["stages"] = stages
        return new_state, out

    fn = jax.jit(partial(_step, with_stages=False), donate_argnums=0)
    fn_stages = jax.jit(partial(_step, with_stages=True))

    return ChunkStep(
        os_plan=os_plan,
        rs_plan=rs_plan,
        num_channels=c,
        codec=codec,
        iq_order=iq_order,
        pass_through=pass_through,
        dump_iq=dump_iq,
        decoder=decoder,
        fn=fn,
        fn_stages=fn_stages,
    )
