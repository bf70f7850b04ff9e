"""Pallas TPU kernel for the DDC's decimating bandpass FIR.

The XLA convolution in :mod:`.ddc` already maps onto the MXU; this kernel is
the hand-scheduled alternative (select with ``IQ2A_PALLAS=1`` or
``ddc_apply(..., use_pallas=True)`` via :func:`pallas_available`).  It
demonstrates the intended production shape for further fusion work:

* **Polyphase decomposition** makes every memory access contiguous: the
  input pair is reshaped to ``(M + K, F)`` where ``F = 2*D`` interleaves
  (re, im) x D phases and ``M = N/D`` decimated outputs, so output tile
  ``[m0, m0+TM)`` only needs the contiguous block ``x[m0 : m0+TM+K, :]``.
* The kernel computes ``out[m, o] = sum_k X[m+k, :] @ W[k, :, o]`` as ``K``
  accumulated MXU matmuls over the feature axis — no gathers, no FFTs,
  float32 accumulation.
* Grid over output tiles; the (small) tap tensor is resident in VMEM.

Numerically identical to the conv path (same reduction order per output up
to f32 reassociation; verified at -120 dB in tests/test_pallas.py).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

try:  # pallas is optional at runtime
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAVE_PALLAS = True
except ImportError:  # pragma: no cover
    _HAVE_PALLAS = False

_TILE_M = 256  # decimated outputs per grid step


def pallas_available() -> bool:
    return _HAVE_PALLAS


def build_poly_kernel(conv_kernel: np.ndarray, decimation: int) -> np.ndarray:
    """Repack the conv kernel ``(2C, 2, L)`` (tap axis reversed, see
    ``ddc.bandpass_kernel``) into the polyphase tensor ``(K, F, 2C)`` with
    ``F = 2*D`` features ((re, im) x phase) and ``K = (L-1)//D + 1`` taps.

    Derivation: the conv output ``out[o, m] = sum_j k[o, i, j] x[i, mD + j]``
    with ``j = kD + p`` becomes ``sum_{k,p} k[o, i, kD+p] x[i, (m+k)D + p]``,
    and ``x[i, (m+k)D + p]`` is exactly ``X[m+k, f]`` for the reshaped input
    ``X[t, f] = x_pair[i, tD + p]`` with ``f = i*D + p``.  ``K`` is exactly
    the largest block index ``(L-1)//D`` plus one — an extra block would be
    all-zero yet still cost one MXU matmul per output tile.
    """
    out_ch, in_ch, L = conv_kernel.shape
    D = decimation
    K = (L - 1) // D + 1
    w = np.zeros((K, in_ch * D, out_ch), dtype=np.float32)
    for j in range(L):
        k, p = divmod(j, D)
        for i in range(in_ch):
            w[k, i * D + p, :] = conv_kernel[:, i, j]
    return w


def _ddc_matmul_kernel(
    x_hbm, w_ref, o_ref, x_vmem, sem, *, k_taps: int, tile_m: int, win_rows: int
):
    """One output tile: out[m, o] = sum_k X[m+k, :] @ W[k, :, :].

    Output tiles need overlapping input windows (stride ``tile_m``, size
    ``tile_m + K``), which BlockSpec cannot express — so the input stays in
    HBM and each grid step DMAs its window into VMEM scratch.
    """
    i = pl.program_id(0)
    dma = pltpu.make_async_copy(
        x_hbm.at[pl.ds(i * tile_m, win_rows), :], x_vmem, sem
    )
    dma.start()
    dma.wait()
    # aligned access pattern: keep the slice start at row 0 and rotate the
    # window with pltpu.roll instead of k-shifted (sublane-unaligned) slices
    xs = x_vmem[:, :]
    acc = jnp.zeros(o_ref.shape, dtype=jnp.float32)
    for k in range(k_taps):
        acc = acc + jnp.dot(
            xs[:tile_m, :],
            w_ref[k],
            preferred_element_type=jnp.float32,
            # full f32 MXU passes: bf16 default lands near -50 dB, above
            # the -60 dB audio contract
            precision=jax.lax.Precision.HIGHEST,
        )
        if k + 1 < k_taps:
            # pltpu.roll requires a non-negative shift: rolling by size-1
            # moves row 1 to row 0 (equivalent to a -1 roll)
            xs = pltpu.roll(xs, xs.shape[0] - 1, 0)
    o_ref[:, :] = acc


def _ddc_matmul_kernel_tiled(
    x_hbm, w_ref, o_ref, x_vmem, sem, *, k_block: int, tile_m: int, win_rows: int
):
    """Tap-axis-tiled variant: grid ``(grid_m, grid_k)`` with ``k`` as the
    inner (reduction) dimension; only a ``k_block``-tap slice of the
    polyphase tensor is VMEM-resident per step, so the kernel serves
    arbitrarily large filters (the reference allows up to 32 768 taps,
    reference ``processing.py:613``) without breaching VMEM.

    out[m, o] += sum_{kk<k_block} X[m + kb*k_block + kk, :] @ W-block[kk]
    — the output tile's index map ignores ``k``, so Mosaic keeps it
    resident across the k-steps and the ``+=`` accumulates in place.
    """
    i = pl.program_id(0)
    kb = pl.program_id(1)
    dma = pltpu.make_async_copy(
        x_hbm.at[pl.ds(i * tile_m + kb * k_block, win_rows), :], x_vmem, sem
    )
    dma.start()
    dma.wait()

    @pl.when(kb == 0)
    def _init():
        o_ref[:, :] = jnp.zeros_like(o_ref)

    xs = x_vmem[:, :]
    acc = jnp.zeros(o_ref.shape, dtype=jnp.float32)
    for k in range(k_block):
        acc = acc + jnp.dot(
            xs[:tile_m, :],
            w_ref[k],
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        if k + 1 < k_block:
            xs = pltpu.roll(xs, xs.shape[0] - 1, 0)
    o_ref[:, :] += acc


# resident tap-block budget: the W slice (x2 for Mosaic double-buffering)
# should stay well under the ~16 MB of VMEM alongside the input scratch
_W_BLOCK_BYTES = 4 << 20


def choose_k_block(k_taps: int, f_pad: int, o_pad: int) -> int:
    """Largest tap-block (multiple of 8 when possible) whose VMEM-resident
    W slice fits the budget; the whole tensor when it already fits.

    Very wide geometries (``f_pad * o_pad`` in the thousands after the
    128-lane padding) can make even an 8-tap block exceed the budget — then
    degrade to the largest block that fits (floor 1) instead of returning a
    block Mosaic cannot allocate."""
    fit = _W_BLOCK_BYTES // max(1, f_pad * o_pad * 4)
    if fit >= k_taps:
        return k_taps
    if fit >= 8:
        return (fit // 8) * 8
    return max(1, fit)


def pallas_poly_fir_il(
    x_il: jnp.ndarray,
    poly_w: jnp.ndarray,
    decimation: int,
    out_size: int,
    *,
    k_block: int | None = None,
):
    """Decimating FIR via the Pallas kernel, fed the raw interleaved stream.

    The polyphase reshape becomes a single CONTIGUOUS ``(T, 2D)`` reshape of
    the interleaved stream — no transpose, no strided slices (the pair-input
    variant's ``(2, T, D) -> (T, 2D)`` swapaxes compiles into
    chunk-length-proportional TPU code; see ``ddc.interleave_kernel``).

    Large filters are handled by tiling the tap axis (``k_block`` taps
    VMEM-resident per grid step, output tile accumulated in place), so any
    filter length the planner allows (up to the reference's 32 768-tap
    ceiling) runs through this kernel.

    Parameters
    ----------
    x_il: float32 ``(2(L-1) + 2N,)`` — scaled raw samples incl. carried tail.
    poly_w: float32 ``(K, 2D, 2C)`` = ``build_poly_kernel(kernel_il, 2*D)``
        (the generic polyphase repack applied to the interleaved-domain
        kernel: window stride ``2D`` makes feature ``q`` of row ``t`` equal
        ``x_il[2Dt + q]``, which is exactly the contiguous reshape).
    k_block: taps resident per grid step; default = auto from VMEM budget.
    Returns float32 ``(2C, out_size)`` matching the conv output layout.
    """
    if not _HAVE_PALLAS:
        raise RuntimeError("Pallas is unavailable in this JAX build.")
    D2 = 2 * decimation
    K, F, out_ch = poly_w.shape
    m = out_size
    tile_m = min(_TILE_M, m)
    grid_m = -(-m // tile_m)
    f_pad = -(-F // 128) * 128
    o_pad = -(-out_ch // 128) * 128
    if k_block is None:
        k_block = choose_k_block(K, f_pad, o_pad)
    kb = max(1, min(K, k_block))
    grid_k = -(-K // kb)
    k_pad = grid_k * kb  # zero-padded taps contribute nothing
    w_p = jnp.zeros((k_pad, f_pad, o_pad), jnp.float32)
    w_p = w_p.at[:K, :F, :out_ch].set(poly_w)
    win_rows = tile_m + (-(-kb // 8) * 8)
    total = x_il.shape[-1]
    t_need = (grid_m - 1) * tile_m + (grid_k - 1) * kb + win_rows
    pad = t_need * D2 - total
    if pad > 0:
        x_il = jnp.pad(x_il, (0, pad))
    else:
        x_il = x_il[: t_need * D2]
    xf = x_il.reshape(t_need, D2)  # contiguous: X[t, q] = x_il[2Dt + q]
    if f_pad > F:
        xf = jnp.pad(xf, ((0, 0), (0, f_pad - F)))

    if grid_k == 1:
        out = pl.pallas_call(
            functools.partial(
                _ddc_matmul_kernel, k_taps=K, tile_m=tile_m, win_rows=win_rows
            ),
            out_shape=jax.ShapeDtypeStruct((grid_m * tile_m, o_pad), jnp.float32),
            grid=(grid_m,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),  # xf stays in HBM; DMA'd
                pl.BlockSpec(
                    (K, f_pad, o_pad), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=pl.BlockSpec(
                (tile_m, o_pad), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            scratch_shapes=[
                pltpu.VMEM((win_rows, f_pad), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
        )(xf, w_p)
    else:
        out = pl.pallas_call(
            functools.partial(
                _ddc_matmul_kernel_tiled,
                k_block=kb,
                tile_m=tile_m,
                win_rows=win_rows,
            ),
            out_shape=jax.ShapeDtypeStruct((grid_m * tile_m, o_pad), jnp.float32),
            grid=(grid_m, grid_k),  # k innermost: output tile stays resident
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(
                    (kb, f_pad, o_pad), lambda i, k: (k, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (tile_m, o_pad), lambda i, k: (i, 0), memory_space=pltpu.VMEM
            ),
            scratch_shapes=[
                pltpu.VMEM((win_rows, f_pad), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
        )(xf, w_p)
    return out[:m, :out_ch].T  # (2C, m)


def pallas_poly_fir(
    x_pair: jnp.ndarray,
    poly_w: jnp.ndarray,
    decimation: int,
    out_size: int,
):
    """Decimating FIR via the Pallas kernel.

    Parameters
    ----------
    x_pair: float32 ``(2, L-1+N)`` — (re, im) input including the carried
        tail (as fed to the conv in ``ddc_apply``).
    poly_w: float32 ``(K, F, 2C)`` from :func:`build_poly_kernel`.
    Returns float32 ``(2C, out_size)`` matching the conv output layout.
    """
    if not _HAVE_PALLAS:
        raise RuntimeError("Pallas is unavailable in this JAX build.")
    D = decimation
    K, F, out_ch = poly_w.shape
    m = out_size
    tile_m = min(_TILE_M, m)
    grid_m = -(-m // tile_m)
    # DMA windows and VMEM scratch want sublane-aligned (x8) row counts
    win_rows = tile_m + (-(-K // 8) * 8)
    # Mosaic tiling wants 128 lanes: pad the feature and output-channel
    # axes up to multiples of 128 (zero features contribute nothing)
    f_pad = -(-F // 128) * 128
    o_pad = -(-out_ch // 128) * 128
    w_p = jnp.zeros((K, f_pad, o_pad), jnp.float32)
    w_p = w_p.at[:, :F, :out_ch].set(poly_w)
    # reshape to (T, F): X[t, i*D+p] = x_pair[i, t*D + p]
    total = x_pair.shape[-1]
    t_need = (grid_m - 1) * tile_m + win_rows
    pad = t_need * D - total
    if pad > 0:
        x_pair = jnp.pad(x_pair, ((0, 0), (0, pad)))
    else:
        x_pair = x_pair[:, : t_need * D]
    x3 = x_pair.reshape(2, t_need, D)
    xf = jnp.swapaxes(x3, 0, 1).reshape(t_need, 2 * D)  # (T, F)
    if f_pad > F:
        xf = jnp.pad(xf, ((0, 0), (0, f_pad - F)))

    out = pl.pallas_call(
        functools.partial(
            _ddc_matmul_kernel, k_taps=K, tile_m=tile_m, win_rows=win_rows
        ),
        out_shape=jax.ShapeDtypeStruct((grid_m * tile_m, o_pad), jnp.float32),
        grid=(grid_m,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # xf stays in HBM; DMA'd
            pl.BlockSpec(
                (K, f_pad, o_pad), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (tile_m, o_pad), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((win_rows, f_pad), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )(xf, w_p)
    return out[:m, :out_ch].T  # (2C, m)