"""First-order recurrences as associative scans.

The reference implements these as per-sample Python loops or scipy
``lfilter`` calls (reference ``decoders/common.py:23-27`` DC blocker,
``decoders/nfm.py:53-58`` de-emphasis, ``decoders/ssb.py:74-79`` feedback
AGC).  All of them are instances of the first-order linear recurrence

    y[n] = a[n] * y[n-1] + b[n]

which is associative under the composition

    (a2, b2) o (a1, b1) = (a1*a2, a2*b1 + b2)

so on TPU we evaluate them with ``jax.lax.associative_scan`` in O(log N)
depth instead of O(N) sequential steps.  Chunked output is identical to
whole-signal output because the carry ``y[-1]`` is threaded between chunks.
"""

from __future__ import annotations

import math

import numpy as np

import jax.numpy as jnp
from jax import lax

_BLOCK = 1024  # accelerator block (MXU-shaped); see _block_size()


def _block_size(a: float) -> int:
    """Triangular-matmul block width, chosen per backend at trace time.

    The closed block form costs B MACs per sample; on the MXU a (1024,
    1024) triangular matmul is one well-shaped op and the cross-block
    carry all but vanishes (a^1024 underflows), so big blocks win.  On
    CPU those are real scalar FLOPs — 1024 per channel sample made the
    de-emphasis rival the whole channelizer (measured ~1.2 ns per INPUT
    sample at decim 26) — so the block should be as small as accuracy
    allows.  Accuracy sets a floor: the cross-block carry is a
    sequential f32 fold, and when ``a^B`` is not small the carry chain
    stays live for many blocks and its rounding accumulates (measured:
    a blanket B=64 pushed the SSB+AGC golden test from inside -60 dB to
    -52.7 dB — the DC blocker's 0.995 pole kept carries alive for ~900
    samples and the AGC amplified the drift).  So pick the smallest
    power-of-two block with ``a^B <= 0.01`` — carries then localize
    within ~2 blocks and the result matches the 1024-block numerics.
    """
    import jax

    if jax.default_backend() != "cpu":
        return _BLOCK
    mag = abs(float(a))
    if mag >= 1.0:
        return _BLOCK  # fully live carries: keep the most exact form
    need = math.log(0.01) / math.log(mag) if mag > 0.0 else 1.0
    blk = 64
    while blk < need and blk < _BLOCK:
        blk *= 2
    return blk


def first_order_scan_const(a: float, b: jnp.ndarray, y0: jnp.ndarray):
    """``y[n] = a*y[n-1] + b[n]`` for a CONSTANT coefficient, evaluated as
    block matmuls on the MXU plus a tiny cross-block carry scan.

    Why not ``associative_scan``: its recursive halving lowers to a ladder
    of ~2*log2(N) differently-shaped slice/concat stages, and on TPU each
    odd shape gets its own generated code — the compiled size grows with
    the chunk length (measured ~1.7 MB for N=161k; docs/performance.md).
    With a constant ``a`` the recurrence has a closed block form:

        y[i] = a^(i+1) * y_in + sum_{j<=i} a^(i-j) * b[j]     (per block)

    i.e. one lower-triangular (B, B) matmul per block — a single
    MXU-shaped op whatever N is — followed by a length-N/B scan carrying
    ``y_in`` across blocks (a^B underflows to 0 well before B=1024 for any
    audio-range coefficient, so f32 is exact enough: validated at
    better than -100 dB vs the float64 twin).

    Returns ``(y, y_last)`` like :func:`first_order_scan`.
    """
    orig_shape = b.shape
    n = orig_shape[-1]
    blk = min(_block_size(a), n)
    nb = -(-n // blk)
    pad = nb * blk - n
    if pad:
        b = jnp.pad(b, [(0, 0)] * (b.ndim - 1) + [(0, pad)])
    blocks = b.reshape(*b.shape[:-1], nb, blk)
    i = np.arange(blk)
    delta = i[:, None] - i[None, :]
    tri = np.where(delta >= 0, float(a) ** np.maximum(delta, 0), 0.0)
    T = jnp.asarray(tri, jnp.float32)  # T[i, j] = a^(i-j), lower-triangular
    pref = jnp.matmul(
        blocks, T.T, precision=lax.Precision.HIGHEST
    )  # (..., nb, blk): the y0-independent part of each block
    a_blk = jnp.float32(float(a) ** blk)
    y0 = jnp.asarray(y0, jnp.float32)

    def fold(carry, p_last):
        nxt = a_blk * carry + p_last
        return nxt, nxt

    p_last = jnp.moveaxis(pref[..., -1], -1, 0)  # (nb, ...)
    _, outs = lax.scan(fold, y0, p_last)
    ends = jnp.moveaxis(outs, 0, -1)  # (..., nb): exact y at each block end
    in_carry = jnp.concatenate([y0[..., None], ends[..., :-1]], axis=-1)
    powers = jnp.asarray(float(a) ** (i + 1), jnp.float32)  # a^(i+1)
    y = pref + in_carry[..., None] * powers
    y = y.reshape(*orig_shape[:-1], nb * blk)[..., :n]
    return y, y[..., -1]


def first_order_combine(e1, e2):
    """Associative combine of ``(a, b)`` recurrence elements — the single
    source for every first-order scan in the package (the distributed
    variant in :mod:`iq_to_audio_tpu.parallel.sharded` uses it too, so a
    numerical change here propagates everywhere)."""
    a1, b1 = e1
    a2, b2 = e2
    return a1 * a2, a2 * b1 + b2


def first_order_scan(a: jnp.ndarray, b: jnp.ndarray, y0: jnp.ndarray):
    """Evaluate ``y[n] = a[n]*y[n-1] + b[n]`` along the last axis.

    ``y0`` is the carried ``y[-1]`` (shape = batch shape of ``a``/``b``
    without the scan axis).  Returns ``(y, y_last)``.
    """
    cum_a, cum_b = lax.associative_scan(first_order_combine, (a, b), axis=-1)
    y = cum_a * jnp.asarray(y0)[..., None] + cum_b
    return y, y[..., -1]


def deemphasis(x: jnp.ndarray, alpha: float, y0: jnp.ndarray):
    """Single-pole FM de-emphasis ``y[n] = (1-alpha)*x[n] + alpha*y[n-1]``.

    Equivalent to the reference's ``lfilter([beta], [1, -alpha], x, zi=...)``
    (reference ``decoders/nfm.py:27-62``) with exact state carry: scipy's
    ``zi`` for this filter equals ``alpha * y[-1]``, so carrying ``y[-1]``
    reproduces the same stream.
    """
    b = (jnp.float32(1.0) - jnp.float32(alpha)) * x
    return first_order_scan_const(float(alpha), b, y0)


def dc_blocker(x: jnp.ndarray, radius: float, x_prev: jnp.ndarray, y_prev: jnp.ndarray):
    """One-pole DC blocker ``y[n] = x[n] - x[n-1] + r*y[n-1]``.

    Replaces the reference's per-sample Python loop (reference
    ``decoders/common.py:23-27``).  Returns ``(y, (x_last, y_last))``.
    """
    shifted = jnp.concatenate([jnp.asarray(x_prev)[..., None], x[..., :-1]], axis=-1)
    u = x - shifted
    y, y_last = first_order_scan_const(float(radius), u, y_prev)
    return y, (x[..., -1], y_last)


def feedback_agc(
    x: jnp.ndarray,
    target: float,
    decay: float,
    gain0: jnp.ndarray,
    eps: float = 1e-6,
):
    """Feedback AGC ``g += decay * (target/|x| - g)`` applied as ``x * g``.

    Mirrors the reference loop (reference ``decoders/ssb.py:67-80``): the gain
    update happens *before* the sample is scaled, and samples with magnitude
    <= eps leave the gain untouched.  The nonlinear-looking recurrence is
    linear in ``g`` with input-dependent coefficients, so it scans.

    Unlike the reference — which resets the gain to 1.0 on every chunk —
    the gain is carried across chunks so chunked output equals whole-signal
    output.  Returns ``(y, gain_last)``.
    """
    a, b = agc_coefficients(x, target, decay, eps)
    g, g_last = first_order_scan(a, b, gain0)
    return x * g, g_last


def agc_coefficients(x: jnp.ndarray, target: float, decay: float, eps: float = 1e-6):
    """``(a, b)`` of the feedback-AGC linear recurrence (see
    :func:`feedback_agc`) — shared with the distributed AGC in
    :mod:`iq_to_audio_tpu.parallel.sharded` so the masking/eps semantics
    cannot drift between the serial and sharded paths."""
    mag = jnp.abs(x)
    valid = mag > jnp.float32(eps)
    decay = jnp.float32(decay)
    a = jnp.where(valid, jnp.float32(1.0) - decay, jnp.float32(1.0))
    b = jnp.where(
        valid, decay * jnp.float32(target) / jnp.maximum(mag, eps), jnp.float32(0.0)
    )
    return a, b
