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

import jax.numpy as jnp
from jax import lax


def first_order_scan(a: jnp.ndarray, b: jnp.ndarray, y0: jnp.ndarray):
    """Evaluate ``y[n] = a[n]*y[n-1] + b[n]`` along the last axis.

    ``y0`` is the carried ``y[-1]`` (shape = batch shape of ``a``/``b``
    without the scan axis).  Returns ``(y, y_last)``.
    """

    def combine(e1, e2):
        a1, b1 = e1
        a2, b2 = e2
        return a1 * a2, a2 * b1 + b2

    cum_a, cum_b = lax.associative_scan(combine, (a, b), axis=-1)
    y = cum_a * jnp.asarray(y0)[..., None] + cum_b
    return y, y[..., -1]


def deemphasis(x: jnp.ndarray, alpha: float, y0: jnp.ndarray):
    """Single-pole FM de-emphasis ``y[n] = (1-alpha)*x[n] + alpha*y[n-1]``.

    Equivalent to the reference's ``lfilter([beta], [1, -alpha], x, zi=...)``
    (reference ``decoders/nfm.py:27-62``) with exact state carry: scipy's
    ``zi`` for this filter equals ``alpha * y[-1]``, so carrying ``y[-1]``
    reproduces the same stream.
    """
    alpha = jnp.float32(alpha)
    a = jnp.broadcast_to(alpha, x.shape)
    b = (jnp.float32(1.0) - alpha) * x
    return first_order_scan(a, b, y0)


def dc_blocker(x: jnp.ndarray, radius: float, x_prev: jnp.ndarray, y_prev: jnp.ndarray):
    """One-pole DC blocker ``y[n] = x[n] - x[n-1] + r*y[n-1]``.

    Replaces the reference's per-sample Python loop (reference
    ``decoders/common.py:23-27``).  Returns ``(y, (x_last, y_last))``.
    """
    shifted = jnp.concatenate([jnp.asarray(x_prev)[..., None], x[..., :-1]], axis=-1)
    u = x - shifted
    r = jnp.broadcast_to(jnp.float32(radius), x.shape)
    y, y_last = first_order_scan(r, u, y_prev)
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
    mag = jnp.abs(x)
    valid = mag > jnp.float32(eps)
    decay = jnp.float32(decay)
    a = jnp.where(valid, jnp.float32(1.0) - decay, jnp.float32(1.0))
    b = jnp.where(valid, decay * jnp.float32(target) / jnp.maximum(mag, eps), jnp.float32(0.0))
    g, g_last = first_order_scan(a, b, gain0)
    return x * g, g_last
