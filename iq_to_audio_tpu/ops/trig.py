"""Vectorised polynomial ``atan2`` for the quadrature discriminator.

XLA's CPU backend lowers ``atan2`` to a scalar libm call per element —
measured 37.7 ns/sample on the one-core host, which made the FM
discriminator ~10% of the whole pipeline (the reference inherits numpy's
vectorised C loop, ``decoders/nfm.py:11-24``; this replacement is the
TPU-framework analogue).  The polynomial form is pure mul/add/select, so it
vectorises on every backend and keeps the SAME formula on CPU and TPU —
one fewer source of cross-backend divergence (docs/performance.md
"Cross-backend determinism").

Accuracy: ``atan(r)`` on [0, 1] is a degree-7 least-squares fit in the
shifted variable ``u = 2 r^2 - 1`` (equivalently a degree-15 odd
polynomial in ``r``), max error 8.8e-8 rad in float64 — below float32
rounding of the exact value.  Against the float64 twin's ``np.arctan2``
the discriminator error is ~-135 dBFS, far inside the -60 dB golden
contract (``tests/test_ops.py::test_atan2_fast``).

Conventions: the full atan2 quadrant reduction matches ``np.arctan2``
except at measure-zero edges involving signed zeros/infinities
(``atan2(-0.0, -1.0)`` returns +pi rather than -pi) — irrelevant to the
discriminator, whose inputs are products of finite samples.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

# atan(r)/r ~= sum c_k T-ish basis via Horner in u = 2 r^2 - 1, r in [0, 1]
_ATAN_COEFFS = (
    0.8704196595587864,
    -0.10187631419586549,
    0.020854675551507187,
    -0.005033370703719968,
    0.0013020613817807888,
    -0.0003535131235162185,
    0.00012262017710359455,
    -3.774350302638771e-05,
)

_HALF_PI = float(np.pi / 2)
_PI = float(np.pi)


def atan2_fast(y: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Polynomial ``atan2(y, x)`` in float32 (see module doc).

    ``atan2(0, 0)`` returns 0.  Max error vs the exact value: ~1e-7 rad.
    """
    y = y.astype(jnp.float32)
    x = x.astype(jnp.float32)
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    hi = jnp.maximum(ax, ay)
    lo = jnp.minimum(ax, ay)
    # lo == hi -> r = 1 exactly: besides the generic diagonal this covers
    # inf/inf (plain division gives NaN — and one NaN angle would poison
    # the de-emphasis IIR carry for the rest of the stream) and equal
    # subnormal pairs (XLA:CPU flushes the quotient to 0).
    # 0/0 -> 0: atan2(0, 0) is defined as 0 here.
    r = jnp.where(
        lo == hi,
        jnp.where(hi == 0.0, jnp.float32(0.0), jnp.float32(1.0)),
        lo / jnp.where(hi == 0.0, jnp.float32(1.0), hi),
    )
    u = jnp.float32(2.0) * r * r - jnp.float32(1.0)
    p = jnp.float32(_ATAN_COEFFS[-1])
    for c in _ATAN_COEFFS[-2::-1]:
        p = p * u + jnp.float32(c)
    a = p * r  # atan(min/max) in [0, pi/4]
    a = jnp.where(ay > ax, jnp.float32(_HALF_PI) - a, a)
    a = jnp.where(x < 0.0, jnp.float32(_PI) - a, a)
    return jnp.where(y < 0.0, -a, a)
