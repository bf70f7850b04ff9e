"""Device mesh construction."""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh


def make_mesh(
    n_devices: int | None = None,
    *,
    dp: int | None = None,
    axis_names: tuple[str, str] = ("dp", "seq"),
) -> Mesh:
    """Build a ("dp", "seq") mesh over the first ``n_devices`` devices.

    ``dp`` defaults to 1 (everything sequence-parallel): the per-chunk FFT
    frame work dominates and scales along ``seq`` over ICI; raise ``dp`` to
    batch independent channels/captures across chips.
    """
    devices = jax.devices()
    n = n_devices or len(devices)
    if n > len(devices):
        raise ValueError(f"Requested {n} devices but only {len(devices)} present.")
    dp = dp or 1
    if n % dp != 0:
        raise ValueError(f"dp={dp} must divide device count {n}.")
    grid = np.asarray(devices[:n]).reshape(dp, n // dp)
    return Mesh(grid, axis_names)
