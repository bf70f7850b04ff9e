"""Runtime hook executed by PyInstaller before the app's entry point.

One central place for frozen-environment tweaks — the application code never
branches on ``sys.frozen``.

What it does:

* Defaults ``JAX_PLATFORMS`` to ``cpu`` when unset: a desktop bundle must
  never stall probing for accelerator plugins; users with a real TPU/GPU
  runtime export the variable themselves (cli.py re-asserts it through
  jax.config either way).
* Points the persistent XLA compilation cache at a per-user directory so
  repeat launches skip recompilation.
* Prepends the bundled ``native/`` directory to the shared-library search
  path so the optional C++ IO fast path (``libiqio``) resolves.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path


def _bundle_root() -> Path | None:
    if not getattr(sys, "frozen", False):
        return None
    meipass = getattr(sys, "_MEIPASS", None)
    return Path(meipass) if meipass else Path(sys.executable).resolve().parent


def _user_cache_dir() -> Path:
    if sys.platform == "darwin":
        base = Path.home() / "Library" / "Caches"
    elif os.name == "nt":
        base = Path(os.environ.get("LOCALAPPDATA", Path.home() / "AppData" / "Local"))
    else:
        base = Path(os.environ.get("XDG_CACHE_HOME", Path.home() / ".cache"))
    return base / "iq-to-audio-tpu"


root = _bundle_root()
if root is not None:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")

    cache = _user_cache_dir() / "jax"
    try:
        cache.mkdir(parents=True, exist_ok=True)
        os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(cache))
    except OSError:
        pass

    native = root / "native"
    if native.is_dir():
        var = "PATH" if os.name == "nt" else "LD_LIBRARY_PATH"
        if sys.platform == "darwin":
            var = "DYLD_LIBRARY_PATH"
        os.environ[var] = os.pathsep.join(
            [str(native), os.environ.get(var, "")]
        ).rstrip(os.pathsep)
