"""Interactive Qt GUI (reference ``interactive/`` subpackage).

The GUI requires PySide6 + matplotlib QtAgg.  It is host-side presentation
code orthogonal to the TPU engine; when PySide6 is unavailable this import
raises ImportError and the CLI falls back to terminal mode.
"""

from __future__ import annotations

try:
    import PySide6  # noqa: F401
except ImportError as exc:  # pragma: no cover - environment dependent
    raise ImportError(
        "PySide6 is required for the interactive GUI (pip install PySide6)."
    ) from exc

from .app import InteractiveSessionResult, launch_interactive_session  # noqa: E402,F401

__all__ = ["launch_interactive_session", "InteractiveSessionResult"]
