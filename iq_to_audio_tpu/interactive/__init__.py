"""Interactive Qt GUI (reference ``interactive/`` subpackage).

The Qt widgets require PySide6 + matplotlib; importing :mod:`.app` raises
ImportError without them and the CLI falls back to terminal mode.  The
headless pieces — :mod:`.state` (session state), :mod:`.models`
(snapshot/session dataclasses), and the worker *functions* in
:mod:`.workers` — import without any GUI dependency and are unit-tested.
"""

from __future__ import annotations

from .models import InteractiveSessionResult, SnapshotData, StatusProgressSink
from .state import InteractiveState


def launch_interactive_session(*args, **kwargs):
    """Start the GUI session (requires PySide6; see :mod:`.app`)."""
    from .app import launch_interactive_session as _launch

    return _launch(*args, **kwargs)


def interactive_select(*args, **kwargs):
    from .app import interactive_select as _select

    return _select(*args, **kwargs)


__all__ = [
    "InteractiveSessionResult",
    "SnapshotData",
    "StatusProgressSink",
    "InteractiveState",
    "launch_interactive_session",
    "interactive_select",
]
