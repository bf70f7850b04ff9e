#!/usr/bin/env python3
"""Frozen-bundle entry point (PyInstaller).

Keeps ``iq_to_audio_tpu`` importable as a proper package inside the bundle
so relative imports and the decoder/format registries resolve, then hands
off to the normal CLI `main()` (which launches the GUI when invoked with no
arguments and PySide6 is bundled).
"""

from __future__ import annotations

import sys
from pathlib import Path

if getattr(sys, "frozen", False):
    bundle_root = Path(getattr(sys, "_MEIPASS", Path(sys.executable).parent))
    sys.path.insert(0, str(bundle_root))

from iq_to_audio_tpu.cli import main  # noqa: E402

if __name__ == "__main__":
    sys.exit(main())
