# PyInstaller custom-hook directory (referenced by iq-to-audio-tpu.spec).
