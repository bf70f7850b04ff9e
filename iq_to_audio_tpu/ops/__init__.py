"""Device DSP kernels (JAX/XLA, with Pallas variants for the hot paths).

Each op has a NumPy float64 reference twin in :mod:`iq_to_audio_tpu.ref`
used by the golden-comparison tests (device output must match the twin
within -60 dB, the BASELINE.md contract).
"""

from .nco import nco_increment_fixed, nco_mix, nco_phase_advance
from .osfir import OverlapSavePlan, os_fir_decimate
from .iir import first_order_scan, deemphasis, dc_blocker, feedback_agc
from .resample import ResamplePlan, polyphase_resample

__all__ = [
    "nco_increment_fixed",
    "nco_mix",
    "nco_phase_advance",
    "OverlapSavePlan",
    "os_fir_decimate",
    "first_order_scan",
    "deemphasis",
    "dc_blocker",
    "feedback_agc",
    "ResamplePlan",
    "polyphase_resample",
]
