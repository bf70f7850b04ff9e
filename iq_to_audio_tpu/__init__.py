"""iq-to-audio-tpu — a TPU-native (JAX/XLA/Pallas) SDR post-processing framework.

Re-implementation of the capability surface of ``rknightion/iq-to-audio``
(reference: /root/reference) designed TPU-first:

* The whole channelizer+demod chain is a single jitted chunk-step
  ``step(state, chunk) -> (state, audio)`` driven by a host streaming loop.
* The channelizer is ONE decimating strided convolution of the raw
  interleaved sample stream (mix + IQ-order folded into the taps; Pallas
  MXU kernel when the tap tensor fits VMEM); constant-coefficient
  recurrences (de-emphasis IIR, DC blocker) are MXU block matmuls, the
  input-dependent feedback AGC an associative scan; the 48 kHz resampler
  is an exact polyphase convolution on device.  An overlap-save FFT bank
  (``IQ2A_CHANNELIZER=fft``) serves complex/FFT-capable backends.
* Up to five channels ride a leading batch axis through one shared pass.
* Host ingest/encode (WAV/RIFF + raw cu8/cs16/cf32) is native code with a
  NumPy fallback — no ffmpeg/libsndfile dependency.
"""

from __future__ import annotations

__version__ = "0.1.0"

from .pipeline.config import ProcessingConfig  # noqa: E402
from .pipeline.pipeline import (  # noqa: E402
    ProcessingCancelled,
    ProcessingPipeline,
    ProcessingResult,
)

__all__ = [
    "__version__",
    "ProcessingConfig",
    "ProcessingPipeline",
    "ProcessingResult",
    "ProcessingCancelled",
]
