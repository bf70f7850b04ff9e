"""Pipeline orchestration: config, filter design, progress, the chunk loop."""

from .config import ProcessingConfig
from .pipeline import ProcessingCancelled, ProcessingPipeline, ProcessingResult

__all__ = [
    "ProcessingConfig",
    "ProcessingPipeline",
    "ProcessingResult",
    "ProcessingCancelled",
]
