"""Cross-cutting services used by the orchestrator (reference src/services/)."""

from .checkpoint_service import CheckpointService
from .output_service import OutputService
from .perf_service import PerformanceService

__all__ = ["CheckpointService", "OutputService", "PerformanceService"]
