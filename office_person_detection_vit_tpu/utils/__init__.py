"""Host-side utilities: sessions, checkpoints, perf, logging, stats, imagery."""

from .checkpoint_manager import CheckpointManager
from .logging_utils import setup_logging
from .memory_utils import cleanup_resources
from .output_manager import OutputManager, reproducibility_info
from .performance_monitor import PerformanceMonitor
from .stats_utils import calculate_detection_statistics, calculate_frame_statistics

__all__ = [
    "CheckpointManager",
    "OutputManager",
    "PerformanceMonitor",
    "calculate_detection_statistics",
    "calculate_frame_statistics",
    "cleanup_resources",
    "reproducibility_info",
    "setup_logging",
]
