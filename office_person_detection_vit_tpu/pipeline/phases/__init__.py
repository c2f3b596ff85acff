"""Pipeline phases (reference src/pipeline/phases/)."""

from .aggregation import AggregationPhase
from .base import BasePhase
from .detection import DetectionPhase
from .tracking import TrackingPhase
from .transform import TransformPhase
from .visualization import VisualizationPhase

__all__ = [
    "AggregationPhase",
    "BasePhase",
    "DetectionPhase",
    "TrackingPhase",
    "TransformPhase",
    "VisualizationPhase",
]
