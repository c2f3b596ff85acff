"""Pipeline orchestration: host driver + five phases."""

from .frame_extraction_pipeline import FrameExtractionPipeline
from .orchestrator import PipelineOrchestrator

__all__ = ["FrameExtractionPipeline", "PipelineOrchestrator"]
