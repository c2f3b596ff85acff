"""Detectors behind the pluggable contract (core/interfaces.DetectorPort)."""

from .detector import DETRDetector
from .ssd_detector import SSDDetector, build_detector

__all__ = ["DETRDetector", "SSDDetector", "build_detector"]
