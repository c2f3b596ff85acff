"""Host-side visualization: charts, floormaps, dashboard."""

from .dashboard_utils import SessionDataLoader
from .feature_visualizer import FeatureVisualizer
from .floormap_visualizer import FloormapVisualizer
from .visualizer import Visualizer

__all__ = [
    "FeatureVisualizer",
    "FloormapVisualizer",
    "SessionDataLoader",
    "Visualizer",
]
