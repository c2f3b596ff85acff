"""Host-side visualization: charts, floormaps, dashboard."""

from .floormap_visualizer import FloormapVisualizer
from .visualizer import Visualizer

__all__ = ["FloormapVisualizer", "Visualizer"]
