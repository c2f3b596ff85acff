"""Visualizer chart tests (reference tests/test_visualizer.py analog):
time-series/statistics/heatmap PNGs, attention overlay, bbox drawing."""

import numpy as np
import pytest

from office_person_detection_vit_tpu.core.dto import AggregationResult, Detection
from office_person_detection_vit_tpu.visualization.visualizer import Visualizer


@pytest.fixture
def results():
    return [
        AggregationResult(f"2025-06-01 12:{m:02d}:00", {"zone_1": m % 3, "zone_2": 1})
        for m in range(0, 30, 5)
    ]


class TestCharts:
    def test_time_series_writes_png(self, tmp_path, results):
        out = Visualizer().plot_time_series(results, tmp_path / "ts.png")
        assert out is not None and out.exists() and out.stat().st_size > 1000

    def test_time_series_empty_returns_none(self, tmp_path):
        assert Visualizer().plot_time_series([], tmp_path / "ts.png") is None
        assert not (tmp_path / "ts.png").exists()

    def test_zone_statistics_bars(self, tmp_path):
        stats = {
            "zone_1": {"avg": 1.5, "max": 3, "min": 0},
            "zone_2": {"avg": 0.5, "max": 1, "min": 0},
        }
        out = Visualizer().plot_zone_statistics(stats, tmp_path / "stats.png")
        assert out is not None and out.exists()

    def test_zone_statistics_empty_none(self, tmp_path):
        assert Visualizer().plot_zone_statistics({}, tmp_path / "s.png") is None

    def test_heatmap(self, tmp_path, results):
        out = Visualizer().plot_heatmap(results, tmp_path / "heat.png")
        assert out is not None and out.exists()

    def test_heatmap_empty_none(self, tmp_path):
        assert Visualizer().plot_heatmap([], tmp_path / "heat.png") is None

    def test_creates_parent_dirs(self, tmp_path, results):
        out = Visualizer().plot_time_series(results, tmp_path / "a" / "b" / "ts.png")
        assert out.exists()


class TestImages:
    def test_draw_detections_marks_pixels(self, sample_frame):
        dets = [Detection(bbox=(100, 100, 60, 140), confidence=0.9)]
        out = Visualizer().draw_detections(sample_frame, dets)
        assert out.shape == sample_frame.shape
        assert out.sum() > 0  # something was drawn on the black frame

    def test_attention_overlay_appends_colorbar(self, sample_frame, tmp_path):
        attention = np.random.default_rng(0).random((24, 42)).astype(np.float32)
        out = Visualizer().overlay_attention_map(
            sample_frame, attention, output_path=tmp_path / "att.png"
        )
        h, w = sample_frame.shape[:2]
        assert out.shape == (h, w + 24, 3)
        assert (tmp_path / "att.png").exists()

    def test_attention_overlay_constant_map_no_nan(self, sample_frame):
        out = Visualizer().overlay_attention_map(
            sample_frame, np.ones((8, 8), np.float32)
        )
        assert np.isfinite(out.astype(np.float32)).all()
