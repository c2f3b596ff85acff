"""VisualizationPhase unit tests (reference tests/test_visualization_phase.py
analog): chart artifacts, parallel floormap renders, flags."""

from datetime import datetime

from office_person_detection_vit_tpu.config.config_manager import ConfigManager
from office_person_detection_vit_tpu.core.dto import (
    AggregationResult,
    Detection,
    FrameResult,
)
from office_person_detection_vit_tpu.pipeline.phases.visualization import (
    VisualizationPhase,
)


def _cfg(**over):
    cfg = ConfigManager.from_dict(
        {
            "floormap": {"image_width": 300, "image_height": 200},
            "zones": [
                {"id": "zone_a", "name": "A",
                 "polygon": [[10, 10], [150, 10], [150, 150], [10, 150]],
                 "priority": 1},
            ],
            "output": {"save_floormap_images": True},
        }
    )
    for k, v in over.items():
        cfg.set(k, v)
    return cfg


def _data(n=3):
    frame_results = []
    for i in range(n):
        det = Detection(
            bbox=(50, 50, 40, 100), confidence=0.9,
            floor_coords_px=(60.0 + 20 * i, 80.0), track_id=1,
            zone_ids=["zone_a"],
        )
        frame_results.append(
            FrameResult(i, datetime(2025, 1, 20, 9, 5 * i, 0), [det],
                        zone_counts={"zone_a": 1})
        )
    agg = [
        AggregationResult(fr.timestamp_str, fr.zone_counts) for fr in frame_results
    ]
    return frame_results, agg


class TestVisualizationPhase:
    def test_generates_charts_and_floormaps(self, tmp_path):
        phase = VisualizationPhase(_cfg())
        frs, agg = _data()
        generated = phase.execute(frs, agg, tmp_path)
        assert (tmp_path / "zone_time_series.png").exists()
        assert (tmp_path / "zone_heatmap.png").exists()
        assert generated["floormaps"] == 3
        assert len(list((tmp_path / "floormaps").glob("floormap_*.png"))) == 3

    def test_zone_statistics_chart_optional(self, tmp_path):
        phase = VisualizationPhase(_cfg())
        frs, agg = _data(1)
        stats = {"zone_a": {"avg": 1.0, "max": 1}}
        generated = phase.execute(frs, agg, tmp_path, zone_statistics=stats)
        assert (tmp_path / "zone_statistics.png").exists()
        assert generated["statistics"] is not None

    def test_floormaps_disabled(self, tmp_path):
        phase = VisualizationPhase(_cfg(**{"output.save_floormap_images": False}))
        frs, agg = _data()
        generated = phase.execute(frs, agg, tmp_path)
        assert "floormaps" not in generated
        assert not (tmp_path / "floormaps").exists()

    def test_empty_aggregation_still_succeeds(self, tmp_path):
        phase = VisualizationPhase(_cfg())
        generated = phase.execute([], [], tmp_path)
        assert generated["time_series"] is None
        assert generated["heatmap"] is None


class TestSideBySideZoom:
    def test_zoom_knob_passes_floor_points(self, tmp_path):
        cfg = _cfg(**{
            "output.save_side_by_side_video": True,
            "output.side_by_side_zoom": True,
        })
        phase = VisualizationPhase(cfg)
        frs, agg = _data(2)
        # detection images matching the floormap timestamp keys
        import cv2
        import numpy as np

        det_dir = tmp_path / "det"
        det_dir.mkdir()
        for fr in frs:
            ts = fr.timestamp_str.replace(":", "").replace("-", "").replace(" ", "_")
            cv2.imwrite(str(det_dir / f"detection_{ts}.jpg"),
                        np.zeros((72, 128, 3), np.uint8))
        generated = phase.execute(frs, agg, tmp_path, detection_image_dir=det_dir)
        assert generated["side_by_side"] is not None
        assert (tmp_path / "side_by_side.mp4").stat().st_size > 0
