"""FloormapVisualizer tests (reference tests/test_floormap_visualizer.py
analog): blank-canvas rendering, zone fills, foot points, trajectories,
camera marker toggle, file output."""

import numpy as np
import pytest

from office_person_detection_vit_tpu.config.config_manager import ConfigManager
from office_person_detection_vit_tpu.core.dto import Detection, FrameResult
from office_person_detection_vit_tpu.visualization.floormap_visualizer import (
    FloormapVisualizer,
)


@pytest.fixture
def config(zones_config):
    return ConfigManager.from_dict(
        {
            "floormap": {"image_width": 400, "image_height": 300},
            "zones": [
                {
                    "id": z["id"],
                    "name": z["name"],
                    # scale reference polygons into the small canvas
                    "polygon": [[x // 5, y // 5] for x, y in z["polygon"]],
                    "priority": z["priority"],
                }
                for z in zones_config
            ],
            "camera": {"position_x": 50, "position_y": 40, "show_on_floormap": True},
        }
    )


def _frame_result(track_id=None):
    det = Detection(
        bbox=(100, 100, 50, 120),
        confidence=0.9,
        floor_coords_px=(200.0, 150.0),
        track_id=track_id,
    )
    return FrameResult(
        frame_number=1, timestamp="2025-06-01 12:00:00", detections=[det],
        zone_counts={"zone_1": 1},
    )


class TestVisualizeFrame:
    def test_blank_canvas_dimensions_from_config(self, config):
        img = FloormapVisualizer(config).visualize_frame(_frame_result())
        assert img.shape == (300, 400, 3)

    def test_foot_point_drawn(self, config):
        viz = FloormapVisualizer(config)
        base = viz.visualize_frame(
            FrameResult(frame_number=1, timestamp=None, detections=[])
        )
        with_det = viz.visualize_frame(_frame_result())
        # pixels around the foot point (200, 150) must differ from the base
        assert not np.array_equal(base[140:160, 190:210], with_det[140:160, 190:210])

    def test_detection_without_floor_coords_skipped(self, config):
        viz = FloormapVisualizer(config)
        fr = FrameResult(
            frame_number=1, timestamp=None,
            detections=[Detection(bbox=(0, 0, 10, 10), confidence=0.5)],
        )
        img = viz.visualize_frame(fr)  # must not raise
        assert img.shape == (300, 400, 3)

    def test_camera_marker_toggle(self, config):
        on = FloormapVisualizer(config).visualize_frame(_frame_result())
        config.set("camera.show_on_floormap", False)
        off = FloormapVisualizer(config).visualize_frame(_frame_result())
        assert not np.array_equal(on[20:60, 30:70], off[20:60, 30:70])

    def test_writes_output_file(self, config, tmp_path):
        out = tmp_path / "maps" / "frame_0001.png"
        FloormapVisualizer(config).visualize_frame(_frame_result(), output_path=out)
        assert out.exists() and out.stat().st_size > 0

    def test_trajectory_polyline_drawn(self, config):
        viz = FloormapVisualizer(config)
        traj = {5: [(50.0, 250.0), (150.0, 250.0), (250.0, 250.0)]}
        with_traj = viz.visualize_frame(_frame_result(track_id=5), trajectories=traj)
        without = viz.visualize_frame(_frame_result(track_id=5))
        assert not np.array_equal(with_traj[245:255, 60:240], without[245:255, 60:240])

    def test_single_point_trajectory_ignored(self, config):
        viz = FloormapVisualizer(config)
        img = viz.visualize_frame(
            _frame_result(track_id=5), trajectories={5: [(50.0, 250.0)]}
        )
        assert img.shape == (300, 400, 3)


class TestCollectTrajectories:
    def _frames(self):
        frames = []
        for i in range(4):
            det = Detection(
                bbox=(0, 0, 10, 10), confidence=0.9,
                floor_coords_px=(float(i * 10), 100.0), track_id=1,
            )
            untracked = Detection(bbox=(5, 5, 10, 10), confidence=0.8)
            frames.append(FrameResult(i, None, detections=[det, untracked]))
        return frames

    def test_collects_per_track(self, config):
        traj = FloormapVisualizer(config).collect_trajectories(self._frames())
        assert set(traj) == {1}
        assert traj[1] == [(0.0, 100.0), (10.0, 100.0), (20.0, 100.0), (30.0, 100.0)]

    def test_up_to_limits_frames(self, config):
        traj = FloormapVisualizer(config).collect_trajectories(self._frames(), up_to=1)
        assert len(traj[1]) == 2
