"""LightweightTracker unit tests (reference tests/test_lightweight_tracker.py
analog): greedy IoU association, Kalman interpolation, optical-flow path,
max-age pruning, reset."""

import numpy as np
import pytest

from office_person_detection_vit_tpu.core.dto import Detection
from office_person_detection_vit_tpu.tracking.lightweight_tracker import (
    LightweightTracker,
    OpticalFlowTracker,
)


def _det(x, y, w=40.0, h=100.0, conf=0.9):
    return Detection(bbox=(float(x), float(y), w, h), confidence=conf)


_PATCH = np.random.default_rng(7).integers(120, 255, (40, 40, 3)).astype(np.uint8)


def _frame_with_square(x, y, size=40):
    """Frame with a *textured* bright patch — LK flow needs gradients at the
    tracked point, so the patch interior carries fixed random texture."""
    frame = np.full((240, 320, 3), 40, np.uint8)
    frame[y : y + size, x : x + size] = _PATCH[:size, :size]
    return frame


class TestAssociation:
    def test_new_detections_get_ids(self):
        tracker = LightweightTracker(use_optical_flow=False)
        dets = [_det(10, 10), _det(200, 50)]
        tracks = tracker.update_with_detections(dets)
        assert len(tracks) == 2
        assert {d.track_id for d in dets} == {1, 2}

    def test_id_persists_across_frames(self):
        tracker = LightweightTracker(use_optical_flow=False)
        d0 = _det(100, 100)
        tracker.update_with_detections([d0])
        d1 = _det(104, 102)  # small motion, high IoU
        tracker.update_with_detections([d1])
        assert d1.track_id == d0.track_id == 1

    def test_low_iou_spawns_new_track(self):
        tracker = LightweightTracker(iou_threshold=0.3, use_optical_flow=False)
        tracker.update_with_detections([_det(0, 0)])
        far = _det(250, 120)
        tracker.update_with_detections([far])
        assert far.track_id == 2
        assert len(tracker.tracks) == 2

    def test_max_age_prunes_stale_tracks(self):
        tracker = LightweightTracker(max_age=2, use_optical_flow=False)
        tracker.update_with_detections([_det(0, 0)])
        for _ in range(3):
            tracker.update_with_detections([_det(250, 120)])
        assert [t.track_id for t in tracker.tracks] == [2]

    def test_hits_and_confidence_updated(self):
        tracker = LightweightTracker(use_optical_flow=False)
        tracker.update_with_detections([_det(0, 0, conf=0.5)])
        tracker.update_with_detections([_det(2, 1, conf=0.8)])
        t = tracker.tracks[0]
        assert t.hits == 2
        assert t.confidence == pytest.approx(0.8)

    def test_reset(self):
        tracker = LightweightTracker(use_optical_flow=False)
        tracker.update_with_detections([_det(0, 0)])
        tracker.reset()
        assert tracker.tracks == []
        d = _det(0, 0)
        tracker.update_with_detections([d])
        assert d.track_id == 1  # ids restart


class TestInterpolation:
    def test_kalman_fallback_extrapolates_motion(self):
        tracker = LightweightTracker(use_optical_flow=False)
        # Constant velocity +10 px/frame in x.
        for i in range(4):
            tracker.update_with_detections([_det(100 + 10 * i, 50)], timestamp=float(i))
        x_before = tracker.tracks[0].bbox[0]
        tracks = tracker.interpolate(timestamp=4.0)
        assert tracks[0].interpolated is True
        assert tracks[0].bbox[0] > x_before  # kept moving in +x
        assert tracks[0].bbox[2:] == (40.0, 100.0)  # size preserved

    def test_interpolate_empty_tracker(self):
        assert LightweightTracker(use_optical_flow=False).interpolate() == []

    def test_trajectory_records_interpolated_steps(self):
        tracker = LightweightTracker(use_optical_flow=False)
        tracker.update_with_detections([_det(0, 0)], timestamp=0.0)
        tracker.interpolate(timestamp=1.0)
        tracker.interpolate(timestamp=2.0)
        assert len(tracker.tracks[0].trajectory) == 3
        assert [ts for ts, _ in tracker.tracks[0].trajectory] == [0.0, 1.0, 2.0]


class TestOpticalFlow:
    def test_flow_tracks_moving_square(self):
        cv2 = pytest.importorskip("cv2")  # noqa: F841
        flow = OpticalFlowTracker()
        flow.set_reference(_frame_with_square(100, 100))
        pts = np.asarray([[120.0, 120.0]], np.float32)  # square center
        new_pts, ok = flow.flow_points(_frame_with_square(108, 100), pts)
        assert ok[0]
        assert new_pts[0, 0] == pytest.approx(128.0, abs=3.0)
        assert new_pts[0, 1] == pytest.approx(120.0, abs=3.0)

    def test_flow_without_reference_fails_closed(self):
        flow = OpticalFlowTracker()
        pts = np.asarray([[10.0, 10.0]], np.float32)
        out, ok = flow.flow_points(_frame_with_square(0, 0), pts)
        assert not ok.any()
        np.testing.assert_array_equal(out, pts)

    def test_tracker_uses_flow_between_detections(self):
        pytest.importorskip("cv2")
        tracker = LightweightTracker(use_optical_flow=True)
        d = _det(100, 100, w=40, h=40)
        tracker.update_with_detections([d], frame=_frame_with_square(100, 100))
        tracker.interpolate(frame=_frame_with_square(110, 100), timestamp=1.0)
        t = tracker.tracks[0]
        assert t.interpolated
        assert t.bbox[0] == pytest.approx(110.0, abs=4.0)
