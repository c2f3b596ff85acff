"""image_utils tests (reference tests/test_image_utils.py analog):
deterministic track colors, label overlap nudging, annotated saves."""

import numpy as np
import pytest

from office_person_detection_vit_tpu.core.dto import Detection
from office_person_detection_vit_tpu.utils.image_utils import (
    draw_detections,
    save_detection_image,
    save_tracked_detection_image,
    track_id_color,
)


class TestTrackIdColor:
    def test_deterministic(self):
        assert track_id_color(7) == track_id_color(7)

    def test_distinct_for_nearby_ids(self):
        colors = [track_id_color(i) for i in range(12)]
        assert len(set(colors)) == 12

    def test_valid_bgr_range(self):
        for i in (0, 1, 99, 12345):
            c = track_id_color(i)
            assert len(c) == 3
            assert all(isinstance(v, int) and 0 <= v <= 255 for v in c)


class TestDrawDetections:
    def _det(self, x=100, y=100, track_id=None, conf=0.9):
        return Detection(bbox=(x, y, 60, 140), confidence=conf, track_id=track_id)

    def test_original_frame_untouched(self, sample_frame):
        before = sample_frame.copy()
        draw_detections(sample_frame, [self._det()])
        np.testing.assert_array_equal(sample_frame, before)

    def test_draws_bbox_and_foot(self, sample_frame):
        img = draw_detections(sample_frame, [self._det()])
        assert img[100, 100].sum() > 0  # bbox corner
        assert img[240, 130].sum() > 0  # foot point (130, 240)

    def test_track_color_used_when_requested(self, sample_frame):
        tracked = draw_detections(sample_frame, [self._det(track_id=3)], draw_track_ids=True)
        untracked = draw_detections(sample_frame, [self._det(track_id=3)])
        assert not np.array_equal(tracked, untracked)

    def test_no_confidence_label(self, sample_frame):
        with_label = draw_detections(sample_frame, [self._det()])
        without = draw_detections(sample_frame, [self._det()], draw_confidence=False)
        assert not np.array_equal(with_label, without)

    def test_overlapping_labels_nudged_apart(self, sample_frame):
        # Two identical label positions: the second row must be nudged down.
        from office_person_detection_vit_tpu.utils.image_utils import _draw_label

        used: list[tuple[int, int, int]] = []
        img = sample_frame.copy()
        _draw_label(img, "ID1 0.90", 100, 100, (0, 200, 0), used)
        _draw_label(img, "ID2 0.80", 100, 100, (0, 0, 200), used)
        assert len(used) == 2
        assert used[1][2] > used[0][2]  # second label placed lower

    def test_disjoint_labels_not_nudged(self, sample_frame):
        from office_person_detection_vit_tpu.utils.image_utils import _draw_label

        used: list[tuple[int, int, int]] = []
        img = sample_frame.copy()
        _draw_label(img, "A", 100, 100, (0, 200, 0), used)
        _draw_label(img, "B", 600, 100, (0, 0, 200), used)
        assert used[0][2] == used[1][2]  # same row, no overlap

    def test_foot_point_optional(self, sample_frame):
        with_foot = draw_detections(sample_frame, [self._det()])
        without = draw_detections(sample_frame, [self._det()], draw_foot_point=False)
        assert not np.array_equal(with_foot, without)


class TestSaves:
    def test_save_detection_image(self, tmp_path, sample_frame):
        out = save_detection_image(
            sample_frame, [Detection(bbox=(10, 10, 40, 80), confidence=0.5)],
            tmp_path / "nested" / "det.jpg",
        )
        assert out.exists() and out.stat().st_size > 0

    def test_save_tracked_variant(self, tmp_path, sample_frame):
        out = save_tracked_detection_image(
            sample_frame,
            [Detection(bbox=(10, 10, 40, 80), confidence=0.5, track_id=4)],
            tmp_path / "trk.jpg",
        )
        assert out.exists()
