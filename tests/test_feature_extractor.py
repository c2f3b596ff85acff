"""Feature-extraction tests (reference tests/test_feature_extractor.py
analog): jitted ROI mean-pool over encoder features and the crop-histogram
fallback."""

import numpy as np
import pytest

from office_person_detection_vit_tpu.detection.features import (
    crop_histogram_features,
    roi_mean_pool,
)


class TestRoiMeanPool:
    def _grid_features(self, fh=6, fw=8, C=4):
        """Feature map where cell (y, x) has a one-hot-ish signature."""
        feats = np.zeros((1, fh * fw, C), np.float32)
        for i in range(fh * fw):
            feats[0, i, i % C] = 1.0 + i
        return feats

    def test_output_shape_and_l2_norm(self):
        feats = self._grid_features()
        boxes = np.asarray([[[0, 0, 640, 360], [640, 360, 640, 360]]], np.float32)
        valid = np.asarray([[True, True]])
        out = np.asarray(
            roi_mean_pool(feats, (6, 8), boxes, valid, np.asarray([1280.0, 720.0], np.float32))
        )
        assert out.shape == (1, 2, 4)
        norms = np.linalg.norm(out, axis=-1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-5)

    def test_invalid_slots_zeroed(self):
        feats = self._grid_features()
        boxes = np.asarray([[[0, 0, 100, 100], [0, 0, 100, 100]]], np.float32)
        valid = np.asarray([[True, False]])
        out = np.asarray(
            roi_mean_pool(feats, (6, 8), boxes, valid, np.asarray([1280.0, 720.0], np.float32))
        )
        assert np.all(out[0, 1] == 0)
        assert np.linalg.norm(out[0, 0]) > 0

    def test_disjoint_boxes_get_different_features(self):
        rng = np.random.default_rng(0)
        feats = rng.normal(size=(1, 48, 16)).astype(np.float32)
        boxes = np.asarray([[[0, 0, 200, 200], [1000, 500, 200, 200]]], np.float32)
        valid = np.asarray([[True, True]])
        out = np.asarray(
            roi_mean_pool(feats, (6, 8), boxes, valid, np.asarray([1280.0, 720.0], np.float32))
        )
        cos = float(out[0, 0] @ out[0, 1])
        assert cos < 0.99  # pooled from different cells

    def test_same_box_same_feature_across_batch(self):
        rng = np.random.default_rng(1)
        one = rng.normal(size=(1, 48, 8)).astype(np.float32)
        feats = np.concatenate([one, one])
        boxes = np.tile(np.asarray([[[100, 100, 300, 300]]], np.float32), (2, 1, 1))
        valid = np.ones((2, 1), bool)
        out = np.asarray(
            roi_mean_pool(feats, (6, 8), boxes, valid, np.asarray([1280.0, 720.0], np.float32))
        )
        np.testing.assert_allclose(out[0, 0], out[1, 0], atol=1e-6)


class TestCropHistogramFallback:
    def test_dim_and_norm(self):
        frame = np.random.default_rng(0).integers(0, 255, (240, 320, 3), np.uint8)
        boxes = np.asarray([[10, 10, 50, 80], [100, 50, 60, 100]], np.float32)
        out = crop_histogram_features(frame, boxes)
        assert out.shape == (2, 256)
        np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, atol=1e-5)

    def test_distinct_colors_distinct_features(self):
        frame = np.zeros((200, 320, 3), np.uint8)
        frame[:, :160] = (255, 0, 0)
        frame[:, 160:] = (0, 0, 255)
        boxes = np.asarray([[0, 0, 100, 100], [200, 0, 100, 100]], np.float32)
        out = crop_histogram_features(frame, boxes)
        assert float(out[0] @ out[1]) < 0.9

    def test_similar_crops_similar_features(self):
        rng = np.random.default_rng(2)
        frame = rng.integers(100, 140, (200, 320, 3), np.uint8)
        boxes = np.asarray([[0, 0, 80, 80], [10, 5, 80, 80]], np.float32)
        out = crop_histogram_features(frame, boxes)
        assert float(out[0] @ out[1]) > 0.95

    def test_degenerate_box_zero_vector(self):
        frame = np.zeros((100, 100, 3), np.uint8)
        out = crop_histogram_features(frame, np.asarray([[95, 95, 0, 10]], np.float32))
        assert np.all(out[0] == 0)

    def test_out_of_bounds_box_clamped(self):
        frame = np.full((100, 100, 3), 50, np.uint8)
        out = crop_histogram_features(frame, np.asarray([[-20, -20, 60, 60]], np.float32))
        assert np.linalg.norm(out[0]) == pytest.approx(1.0, abs=1e-5)
