"""ROI extractor + stats_utils depth tests (reference tests/test_roi_extractor.py
and tests/test_stats_utils.py analogs)."""

import numpy as np
import pytest

from office_person_detection_vit_tpu.config.config_manager import ConfigManager
from office_person_detection_vit_tpu.core.dto import (
    Detection,
    FrameResult,
    detections_to_batch,
)
from office_person_detection_vit_tpu.timestamp.roi_extractor import (
    TimestampROIExtractor,
)
from office_person_detection_vit_tpu.utils.stats_utils import (
    calculate_detection_statistics,
    calculate_frame_statistics,
)


class TestROIExtractor:
    def test_default_region_is_right_top(self, sample_frame):
        roi = TimestampROIExtractor().extract_roi(sample_frame)
        # x from 0.70*1280=896, width 0.28*1280=358; y from 0.045*720=32, h 0.06*720=43
        assert roi.shape[0] == 43 and roi.shape[1] == 358

    def test_custom_ratios(self, sample_frame):
        roi = TimestampROIExtractor(
            x_ratio=0.5, y_ratio=0.5, width_ratio=0.25, height_ratio=0.25
        ).extract_roi(sample_frame)
        assert roi.shape[:2] == (180, 320)

    def test_region_clamped_at_edges(self, sample_frame):
        roi = TimestampROIExtractor(
            x_ratio=0.9, y_ratio=0.9, width_ratio=0.5, height_ratio=0.5
        ).extract_roi(sample_frame)
        assert roi.shape[0] == 72 and roi.shape[1] == 128  # clipped to frame

    def test_roi_content_matches_slice(self):
        frame = np.arange(720 * 1280 * 3, dtype=np.uint8).reshape(720, 1280, 3)
        ext = TimestampROIExtractor()
        roi = ext.extract_roi(frame)
        np.testing.assert_array_equal(roi, frame[32:75, 896:1254])

    def test_preprocess_upscales_to_min_width(self):
        ext = TimestampROIExtractor(min_width=300)
        small = np.random.default_rng(0).integers(0, 255, (20, 100, 3), np.uint8)
        out = ext.preprocess_roi(small)
        assert out.ndim == 2  # grayscale
        assert out.shape[1] == 300
        assert out.shape[0] == 60  # aspect preserved

    def test_preprocess_keeps_wide_roi_size(self):
        ext = TimestampROIExtractor(min_width=300)
        wide = np.random.default_rng(0).integers(0, 255, (40, 400), np.uint8)
        out = ext.preprocess_roi(wide)
        assert out.shape == (40, 400)

    def test_preprocess_no_binarization(self):
        # Output must stay continuous grayscale (reference finding: no
        # thresholding), i.e. more than 2 distinct levels.
        ext = TimestampROIExtractor()
        roi = np.random.default_rng(0).integers(0, 255, (30, 350), np.uint8)
        out = ext.preprocess_roi(roi)
        assert len(np.unique(out)) > 10

    def test_empty_roi_passthrough(self):
        ext = TimestampROIExtractor()
        empty = np.zeros((0, 0, 3), np.uint8)
        assert ext.preprocess_roi(empty).size == 0

    def test_from_config(self):
        cfg = ConfigManager.from_dict(
            {"timestamp": {"extraction": {"roi": {"x_ratio": 0.6, "height_ratio": 0.1}}}}
        )
        ext = TimestampROIExtractor.from_config(cfg)
        assert ext.x_ratio == 0.6 and ext.height_ratio == 0.1
        assert ext.width_ratio == 0.28  # default retained


class TestDetectionStatistics:
    def _batch(self):
        frames = [
            [Detection(bbox=(0, 0, 10, 10), confidence=0.8),
             Detection(bbox=(5, 5, 10, 10), confidence=0.6)],
            [Detection(bbox=(0, 0, 10, 10), confidence=1.0)],
            [],
        ]
        return detections_to_batch(frames, capacity=4)

    def test_counts_and_confidence(self):
        s = calculate_detection_statistics(self._batch())
        assert s["total_frames"] == 3
        assert s["total_detections"] == 3
        assert s["avg_detections_per_frame"] == pytest.approx(1.0)
        assert s["max_detections_per_frame"] == 2
        assert s["min_detections_per_frame"] == 0
        assert s["confidence"]["mean"] == pytest.approx(0.8)
        assert s["confidence"]["min"] == pytest.approx(0.6)
        assert s["confidence"]["max"] == pytest.approx(1.0)

    def test_confidence_std_ignores_padding(self):
        s = calculate_detection_statistics(self._batch())
        expected_std = np.std([0.8, 0.6, 1.0])
        assert s["confidence"]["std"] == pytest.approx(expected_std, rel=1e-5)

    def test_empty_batch(self):
        s = calculate_detection_statistics(detections_to_batch([], capacity=4))
        assert s["total_frames"] == 0 and s["total_detections"] == 0
        assert s["confidence"]["mean"] == 0.0

    def test_frame_results_wrapper_matches_batch(self):
        frames = [
            FrameResult(0, None, [Detection(bbox=(0, 0, 10, 10), confidence=0.8)]),
            FrameResult(1, None, []),
        ]
        s = calculate_frame_statistics(frames)
        assert s["total_frames"] == 2
        assert s["total_detections"] == 1
        assert s["confidence"]["mean"] == pytest.approx(0.8)
