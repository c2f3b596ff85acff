"""Domain data-model tests (reference tests/test_data_models.py analog):
host dataclasses plus the device-facing fixed-shape DetectionBatch."""

from datetime import datetime

import numpy as np

from office_person_detection_vit_tpu.core.dto import (
    AggregationResult,
    Detection,
    DetectionBatch,
    EvaluationMetrics,
    FrameResult,
    detections_to_batch,
)


class TestDetection:
    def test_derives_center_and_foot_point(self):
        d = Detection(bbox=(100.0, 200.0, 50.0, 120.0), confidence=0.9)
        assert d.center == (125.0, 260.0)
        assert d.foot_point == (125.0, 320.0)  # bottom-center

    def test_explicit_center_foot_preserved(self):
        d = Detection(
            bbox=(0, 0, 10, 10), confidence=0.5, center=(1.0, 2.0), foot_point=(3.0, 4.0)
        )
        assert d.center == (1.0, 2.0)
        assert d.foot_point == (3.0, 4.0)

    def test_to_dict_shape_and_precision(self):
        d = Detection(bbox=(1.23456, 2.34567, 10.0, 20.0), confidence=0.876)
        out = d.to_dict(precision=2)
        assert out["bbox"] == {"x": 1.23, "y": 2.35, "width": 10.0, "height": 20.0}
        assert out["camera_coords"]["y"] == 22.35
        assert "floor_coords_px" not in out and "track_id" not in out

    def test_to_dict_optional_fields(self):
        d = Detection(
            bbox=(0, 0, 10, 10),
            confidence=0.5,
            track_id=7,
            floor_coords_px=(100.0, 200.0),
            floor_coords_mm=(2819.0, 5638.0),
            zone_ids=["zone_1"],
        )
        out = d.to_dict()
        assert out["track_id"] == 7
        assert out["floor_coords_mm"] == {"x": 2819.0, "y": 5638.0}
        assert out["zone_ids"] == ["zone_1"]

    def test_compact_dict_excludes_px_by_default(self):
        d = Detection(
            bbox=(1.26, 2.24, 10.0, 20.0),
            confidence=0.87654,
            floor_coords_px=(10.0, 20.0),
            floor_coords_mm=(100.04, 200.06),
            track_id=3,
            zone_ids=["z"],
        )
        c = d.to_compact_dict()
        assert "floor_px" not in c
        assert c["bb"] == [1.3, 2.2, 10.0, 20.0]
        assert c["conf"] == 0.877
        assert c["floor_mm"] == [100.0, 200.1]
        assert c["id"] == 3 and c["zones"] == ["z"]
        c2 = d.to_compact_dict(exclude_px=False)
        assert c2["floor_px"] == [10.0, 20.0]


class TestFrameResult:
    def test_timestamp_str_variants(self):
        assert FrameResult(1, None).timestamp_str == ""
        assert (
            FrameResult(1, datetime(2025, 6, 1, 12, 30, 5)).timestamp_str
            == "2025-06-01 12:30:05"
        )
        assert FrameResult(1, "2025-06-01 12:30").timestamp_str == "2025-06-01 12:30"


class TestAggregationResult:
    def test_total_derived(self):
        r = AggregationResult("t", {"a": 2, "b": 3})
        assert r.total_count == 5

    def test_total_explicit(self):
        assert AggregationResult("t", {"a": 2}, total_count=9).total_count == 9


class TestEvaluationMetrics:
    def test_to_dict_keys(self):
        m = EvaluationMetrics(0.5, 0.25, 1 / 3, 1, 1, 3)
        d = m.to_dict()
        assert set(d) == {
            "precision", "recall", "f1_score",
            "true_positives", "false_positives", "false_negatives",
        }


class TestDetectionBatch:
    def test_pack_and_roundtrip(self):
        frames = [
            [
                Detection(bbox=(1, 2, 3, 4), confidence=0.9),
                Detection(bbox=(5, 6, 7, 8), confidence=0.8),
            ],
            [],
            [Detection(bbox=(9, 10, 11, 12), confidence=0.7)],
        ]
        batch = detections_to_batch(frames, capacity=4)
        assert batch.num_frames == 3 and batch.capacity == 4
        assert batch.valid.sum() == 3
        results = batch.to_frame_results(
            frame_numbers=[10, 11, 12], timestamps=["a", "b", "c"]
        )
        assert [len(r.detections) for r in results] == [2, 0, 1]
        assert results[0].frame_number == 10 and results[2].timestamp == "c"
        d0 = results[0].detections[0]
        assert d0.bbox == (1.0, 2.0, 3.0, 4.0)
        assert d0.foot_point == (2.5, 6.0)

    def test_capacity_clamps_overflow(self):
        frames = [[Detection(bbox=(i, i, 1, 1), confidence=0.5) for i in range(8)]]
        batch = detections_to_batch(frames, capacity=4)
        assert batch.valid.sum() == 4

    def test_is_jax_pytree(self):
        import jax

        batch = detections_to_batch([[Detection(bbox=(1, 2, 3, 4), confidence=0.9)]])
        leaves = jax.tree_util.tree_leaves(batch)
        assert len(leaves) == 4
        doubled = jax.tree_util.tree_map(lambda x: x, batch)
        assert isinstance(doubled, DetectionBatch)
        np.testing.assert_array_equal(doubled.scores, batch.scores)
