"""EvaluationModule tests (reference tests/test_evaluation_module.py analog):
greedy IoU matching, COCO GT loading, P/R/F1 math, report export, and the
--evaluate helper wiring."""

import json

import numpy as np
import pytest

from office_person_detection_vit_tpu.config.config_manager import ConfigManager
from office_person_detection_vit_tpu.core.dto import Detection, FrameResult
from office_person_detection_vit_tpu.evaluation.evaluation_module import (
    EvaluationModule,
    greedy_match,
    run_evaluation,
)


def _coco_doc():
    return {
        "images": [
            {"id": 1, "file_name": "frame_0001.jpg"},
            {"id": 2, "file_name": "frame_0002.jpg"},
        ],
        "annotations": [
            {"image_id": 1, "bbox": [100, 100, 50, 120], "category_id": 1},
            {"image_id": 1, "bbox": [300, 200, 60, 140], "category_id": 1},
            {"image_id": 2, "bbox": [500, 300, 55, 130], "category_id": 1},
        ],
    }


class TestGreedyMatch:
    def test_empty_predictions_all_fn(self):
        gt = np.asarray([[0, 0, 10, 10], [20, 20, 10, 10]], np.float32)
        assert greedy_match(np.zeros((0, 4), np.float32), gt) == (0, 0, 2)

    def test_empty_gt_all_fp(self):
        pred = np.asarray([[0, 0, 10, 10]], np.float32)
        assert greedy_match(pred, np.zeros((0, 4), np.float32)) == (0, 1, 0)

    def test_perfect_match(self):
        boxes = np.asarray([[0, 0, 10, 10], [50, 50, 20, 20]], np.float32)
        assert greedy_match(boxes, boxes) == (2, 0, 0)

    def test_gt_matched_at_most_once(self):
        # Two predictions over one GT box: only one TP, the other is FP.
        pred = np.asarray([[0, 0, 10, 10], [1, 1, 10, 10]], np.float32)
        gt = np.asarray([[0, 0, 10, 10]], np.float32)
        assert greedy_match(pred, gt) == (1, 1, 0)

    def test_below_threshold_not_matched(self):
        pred = np.asarray([[0, 0, 10, 10]], np.float32)
        gt = np.asarray([[8, 8, 10, 10]], np.float32)  # IoU ~ 0.026
        assert greedy_match(pred, gt, iou_threshold=0.5) == (0, 1, 1)

    def test_threshold_is_inclusive_boundary(self):
        # Half-overlapping boxes: IoU = 1/3; passes at 0.3, fails at 0.5.
        pred = np.asarray([[0, 0, 10, 10]], np.float32)
        gt = np.asarray([[5, 0, 10, 10]], np.float32)
        assert greedy_match(pred, gt, iou_threshold=0.3)[0] == 1
        assert greedy_match(pred, gt, iou_threshold=0.5)[0] == 0


class TestEvaluationModule:
    def test_load_coco_ground_truth(self, tmp_path):
        p = tmp_path / "gt.json"
        p.write_text(json.dumps(_coco_doc()))
        gt = EvaluationModule.load_coco_ground_truth(p)
        assert set(gt) == {"frame_0001.jpg", "frame_0002.jpg"}
        assert len(gt["frame_0001.jpg"]) == 2
        assert gt["frame_0002.jpg"] == [[500.0, 300.0, 55.0, 130.0]]

    def test_load_skips_orphan_annotations(self, tmp_path):
        doc = _coco_doc()
        doc["annotations"].append({"image_id": 99, "bbox": [0, 0, 1, 1]})
        p = tmp_path / "gt.json"
        p.write_text(json.dumps(doc))
        gt = EvaluationModule.load_coco_ground_truth(p)
        assert sum(len(v) for v in gt.values()) == 3

    def test_evaluate_metrics_math(self):
        module = EvaluationModule(iou_threshold=0.5)
        gt = {
            "a.jpg": [[100, 100, 50, 120], [300, 200, 60, 140]],
            "b.jpg": [[500, 300, 55, 130]],
        }
        preds = {
            "a.jpg": [
                Detection(bbox=(101, 101, 50, 120), confidence=0.9),  # TP
                Detection(bbox=(700, 50, 40, 90), confidence=0.8),  # FP
            ],
            "b.jpg": [Detection(bbox=(502, 301, 55, 130), confidence=0.95)],  # TP
        }
        m = module.evaluate(preds, gt)
        assert (m.true_positives, m.false_positives, m.false_negatives) == (2, 1, 1)
        assert m.precision == pytest.approx(2 / 3)
        assert m.recall == pytest.approx(2 / 3)
        assert m.f1_score == pytest.approx(2 / 3)

    def test_evaluate_missing_frame_counts_fn(self):
        module = EvaluationModule()
        m = module.evaluate({}, {"a.jpg": [[0, 0, 10, 10]]})
        assert (m.true_positives, m.false_negatives) == (0, 1)
        assert m.precision == 0.0 and m.recall == 0.0 and m.f1_score == 0.0

    def test_evaluate_sorts_by_confidence(self):
        # The high-confidence box should claim the GT first even if listed
        # second (reference sorts predictions before matching).
        module = EvaluationModule()
        gt = {"a.jpg": [[0, 0, 10, 10]]}
        preds = {
            "a.jpg": [
                Detection(bbox=(2, 2, 10, 10), confidence=0.3),
                Detection(bbox=(0, 0, 10, 10), confidence=0.9),
            ]
        }
        m = module.evaluate(preds, gt)
        assert m.true_positives == 1 and m.false_positives == 1

    def test_export_report(self, tmp_path):
        module = EvaluationModule()
        m = module.evaluate(
            {"a.jpg": [Detection(bbox=(0, 0, 10, 10), confidence=0.9)]},
            {"a.jpg": [[0, 0, 10, 10]]},
        )
        paths = module.export_report(m, tmp_path)
        doc = json.loads(paths["json"].read_text())
        assert doc["true_positives"] == 1
        lines = paths["csv"].read_text().strip().splitlines()
        assert len(lines) == 2
        assert "precision" in lines[0]


class TestRunEvaluation:
    def _frames(self):
        return [
            FrameResult(
                frame_number=1,
                timestamp=None,
                detections=[Detection(bbox=(100, 100, 50, 120), confidence=0.9)],
                frame_path="/sessions/x/frames/frame_0001.jpg",
            )
        ]

    def test_missing_gt_returns_none(self, tmp_path):
        cfg = ConfigManager.from_dict(
            {"evaluation": {"ground_truth_path": str(tmp_path / "nope.json")}}
        )
        assert run_evaluation(cfg, self._frames(), tmp_path) is None

    def test_end_to_end_joined_by_filename(self, tmp_path):
        gt_path = tmp_path / "gt.json"
        gt_path.write_text(json.dumps(_coco_doc()))
        cfg = ConfigManager.from_dict(
            {"evaluation": {"ground_truth_path": str(gt_path), "iou_threshold": 0.5}}
        )
        m = run_evaluation(cfg, self._frames(), tmp_path)
        assert m is not None
        assert m.true_positives == 1
        # frame_0001 had 2 GT boxes (1 matched) + frame_0002 unmatched -> 2 FN
        assert m.false_negatives == 2
        assert (tmp_path / "evaluation" / "evaluation_metrics.json").exists()
