"""Benchmark harness: detection AP, native MOT metrics, CLI runners."""

import json

import numpy as np
import pytest

from office_person_detection_vit_tpu.benchmark import main as tracking_main
from office_person_detection_vit_tpu.benchmark.detection_benchmark import (
    DetectionBenchmark,
    DetectionRecord,
    average_precision,
    threshold_sweep,
)
from office_person_detection_vit_tpu.benchmark.detection_runner import (
    main as detection_main,
)
from office_person_detection_vit_tpu.benchmark.mot_metrics import (
    evaluate_mot,
    load_gold_gt,
    load_mot_csv,
)
from office_person_detection_vit_tpu.benchmark.tracking_benchmark import (
    TrackingBenchmark,
)


# ---------------------------------------------------------------- detection
class TestAveragePrecision:
    def test_perfect(self):
        flags = np.asarray([True, True, True])
        scores = np.asarray([0.9, 0.8, 0.7])
        assert average_precision(flags, scores, 3) == pytest.approx(1.0)

    def test_all_wrong(self):
        flags = np.asarray([False, False])
        scores = np.asarray([0.9, 0.8])
        assert average_precision(flags, scores, 2) == 0.0

    def test_half(self):
        # TP at rank 1, FP at rank 2, one GT missed (2 GT total).
        flags = np.asarray([True, False])
        scores = np.asarray([0.9, 0.8])
        ap = average_precision(flags, scores, 2)
        assert ap == pytest.approx(0.5)


class TestDetectionBenchmark:
    def _gt(self):
        return {
            "img1.jpg": np.asarray([[10, 10, 50, 100], [200, 50, 40, 90]], np.float32),
            "img2.jpg": np.asarray([[300, 100, 60, 120]], np.float32),
        }

    def _perfect_preds(self):
        return [
            DetectionRecord("img1.jpg", (10, 10, 50, 100), 0.95),
            DetectionRecord("img1.jpg", (200, 50, 40, 90), 0.9),
            DetectionRecord("img2.jpg", (300, 100, 60, 120), 0.85),
        ]

    def test_perfect_predictions(self):
        result = DetectionBenchmark().evaluate(self._perfect_preds(), self._gt())
        assert result.precision == pytest.approx(1.0)
        assert result.recall == pytest.approx(1.0)
        assert result.ap50 == pytest.approx(1.0)
        assert result.map_5095 == pytest.approx(1.0)

    def test_false_positive_lowers_precision(self):
        preds = self._perfect_preds() + [
            DetectionRecord("img2.jpg", (600, 600, 50, 100), 0.5)
        ]
        result = DetectionBenchmark().evaluate(preds, self._gt())
        assert result.precision == pytest.approx(3 / 4)
        assert result.recall == pytest.approx(1.0)
        assert result.fp == 1

    def test_jittered_boxes_pass_50_fail_75(self):
        # ~0.62 IoU vs GT: TP at IoU 0.5 but not at 0.75.
        preds = [DetectionRecord("img2.jpg", (310, 110, 60, 120), 0.9)]
        gt = {"img2.jpg": self._gt()["img2.jpg"]}
        result = DetectionBenchmark().evaluate(preds, gt)
        assert result.ap50 == pytest.approx(1.0)
        assert result.ap75 == pytest.approx(0.0)

    def test_threshold_sweep_best(self):
        preds = self._perfect_preds() + [
            DetectionRecord("img1.jpg", (600, 600, 30, 60), 0.3)
        ]
        sweep = threshold_sweep(preds, self._gt(), thresholds=np.asarray([0.1, 0.5]))
        assert sweep["best_threshold"] == 0.5
        assert sweep["best_f1"] == pytest.approx(1.0)

    def test_export(self, tmp_path):
        result = DetectionBenchmark().evaluate(self._perfect_preds(), self._gt())
        paths = DetectionBenchmark().export(result, tmp_path)
        assert paths["json"].exists()
        metrics = json.loads(paths["json"].read_text())
        assert metrics["ap_50"] == pytest.approx(1.0)
        assert "# Detection Benchmark" in paths["report"].read_text()


# --------------------------------------------------------------------- MOT
def _box(x, y=100):
    return (x, y, 50.0, 130.0)


class TestMOTMetrics:
    def test_perfect_tracking(self):
        gt = {f: [(1, _box(100 + 5 * f)), (2, _box(400))] for f in range(1, 6)}
        hyp = {f: [(11, _box(100 + 5 * f)), (12, _box(400))] for f in range(1, 6)}
        r = evaluate_mot(gt, hyp)
        assert r.mota == pytest.approx(1.0)
        assert r.idf1 == pytest.approx(1.0)
        assert r.idsw == 0

    def test_id_switch_detected(self):
        gt = {f: [(1, _box(100))] for f in range(1, 7)}
        hyp = {f: [(11 if f <= 3 else 22, _box(100))] for f in range(1, 7)}
        r = evaluate_mot(gt, hyp)
        assert r.idsw == 1
        assert r.mota == pytest.approx(1.0 - 1 / 6)
        # IDF1: best global match covers 3 of 6 frames each side.
        assert r.idf1 == pytest.approx(0.5)

    def test_misses_and_false_positives(self):
        gt = {1: [(1, _box(100)), (2, _box(400))]}
        hyp = {1: [(11, _box(100)), (12, _box(900))]}
        r = evaluate_mot(gt, hyp)
        assert r.fn == 1 and r.fp == 1
        assert r.mota == pytest.approx(1.0 - 2 / 2)

    def test_continuation_preferred_over_swap(self):
        # Two crossing tracks with ambiguous middle frame: the accumulator
        # should keep existing correspondences when still matchable.
        gt = {
            1: [(1, _box(100)), (2, _box(200))],
            2: [(1, _box(150)), (2, _box(150, y=104))],
            3: [(1, _box(200)), (2, _box(100))],
        }
        hyp = {
            1: [(11, _box(100)), (22, _box(200))],
            2: [(11, _box(150)), (22, _box(150, y=104))],
            3: [(11, _box(200)), (22, _box(100))],
        }
        r = evaluate_mot(gt, hyp)
        assert r.idsw == 0
        assert r.mota == pytest.approx(1.0)


class TestTrackingBenchmarkFiles:
    def _write_files(self, tmp_path):
        gt = {
            "frames": [
                {
                    "frame_number": f,
                    "annotations": [
                        {"track_id": 1, "bbox": {"x": 100.0 + f, "y": 100.0, "width": 50.0, "height": 130.0}}
                    ],
                }
                for f in (1, 2, 3)
            ]
        }
        gt_path = tmp_path / "gt.json"
        gt_path.write_text(json.dumps(gt))
        pred_path = tmp_path / "tracks_mot.csv"
        pred_path.write_text(
            "\n".join(
                f"{f},7,{100.0 + f},100.0,50.0,130.0,0.9,-1,-1,-1" for f in (1, 2, 3)
            )
        )
        return gt_path, pred_path

    def test_evaluate_from_files(self, tmp_path):
        gt_path, pred_path = self._write_files(tmp_path)
        r = TrackingBenchmark().evaluate_from_files(gt_path, pred_path)
        assert r.mota == pytest.approx(1.0)
        assert r.idf1 == pytest.approx(1.0)

    def test_sparse_mode_renumbers(self, tmp_path):
        gt_path, pred_path = self._write_files(tmp_path)
        gt = load_gold_gt(gt_path)
        gt = {f * 9000: v for f, v in gt.items()}  # 5-min frame numbers
        gt_path.write_text(
            json.dumps(
                {
                    "frames": [
                        {
                            "frame_number": f,
                            "annotations": [
                                {"track_id": t, "bbox": list(b)} for t, b in anns
                            ],
                        }
                        for f, anns in gt.items()
                    ]
                }
            )
        )
        r = TrackingBenchmark(sparse=True).evaluate_from_files(gt_path, pred_path)
        assert r.mota == pytest.approx(1.0)

    def test_cli_main(self, tmp_path, capsys):
        gt_path, pred_path = self._write_files(tmp_path)
        rc = tracking_main(
            ["--gt", str(gt_path), "--pred", str(pred_path), "--json",
             "--report", str(tmp_path / "rep")]
        )
        assert rc == 0
        out = json.loads(capsys.readouterr().out)
        assert out["mota"] == pytest.approx(1.0)
        assert (tmp_path / "rep" / "tracking_metrics.json").exists()
        assert (tmp_path / "rep" / "tracking_diagnostics.json").exists()


class TestDetectionRunnerCLI:
    def test_cli(self, tmp_path, capsys):
        gt = {
            "images": [{"id": 1, "file_name": "img1.jpg"}],
            "annotations": [{"image_id": 1, "bbox": [10, 10, 50, 100]}],
        }
        (tmp_path / "gt.json").write_text(json.dumps(gt))
        preds = [{"file_name": "img1.jpg", "bbox": [10, 10, 50, 100], "score": 0.9}]
        (tmp_path / "pred.json").write_text(json.dumps(preds))
        rc = detection_main(
            ["--gt", str(tmp_path / "gt.json"), "--pred", str(tmp_path / "pred.json"),
             "--json", "--report", str(tmp_path / "rep"), "--sweep"]
        )
        assert rc == 0
        out = json.loads(capsys.readouterr().out)
        assert out["ap_50"] == pytest.approx(1.0)
        assert (tmp_path / "rep" / "threshold_analysis.json").exists()

    def test_load_pipeline_predictions(self, tmp_path):
        doc = {
            "transform_method": "homography",
            "frames": [
                {
                    "frame_number": 0,
                    "timestamp": "img1.jpg",
                    "detections": [
                        {"bbox": {"x": 1.0, "y": 2.0, "width": 3.0, "height": 4.0},
                         "confidence": 0.7,
                         "camera_coords": {"x": 2.5, "y": 6.0}},
                    ],
                }
            ],
        }
        p = tmp_path / "ct.json"
        p.write_text(json.dumps(doc))
        records = DetectionBenchmark.load_predictions(p)
        assert len(records) == 1
        assert records[0].bbox == (1.0, 2.0, 3.0, 4.0)


class TestSparseAlignment:
    def test_shared_frame_space_missing_frame_stays_missing(self):
        from office_person_detection_vit_tpu.benchmark.tracking_benchmark import (
            _renumber_sparse,
        )

        gt = {100: [(1, _box(10))], 200: [(1, _box(20))], 300: [(1, _box(30))]}
        hyp = {100: [(9, _box(10))], 300: [(9, _box(30))]}  # missed frame 200
        g2, h2 = _renumber_sparse(gt, hyp)
        assert set(g2) == {1, 2, 3}
        assert set(h2) == {1, 3}  # NOT shifted onto {1, 2}

    def test_disjoint_equal_sets_align_by_order(self):
        from office_person_detection_vit_tpu.benchmark.tracking_benchmark import (
            _renumber_sparse,
        )

        gt = {9000: [(1, _box(10))], 18000: [(1, _box(20))]}
        hyp = {1: [(9, _box(10))], 2: [(9, _box(20))]}
        g2, h2 = _renumber_sparse(gt, hyp)
        assert set(g2) == set(h2) == {1, 2}


class TestIDF1PaddedSquare:
    def test_prefers_high_overlap_hypothesis(self):
        """Ristani construction: GT must match the 5-frame-overlap hyp (10
        frames total), not the 4-frame-overlap hyp (4 frames total)."""
        gt = {f: [(1, _box(100))] for f in range(1, 11)}
        hyp = {}
        for f in range(1, 6):  # hyp A overlaps frames 1-5
            hyp.setdefault(f, []).append((77, _box(100)))
        for f in range(6, 11):  # hyp A present but far away frames 6-10
            hyp.setdefault(f, []).append((77, _box(900)))
        for f in range(1, 5):  # hyp B overlaps frames 1-4 only
            hyp.setdefault(f, []).append((88, _box(100, y=104)))
        r = evaluate_mot(gt, hyp)
        # IDTP=5 via hyp A: IDF1 = 2*5 / (10 + 14) = 0.4166...
        assert r.idf1 == pytest.approx(2 * 5 / 24, abs=1e-6)


class TestHOTA:
    def _gt(self, n=10):
        return {f: [(1, (10.0 * f, 0.0, 10.0, 20.0)),
                    (2, (100.0 + 5 * f, 50.0, 10.0, 20.0))] for f in range(n)}

    def test_perfect_tracking_is_one(self):
        from office_person_detection_vit_tpu.benchmark.mot_metrics import evaluate_hota

        gt = self._gt()
        r = evaluate_hota(gt, gt)
        assert r.hota == 1.0 and r.det_a == 1.0 and r.ass_a == 1.0

    def test_id_switch_halves_association(self):
        """One track switching ids halfway: DetA stays 1, AssA = 0.75
        (track 1 contributes 0.5 over its 10 TPs, track 2 contributes 1.0),
        HOTA = sqrt(0.75) — hand-derived from Luiten et al. definitions."""
        import numpy as np

        from office_person_detection_vit_tpu.benchmark.mot_metrics import evaluate_hota

        gt = self._gt()
        hyp = {f: [(1 if f < 5 else 3, gt[f][0][1]), (2, gt[f][1][1])]
               for f in range(10)}
        r = evaluate_hota(gt, hyp)
        assert r.det_a == 1.0
        assert r.ass_a == pytest.approx(0.75)
        assert r.hota == pytest.approx(float(np.sqrt(0.75)))

    def test_missed_detections_lower_det_a(self):
        from office_person_detection_vit_tpu.benchmark.mot_metrics import evaluate_hota

        gt = self._gt()
        hyp = {f: [(1, gt[f][0][1])] for f in range(10)}  # track 2 never found
        r = evaluate_hota(gt, hyp)
        # TP=10, FN=10, FP=0 at every alpha -> DetA 0.5; matched track is clean.
        assert r.det_a == pytest.approx(0.5)
        assert r.ass_a == pytest.approx(1.0)

    def test_cli_reports_hota(self, tmp_path):
        import json as _json

        from office_person_detection_vit_tpu.benchmark import main as bench_main

        gt = self._gt()
        gold = {"format": "gold_tracking_gt", "frames": [
            {"frame_number": f, "annotations": [
                {"track_id": t, "bbox": list(b)} for t, b in anns]}
            for f, anns in gt.items()]}
        gt_path = tmp_path / "gt.json"
        gt_path.write_text(_json.dumps(gold))
        pred = tmp_path / "pred.csv"
        pred.write_text("".join(
            f"{f},{t},{b[0]},{b[1]},{b[2]},{b[3]},1.0,-1,-1,-1\n"
            for f, anns in gt.items() for t, b in anns))
        out = tmp_path / "report"
        rc = bench_main(["--gt", str(gt_path), "--pred", str(pred),
                         "--report", str(out)])
        assert rc == 0
        doc = _json.loads((out / "tracking_metrics.json").read_text())
        assert doc["hota"]["hota"] == 1.0
        assert "HOTA: 1.0000" in (out / "tracking_report.md").read_text()


class TestReferenceCompatAP:
    """ap_mode="reference" reproduces the reference's AP formula
    (src/evaluation/detection_benchmark.py:434-472): 11-point interpolation
    with recall normalized by MATCHED predictions. Verified against the
    reference's committed artifacts to full float precision
    (AP@50 0.9519408122061515 — see BASELINE.md "metric parity")."""

    def _data(self):
        # 1 image: 2 GT, 1 matching pred -> 1 TP, 1 FN.
        gt = {"a.jpg": np.asarray([[0, 0, 10, 10], [50, 50, 10, 10]], np.float32)}
        preds = [DetectionRecord("a.jpg", (0.0, 0.0, 10.0, 10.0), 0.9)]
        return preds, gt

    def test_reference_mode_ignores_false_negatives(self):
        preds, gt = self._data()
        std = DetectionBenchmark(ap_mode="standard").evaluate(preds, gt)
        ref = DetectionBenchmark(ap_mode="reference").evaluate(preds, gt)
        # Standard: recall ceiling 0.5 (1 of 2 GT found) -> AP@50 ~0.5.
        assert std.ap50 == pytest.approx(0.5)
        # Reference formula: recall normalized by matched preds -> perfect 1.0
        # despite the missed GT box.
        assert ref.ap50 == pytest.approx(1.0)
        # Working-point metrics agree between modes.
        assert std.f1 == ref.f1 and std.fn == ref.fn == 1

    def test_reference_mode_penalizes_false_positives(self):
        gt = {"a.jpg": np.asarray([[0, 0, 10, 10]], np.float32)}
        preds = [
            DetectionRecord("a.jpg", (500.0, 500.0, 10.0, 10.0), 0.95),  # FP first
            DetectionRecord("a.jpg", (0.0, 0.0, 10.0, 10.0), 0.9),
        ]
        ref = DetectionBenchmark(ap_mode="reference").evaluate(preds, gt)
        assert ref.ap50 < 1.0

    def test_unknown_mode_rejected(self):
        with pytest.raises(ValueError, match="unknown ap_mode"):
            DetectionBenchmark(ap_mode="coco")

    def test_runner_flag(self, tmp_path, capsys):
        import json as _json

        from office_person_detection_vit_tpu.benchmark.detection_runner import (
            main as runner_main,
        )

        gt_doc = {
            "images": [{"id": 1, "file_name": "a.jpg"}],
            "annotations": [
                {"id": 1, "image_id": 1, "bbox": [0, 0, 10, 10]},
                {"id": 2, "image_id": 1, "bbox": [50, 50, 10, 10]},
            ],
        }
        pred_doc = [{"file_name": "a.jpg", "bbox": [0, 0, 10, 10], "score": 0.9}]
        (tmp_path / "gt.json").write_text(_json.dumps(gt_doc))
        (tmp_path / "pred.json").write_text(_json.dumps(pred_doc))
        assert runner_main([
            "--gt", str(tmp_path / "gt.json"), "--pred", str(tmp_path / "pred.json"),
            "--ap-mode", "reference", "--json",
        ]) == 0
        out = _json.loads(capsys.readouterr().out)
        assert out["ap_50"] == pytest.approx(1.0)


class TestFullCocoPredictionLoading:
    def test_images_annotations_document(self, tmp_path):
        """The reference's detect_yolov8.py exports a FULL COCO document
        (images + annotations with scores); the loader must join bboxes to
        file names through the images table."""
        import json as _json

        doc = {
            "images": [
                {"id": 0, "file_name": "f1.jpg"},
                {"id": 1, "file_name": "f2.jpg"},
            ],
            "annotations": [
                {"id": 0, "image_id": 0, "bbox": [1, 2, 3, 4], "score": 0.8},
                {"id": 1, "image_id": 1, "bbox": [5, 6, 7, 8], "score": 0.6},
                {"id": 2, "image_id": 1, "bbox": [9, 9, 2, 2]},  # no score -> 1.0
            ],
            "categories": [{"id": 0, "name": "person"}],
        }
        p = tmp_path / "pred.json"
        p.write_text(_json.dumps(doc))
        records = DetectionBenchmark.load_predictions(p)
        assert len(records) == 3
        assert records[0].image == "f1.jpg" and records[0].score == 0.8
        assert records[2].image == "f2.jpg" and records[2].score == 1.0


class TestReferenceGoldGTKeyStyle:
    """The reference's committed gt_tracking.json uses frame_idx/person_id
    keys with 0-based frame_idx mapping to MOT's 1-based FrameId
    (reference tracking_benchmark.py:332). Its committed CSV twin encodes
    the same boxes at frame_idx+1; loading both must align perfectly."""

    def _write_pair(self, tmp_path):
        gold = {
            "version": "1.0",
            "frames": [
                {
                    "frame_idx": 4,
                    "annotations": [
                        {"person_id": 1, "bbox": [611.8, 277.1, 28.8, 19.4],
                         "confidence": 0.63},
                        {"person_id": 2, "bbox": [606.0, 321.8, 65.5, 59.3],
                         "confidence": 0.96},
                    ],
                }
            ],
        }
        (tmp_path / "gt.json").write_text(json.dumps(gold))
        (tmp_path / "gt.csv").write_text(
            "5,1,611.8,277.1,28.8,19.4,0.63,-1,-1,-1\n"
            "5,2,606.0,321.8,65.5,59.3,0.96,-1,-1,-1\n"
        )
        return tmp_path / "gt.json", tmp_path / "gt.csv"

    def test_frame_idx_maps_to_one_based(self, tmp_path):
        gold_path, _ = self._write_pair(tmp_path)
        gt = load_gold_gt(gold_path)
        assert list(gt) == [5]
        assert {tid for tid, _ in gt[5]} == {1, 2}

    def test_json_and_csv_twins_score_perfectly(self, tmp_path):
        gold_path, csv_path = self._write_pair(tmp_path)
        gt = load_gold_gt(gold_path)
        pred = load_mot_csv(csv_path)
        result = evaluate_mot(gt, pred)
        assert result.mota == pytest.approx(1.0)
        assert result.idf1 == pytest.approx(1.0)
        assert result.fp == 0 and result.fn == 0

    def test_frame_number_style_not_shifted(self, tmp_path):
        gold = {"frames": [{"frame_number": 5, "annotations": [
            {"track_id": 1, "bbox": [0, 0, 10, 10]}]}]}
        p = tmp_path / "g.json"
        p.write_text(json.dumps(gold))
        assert list(load_gold_gt(p)) == [5]

    def test_missing_id_key_raises(self, tmp_path):
        gold = {"frames": [{"frame_idx": 0, "annotations": [{"bbox": [0, 0, 1, 1]}]}]}
        p = tmp_path / "g.json"
        p.write_text(json.dumps(gold))
        with pytest.raises(KeyError):
            load_gold_gt(p)


class TestPerBoxDiagnostics:
    def test_fp_fn_jsonl_files(self, tmp_path):
        """Per-box diagnostics match the reference diagnostics/ layout:
        detection_fp.jsonl (score + best_iou) and detection_fn.jsonl."""
        gt = {"a.jpg": np.asarray([[0, 0, 10, 10], [50, 50, 10, 10]], np.float32)}
        preds = [
            DetectionRecord("a.jpg", (0.0, 0.0, 10.0, 10.0), 0.9),     # TP
            DetectionRecord("a.jpg", (200.0, 200.0, 10.0, 10.0), 0.7),  # FP
        ]
        bench = DetectionBenchmark()
        result = bench.evaluate(preds, gt)
        paths = bench.export(result, tmp_path)
        fp_rows = [json.loads(x) for x in paths["fp_jsonl"].read_text().splitlines()]
        fn_rows = [json.loads(x) for x in paths["fn_jsonl"].read_text().splitlines()]
        assert len(fp_rows) == 1 and len(fn_rows) == 1
        assert fp_rows[0]["score"] == 0.7
        assert fp_rows[0]["best_iou"] == 0.0
        assert fn_rows[0]["bbox"] == [50.0, 50.0, 10.0, 10.0]


class TestTrackingEventDiagnostics:
    """Per-event JSONL diagnostics in the reference's diagnostics/ layout
    (id_switches / missed_detections / false_positives)."""

    def _scenario(self):
        gt = {1: [(1, (0, 0, 10, 10))], 2: [(1, (2, 0, 10, 10))],
              3: [(1, (4, 0, 10, 10))]}
        hyp = {1: [(7, (0, 0, 10, 10))],
               2: [(8, (2, 0, 10, 10)), (9, (100, 100, 5, 5))],
               3: []}
        return gt, hyp

    def test_events_collected(self):
        gt, hyp = self._scenario()
        events = {}
        result = evaluate_mot(gt, hyp, events_out=events)
        assert result.idsw == 1 and result.fp == 1 and result.fn == 1
        sw = events["id_switches"][0]
        assert (sw["old_track_id"], sw["new_track_id"], sw["gt_id"]) == (7, 8, 1)
        # frame_idx carries the 1-based MOT FrameId — exactly what the
        # reference's committed diagnostics emit (gold frame_idx 4 appears
        # as "frame_idx": 5 in its missed_detections.jsonl).
        assert sw["frame_idx"] == 2 and sw["iou"] == pytest.approx(1.0)
        assert events["false_positives"][0]["pred_id"] == 9
        assert events["missed_detections"][0]["frame_idx"] == 3

    def test_export_writes_jsonl_files(self, tmp_path):
        gt, hyp = self._scenario()
        events = {}
        result = evaluate_mot(gt, hyp, events_out=events)
        paths = TrackingBenchmark.export(result, tmp_path, events=events)
        for name in ("id_switches", "missed_detections", "false_positives"):
            rows = [json.loads(x) for x in paths[name].read_text().splitlines()]
            assert len(rows) == 1

    def test_no_events_without_request(self):
        gt, hyp = self._scenario()
        result = evaluate_mot(gt, hyp)  # no events_out: unchanged behavior
        assert result.idsw == 1


class TestSparseEventAlignment:
    def test_sparse_report_events_align_with_metrics(self, tmp_path):
        """Sparse mode: events must come from the SAME renumbered evaluation
        as the metrics — disjoint frame spaces aligned by order must produce
        matched tracks, not all-FP/all-FN diagnostics."""
        # GT in raw video frame numbers, predictions in 1..N sample indices.
        (tmp_path / "gt.csv").write_text(
            "1000,1,10,10,20,40,1,-1,-1,-1\n2000,1,12,11,20,40,1,-1,-1,-1\n"
        )
        (tmp_path / "pred.csv").write_text(
            "1,5,10,10,20,40,1,-1,-1,-1\n2,5,12,11,20,40,1,-1,-1,-1\n"
        )
        bench = TrackingBenchmark(sparse=True)
        events = {}
        result = bench.evaluate_from_files(
            tmp_path / "gt.csv", tmp_path / "pred.csv",
            gt_format="mot", events_out=events,
        )
        assert result.mota == pytest.approx(1.0)
        assert events["missed_detections"] == []
        assert events["false_positives"] == []
        assert events["id_switches"] == []
