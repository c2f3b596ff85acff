"""Tools integration loop: detect_export -> detection_runner -> threshold
sweep -> gt conversion -> tracking benchmark, all through the real CLIs."""

import json
import sys
from pathlib import Path

import cv2
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


@pytest.fixture(scope="module")
def image_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    for i in range(3):
        cv2.imwrite(str(d / f"img{i}.jpg"),
                    rng.integers(0, 255, (72, 96, 3), np.uint8))
    return d


def test_detect_export_then_benchmark(image_dir, tmp_path):
    from tools.detect_export import main as export_main
    from office_person_detection_vit_tpu.benchmark.detection_runner import (
        main as bench_main,
    )

    out = tmp_path / "detections.json"
    rc = export_main([
        "--images", str(image_dir), "--output", str(out),
        "--conf", "0.0", "--batch", "2", "--tiny",
    ])
    assert rc == 0
    records = json.loads(out.read_text())
    assert isinstance(records, list)

    # GT: use the exported detections as their own ground truth -> perfect AP
    # when anything was detected; empty-GT degenerate case otherwise.
    images = sorted({r["file_name"] for r in records}) or ["img0.jpg"]
    gt = {
        "images": [{"id": i, "file_name": n} for i, n in enumerate(images)],
        "annotations": [
            {"id": k, "image_id": images.index(r["file_name"]), "bbox": r["bbox"],
             "category_id": 1}
            for k, r in enumerate(records)
        ],
        "categories": [{"id": 1, "name": "person"}],
    }
    gt_path = tmp_path / "gt.json"
    gt_path.write_text(json.dumps(gt))
    rc = bench_main([
        "--gt", str(gt_path), "--pred", str(out), "--json",
        "--report", str(tmp_path / "rep"), "--sweep",
    ])
    assert rc == 0
    metrics = json.loads((tmp_path / "rep" / "detection_metrics.json").read_text())
    if records:
        assert metrics["ap_50"] == pytest.approx(1.0)
    assert (tmp_path / "rep" / "threshold_analysis.json").exists()


def test_threshold_tool(image_dir, tmp_path):
    from tools.analyze_threshold import main as thr_main

    gt = {
        "images": [{"id": 1, "file_name": "a.jpg"}],
        "annotations": [{"id": 1, "image_id": 1, "bbox": [5, 5, 20, 40],
                         "category_id": 1}],
    }
    (tmp_path / "gt.json").write_text(json.dumps(gt))
    preds = [
        {"file_name": "a.jpg", "bbox": [5, 5, 20, 40], "score": 0.9},
        {"file_name": "a.jpg", "bbox": [60, 5, 20, 40], "score": 0.2},
    ]
    (tmp_path / "pred.json").write_text(json.dumps(preds))
    rc = thr_main(["--gt", str(tmp_path / "gt.json"),
                   "--pred", str(tmp_path / "pred.json"),
                   "--output", str(tmp_path / "sweep.json")])
    assert rc == 0
    sweep = json.loads((tmp_path / "sweep.json").read_text())
    assert sweep["best_f1"] == pytest.approx(1.0)
    assert sweep["best_threshold"] >= 0.25  # must exclude the 0.2 FP


def test_camera_optimizer_cli(tmp_path):
    from tools.camera_param_optimizer import main as cam_main

    rng = np.random.default_rng(0)
    cam = rng.uniform(0, 500, (10, 2))
    H = np.asarray([[1.1, 0.05, 20], [0.02, 1.2, -5], [0, 0, 1.0]])
    hom = np.concatenate([cam, np.ones((10, 1))], axis=1) @ H.T
    floor = hom[:, :2] / hom[:, 2:3]
    doc = {"points": [{"camera": c.tolist(), "floor": f.tolist()}
                      for c, f in zip(cam, floor)]}
    (tmp_path / "corr.json").write_text(json.dumps(doc))
    rc = cam_main(["--correspondences", str(tmp_path / "corr.json"),
                   "--output", str(tmp_path / "H.json"), "--steps", "300"])
    assert rc == 0
    result = json.loads((tmp_path / "H.json").read_text())
    assert result["fit"]["rmse"] < 0.1


@pytest.fixture()
def correspondence_file(tmp_path):
    rng = np.random.default_rng(1)
    H = np.array([[1.5, 0.0, 100.0], [0.0, 1.4, 50.0], [0.0, 0.0, 1.0]])
    cam = rng.uniform(0, [1280, 720], (25, 2))
    fl = np.concatenate([cam, np.ones((25, 1))], 1) @ H.T
    fl = fl[:, :2] / fl[:, 2:3]
    fl[0] += [400, 300]  # one outlier
    p = tmp_path / "pts.json"
    p.write_text(json.dumps({
        "points": [{"camera": c.tolist(), "floormap": f.tolist()}
                   for c, f in zip(cam, fl)]
    }))
    return p, H


def test_correspondence_analyzer_cli(correspondence_file, tmp_path):
    from tools.correspondence_analyzer import main as analyzer_main

    pts, _ = correspondence_file
    out = tmp_path / "analysis"
    rc = analyzer_main(["--correspondences", str(pts), "--output-dir", str(out)])
    assert rc == 0
    res = json.loads((out / "analysis.json").read_text())
    assert res["distribution"]["total_points"] == 25
    err = res["homography_error"]
    assert err["num_outliers"] == 1
    assert not err["point_errors"][0]["is_inlier"]
    inlier_errs = [p["error"] for p in err["point_errors"] if p["is_inlier"]]
    assert max(inlier_errs) < 1.0
    assert (out / "report.md").exists()
    assert (out / "distribution.png").exists()
    assert (out / "error_map.png").exists()


def test_poc_deep_homography_cli(correspondence_file, tmp_path):
    from tools.poc_deep_homography import main as poc_main

    pts, H = correspondence_file
    out = tmp_path / "poc.json"
    rc = poc_main(["--correspondence", str(pts), "--ransac", "--json", str(out)])
    assert rc == 0
    (result,) = json.loads(out.read_text())
    assert result["name"] == "ransac"
    assert result["num_inliers"] == 24
    est = np.asarray(result["homography_matrix"])
    assert np.abs(est - H).max() < 0.5


def test_poc_tracking_backends_cli(tmp_path):
    from tools.poc_tracking_backends import main as poc_main

    # Two people moving right; 6 frames.
    frames = []
    for f in range(6):
        frames.append({
            "frame": f,
            "timestamp": f"t{f}",
            "detections": [
                {"bbox": [100 + 5 * f, 200, 40, 80], "score": 0.9},
                {"bbox": [400 + 5 * f, 210, 40, 80], "score": 0.85},
            ],
        })
    dets = tmp_path / "dets.json"
    dets.write_text(json.dumps(frames))
    out = tmp_path / "tracked.json"
    rc = poc_main(["--detections", str(dets), "--backend", "both",
                   "--output", str(out)])
    assert rc == 0
    res = json.loads(out.read_text())
    for backend in ("deepsort", "lightweight"):
        stats = res[backend]["stats"]
        assert stats["frames"] == 6 and stats["detections"] == 12
        assert stats["unique_tracks"] == 2
        # ids persist across frames
        last = res[backend]["frames"][-1]["detections"]
        first_ids = {d["track_id"] for d in res[backend]["frames"][2]["detections"]}
        assert {d["track_id"] for d in last} == first_ids


def test_convert_coco_to_yolo(tmp_path):
    from tools.convert_gt import main as convert_main

    coco = {
        "images": [
            {"id": 1, "file_name": "a.jpg", "width": 100, "height": 50},
            {"id": 2, "file_name": "b.jpg", "width": 100, "height": 50},
        ],
        "annotations": [
            {"id": 1, "image_id": 1, "bbox": [10, 10, 20, 30]},
            {"id": 2, "image_id": 2, "bbox": [50, 0, 10, 10]},
        ],
    }
    src = tmp_path / "coco.json"
    src.write_text(json.dumps(coco))
    out = tmp_path / "yolo"
    rc = convert_main(["coco-to-yolo", "--input", str(src),
                       "--output", str(out), "--val-ratio", "0.5"])
    assert rc == 0
    train_label = (out / "labels/train/a.txt").read_text().split()
    assert train_label[0] == "0"
    # center-x = (10+10)/100, center-y = (10+15)/50, w = 0.2, h = 0.6
    assert [float(v) for v in train_label[1:]] == pytest.approx([0.2, 0.5, 0.2, 0.6])
    assert (out / "labels/val/b.txt").exists()
    assert "names" in (out / "data.yaml").read_text()


def test_dagster_poc_runs_pipeline_body(tmp_path):
    """The dagster PoC's op body runs the full pipeline from a YAML config
    (directly when dagster is absent, as in this image)."""
    import yaml

    from tests.helpers.synthetic_video import write_video
    from tools.dagster_poc import HAS_DAGSTER, run_full_pipeline

    video = tmp_path / "v.mp4"
    write_video(video, num_frames=30)
    cfg = {
        "video": {"input_path": str(video), "fps": 30,
                  "frame_interval_minutes": 5, "tolerance_seconds": 60,
                  "time_compression_ratio": 313.0},
        "detection": {"confidence_threshold": 0.0, "batch_size": 2,
                      "device": "cpu", "model_size": "tiny",
                      "input_height": 96, "input_width": 128,
                      "dtype": "float32", "use_pallas_attention": False},
        "transform": {"method": "homography"},
        "homography": {"matrix": [[1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0]]},
        "zones": [{"id": "zone_a", "name": "A",
                   "polygon": [[0, 0], [2000, 0], [2000, 1500], [0, 1500]]}],
        "output": {"directory": str(tmp_path / "out")},
        "timestamp": {"extraction_mode": "auto_targets",
                      "auto_targets": {"max_frames": 30,
                                       "disable_validation": True},
                      "sampling": {"coarse_interval_seconds": 0.5},
                      "extraction": {"confidence_threshold": 0.3}},
    }
    cfg_path = tmp_path / "config.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    summary_path = Path(run_full_pipeline(str(cfg_path)))
    assert summary_path.name == "summary.json"
    summary = json.loads(summary_path.read_text())
    assert summary["status"] == "completed"
    assert not HAS_DAGSTER  # this image has no dagster; body ran directly


def test_convert_coco_to_yolo_single_image_keeps_train(tmp_path):
    """A 1-image dataset must not end up with an empty train split."""
    from tools.convert_gt import main as convert_main

    coco = {"images": [{"id": 1, "file_name": "a.jpg", "width": 10, "height": 10}],
            "annotations": [{"id": 1, "image_id": 1, "bbox": [1, 1, 2, 2]}]}
    src = tmp_path / "coco.json"
    src.write_text(json.dumps(coco))
    out = tmp_path / "yolo"
    assert convert_main(["coco-to-yolo", "--input", str(src), "--output", str(out)]) == 0
    assert (out / "labels/train/a.txt").exists()
    assert not (out / "labels/val/a.txt").exists()


def test_correspondence_analyzer_clamps_offgrid_points(tmp_path):
    """Negative-coordinate points must clamp to cell 0, not wrap to -1."""
    from tools.correspondence_analyzer import analyze_distribution

    src = np.asarray([[-300.0, -50.0], [100.0, 100.0]])
    dist = analyze_distribution(src, (1280, 720))
    grid = np.asarray(dist["grid_counts"])
    assert grid[0, 0] == 2  # both land in the first cell
    assert grid[-1, -1] == 0


def test_transforms_to_gold_roundtrip(tmp_path):
    """Phase-3 artifact (both key layouts) -> gold GT + MOT CSV that the
    tracking benchmark can consume."""
    from office_person_detection_vit_tpu.benchmark.mot_metrics import load_gold_gt
    from tools.convert_gt import main as convert_main

    doc = {"frames": [
        {"frame_number": 0, "detections": [
            {"bbox": {"x": 10.0, "y": 20.0, "width": 30.0, "height": 60.0},
             "track_id": 1, "confidence": 0.9, "zone_ids": ["zone_a"]},
            {"bbox": {"x": 99.0, "y": 9.0, "width": 5.0, "height": 5.0}},  # untracked
        ]},
        {"idx": 1, "det": [  # compact layout
            {"bb": [12.0, 21.0, 30.0, 60.0], "id": 1, "conf": 0.8},
        ]},
    ]}
    src = tmp_path / "coordinate_transformations.json"
    src.write_text(json.dumps(doc))
    gold = tmp_path / "gt.json"
    mot = tmp_path / "gt.csv"
    rc = convert_main(["transforms-to-gold", "--input", str(src),
                       "--output", str(gold), "--mot-output", str(mot)])
    assert rc == 0
    loaded = load_gold_gt(gold)
    assert loaded[0] == [(1, (10.0, 20.0, 30.0, 60.0))]
    assert loaded[1] == [(1, (12.0, 21.0, 30.0, 60.0))]
    rows = [line.split(",") for line in mot.read_text().splitlines()]
    assert rows[0][0] == "1" and rows[0][1] == "1"  # 1-indexed frame, id
    assert rows[1][0] == "2"


class TestPerfTools:
    """CPU-checkable pieces of the TPU perf tools."""

    def test_analytic_flops_matches_xla_cost_model_convention(self):
        import sys
        from pathlib import Path

        sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
        from profile_detect import analytic_detr_flops, detect_peak_tflops

        from office_person_detection_vit_tpu.models.detr import DETRConfig

        f = analytic_detr_flops(1, 736, 1280, DETRConfig())
        # XLA cost_analysis reports 177.7 GFLOPs/frame for the full fused
        # program at this geometry (2*MAC convention).
        assert 1.7e11 < f < 1.9e11
        # batch scales linearly
        assert analytic_detr_flops(16, 736, 1280, DETRConfig()) == 16 * f
        peak, kind = detect_peak_tflops()
        assert peak > 0 and isinstance(kind, str)

    def test_attn_bench_shapes_cover_production_sites(self):
        import sys
        from pathlib import Path

        sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
        from attn_kernel_bench import SHAPES

        names = {n for n, _ in SHAPES}
        assert {"enc-self-B16", "dec-cross-B16", "dec-self-B16"} <= names
        for _, (B, H, Lq, Lk, D) in SHAPES:
            assert D == 32 and H == 8  # DETR head geometry


class TestCollapseDiagnosis:
    """tools/diagnose_detr_collapse.py metric core (round-4 DETR-small
    blind-anchor failure — docs/training.md "DETR at tiny scale")."""

    @staticmethod
    def _make(n_images=6, Q=8, person_id=1, C=3, healthy=True, seed=0):
        rng = np.random.default_rng(seed)
        gt = [np.asarray([[0.2 + 0.1 * (i % 3), 0.5, 0.1, 0.3]], np.float32)
              for i in range(n_images)]
        logits = np.full((n_images, Q, C + 1), -4.0, np.float32)
        boxes = np.zeros((n_images, Q, 4), np.float32)
        if healthy:
            # query 0 tracks the object exactly and fires alone
            for i in range(n_images):
                boxes[i, 0] = gt[i][0]
                boxes[i, 1:] = rng.uniform(0.3, 0.9, (Q - 1, 4))
            logits[:, :, C] = 4.0          # others: no-object
            logits[:, 0, C] = -4.0
            logits[:, 0, person_id] = 4.0  # query 0: person
        else:
            # blend: every query person at p~0.6, same frozen anchors
            logits[:, :, person_id] = 0.5
            logits[:, :, C] = 0.0
            anchors = rng.uniform(0.2, 0.8, (Q, 4)).astype(np.float32)
            boxes[:] = anchors[None]
        return logits, boxes, gt

    def test_healthy_predictions_raise_no_flags(self):
        from tools.diagnose_detr_collapse import summarize_predictions

        logits, boxes, gt = self._make(healthy=True)
        r = summarize_predictions(logits, boxes, gt, person_class_id=1)
        assert not any(r["flags"].values()), r
        assert r["blend_gap"] > 0.5 and r["matched_iou_mean"] > 0.99
        assert r["fire_rate"] == pytest.approx(1 / 8)

    def test_collapsed_predictions_raise_all_flags(self):
        from tools.diagnose_detr_collapse import summarize_predictions

        logits, boxes, gt = self._make(healthy=False)
        r = summarize_predictions(logits, boxes, gt, person_class_id=1)
        assert r["flags"]["symmetric_collapse"], r
        assert r["flags"]["blind_anchors"], r
        assert r["frozen_query_frac"] == 1.0
        assert abs(r["blend_gap"]) < 0.1

    def test_focal_mode_scores_sigmoid_and_respects_person_id(self):
        """A focal-trained checkpoint's no-object column is untrained
        garbage: softmax scoring sees a blend, sigmoid scoring sees health
        (ADVICE r4). person_class_id=2 must be honored, not hardcoded to 1."""
        from tools.diagnose_detr_collapse import summarize_predictions

        person_id = 2
        logits, boxes, gt = self._make(healthy=True, person_id=person_id)
        # Focal head semantics: no-object logit is dead weight — fill it
        # with large garbage that would dominate a softmax.
        logits[:, :, -1] = 9.0
        r = summarize_predictions(logits, boxes, gt,
                                  person_class_id=person_id,
                                  class_loss="focal")
        assert r["class_loss"] == "focal"
        assert not any(r["flags"].values()), r
        assert r["blend_gap"] > 0.5 and r["matched_iou_mean"] > 0.99
        # Softmax scoring of the same checkpoint misreads it (all person
        # probabilities crushed by the garbage no-object column).
        r_ce = summarize_predictions(logits, boxes, gt,
                                     person_class_id=person_id)
        assert r_ce["matched_p"] < 0.1
