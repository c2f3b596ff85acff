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
