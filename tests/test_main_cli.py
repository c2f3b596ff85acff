"""main.py CLI: exit codes + full run through the real entry point."""

import json
import sys
from pathlib import Path

import pytest
import yaml

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from main import main  # noqa: E402

from tests.helpers.synthetic_video import write_video  # noqa: E402
from tests.test_pipeline_e2e import ZONES, H_IDENТITY_ISH  # noqa: E402


def _write_config(tmp_path, video_path) -> Path:
    cfg = {
        "video": {
            "input_path": str(video_path),
            "fps": 30,
            "frame_interval_minutes": 5,
            "tolerance_seconds": 60,
            "time_compression_ratio": 313.0,
        },
        "detection": {
            "confidence_threshold": 0.0,
            "batch_size": 2,
            "device": "cpu",
            "model_size": "tiny",
            "input_height": 96,
            "input_width": 128,
            "dtype": "float32",
            "use_pallas_attention": False,
        },
        "transform": {"method": "homography"},
        "homography": {"matrix": H_IDENТITY_ISH},
        "zones": ZONES,
        "output": {"directory": str(tmp_path / "output"),
                   "save_floormap_images": False},
        "timestamp": {
            "extraction_mode": "auto_targets",
            "auto_targets": {"max_frames": 40, "disable_validation": True},
            "sampling": {"coarse_interval_seconds": 0.5},
            "extraction": {"confidence_threshold": 0.3},
        },
    }
    path = tmp_path / "config.yaml"
    path.write_text(yaml.safe_dump(cfg))
    return path


def test_missing_config_returns_1(tmp_path):
    assert main(["--config", str(tmp_path / "missing.yaml")]) == 1


def test_timestamps_only_run(tmp_path):
    video = write_video(tmp_path / "v.mp4", num_frames=40)
    cfg = _write_config(tmp_path, video)
    rc = main(["--config", str(cfg), "--timestamps-only"])
    assert rc == 0
    sessions = [
        p for p in (tmp_path / "output").iterdir()
        if p.is_dir() and not p.is_symlink()
    ]
    assert len(sessions) == 1
    assert (sessions[0] / "01_extraction" / "extraction_results.csv").exists()
    summary = json.loads((sessions[0] / "summary.json").read_text())
    assert summary["status"] == "completed"


def test_default_repo_config_is_valid():
    """The shipped config.yaml must parse and validate."""
    from office_person_detection_vit_tpu.config.config_manager import ConfigManager

    repo_cfg = Path(__file__).resolve().parents[1] / "config.yaml"
    cm = ConfigManager(repo_cfg)
    assert cm.validate()
    assert cm.get("detection.model") == "detr"
    assert cm.get("detection.input_height") % 32 == 0
    assert cm.get("detection.input_width") % 32 == 0


def test_evaluate_flag_runs_evaluation(tmp_path):
    """--evaluate with a GT file produces the evaluation report."""
    import cv2
    import numpy as np

    video = write_video(tmp_path / "v.mp4", num_frames=40)
    cfg_path = _write_config(tmp_path, video)
    cfg = yaml.safe_load(cfg_path.read_text())
    # GT keyed by the frame filenames Phase 1 will save.
    gt = {
        "images": [],
        "annotations": [],
        "categories": [{"id": 1, "name": "person"}],
    }
    gt_path = tmp_path / "gt.json"
    gt_path.write_text(json.dumps(gt))
    cfg["evaluation"] = {"ground_truth_path": str(gt_path), "iou_threshold": 0.5}
    cfg["output"]["save_extracted_frames"] = True
    cfg_path.write_text(yaml.safe_dump(cfg))

    rc = main(["--config", str(cfg_path), "--evaluate"])
    assert rc == 0
    sessions = [
        p for p in (tmp_path / "output").iterdir()
        if p.is_dir() and not p.is_symlink()
    ]
    # Empty GT -> evaluation runs and reports zero metrics.
    report = sessions[0] / "evaluation" / "evaluation_metrics.json"
    assert report.exists()
    metrics = json.loads(report.read_text())
    assert metrics["true_positives"] == 0


def test_fine_tune_flag_runs_training(tmp_path):
    """--fine-tune dispatches to the training tool using training.* config."""
    import cv2
    import numpy as np

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    for i in range(2):
        cv2.imwrite(str(img_dir / f"i{i}.jpg"),
                    np.random.default_rng(i).integers(0, 255, (120, 160, 3), np.uint8))
    coco = {
        "images": [{"id": i, "file_name": f"i{i}.jpg", "width": 160, "height": 120}
                   for i in range(2)],
        "annotations": [{"id": i, "image_id": i, "bbox": [20, 30, 40, 60],
                         "category_id": 1} for i in range(2)],
        "categories": [{"id": 1, "name": "person"}],
    }
    (tmp_path / "coco.json").write_text(json.dumps(coco))

    video = write_video(tmp_path / "v.mp4", num_frames=10)
    cfg_path = _write_config(tmp_path, video)
    cfg = yaml.safe_load(cfg_path.read_text())
    cfg["training"] = {
        "images_dir": str(img_dir),
        "annotations": str(tmp_path / "coco.json"),
        "epochs": 1,
        "batch_size": 2,
        "output_dir": str(tmp_path / "run"),
    }
    cfg_path.write_text(yaml.safe_dump(cfg))

    # Note: --fine-tune currently trains the full-size model config unless
    # the training tool's --tiny is used; patch argv to keep the test small.
    import tools.train_detr as td

    orig = td.main

    def small_main(argv):
        return orig(argv + ["--tiny", "--height", "96", "--width", "128"])

    td.main = small_main
    try:
        rc = main(["--config", str(cfg_path), "--fine-tune"])
    finally:
        td.main = orig
    assert rc == 0
    assert (tmp_path / "run" / "weights.npz").exists()


def test_fine_tune_forwards_recipe_knobs(tmp_path):
    """training.schedule/accum_steps/ema/augment config keys forward to the
    training tool as the matching CLI flags (docs/training.md recipe)."""
    video = write_video(tmp_path / "v.mp4", num_frames=10)
    cfg_path = _write_config(tmp_path, video)
    cfg = yaml.safe_load(cfg_path.read_text())
    cfg["training"] = {
        "images_dir": str(tmp_path), "annotations": str(tmp_path / "x.json"),
        "schedule": "cosine", "warmup_steps": 5, "accum_steps": 2,
        "ema": 0.99, "augment": True,
    }
    cfg_path.write_text(yaml.safe_dump(cfg))

    import tools.train_detr as td

    seen = {}
    orig = td.main

    def capture(argv):
        seen["argv"] = argv
        return 0

    td.main = capture
    try:
        assert main(["--config", str(cfg_path), "--fine-tune"]) == 0
    finally:
        td.main = orig
    argv = seen["argv"]
    for flag, val in (("--schedule", "cosine"), ("--warmup-steps", "5"),
                      ("--accum-steps", "2"), ("--ema", "0.99")):
        assert argv[argv.index(flag) + 1] == val, argv
    assert "--augment" in argv and "--drop-at" not in argv
