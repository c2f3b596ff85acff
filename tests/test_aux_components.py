"""Preprocessing ops, feature visualizer, dashboard loader, transform
evaluator, GT conversion tools."""

import json
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from office_person_detection_vit_tpu.detection.preprocessing import (
    apply_clahe,
    apply_pipeline,
    deskew,
    invert,
    morphology,
    resize,
    threshold,
    unsharp_mask,
)
from office_person_detection_vit_tpu.evaluation.transform_evaluator import (
    TransformEvaluator,
    point_errors,
)
from office_person_detection_vit_tpu.visualization.dashboard_utils import (
    SessionDataLoader,
)
from office_person_detection_vit_tpu.visualization.feature_visualizer import (
    FeatureVisualizer,
)


class TestPreprocessing:
    @pytest.fixture
    def img(self):
        rng = np.random.default_rng(0)
        return rng.integers(0, 255, (60, 80, 3), np.uint8)

    def test_invert_involution(self, img):
        assert (invert(invert(img)) == img).all()

    def test_clahe_shapes(self, img):
        assert apply_clahe(img).shape == img.shape
        gray = img[..., 0]
        assert apply_clahe(gray).shape == gray.shape

    def test_resize_modes(self, img):
        assert resize(img, scale=2.0).shape[:2] == (120, 160)
        assert resize(img, width=40).shape[:2] == (30, 40)
        assert resize(img, width=100, height=50).shape[:2] == (50, 100)

    def test_threshold_binary(self, img):
        out = threshold(img)
        assert set(np.unique(out)) <= {0, 255}
        out_adaptive = threshold(img, adaptive=True)
        assert out_adaptive.shape == img.shape[:2]

    def test_morphology_ops(self, img):
        for op in ("open", "close", "erode", "dilate"):
            assert morphology(img, op).shape == img.shape
        with pytest.raises(ValueError):
            morphology(img, "bogus")

    def test_unsharp_and_deskew(self, img):
        assert unsharp_mask(img).shape == img.shape
        assert deskew(img).shape == img.shape

    def test_pipeline(self, img):
        out = apply_pipeline(
            img,
            [
                {"name": "grayscale"},
                {"name": "clahe", "clip_limit": 3.0},
                {"name": "resize", "scale": 2.0},
                {"name": "threshold"},
            ],
        )
        assert out.ndim == 2
        assert out.shape == (120, 160)

    def test_pipeline_unknown_step(self, img):
        with pytest.raises(ValueError):
            apply_pipeline(img, [{"name": "nope"}])

    def test_pipeline_bad_params_skipped(self, img):
        out = apply_pipeline(img, [{"name": "resize", "bogus_param": 1}])
        assert out.shape == img.shape


class TestFeatureVisualizer:
    def _features(self):
        rng = np.random.default_rng(0)
        # Three well-separated identity clusters.
        centers = np.asarray([[5, 0, 0], [0, 5, 0], [0, 0, 5]], np.float64)
        feats, ids = [], []
        for tid, c in enumerate(centers):
            feats.append(c + 0.1 * rng.normal(size=(10, 3)))
            ids.extend([tid] * 10)
        return np.concatenate(feats), np.asarray(ids)

    def test_cluster_quality(self):
        feats, ids = self._features()
        labels, sil = FeatureVisualizer().cluster(feats, 3)
        assert sil > 0.8
        assert len(np.unique(labels)) == 3

    def test_quality_report(self):
        feats, ids = self._features()
        report = FeatureVisualizer().quality_report(feats, ids)
        assert report["num_tracks"] == 3
        assert report["silhouette_by_track"] > 0.8

    def test_tsne_and_plot(self, tmp_path):
        feats, ids = self._features()
        out = FeatureVisualizer().plot_embedding(feats, ids, tmp_path / "emb.png")
        assert out.exists()


class TestTransformEvaluator:
    def test_point_errors(self):
        pred = np.asarray([[0, 0], [3, 4]], np.float32)
        exp = np.asarray([[0, 0], [0, 0]], np.float32)
        stats = point_errors(pred, exp)
        assert stats["max_error"] == pytest.approx(5.0)
        assert stats["rmse"] == pytest.approx(np.sqrt(12.5))

    def test_evaluate_homography(self):
        from office_person_detection_vit_tpu.transform.homography import (
            HomographyTransformer,
        )

        H = np.asarray([[2.0, 0, 10], [0, 2.0, 20], [0, 0, 1.0]])
        t = HomographyTransformer(H)
        cam = np.asarray([[0, 0], [10, 10], [50, 5], [5, 50]], np.float32)
        floor = cam * 2 + np.asarray([10, 20], np.float32)
        stats = TransformEvaluator().evaluate(t, cam, floor)
        assert stats["rmse"] < 1e-3
        assert stats["meets_target"]

    def test_cross_validation(self):
        from office_person_detection_vit_tpu.transform.homography import (
            HomographyTransformer,
        )
        import cv2

        rng = np.random.default_rng(0)
        cam = rng.uniform(0, 100, (8, 2)).astype(np.float32)
        H_true = np.asarray([[1.5, 0.1, 5], [0.05, 1.4, 8], [0, 0, 1.0]])
        hom = np.concatenate([cam, np.ones((8, 1), np.float32)], axis=1) @ H_true.T
        floor = (hom[:, :2] / hom[:, 2:3]).astype(np.float32)

        def build(c, f):
            H, _ = cv2.findHomography(c.astype(np.float64), f.astype(np.float64), 0)
            return HomographyTransformer(H)

        cv_stats = TransformEvaluator().cross_validate(build, cam, floor)
        assert cv_stats["num_folds"] == 8
        assert cv_stats["loo_rmse"] < 1e-2


class TestDashboardLoader:
    def _make_session(self, tmp_path):
        s = tmp_path / "20260101_120000"
        for sub in ("01_extraction", "03_tracking", "04_transform", "05_aggregation"):
            (s / sub).mkdir(parents=True)
        (s / "metadata.json").write_text(json.dumps({"session_id": "20260101_120000"}))
        (s / "summary.json").write_text(
            json.dumps({"statistics": {"frames_extracted": 3}})
        )
        (s / "pipeline_checkpoint.json").write_text(
            json.dumps({"phases": {"01_extraction": {"status": "completed"}}})
        )
        (s / "05_aggregation" / "zone_counts.csv").write_text(
            "timestamp,zone_a,zone_b\n2025-01-01 10:00:00,2,1\n"
        )
        (s / "04_transform" / "coordinate_transformations.json").write_text(
            json.dumps(
                {
                    "transform_method": "homography",
                    "frames": [
                        {
                            "frame_number": 0,
                            "detections": [
                                {
                                    "bbox": {"x": 1, "y": 2, "width": 3, "height": 4},
                                    "confidence": 0.9,
                                    "camera_coords": {"x": 2.5, "y": 6},
                                    "floor_coords_px": {"x": 100, "y": 200},
                                    "track_id": 5,
                                }
                            ],
                        }
                    ],
                }
            )
        )
        return s

    def test_loads_artifacts(self, tmp_path):
        s = self._make_session(tmp_path)
        loader = SessionDataLoader(s)
        assert loader.metadata()["session_id"] == "20260101_120000"
        assert loader.summary()["statistics"]["frames_extracted"] == 3
        assert loader.phase_status() == {"01_extraction": "completed"}
        zones, rows = loader.zone_counts()
        assert zones == ["zone_a", "zone_b"]
        assert rows[0]["zone_a"] == "2"

    def test_floor_trajectories(self, tmp_path):
        s = self._make_session(tmp_path)
        traj = SessionDataLoader(s).floor_trajectories()
        assert traj == {5: [(100, 200)]}

    def test_list_sessions(self, tmp_path):
        self._make_session(tmp_path)
        assert SessionDataLoader.list_sessions(tmp_path) == ["20260101_120000"]
        assert SessionDataLoader.list_sessions(tmp_path / "nope") == []


class TestGTConversionTools:
    def test_roundtrip_mot_gold(self, tmp_path):
        from tools.convert_gt import gold_to_mot, mot_to_gold

        mot = tmp_path / "gt.csv"
        mot.write_text("1,5,10.00,20.00,50.00,130.00,1.0,-1,-1,-1\n"
                       "2,5,12.00,21.00,50.00,130.00,1.0,-1,-1,-1\n")
        gold = tmp_path / "gold.json"
        mot_to_gold(mot, gold)
        doc = json.loads(gold.read_text())
        assert len(doc["frames"]) == 2
        assert doc["frames"][0]["annotations"][0]["track_id"] == 5
        back = tmp_path / "back.csv"
        gold_to_mot(gold, back)
        assert back.read_text().splitlines()[0].startswith("1,5,10.00")

    def test_coco_to_gold(self, tmp_path):
        from tools.convert_gt import coco_to_gold

        coco = tmp_path / "coco.json"
        coco.write_text(
            json.dumps(
                {
                    "images": [{"id": 10, "file_name": "a.jpg"}],
                    "annotations": [
                        {"id": 1, "image_id": 10, "bbox": [1, 2, 3, 4], "track_id": 9}
                    ],
                }
            )
        )
        out = tmp_path / "gold.json"
        coco_to_gold(coco, out)
        doc = json.loads(out.read_text())
        assert doc["frames"][0]["annotations"][0]["track_id"] == 9


class TestCameraOptimizer:
    def test_refines_to_low_rmse(self, tmp_path):
        from tools.camera_param_optimizer import (
            fit_homography_dlt,
            refine_homography_jax,
        )

        rng = np.random.default_rng(1)
        cam = rng.uniform(0, 500, (12, 2)).astype(np.float32)
        H_true = np.asarray([[1.2, 0.08, 30], [0.04, 1.3, -12], [1e-5, 2e-5, 1.0]])
        hom = np.concatenate([cam, np.ones((12, 1), np.float32)], axis=1) @ H_true.T
        floor = (hom[:, :2] / hom[:, 2:3]).astype(np.float32)
        noisy = floor + rng.normal(0, 0.5, floor.shape).astype(np.float32)

        H0 = fit_homography_dlt(cam, noisy)
        H, stats = refine_homography_jax(H0, cam, noisy, steps=500)
        assert stats["rmse"] < 1.5  # dominated by the injected 0.5 px noise


class TestGTEditor:
    def test_annotation_model_and_coco_export(self, tmp_path):
        import cv2
        from tools.gt_editor import GTEditor

        img_dir = tmp_path / "imgs"
        img_dir.mkdir()
        for name in ("a.jpg", "b.jpg"):
            cv2.imwrite(str(img_dir / name), np.zeros((60, 80, 3), np.uint8))
        paths = sorted(img_dir.iterdir())
        ed = GTEditor(paths, tmp_path / "gt.json", resume=None)
        # Simulate a drag on image 0: down at (10, 10), up at (40, 50).
        ed.on_mouse(cv2.EVENT_LBUTTONDOWN, 10, 10, 0, None)
        ed.on_mouse(cv2.EVENT_LBUTTONUP, 40, 50, 0, None)
        assert ed.annotations["a.jpg"][0]["bbox"] == [10.0, 10.0, 30.0, 40.0]
        ed.save()
        doc = json.loads((tmp_path / "gt.json").read_text())
        assert len(doc["images"]) == 2
        assert doc["annotations"][0]["bbox"] == [10.0, 10.0, 30.0, 40.0]
        # Resume round-trips.
        ed2 = GTEditor(paths, tmp_path / "gt.json", resume=tmp_path / "gt.json")
        assert ed2.annotations["a.jpg"][0]["track_id"] == 1

    def test_tiny_drag_ignored(self, tmp_path):
        import cv2
        from tools.gt_editor import GTEditor

        img_dir = tmp_path / "imgs"
        img_dir.mkdir()
        cv2.imwrite(str(img_dir / "a.jpg"), np.zeros((60, 80, 3), np.uint8))
        ed = GTEditor(sorted(img_dir.iterdir()), tmp_path / "gt.json", None)
        ed.on_mouse(cv2.EVENT_LBUTTONDOWN, 10, 10, 0, None)
        ed.on_mouse(cv2.EVENT_LBUTTONUP, 12, 12, 0, None)
        assert "a.jpg" not in ed.annotations


class TestArtifactValidator:
    def test_validates_good_session(self, tmp_path):
        from tools.validate_artifacts import validate_session

        s = tmp_path / "sess"
        (s / "04_transform").mkdir(parents=True)
        (s / "metadata.json").write_text(json.dumps(
            {"session_id": "20260101_120000", "timestamp": "2026-01-01T12:00:00",
             "config": {}}))
        (s / "summary.json").write_text(json.dumps(
            {"session_id": "20260101_120000", "timestamp": "2026-01-01T12:00:00",
             "status": "completed"}))
        (s / "pipeline_checkpoint.json").write_text(json.dumps(
            {"session_dir": str(s), "created_at": "2026-01-01T12:00:00",
             "phases": {"01_extraction": {"status": "completed"}}}))
        (s / "04_transform" / "coordinate_transformations.json").write_text(
            json.dumps({"transform_method": "homography", "frames": []}))
        schemas = Path(__file__).resolve().parents[1] / "schemas"
        assert validate_session(s, schemas) == []

    def test_flags_bad_artifact(self, tmp_path):
        from tools.validate_artifacts import validate_session

        s = tmp_path / "sess"
        s.mkdir()
        (s / "summary.json").write_text(json.dumps({"status": "bogus_status"}))
        schemas = Path(__file__).resolve().parents[1] / "schemas"
        errors = validate_session(s, schemas)
        assert any("summary.json" in e and "INVALID" in e for e in errors)
        assert any("MISSING" in e for e in errors)


class TestHTMLReport:
    def test_renders_from_session(self, tmp_path):
        from tools.report_html import render

        # reuse the dashboard loader fixture structure
        s = TestDashboardLoader()._make_session(tmp_path)
        html_text = render(s)
        assert "Session 20260101_120000" in html_text
        assert "zone_a" in html_text          # chart legend
        assert "01_extraction" in html_text   # phase table
        assert "<svg" in html_text

    def test_cli(self, tmp_path, capsys):
        from tools.report_html import main

        s = TestDashboardLoader()._make_session(tmp_path)
        rc = main(["--session", str(s)])
        assert rc == 0
        assert (s / "report.html").exists()


class TestCalibrationConfigAlias:
    """The reference's calibration.{distortion,intrinsics} layout works as a
    drop-in alias for transform.lens_distortion (reference config.yaml)."""

    def test_distortion_params_from_reference_layout(self):
        from office_person_detection_vit_tpu.calibration.lens_distortion import (
            DistortionParams,
        )
        from office_person_detection_vit_tpu.config.config_manager import ConfigManager

        cfg = ConfigManager.from_dict({
            "calibration": {
                "use_distortion_correction": True,
                "distortion": {"k1": -0.1, "k2": 0.01, "k3": 0.0, "p1": 0.001, "p2": 0.0},
                "intrinsics": {"focal_length_x": 1000.0, "focal_length_y": 990.0,
                               "principal_point_x": 600.0, "principal_point_y": 350.0,
                               "image_width": 1280, "image_height": 720},
            },
        })
        p = DistortionParams.from_config(cfg)
        assert (p.k1, p.p1) == (-0.1, 0.001)
        assert (p.focal_length_x, p.center_x, p.center_y) == (1000.0, 600.0, 350.0)
        assert not p.is_identity

    def test_flat_layout_wins_when_present(self):
        from office_person_detection_vit_tpu.calibration.lens_distortion import (
            DistortionParams,
        )
        from office_person_detection_vit_tpu.config.config_manager import ConfigManager

        cfg = ConfigManager.from_dict({
            "transform": {"lens_distortion": {"k1": -0.2}},
            "calibration": {"distortion": {"k1": -0.9}},
        })
        assert DistortionParams.from_config(cfg).k1 == -0.2

    def test_transform_phase_honors_reference_flag(self):
        from office_person_detection_vit_tpu.config.config_manager import ConfigManager
        from office_person_detection_vit_tpu.pipeline.phases.transform import (
            TransformPhase,
        )

        cfg = ConfigManager.from_dict({
            "transform": {"method": "homography"},
            "homography": {"matrix": [[1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0]]},
            "calibration": {
                "use_distortion_correction": True,
                "distortion": {"k1": -0.1, "k2": 0.0, "k3": 0.0, "p1": 0.0, "p2": 0.0},
                "intrinsics": {"focal_length_x": 1000.0, "focal_length_y": 1000.0,
                               "principal_point_x": 640.0, "principal_point_y": 360.0,
                               "image_width": 1280, "image_height": 720},
            },
        })
        phase = TransformPhase(cfg)
        phase.initialize()
        assert phase.undistorter is not None

    def test_calibration_coeffs_used_with_flat_intrinsics(self):
        """calibration.distortion coefficients apply even when only flat
        intrinsics are customized (coefficients decide the layout, not
        intrinsics)."""
        from office_person_detection_vit_tpu.calibration.lens_distortion import (
            DistortionParams,
        )
        from office_person_detection_vit_tpu.config.config_manager import ConfigManager

        cfg = ConfigManager.from_dict({
            "transform": {"lens_distortion": {"focal_length_x": 1000.0}},
            "calibration": {"distortion": {"k1": -0.2, "k2": 0.0, "k3": 0.0,
                                           "p1": 0.0, "p2": 0.0}},
        })
        p = DistortionParams.from_config(cfg)
        assert p.k1 == -0.2              # coefficients from calibration
        assert p.focal_length_x == 1000.0  # intrinsics fall back to flat


class TestDashboardLiveProjection:
    def test_fallback_projects_tracks_without_transform_artifact(self, tmp_path):
        """No Phase-3 output -> trajectories come from tracks.json projected
        through the session config's homography (reference
        dashboard_app.py:154-200)."""
        from office_person_detection_vit_tpu.visualization.dashboard_utils import (
            SessionDataLoader,
        )

        (tmp_path / "03_tracking").mkdir(parents=True)
        (tmp_path / "03_tracking/tracks.json").write_text(json.dumps({
            "tracks": [{"track_id": 1, "trajectory": [
                {"frame": 0, "bbox": [100.0, 100.0, 40.0, 80.0]},
                {"frame": 1, "bbox": [110.0, 100.0, 40.0, 80.0]},
            ]}]
        }))
        (tmp_path / "config.yaml").write_text(
            "homography:\n  matrix: [[2.0, 0, 10.0], [0, 2.0, 5.0], [0, 0, 1.0]]\n")
        loader = SessionDataLoader(tmp_path)
        traj = loader.floor_trajectories()
        # foot of first bbox = (120, 180) -> (2*120+10, 2*180+5) = (250, 365)
        assert traj[1][0] == (250.0, 365.0)
        assert len(traj[1]) == 2

    def test_no_tracks_no_config_is_empty(self, tmp_path):
        from office_person_detection_vit_tpu.visualization.dashboard_utils import (
            SessionDataLoader,
        )

        assert SessionDataLoader(tmp_path).floor_trajectories() == {}
