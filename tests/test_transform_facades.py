import numpy as np
import pytest

from office_person_detection_vit_tpu.calibration.lens_distortion import (
    DistortionParams,
    LensDistortionCorrector,
)
from office_person_detection_vit_tpu.calibration.reprojection_error import (
    ReprojectionErrorEvaluator,
)
from office_person_detection_vit_tpu.config.config_manager import ConfigManager
from office_person_detection_vit_tpu.core.dto import Detection
from office_person_detection_vit_tpu.transform.floormap_config import FloorMapConfig
from office_person_detection_vit_tpu.transform.homography import HomographyTransformer
from office_person_detection_vit_tpu.transform.piecewise_affine import (
    PiecewiseAffineTransformer,
    ThinPlateSplineTransformer,
    build_transformer,
)


@pytest.fixture
def ref_cfg(homography_matrix, zones_config):
    return ConfigManager.from_dict(
        {"homography": {"matrix": homography_matrix.tolist()}, "zones": zones_config}
    )


def test_homography_from_config(ref_cfg):
    t = HomographyTransformer.from_config(ref_cfg)
    out = t.transform_pixel(640.0, 500.0)
    assert all(np.isfinite(out))


def test_homography_transform_detections(ref_cfg):
    t = HomographyTransformer.from_config(ref_cfg)
    dets = [Detection(bbox=(600.0, 400.0, 60.0, 150.0), confidence=0.9)]
    t.transform_detections(dets)
    assert dets[0].floor_coords_px is not None
    assert dets[0].floor_coords_mm is not None
    # mm consistent with floormap constants
    fm = FloorMapConfig()
    px = np.asarray(dets[0].floor_coords_px)
    np.testing.assert_allclose(
        np.asarray(dets[0].floor_coords_mm), fm.px_to_mm(px), rtol=1e-4
    )


def test_foot_point_static():
    assert HomographyTransformer.get_foot_point((10, 20, 30, 40)) == (25.0, 60.0)


def test_pwa_save_load_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    src = rng.uniform(0, 100, (10, 2))
    A = np.asarray([[2.0, 0.0], [0.0, 1.5]])
    dst = src @ A.T
    t = PiecewiseAffineTransformer(src, dst)
    p = tmp_path / "pwa.pkl"
    t.save(p)
    t2 = PiecewiseAffineTransformer.load(p)
    q = np.asarray([[50.0, 50.0]], np.float32)
    np.testing.assert_allclose(t.transform_batch(q), t2.transform_batch(q), atol=1e-4)
    info = t2.get_info()
    assert info["training_error"]["rmse"] < 0.1
    assert info["num_triangles"] > 0


def test_pwa_correspondence_file(tmp_path):
    import json

    rng = np.random.default_rng(1)
    src = rng.uniform(0, 100, (8, 2))
    dst = src * 2
    p = tmp_path / "corr.json"
    p.write_text(json.dumps({"points": [
        {"camera": s.tolist(), "floormap": d.tolist()} for s, d in zip(src, dst)
    ]}))
    t = PiecewiseAffineTransformer.from_correspondence_file(p)
    np.testing.assert_allclose(
        t.transform_batch(np.asarray([[30.0, 40.0]], np.float32)), [[60.0, 80.0]], atol=0.5
    )


def test_tps_facade():
    rng = np.random.default_rng(2)
    src = rng.uniform(0, 100, (10, 2))
    dst = src + 5
    t = ThinPlateSplineTransformer(src, dst)
    assert t.training_error()["rmse"] < 0.1


def test_build_transformer_selects_method(ref_cfg, tmp_path):
    t = build_transformer(ref_cfg)
    assert t.method == "homography"
    ref_cfg.set("transform.method", "piecewise_affine")
    with pytest.raises(FileNotFoundError):
        build_transformer(ref_cfg)
    ref_cfg.set("transform.method", "bogus")
    with pytest.raises(ValueError):
        build_transformer(ref_cfg)


def test_pwa_with_undistorter():
    params = DistortionParams(k1=-0.05)
    und = LensDistortionCorrector(params)
    rng = np.random.default_rng(3)
    src_true = rng.uniform(200, 1000, (10, 2))
    dst = src_true * 1.5
    src_distorted = und.distort_points(src_true)
    t = PiecewiseAffineTransformer(src_distorted, dst, undistorter=und)
    out = t.transform_batch(und.distort_points(np.asarray([[500.0, 400.0]])))
    np.testing.assert_allclose(out, [[750.0, 600.0]], atol=1.0)


def test_identity_distortion_passthrough():
    und = LensDistortionCorrector(DistortionParams())
    pts = np.asarray([[100.0, 200.0]], np.float32)
    np.testing.assert_array_equal(und.undistort_points(pts), pts)


def test_reprojection_evaluator(ref_cfg):
    t = HomographyTransformer.from_config(ref_cfg)
    src = np.asarray([[640.0, 500.0], [700.0, 550.0]], np.float32)
    dst = t.transform_batch(src)
    result = ReprojectionErrorEvaluator(t).evaluate(src, dst)
    assert result["rmse"] < 1e-3
    assert result["num_points"] == 2


class TestPWAUndistorterRoundtrip:
    def _undistorter(self):
        class FakeUndistorter:
            def undistort_points(self, pts):
                return np.asarray(pts, np.float64) + 5.0  # simple shift
        return FakeUndistorter()

    def test_load_preserves_undistortion(self, tmp_path):
        from office_person_detection_vit_tpu.transform.piecewise_affine import (
            PiecewiseAffineTransformer,
        )

        rng = np.random.default_rng(0)
        src = rng.uniform(0, 100, (8, 2))
        dst = src * 2.0
        und = self._undistorter()
        t = PiecewiseAffineTransformer(src, dst, undistorter=und)
        want = t.transform_batch(np.asarray([[50.0, 50.0]], np.float32))
        t.save(tmp_path / "pwa.pkl")
        t2 = PiecewiseAffineTransformer.load(tmp_path / "pwa.pkl", undistorter=und)
        got = t2.transform_batch(np.asarray([[50.0, 50.0]], np.float32))
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_training_error_not_double_undistorted(self):
        from office_person_detection_vit_tpu.transform.piecewise_affine import (
            PiecewiseAffineTransformer,
        )

        rng = np.random.default_rng(1)
        src = rng.uniform(0, 100, (8, 2))
        dst = (src + 5.0) * 2.0  # exact map of the undistorted points
        t = PiecewiseAffineTransformer(src, dst, undistorter=self._undistorter())
        stats = t.training_error()
        assert stats["rmse"] < 1e-3  # double-undistortion would inflate this


class TestJsonOptimizationKeys:
    """Reference key names + semantics for output.json_optimization
    (reference phases/transform.py:406-410): `enabled` gates everything,
    `compact_keys` is independent, disabled means full precision."""

    def _run(self, tmp_path, opt):
        from office_person_detection_vit_tpu.config.config_manager import (
            ConfigManager,
        )
        from office_person_detection_vit_tpu.core.dto import Detection, FrameResult
        from office_person_detection_vit_tpu.pipeline.phases.transform import (
            TransformPhase,
        )

        cfg = ConfigManager.from_dict(
            {
                "transform": {"method": "homography"},
                "homography": {"matrix": [[1, 0, 0], [0, 1, 0], [0, 0, 1]]},
                "output": {"json_optimization": opt},
            }
        )
        frs = [FrameResult(0, None, [Detection(bbox=(100.123, 200.456, 50.0, 120.0),
                                               confidence=0.9)])]
        TransformPhase(cfg).execute(frs, tmp_path)
        import json as _json

        return _json.loads(
            (tmp_path / "coordinate_transformations.json").read_text()
        )

    def test_enabled_rounds_without_compacting(self, tmp_path):
        doc = self._run(tmp_path, {"enabled": True, "coordinate_precision": 1})
        det = doc["frames"][0]["detections"][0]
        assert "bbox" in det  # full key names (compact_keys not set)
        assert det["bbox"]["x"] == 100.1
        assert "floor_coords_px" in det  # exclude_px_coords not set

    def test_compact_keys_flag(self, tmp_path):
        doc = self._run(
            tmp_path,
            {"enabled": True, "coordinate_precision": 1, "compact_keys": True,
             "exclude_px_coords": True},
        )
        det = doc["frames"][0]["det"][0]
        assert "bb" in det and "floor_px" not in det

    def test_disabled_full_precision(self, tmp_path):
        doc = self._run(tmp_path, {"enabled": False, "coordinate_precision": 0,
                                   "compact_keys": True})
        det = doc["frames"][0]["detections"][0]
        assert det["bbox"]["x"] == pytest.approx(100.123, abs=1e-9)

    def test_exclude_px_in_full_key_form(self, tmp_path):
        doc = self._run(tmp_path, {"enabled": True, "coordinate_precision": 2,
                                   "exclude_px_coords": True})
        det = doc["frames"][0]["detections"][0]
        assert det["bbox"]["x"] == 100.12
        assert "floor_coords_px" not in det
