"""Lens distortion tests (reference tests/test_lens_distortion.py analog):
Brown model roundtrips, cv2 cross-check, config layouts, identity fast path."""

import numpy as np
import pytest

from office_person_detection_vit_tpu.calibration.lens_distortion import (
    DistortionParams,
    LensDistortionCorrector,
)
from office_person_detection_vit_tpu.config.config_manager import ConfigManager

PARAMS = DistortionParams(
    k1=-0.28, k2=0.08, k3=0.0, p1=0.0006, p2=-0.0004,
    focal_length_x=1260.0, focal_length_y=1255.0,
    center_x=642.0, center_y=358.0,
)


class TestDistortionParams:
    def test_camera_matrix_layout(self):
        K = PARAMS.camera_matrix
        assert K.shape == (3, 3)
        assert K[0, 0] == 1260.0 and K[1, 1] == 1255.0
        assert K[0, 2] == 642.0 and K[1, 2] == 358.0
        assert K[2, 2] == 1.0 and K[1, 0] == 0.0

    def test_dist_coeffs_opencv_order(self):
        # OpenCV order: k1 k2 p1 p2 k3
        np.testing.assert_allclose(
            PARAMS.dist_coeffs, [-0.28, 0.08, 0.0006, -0.0004, 0.0]
        )

    def test_identity_detection(self):
        assert DistortionParams().is_identity
        assert not PARAMS.is_identity

    def test_from_config_flat_layout(self):
        cfg = ConfigManager.from_dict(
            {"transform": {"lens_distortion": {"k1": -0.1, "focal_length_x": 1000.0}}}
        )
        p = DistortionParams.from_config(cfg)
        assert p.k1 == -0.1 and p.focal_length_x == 1000.0

    def test_from_config_reference_calibration_layout(self):
        cfg = ConfigManager.from_dict(
            {
                "calibration": {
                    "distortion": {"k1": -0.2, "k2": 0.05},
                    "intrinsics": {
                        "focal_length_x": 1111.0,
                        "principal_point_x": 600.0,
                    },
                }
            }
        )
        p = DistortionParams.from_config(cfg)
        assert p.k1 == -0.2 and p.k2 == 0.05
        assert p.focal_length_x == 1111.0 and p.center_x == 600.0


class TestCorrector:
    def test_identity_passthrough(self):
        c = LensDistortionCorrector(DistortionParams())
        pts = np.asarray([[100.0, 200.0], [640.0, 360.0]], np.float32)
        np.testing.assert_array_equal(c.undistort_points(pts), pts)
        np.testing.assert_array_equal(c.distort_points(pts), pts)

    def test_principal_point_is_fixed_point(self):
        c = LensDistortionCorrector(PARAMS)
        x, y = c.undistort_point(642.0, 358.0)
        assert x == pytest.approx(642.0, abs=1e-3)
        assert y == pytest.approx(358.0, abs=1e-3)

    def test_distort_undistort_roundtrip(self):
        c = LensDistortionCorrector(PARAMS)
        pts = np.asarray(
            [[100.0, 100.0], [640.0, 360.0], [1180.0, 650.0], [320.0, 600.0]],
            np.float32,
        )
        distorted = c.distort_points(pts)
        recovered = c.undistort_points(distorted)
        np.testing.assert_allclose(recovered, pts, atol=0.05)

    def test_barrel_distortion_pulls_corners_inward(self):
        # k1 < 0 barrel: distorted position of an off-center point lies
        # closer to the principal point than the undistorted position.
        c = LensDistortionCorrector(PARAMS)
        p = np.asarray([[1180.0, 650.0]], np.float32)
        d = c.distort_points(p)[0]
        center = np.asarray([642.0, 358.0])
        assert np.linalg.norm(d - center) < np.linalg.norm(p[0] - center)

    def test_matches_cv2_undistort(self):
        cv2 = pytest.importorskip("cv2")
        c = LensDistortionCorrector(PARAMS)
        pts = np.asarray(
            [[150.0, 120.0], [800.0, 500.0], [1100.0, 200.0]], np.float32
        )
        ours = c.undistort_points(pts)
        ref = cv2.undistortPoints(
            pts.reshape(-1, 1, 2),
            PARAMS.camera_matrix,
            PARAMS.dist_coeffs,
            P=PARAMS.camera_matrix,
        ).reshape(-1, 2)
        np.testing.assert_allclose(ours, ref, atol=0.1)

    def test_matches_cv2_distort(self):
        cv2 = pytest.importorskip("cv2")
        c = LensDistortionCorrector(PARAMS)
        pts = np.asarray([[200.0, 150.0], [900.0, 600.0]], np.float32)
        ours = c.distort_points(pts)
        # cv2.projectPoints distorts normalized camera coords.
        K = PARAMS.camera_matrix
        norm = np.concatenate(
            [(pts - [K[0, 2], K[1, 2]]) / [K[0, 0], K[1, 1]],
             np.ones((len(pts), 1), np.float32)],
            axis=1,
        ).astype(np.float64)
        ref, _ = cv2.projectPoints(
            norm, np.zeros(3), np.zeros(3), K, PARAMS.dist_coeffs
        )
        np.testing.assert_allclose(ours, ref.reshape(-1, 2), atol=0.1)

    def test_single_point_and_array_shapes(self):
        c = LensDistortionCorrector(PARAMS)
        single = c.undistort_points(np.asarray([100.0, 100.0], np.float32))
        assert single.shape == (1, 2)
        many = c.undistort_points(np.zeros((7, 2), np.float32) + 300.0)
        assert many.shape == (7, 2)

    def test_from_config(self):
        cfg = ConfigManager.from_dict(
            {"transform": {"lens_distortion": {"k1": -0.3}}}
        )
        c = LensDistortionCorrector.from_config(cfg)
        assert c.params.k1 == -0.3
