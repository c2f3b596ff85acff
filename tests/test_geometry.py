import jax.numpy as jnp
import numpy as np
import pytest

from office_person_detection_vit_tpu.ops import geometry


def test_identity_homography():
    H = jnp.eye(3)
    pts = jnp.asarray([[1.0, 2.0], [3.0, 4.0]])
    out = geometry.homography_transform(H, pts)
    np.testing.assert_allclose(np.asarray(out), np.asarray(pts), atol=1e-6)


def test_translation_homography():
    H = jnp.asarray([[1.0, 0.0, 5.0], [0.0, 1.0, -3.0], [0.0, 0.0, 1.0]])
    out = geometry.homography_transform(H, jnp.asarray([[0.0, 0.0]]))
    np.testing.assert_allclose(np.asarray(out), [[5.0, -3.0]], atol=1e-6)


def test_projective_division():
    # Scale row makes w = 2 -> halves coordinates.
    H = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 2.0]])
    out = geometry.homography_transform(H, jnp.asarray([[4.0, 8.0]]))
    np.testing.assert_allclose(np.asarray(out), [[2.0, 4.0]], atol=1e-6)


def test_reference_homography_agrees_with_cv2(homography_matrix):
    cv2 = pytest.importorskip("cv2")
    pts = np.asarray([[640.0, 500.0], [300.0, 600.0], [900.0, 450.0]], np.float64)
    ours = np.asarray(
        geometry.homography_transform(jnp.asarray(homography_matrix), jnp.asarray(pts))
    )
    cv_out = cv2.perspectiveTransform(pts.reshape(-1, 1, 2), homography_matrix).reshape(-1, 2)
    np.testing.assert_allclose(ours, cv_out, rtol=1e-4, atol=1e-2)


def test_validate_rejects_singular():
    with pytest.raises(ValueError):
        geometry.validate_homography(np.zeros((3, 3)))


def test_px_to_mm_reference_constants():
    origin = jnp.asarray([7.0, 9.0])
    mm = jnp.asarray([28.1926406926406, 28.241430700447])
    out = geometry.px_to_mm(jnp.asarray([[7.0, 9.0], [107.0, 109.0]]), origin, mm)
    np.testing.assert_allclose(np.asarray(out)[0], [0.0, 0.0], atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(out)[1], [100 * 28.1926406926406, 100 * 28.241430700447], rtol=1e-6
    )


def test_undistort_inverts_distort():
    K = jnp.asarray([[1250.0, 0.0, 640.0], [0.0, 1250.0, 360.0], [0.0, 0.0, 1.0]])
    dist = jnp.asarray([-0.1, 0.02, 0.001, -0.001, 0.0])
    pts = jnp.asarray([[100.0, 100.0], [640.0, 360.0], [1200.0, 700.0]])
    distorted = geometry.distort_points(pts, K, dist)
    recovered = geometry.undistort_points(distorted, K, dist, num_iters=20)
    np.testing.assert_allclose(np.asarray(recovered), np.asarray(pts), atol=0.05)


def test_zero_distortion_is_identity():
    K = jnp.asarray([[1250.0, 0.0, 640.0], [0.0, 1250.0, 360.0], [0.0, 0.0, 1.0]])
    dist = jnp.zeros(5)
    pts = jnp.asarray([[123.0, 456.0]])
    np.testing.assert_allclose(
        np.asarray(geometry.undistort_points(pts, K, dist)), np.asarray(pts), atol=1e-4
    )


def test_reprojection_errors():
    H = jnp.eye(3)
    src = jnp.asarray([[0.0, 0.0], [1.0, 1.0]])
    dst = jnp.asarray([[0.0, 3.0], [1.0, 1.0]])
    err = geometry.reprojection_errors(H, src, dst)
    np.testing.assert_allclose(np.asarray(err), [3.0, 0.0], atol=1e-6)


# ------------------------------------------------------- homography fitting
class TestHomographyFit:
    @staticmethod
    def _project(H, pts):
        h = np.concatenate([pts, np.ones((len(pts), 1))], 1) @ H.T
        return h[:, :2] / h[:, 2:3]

    def test_dlt_recovers_exact_homography(self):
        from office_person_detection_vit_tpu.ops.homography_fit import (
            fit_homography_dlt,
        )

        rng = np.random.default_rng(0)
        H = np.array([[1.2, 0.1, 30.0], [0.05, 0.9, -12.0], [1e-4, -2e-4, 1.0]])
        src = rng.uniform(0, 1000, (40, 2))
        dst = self._project(H, src)
        h = np.asarray(fit_homography_dlt(src, dst), np.float64)
        assert np.abs(h - H).max() < 1e-2
        # transfer error is the metric that matters (fp32)
        err = np.linalg.norm(self._project(h, src) - dst, axis=1)
        assert err.max() < 0.05

    def test_dlt_cv2_parity(self):
        import cv2

        from office_person_detection_vit_tpu.ops.homography_fit import (
            fit_homography_dlt,
        )

        rng = np.random.default_rng(3)
        src = rng.uniform(0, 1280, (20, 2))
        H = np.array([[1.5, 0.0, 100.0], [0.0, 1.4, 50.0], [0.0, 0.0, 1.0]])
        dst = self._project(H, src) + rng.normal(0, 1.0, (20, 2))
        ours = np.asarray(fit_homography_dlt(src, dst), np.float64)
        theirs, _ = cv2.findHomography(src, dst, 0)
        # both least-squares fits: projections should agree closely
        np.testing.assert_allclose(
            self._project(ours, src), self._project(theirs, src), atol=0.5
        )

    def test_ransac_rejects_outliers(self):
        from office_person_detection_vit_tpu.ops.homography_fit import (
            fit_homography_ransac,
        )

        rng = np.random.default_rng(1)
        H = np.array([[1.5, 0.0, 100.0], [0.0, 1.4, 50.0], [0.0, 0.0, 1.0]])
        src = rng.uniform(0, [1280, 720], (30, 2))
        dst = self._project(H, src)
        dst[:5] += rng.uniform(150, 400, (5, 2))  # gross outliers
        h, inliers, errors = fit_homography_ransac(src, dst, threshold=5.0)
        inliers = np.asarray(inliers)
        assert inliers.sum() == 25
        assert not inliers[:5].any()
        err = np.linalg.norm(
            self._project(np.asarray(h, np.float64), src[5:]) - dst[5:], axis=1
        )
        assert err.max() < 0.1

    def test_ransac_rejects_too_few_points(self):
        from office_person_detection_vit_tpu.ops.homography_fit import (
            fit_homography_ransac,
        )

        with pytest.raises(ValueError, match=">=4"):
            fit_homography_ransac(np.zeros((3, 2)), np.zeros((3, 2)))
