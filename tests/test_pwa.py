import jax.numpy as jnp
import numpy as np
import pytest

from office_person_detection_vit_tpu.ops import pwa


@pytest.fixture
def affine_correspondences():
    """Points related by a known global affine: y = A x + b."""
    rng = np.random.default_rng(42)
    src = rng.uniform(0, 100, size=(12, 2))
    A = np.asarray([[1.5, 0.2], [-0.1, 2.0]])
    b = np.asarray([10.0, -5.0])
    dst = src @ A.T + b
    return src, dst, A, b


def test_pwa_exact_on_training_points(affine_correspondences):
    src, dst, *_ = affine_correspondences
    model = pwa.fit_pwa(src, dst)
    out = np.asarray(
        pwa.pwa_transform(
            jnp.asarray(src, jnp.float32),
            jnp.asarray(model.triangles),
            jnp.asarray(model.affines),
            jnp.asarray(model.centroids),
        )
    )
    np.testing.assert_allclose(out, dst, atol=1e-2)


def test_pwa_interpolates_global_affine(affine_correspondences):
    src, dst, A, b = affine_correspondences
    model = pwa.fit_pwa(src, dst)
    rng = np.random.default_rng(7)
    queries = rng.uniform(20, 80, size=(50, 2)).astype(np.float32)
    out = np.asarray(
        pwa.pwa_transform(
            jnp.asarray(queries),
            jnp.asarray(model.triangles),
            jnp.asarray(model.affines),
            jnp.asarray(model.centroids),
        )
    )
    expected = queries @ A.T + b
    np.testing.assert_allclose(out, expected, atol=0.1)


def test_pwa_extrapolates_outside_hull(affine_correspondences):
    src, dst, A, b = affine_correspondences
    model = pwa.fit_pwa(src, dst)
    q = np.asarray([[150.0, 150.0]], np.float32)  # outside [0,100]^2 hull
    out = np.asarray(
        pwa.pwa_transform(
            jnp.asarray(q),
            jnp.asarray(model.triangles),
            jnp.asarray(model.affines),
            jnp.asarray(model.centroids),
        )
    )
    # Nearest-triangle affine is the global affine here, so still exact.
    np.testing.assert_allclose(out, q @ A.T + b, atol=0.5)


def test_pwa_matches_scipy_find_simplex(affine_correspondences):
    """Triangle selection must agree with scipy Delaunay.find_simplex inside the hull."""
    from scipy.spatial import Delaunay

    src, dst, *_ = affine_correspondences
    model = pwa.fit_pwa(src, dst)
    tri = Delaunay(src)
    rng = np.random.default_rng(3)
    queries = rng.uniform(10, 90, size=(100, 2))
    inside = tri.find_simplex(queries) >= 0
    out = np.asarray(
        pwa.pwa_transform(
            jnp.asarray(queries, jnp.float32),
            jnp.asarray(model.triangles),
            jnp.asarray(model.affines),
            jnp.asarray(model.centroids),
        )
    )
    # For inside points, result must equal applying the scipy-chosen triangle's affine.
    simplex_ids = tri.find_simplex(queries)
    for q, s, o in zip(queries, simplex_ids, out):
        if s < 0:
            continue
        M = model.affines[s]
        expected = M @ np.asarray([q[0], q[1], 1.0])
        np.testing.assert_allclose(o, expected, atol=1e-2)
    assert inside.sum() > 50  # sanity: the test actually covered the hull


def test_tps_exact_at_control_points(affine_correspondences):
    src, dst, *_ = affine_correspondences
    model = pwa.fit_tps(src, dst)
    out = np.asarray(
        pwa.tps_transform(
            jnp.asarray(src, jnp.float32),
            jnp.asarray(model.control),
            jnp.asarray(model.w),
            jnp.asarray(model.a),
            jnp.asarray(model.offset),
            jnp.asarray(model.scale),
        )
    )
    np.testing.assert_allclose(out, dst, atol=1e-2)


def test_tps_reproduces_affine(affine_correspondences):
    src, dst, A, b = affine_correspondences
    model = pwa.fit_tps(src, dst)
    q = np.asarray([[50.0, 50.0], [25.0, 75.0]], np.float32)
    out = np.asarray(
        pwa.tps_transform(jnp.asarray(q), jnp.asarray(model.control), jnp.asarray(model.w), jnp.asarray(model.a), jnp.asarray(model.offset), jnp.asarray(model.scale))
    )
    np.testing.assert_allclose(out, q @ A.T + b, atol=0.5)


def test_fit_requires_enough_points():
    with pytest.raises(ValueError):
        pwa.fit_pwa(np.zeros((2, 2)), np.zeros((2, 2)))


def test_build_transformer_saves_model_from_correspondences(tmp_path):
    """Building PWA from a correspondence file persists the fitted model to
    transform.model_path for later runs (reference phases/transform.py:179-182)."""
    import json

    from office_person_detection_vit_tpu.config.config_manager import ConfigManager
    from office_person_detection_vit_tpu.transform.piecewise_affine import (
        PiecewiseAffineTransformer,
        build_transformer,
    )

    pts = {
        "points": [
            {"camera": [0, 0], "floormap": [0, 0]},
            {"camera": [100, 0], "floormap": [200, 0]},
            {"camera": [0, 100], "floormap": [0, 200]},
            {"camera": [100, 100], "floormap": [200, 200]},
            {"camera": [50, 50], "floormap": [100, 100]},
        ]
    }
    corr = tmp_path / "corr.json"
    corr.write_text(json.dumps(pts))
    model_path = tmp_path / "models" / "pwa.pkl"
    cfg = ConfigManager.from_dict(
        {
            "transform": {"method": "piecewise_affine", "model_path": str(model_path)},
            "calibration": {"correspondence_file": str(corr)},
        }
    )
    t = build_transformer(cfg)
    assert model_path.exists()
    # Second build loads the pickled model (same mapping).
    t2 = build_transformer(cfg)
    assert isinstance(t2, PiecewiseAffineTransformer)
    assert t2.transform_pixel(50.0, 50.0) == pytest.approx(t.transform_pixel(50.0, 50.0))
