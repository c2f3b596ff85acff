"""TransformEvaluator depth tests (reference tests/test_transform_evaluator.py
analog, 25 tests there): error stats math, target checks, comparisons,
leave-one-out cross-validation, error plot."""

import numpy as np
import pytest

from office_person_detection_vit_tpu.evaluation.transform_evaluator import (
    RMSE_TARGET_PX,
    TransformEvaluator,
    point_errors,
)


class Affine:
    """Exact 2x scale transformer for controlled errors."""

    def __init__(self, scale=2.0, bias=0.0):
        self.scale = scale
        self.bias = bias

    def transform_batch(self, pts):
        return np.asarray(pts, np.float32) * self.scale + self.bias


class TestPointErrors:
    def test_zero_error(self):
        pts = np.asarray([[1.0, 2.0], [3.0, 4.0]], np.float32)
        stats = point_errors(pts, pts)
        assert stats["rmse"] == 0.0 and stats["max_error"] == 0.0

    def test_known_errors(self):
        pred = np.asarray([[0.0, 0.0], [3.0, 4.0]], np.float32)
        exp = np.asarray([[0.0, 0.0], [0.0, 0.0]], np.float32)
        stats = point_errors(pred, exp)
        assert stats["max_error"] == pytest.approx(5.0)
        assert stats["mean_error"] == pytest.approx(2.5)
        assert stats["rmse"] == pytest.approx(np.sqrt(12.5))
        assert stats["min_error"] == 0.0
        assert stats["per_point"] == pytest.approx([0.0, 5.0])

    def test_std(self):
        pred = np.asarray([[1.0, 0.0], [3.0, 0.0]], np.float32)
        exp = np.zeros((2, 2), np.float32)
        assert point_errors(pred, exp)["std_error"] == pytest.approx(1.0)


class TestEvaluate:
    def test_perfect_transformer_meets_target(self):
        cam = np.asarray([[10, 10], [50, 80], [90, 20]], np.float32)
        ev = TransformEvaluator()
        stats = ev.evaluate(Affine(2.0), cam, cam * 2.0)
        assert stats["meets_target"] and stats["rmse"] == 0.0
        assert stats["num_points"] == 3
        assert stats["rmse_target"] == RMSE_TARGET_PX

    def test_biased_transformer_fails_tight_target(self):
        cam = np.asarray([[10, 10], [50, 80]], np.float32)
        ev = TransformEvaluator(rmse_target=1.0)
        stats = ev.evaluate(Affine(2.0, bias=5.0), cam, cam * 2.0)
        assert not stats["meets_target"]
        assert stats["rmse"] == pytest.approx(np.sqrt(50.0), rel=1e-5)

    def test_compare_ranks_transformers(self):
        cam = np.asarray([[10, 10], [50, 80], [20, 60]], np.float32)
        ev = TransformEvaluator()
        out = ev.compare(
            {"good": Affine(2.0), "bad": Affine(2.0, bias=30.0)}, cam, cam * 2.0
        )
        assert out["good"]["rmse"] < out["bad"]["rmse"]
        assert set(out) == {"good", "bad"}


class TestCrossValidation:
    def test_loo_with_exact_model_is_zero(self):
        cam = np.asarray([[0, 0], [100, 0], [0, 100], [100, 100], [50, 50]], np.float32)

        def build(c, f):
            return Affine(2.0)

        ev = TransformEvaluator()
        out = ev.cross_validate(build, cam, cam * 2.0)
        assert out["num_folds"] == 5
        assert out["failed_folds"] == 0
        assert out["loo_rmse"] == pytest.approx(0.0, abs=1e-5)

    def test_loo_with_real_pwa(self):
        from office_person_detection_vit_tpu.transform.piecewise_affine import (
            PiecewiseAffineTransformer,
        )

        rng = np.random.default_rng(0)
        cam = rng.uniform(0, 100, (10, 2)).astype(np.float32)
        floor = cam * 3.0 + 7.0  # globally affine -> PWA interpolates exactly

        def build(c, f):
            return PiecewiseAffineTransformer(c, f)

        out = TransformEvaluator().cross_validate(build, cam, floor)
        held_in_hull = [
            e for e in out["per_point"] if np.isfinite(e)
        ]
        assert len(held_in_hull) >= 7
        # interior points reproject exactly under a globally affine map
        assert np.median(held_in_hull) < 1.0

    def test_failed_fold_counted_not_fatal(self):
        calls = {"n": 0}

        def build(c, f):
            calls["n"] += 1
            if calls["n"] == 2:
                raise RuntimeError("degenerate")
            return Affine(2.0)

        cam = np.asarray([[0, 0], [10, 0], [0, 10]], np.float32)
        out = TransformEvaluator().cross_validate(build, cam, cam * 2.0)
        assert out["failed_folds"] == 1
        assert out["num_folds"] == 3
        assert np.isfinite(out["loo_rmse"])


class TestPlot:
    def test_writes_png(self, tmp_path):
        cam = np.asarray([[10, 10], [50, 80]], np.float32)
        ev = TransformEvaluator()
        out = ev.plot_errors(cam, cam * 2.0, cam * 2.0 + 3.0, tmp_path / "p" / "err.png")
        assert out.exists() and out.stat().st_size > 1000
