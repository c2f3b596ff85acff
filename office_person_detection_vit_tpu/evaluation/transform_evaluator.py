"""Transform-accuracy evaluation (reference
src/evaluation/transform_evaluator.py:75-509).

Correspondence-point error evaluation for any transformer exposing
``transform_batch`` (homography / PWA / TPS): RMSE / mean / max / per-point
errors against floor ground truth, the reference's <=10 px RMSE target
check (phase3_high_precision_transform.md:190), side-by-side comparison of
transformers, error visualization, and leave-one-out cross-validation for
interpolating transformers (reference :447+). Error norms are one jnp
reduction over all points.
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Any, Callable, Sequence

import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)

RMSE_TARGET_PX = 10.0


def point_errors(predicted: np.ndarray, expected: np.ndarray) -> dict[str, Any]:
    """(N, 2) vs (N, 2) -> error stats (all-points jnp reduction)."""
    err = jnp.linalg.norm(
        jnp.asarray(predicted, jnp.float32) - jnp.asarray(expected, jnp.float32),
        axis=-1,
    )
    return {
        "rmse": float(jnp.sqrt(jnp.mean(err**2))),
        "mean_error": float(jnp.mean(err)),
        "max_error": float(jnp.max(err)),
        "min_error": float(jnp.min(err)),
        "std_error": float(jnp.std(err)),
        "per_point": np.asarray(err).tolist(),
    }


class TransformEvaluator:
    def __init__(self, rmse_target: float = RMSE_TARGET_PX):
        self.rmse_target = float(rmse_target)

    @classmethod
    def from_config(cls, cfg: Any) -> "TransformEvaluator":
        """Target from ``calibration.reprojection_error_threshold``
        (reference config default 2.0 px; the docs guide's looser <=10 px is
        this class's constructor default)."""
        return cls(
            rmse_target=float(
                cfg.get("calibration.reprojection_error_threshold", RMSE_TARGET_PX)
            )
        )

    def evaluate(
        self,
        transformer: Any,
        camera_points: np.ndarray,
        floor_points: np.ndarray,
    ) -> dict[str, Any]:
        """Evaluate ``transformer.transform_batch`` on correspondence pairs;
        includes the reference's RMSE-target pass/fail (reference :75-81)."""
        predicted = np.asarray(transformer.transform_batch(np.asarray(camera_points, np.float32)))
        stats = point_errors(predicted, np.asarray(floor_points, np.float32))
        stats["num_points"] = int(len(camera_points))
        stats["rmse_target"] = self.rmse_target
        stats["meets_target"] = bool(stats["rmse"] <= self.rmse_target)
        return stats

    def compare(
        self,
        transformers: dict[str, Any],
        camera_points: np.ndarray,
        floor_points: np.ndarray,
    ) -> dict[str, dict[str, Any]]:
        """Same correspondences through several transformers (reference's
        homography-vs-PWA comparison)."""
        return {
            name: self.evaluate(t, camera_points, floor_points)
            for name, t in transformers.items()
        }

    def cross_validate(
        self,
        build_fn: Callable[[np.ndarray, np.ndarray], Any],
        camera_points: np.ndarray,
        floor_points: np.ndarray,
    ) -> dict[str, Any]:
        """Leave-one-out CV for interpolating transformers (reference :447+):
        refit on N-1 correspondences, measure the held-out point's error.
        ``build_fn(cam, floor) -> transformer``."""
        camera_points = np.asarray(camera_points, np.float32)
        floor_points = np.asarray(floor_points, np.float32)
        n = len(camera_points)
        errors = []
        for i in range(n):
            keep = np.arange(n) != i
            try:
                t = build_fn(camera_points[keep], floor_points[keep])
                pred = np.asarray(
                    t.transform_batch(camera_points[i : i + 1])
                )[0]
                errors.append(float(np.linalg.norm(pred - floor_points[i])))
            except Exception as e:  # degenerate refit (e.g. collinear points)
                logger.warning("LOO fold %d failed: %s", i, e)
                errors.append(float("nan"))
        arr = np.asarray(errors)
        ok = arr[np.isfinite(arr)]
        return {
            "num_folds": n,
            "failed_folds": int(np.sum(~np.isfinite(arr))),
            "loo_rmse": float(np.sqrt(np.mean(ok**2))) if len(ok) else float("nan"),
            "loo_mean": float(np.mean(ok)) if len(ok) else float("nan"),
            "loo_max": float(np.max(ok)) if len(ok) else float("nan"),
            "per_point": errors,
        }

    def plot_errors(
        self,
        camera_points: np.ndarray,
        floor_points: np.ndarray,
        predicted: np.ndarray,
        output_path: str | Path,
    ) -> Path:
        """Expected vs predicted floor positions with error segments."""
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        floor_points = np.asarray(floor_points)
        predicted = np.asarray(predicted)
        fig, ax = plt.subplots(figsize=(9, 7))
        ax.scatter(floor_points[:, 0], floor_points[:, 1], c="tab:green",
                   label="expected", zorder=3)
        ax.scatter(predicted[:, 0], predicted[:, 1], c="tab:red", marker="x",
                   label="predicted", zorder=3)
        for e, p in zip(floor_points, predicted):
            ax.plot([e[0], p[0]], [e[1], p[1]], "k-", alpha=0.4, lw=1)
        ax.invert_yaxis()
        ax.set_title("Transform reprojection errors")
        ax.legend()
        out = Path(output_path)
        out.parent.mkdir(parents=True, exist_ok=True)
        fig.tight_layout()
        fig.savefig(out, dpi=120)
        plt.close(fig)
        return out
