"""Reprojection-error evaluation (reference src/calibration/reprojection_error.py:35-237)."""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import numpy as np

from ..ops import geometry


class ReprojectionErrorEvaluator:
    def __init__(self, transformer: Any):
        self.transformer = transformer

    def evaluate(
        self, src_points: np.ndarray, dst_points: np.ndarray
    ) -> dict[str, Any]:
        src = np.atleast_2d(np.asarray(src_points, np.float32))
        dst = np.atleast_2d(np.asarray(dst_points, np.float32))
        pred = self.transformer.transform_batch(src)
        errors = np.linalg.norm(pred - dst, axis=1)
        return {
            "mean_error": float(errors.mean()),
            "max_error": float(errors.max()),
            "min_error": float(errors.min()),
            "std_error": float(errors.std()),
            "rmse": float(np.sqrt(np.mean(errors**2))),
            "per_point_errors": errors.tolist(),
            "num_points": int(len(errors)),
        }

    @staticmethod
    def homography_errors(H: np.ndarray, src: np.ndarray, dst: np.ndarray) -> np.ndarray:
        return np.asarray(
            geometry.reprojection_errors(
                jnp.asarray(H, jnp.float32),
                jnp.asarray(np.atleast_2d(src), jnp.float32),
                jnp.asarray(np.atleast_2d(dst), jnp.float32),
            )
        )
