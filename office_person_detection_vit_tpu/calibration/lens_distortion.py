"""Lens distortion correction (reference src/calibration/lens_distortion.py).

Brown radial+tangential model; the point-undistortion runs through the jitted
fixed-point iteration in ops/geometry (no cv2 dependency on the hot path).
Chessboard calibration helpers stay host-side cv2 (tool-time only).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax.numpy as jnp
import numpy as np

from ..ops import geometry


@dataclass(frozen=True)
class DistortionParams:
    k1: float = 0.0
    k2: float = 0.0
    k3: float = 0.0
    p1: float = 0.0
    p2: float = 0.0
    focal_length_x: float = 1250.0
    focal_length_y: float = 1250.0
    center_x: float = 640.0
    center_y: float = 360.0
    image_width: int = 1280
    image_height: int = 720

    @classmethod
    def from_config(cls, cfg: Any, prefix: str = "transform.lens_distortion") -> "DistortionParams":
        """Read Brown params. Accepts this framework's
        ``transform.lens_distortion.*`` flat keys and, as a drop-in alias,
        the reference's split ``calibration.distortion.{k1,k2,k3,p1,p2}`` +
        ``calibration.intrinsics.{focal_length_*, principal_point_*,
        image_*}`` layout (reference config.yaml calibration section)."""
        g = lambda k, d: cfg.get(f"{prefix}.{k}", d)
        flat = cls(
            k1=float(g("k1", 0.0)), k2=float(g("k2", 0.0)), k3=float(g("k3", 0.0)),
            p1=float(g("p1", 0.0)), p2=float(g("p2", 0.0)),
            focal_length_x=float(g("focal_length_x", 1250.0)),
            focal_length_y=float(g("focal_length_y", 1250.0)),
            center_x=float(g("center_x", 640.0)), center_y=float(g("center_y", 360.0)),
            image_width=int(g("image_width", 1280)), image_height=int(g("image_height", 720)),
        )
        # The flat layout wins when its distortion COEFFICIENTS carry
        # information; otherwise coefficients come from the reference's
        # calibration layout (ConfigManager backfills identity defaults for
        # the flat keys, so "all zero" = unset). Intrinsics prefer
        # calibration.intrinsics when present, else the flat values — a
        # config may legitimately set flat intrinsics alongside
        # calibration-layout coefficients.
        flat_coeffs_set = any((flat.k1, flat.k2, flat.k3, flat.p1, flat.p2))
        if not flat_coeffs_set and cfg.get("calibration.distortion") is not None:
            d = lambda k, v: cfg.get(f"calibration.distortion.{k}", v)
            i = lambda k, v: cfg.get(f"calibration.intrinsics.{k}", v)
            return cls(
                k1=float(d("k1", 0.0)), k2=float(d("k2", 0.0)), k3=float(d("k3", 0.0)),
                p1=float(d("p1", 0.0)), p2=float(d("p2", 0.0)),
                focal_length_x=float(i("focal_length_x", flat.focal_length_x)),
                focal_length_y=float(i("focal_length_y", flat.focal_length_y)),
                center_x=float(i("principal_point_x", flat.center_x)),
                center_y=float(i("principal_point_y", flat.center_y)),
                image_width=int(i("image_width", flat.image_width)),
                image_height=int(i("image_height", flat.image_height)),
            )
        return flat

    @property
    def camera_matrix(self) -> np.ndarray:
        return np.asarray(
            [
                [self.focal_length_x, 0.0, self.center_x],
                [0.0, self.focal_length_y, self.center_y],
                [0.0, 0.0, 1.0],
            ],
            np.float64,
        )

    @property
    def dist_coeffs(self) -> np.ndarray:
        return np.asarray([self.k1, self.k2, self.p1, self.p2, self.k3], np.float64)

    @property
    def is_identity(self) -> bool:
        return not any([self.k1, self.k2, self.k3, self.p1, self.p2])


class LensDistortionCorrector:
    def __init__(self, params: DistortionParams):
        self.params = params
        self._K = jnp.asarray(params.camera_matrix, jnp.float32)
        self._d = jnp.asarray(params.dist_coeffs, jnp.float32)

    @classmethod
    def from_config(cls, cfg: Any) -> "LensDistortionCorrector":
        return cls(DistortionParams.from_config(cfg))

    def undistort_point(self, x: float, y: float) -> tuple[float, float]:
        out = self.undistort_points(np.asarray([[x, y]], np.float32))[0]
        return float(out[0]), float(out[1])

    def undistort_points(self, points: np.ndarray) -> np.ndarray:
        pts = np.atleast_2d(np.asarray(points, np.float32))
        if self.params.is_identity:
            return pts
        return np.asarray(
            geometry.undistort_points(jnp.asarray(pts), self._K, self._d, num_iters=20)
        )

    def distort_points(self, points: np.ndarray) -> np.ndarray:
        pts = np.atleast_2d(np.asarray(points, np.float32))
        if self.params.is_identity:
            return pts
        return np.asarray(geometry.distort_points(jnp.asarray(pts), self._K, self._d))

    def undistort_image(self, image: np.ndarray) -> np.ndarray:  # pragma: no cover
        """Full-image undistortion (host-side cv2; tool/visualization use)."""
        import cv2

        return cv2.undistort(
            image, self.params.camera_matrix, self.params.dist_coeffs
        )
