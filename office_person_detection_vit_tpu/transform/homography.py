"""Homography transformer facade (reference src/transform/homography.py:105-197).

Host-facing API over the jitted ops.geometry kernels; batched paths process
all detections of a run in one device call.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import numpy as np

from ..core.dto import Detection
from ..ops import geometry
from .floormap_config import FloorMapConfig


class HomographyTransformer:
    method = "homography"

    def __init__(self, matrix: np.ndarray, floormap: FloorMapConfig | None = None):
        matrix = np.asarray(matrix, np.float64)
        geometry.validate_homography(matrix)
        self.H = matrix
        self._H_dev = jnp.asarray(matrix, jnp.float32)
        self.floormap = floormap or FloorMapConfig()

    @classmethod
    def from_config(cls, cfg: Any) -> "HomographyTransformer":
        m = cfg.get("homography.matrix")
        if m is None:
            raise ValueError("homography.matrix missing from config")
        return cls(np.asarray(m, np.float64), FloorMapConfig.from_config(cfg))

    # ------------------------------------------------------------------ API
    @staticmethod
    def get_foot_point(bbox: tuple[float, float, float, float]) -> tuple[float, float]:
        """Bottom-center of an xywh bbox (reference homography.py:93-103)."""
        x, y, w, h = bbox
        return (x + w / 2.0, y + h)

    def transform_pixel(self, x: float, y: float) -> tuple[float, float]:
        out = self.transform_batch(np.asarray([[x, y]], np.float32))[0]
        return float(out[0]), float(out[1])

    def transform_batch(self, points: np.ndarray) -> np.ndarray:
        """(N, 2) camera px -> (N, 2) floormap px."""
        pts = jnp.asarray(np.atleast_2d(points), jnp.float32)
        return np.asarray(geometry.homography_transform(self._H_dev, pts))

    def transform_detection(self, det: Detection) -> Detection:
        foot = det.foot_point
        floor_px = self.transform_batch(np.asarray([foot], np.float32))[0]
        det.floor_coords_px = (float(floor_px[0]), float(floor_px[1]))
        mm = self.floormap.px_to_mm(floor_px)
        det.floor_coords_mm = (float(mm[0]), float(mm[1]))
        return det

    def transform_detections(self, dets: list[Detection]) -> list[Detection]:
        """Batched: one device call for all detections."""
        from .common import apply_floor_transform

        return apply_floor_transform(self.transform_batch, self.floormap, dets)

    def is_in_bounds(self, floor_px: np.ndarray) -> np.ndarray:
        return np.asarray(
            geometry.in_bounds_mask(
                jnp.asarray(np.atleast_2d(floor_px), jnp.float32),
                float(self.floormap.image_width),
                float(self.floormap.image_height),
            )
        )

    def get_info(self) -> dict:
        return {"method": self.method, "num_points": 0}
