"""Piecewise-affine / thin-plate-spline transformer facades.

Host-facing API parity with the reference (src/transform/piecewise_affine.py:
51-591): correspondence-file constructor, pickle save/load, training-error
evaluation, triangulation introspection — applied through the jitted
brute-force barycentric kernel (ops/pwa.py) instead of scipy find_simplex.
"""

from __future__ import annotations

import json
import pickle
from pathlib import Path
from typing import Any

import jax.numpy as jnp
import numpy as np

from ..core.dto import Detection
from ..ops import pwa as pwa_ops
from .floormap_config import FloorMapConfig


def load_correspondences(path: str | Path) -> tuple[np.ndarray, np.ndarray]:
    """Load {camera: [[x,y],...], floormap: [[x,y],...]} correspondence JSON
    (reference correspondence file format, piecewise_affine.py:322-346)."""
    data = json.loads(Path(path).read_text(encoding="utf-8"))
    if "points" in data:  # list of {camera: [x,y], floormap: [x,y]}
        src = np.asarray([p["camera"] for p in data["points"]], np.float64)
        dst = np.asarray([p["floormap"] for p in data["points"]], np.float64)
    else:
        src = np.asarray(data["camera"], np.float64)
        dst = np.asarray(data["floormap"], np.float64)
    return src, dst


class PiecewiseAffineTransformer:
    method = "piecewise_affine"

    def __init__(
        self,
        src_points: np.ndarray,
        dst_points: np.ndarray,
        floormap: FloorMapConfig | None = None,
        undistorter=None,
    ):
        self.undistorter = undistorter
        if undistorter is not None:
            src_points = undistorter.undistort_points(np.asarray(src_points, np.float64))
        self.model = pwa_ops.fit_pwa(src_points, dst_points)
        self.floormap = floormap or FloorMapConfig()
        self._tri = jnp.asarray(self.model.triangles)
        self._aff = jnp.asarray(self.model.affines)
        self._cen = jnp.asarray(self.model.centroids)

    # ------------------------------------------------------------ constructors
    @classmethod
    def from_correspondence_file(
        cls, path: str | Path, floormap: FloorMapConfig | None = None, undistorter=None
    ) -> "PiecewiseAffineTransformer":
        src, dst = load_correspondences(path)
        return cls(src, dst, floormap, undistorter)

    @classmethod
    def load(cls, path: str | Path, undistorter=None) -> "PiecewiseAffineTransformer":
        """The pickled src_points are already in undistorted space (they are
        the fit inputs), so the model is rebuilt WITHOUT re-undistorting and
        the undistorter is attached afterwards for query-time correction."""
        with open(path, "rb") as f:
            state = pickle.load(f)
        t = cls(state["src_points"], state["dst_points"], state.get("floormap"))
        t.undistorter = undistorter
        return t

    def save(self, path: str | Path) -> None:
        Path(path).parent.mkdir(parents=True, exist_ok=True)
        with open(path, "wb") as f:
            pickle.dump(
                {
                    "src_points": self.model.src_points,
                    "dst_points": self.model.dst_points,
                    "floormap": self.floormap,
                },
                f,
            )

    # ------------------------------------------------------------------ API
    def transform_pixel(self, x: float, y: float) -> tuple[float, float]:
        out = self.transform_batch(np.asarray([[x, y]], np.float32))[0]
        return float(out[0]), float(out[1])

    def transform_batch(self, points: np.ndarray) -> np.ndarray:
        pts = np.atleast_2d(np.asarray(points, np.float32))
        if self.undistorter is not None:
            pts = self.undistorter.undistort_points(pts).astype(np.float32)
        return self._transform_model_space(pts)

    def _transform_model_space(self, pts: np.ndarray) -> np.ndarray:
        """Transform points ALREADY in the fit (undistorted) space."""
        return np.asarray(
            pwa_ops.pwa_transform(
                jnp.asarray(np.atleast_2d(np.asarray(pts, np.float32))),
                self._tri, self._aff, self._cen,
            )
        )

    def transform_detections(self, dets: list[Detection]) -> list[Detection]:
        from .common import apply_floor_transform

        return apply_floor_transform(self.transform_batch, self.floormap, dets)

    # ----------------------------------------------------------- diagnostics
    def training_error(self) -> dict[str, float]:
        """RMSE/max/mean over the training correspondences
        (reference piecewise_affine.py:238-262). src_points are already in
        fit space — going through transform_batch would undistort twice."""
        pred = self._transform_model_space(self.model.src_points)
        err = np.linalg.norm(pred - self.model.dst_points, axis=1)
        return {
            "rmse": float(np.sqrt(np.mean(err**2))),
            "max_error": float(err.max()),
            "mean_error": float(err.mean()),
        }

    def get_info(self) -> dict:
        return {
            "method": self.method,
            "num_points": self.model.num_points,
            "num_triangles": self.model.num_triangles,
            "training_error": self.training_error(),
        }


class ThinPlateSplineTransformer:
    method = "thin_plate_spline"

    def __init__(
        self,
        src_points: np.ndarray,
        dst_points: np.ndarray,
        floormap: FloorMapConfig | None = None,
        reg: float = 0.0,
    ):
        self.model = pwa_ops.fit_tps(src_points, dst_points, reg=reg)
        self.floormap = floormap or FloorMapConfig()
        self._args = tuple(
            jnp.asarray(a)
            for a in (
                self.model.control,
                self.model.w,
                self.model.a,
                self.model.offset,
                np.float32(self.model.scale),
            )
        )
        self._src = np.asarray(src_points, np.float64)
        self._dst = np.asarray(dst_points, np.float64)

    @classmethod
    def from_correspondence_file(
        cls, path: str | Path, floormap: FloorMapConfig | None = None
    ) -> "ThinPlateSplineTransformer":
        src, dst = load_correspondences(path)
        return cls(src, dst, floormap)

    def transform_pixel(self, x: float, y: float) -> tuple[float, float]:
        out = self.transform_batch(np.asarray([[x, y]], np.float32))[0]
        return float(out[0]), float(out[1])

    def transform_batch(self, points: np.ndarray) -> np.ndarray:
        pts = jnp.asarray(np.atleast_2d(points), jnp.float32)
        return np.asarray(pwa_ops.tps_transform(pts, *self._args))

    def transform_detections(self, dets: list[Detection]) -> list[Detection]:
        from .common import apply_floor_transform

        return apply_floor_transform(self.transform_batch, self.floormap, dets)

    def training_error(self) -> dict[str, float]:
        pred = self.transform_batch(self._src.astype(np.float32))
        err = np.linalg.norm(pred - self._dst, axis=1)
        return {
            "rmse": float(np.sqrt(np.mean(err**2))),
            "max_error": float(err.max()),
            "mean_error": float(err.mean()),
        }

    def get_info(self) -> dict:
        return {
            "method": self.method,
            "num_points": int(len(self._src)),
            "training_error": self.training_error(),
        }


def build_transformer(cfg: Any, undistorter=None):
    """Config-driven transformer selection (reference phases/transform.py:222-255)."""
    method = cfg.get("transform.method", "homography")
    floormap = FloorMapConfig.from_config(cfg)
    if method == "homography":
        from .homography import HomographyTransformer

        return HomographyTransformer.from_config(cfg)
    model_path = cfg.get("transform.model_path")
    corr = cfg.get("calibration.correspondence_file")
    if method == "piecewise_affine":
        if model_path and Path(str(model_path)).exists():
            loaded = PiecewiseAffineTransformer.load(model_path, undistorter=undistorter)
            loaded.floormap = floormap
            return loaded
        if corr and Path(str(corr)).exists():
            t = PiecewiseAffineTransformer.from_correspondence_file(
                corr, floormap, undistorter
            )
            # Save the fitted model for later runs / the dashboard
            # (reference phases/transform.py:179-182).
            if model_path:
                t.save(model_path)
            return t
        raise FileNotFoundError(
            "piecewise_affine needs transform.model_path or calibration.correspondence_file"
        )
    if method == "thin_plate_spline":
        if corr and Path(str(corr)).exists():
            return ThinPlateSplineTransformer.from_correspondence_file(corr, floormap)
        raise FileNotFoundError("thin_plate_spline needs calibration.correspondence_file")
    raise ValueError(f"unknown transform method: {method}")
