"""Projective geometry as jitted ops.

Homography transform (reference src/transform/homography.py:105-197) and the
Brown lens-distortion model (reference src/calibration/lens_distortion.py).
Geometry runs in float32 with ``precision=HIGHEST`` semantics — it is tiny
compared to the detector, and output-file parity requires full precision
(SURVEY.md §7.4 item 6).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import Array

# --------------------------------------------------------------------- homography


def validate_homography(H) -> None:
    """Host-side validation (reference homography.py:66-91)."""
    import numpy as np

    H = np.asarray(H, dtype=np.float64)
    if H.shape != (3, 3):
        raise ValueError(f"homography must be 3x3, got {H.shape}")
    det = np.linalg.det(H)
    if abs(det) < 1e-10:
        raise ValueError(f"homography is singular (det={det:.3e})")
    cond = np.linalg.cond(H)
    if cond > 1e12:
        raise ValueError(f"homography is ill-conditioned (cond={cond:.3e})")


@jax.jit
def homography_transform(H: Array, points: Array) -> Array:
    """Apply 3x3 homography to (..., 2) points -> (..., 2).

    (x', y', w) = H @ (x, y, 1); returns (x'/w, y'/w).
    """
    x = points[..., 0]
    y = points[..., 1]
    xp = H[0, 0] * x + H[0, 1] * y + H[0, 2]
    yp = H[1, 0] * x + H[1, 1] * y + H[1, 2]
    w = H[2, 0] * x + H[2, 1] * y + H[2, 2]
    w = jnp.where(jnp.abs(w) < 1e-12, jnp.sign(w) * 1e-12 + (w == 0) * 1e-12, w)
    return jnp.stack([xp / w, yp / w], axis=-1)


@jax.jit
def px_to_mm(points_px: Array, origin: Array, mm_per_px: Array) -> Array:
    """Floormap pixel -> millimetres (reference floormap_config.py:52-70).

    mm = (px - origin) * mm_per_pixel, per axis.
    """
    return (points_px - origin) * mm_per_px


@jax.jit
def in_bounds_mask(points: Array, width: float, height: float) -> Array:
    """(..., 2) -> bool mask of points inside [0, width) x [0, height)."""
    x = points[..., 0]
    y = points[..., 1]
    return (x >= 0) & (x < width) & (y >= 0) & (y < height)


# ----------------------------------------------------------------- lens distortion


@partial(jax.jit, static_argnames=("num_iters",))
def undistort_points(
    points: Array,
    camera_matrix: Array,
    dist_coeffs: Array,
    num_iters: int = 10,
) -> Array:
    """Iteratively invert the Brown radial+tangential distortion model.

    points: (..., 2) distorted pixel coords; camera_matrix: (3, 3) K;
    dist_coeffs: (5,) [k1, k2, p1, p2, k3]. Matches cv2.undistortPoints'
    fixed-point iteration (reference lens_distortion.py:161-202) but jitted
    with a static iteration count (lax.fori_loop, no data-dependent control
    flow).
    """
    fx, fy = camera_matrix[0, 0], camera_matrix[1, 1]
    cx, cy = camera_matrix[0, 2], camera_matrix[1, 2]
    k1, k2, p1, p2, k3 = (dist_coeffs[i] for i in range(5))

    # Normalized distorted coords.
    xd = (points[..., 0] - cx) / fx
    yd = (points[..., 1] - cy) / fy

    def body(_, xy):
        x, y = xy
        r2 = x * x + y * y
        radial = 1.0 + k1 * r2 + k2 * r2 * r2 + k3 * r2 * r2 * r2
        dx = 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
        dy = p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
        x_new = (xd - dx) / radial
        y_new = (yd - dy) / radial
        return (x_new, y_new)

    x, y = jax.lax.fori_loop(0, num_iters, body, (xd, yd))
    return jnp.stack([x * fx + cx, y * fy + cy], axis=-1)


@jax.jit
def distort_points(points: Array, camera_matrix: Array, dist_coeffs: Array) -> Array:
    """Forward Brown distortion (undistorted px -> distorted px)."""
    fx, fy = camera_matrix[0, 0], camera_matrix[1, 1]
    cx, cy = camera_matrix[0, 2], camera_matrix[1, 2]
    k1, k2, p1, p2, k3 = (dist_coeffs[i] for i in range(5))
    x = (points[..., 0] - cx) / fx
    y = (points[..., 1] - cy) / fy
    r2 = x * x + y * y
    radial = 1.0 + k1 * r2 + k2 * r2 * r2 + k3 * r2 * r2 * r2
    xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return jnp.stack([xd * fx + cx, yd * fy + cy], axis=-1)


# ------------------------------------------------------------- reprojection error


@jax.jit
def reprojection_errors(H: Array, src: Array, dst: Array) -> Array:
    """Per-point L2 error of H(src) vs dst (reference reprojection_error.py:35-237)."""
    proj = homography_transform(H, src)
    return jnp.linalg.norm(proj - dst, axis=-1)
