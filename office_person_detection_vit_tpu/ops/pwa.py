"""Piecewise-affine and thin-plate-spline transforms, jit-native apply.

The reference (src/transform/piecewise_affine.py) triangulates correspondence
points with scipy Delaunay, fits a per-triangle affine by lstsq, and at query
time calls ``find_simplex`` with nearest-centroid extrapolation. scipy's
simplex lookup is not jittable; with only tens of triangles the right
TPU-native formulation (SURVEY.md §7.4 item 7) is a brute-force barycentric
sign test over *all* triangles + a masked argmin for extrapolation — one
broadcast expression, no host round-trip.

Fitting stays host-side numpy/scipy (done once, at calibration load time);
the fitted transform is a pytree of arrays applied by :func:`pwa_transform`.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array


@dataclass(frozen=True)
class PWAModel:
    """Fitted piecewise-affine transform (host-built, device-applied).

    triangles   : (T, 3, 2) float32 source-triangle vertices
    affines     : (T, 2, 3) float32 per-triangle affine [A | b]
    centroids   : (T, 2)    float32 source-triangle centroids
    src_points  : (N, 2)    correspondence sources (for diagnostics)
    dst_points  : (N, 2)    correspondence targets
    """

    triangles: np.ndarray
    affines: np.ndarray
    centroids: np.ndarray
    src_points: np.ndarray
    dst_points: np.ndarray

    @property
    def num_triangles(self) -> int:
        return int(self.triangles.shape[0])

    @property
    def num_points(self) -> int:
        return int(self.src_points.shape[0])


def fit_pwa(src: np.ndarray, dst: np.ndarray) -> PWAModel:
    """Delaunay-triangulate src and fit per-triangle affines (host-side).

    Mirrors reference piecewise_affine.py:89-125: triangulation of the source
    correspondence points; affine per triangle by exact solve (3 points).
    """
    from scipy.spatial import Delaunay

    src = np.asarray(src, np.float64)
    dst = np.asarray(dst, np.float64)
    if src.shape != dst.shape or src.ndim != 2 or src.shape[1] != 2:
        raise ValueError("src/dst must both be (N, 2)")
    if src.shape[0] < 3:
        raise ValueError("need >= 3 correspondence points")
    tri = Delaunay(src)
    simplices = tri.simplices  # (T, 3)
    T = len(simplices)
    triangles = src[simplices]  # (T, 3, 2)
    affines = np.zeros((T, 2, 3), np.float64)
    for t in range(T):
        s = src[simplices[t]]  # (3, 2)
        d = dst[simplices[t]]  # (3, 2)
        # Solve [x y 1] @ M.T = d for M (2x3).
        A = np.hstack([s, np.ones((3, 1))])  # (3, 3)
        M, *_ = np.linalg.lstsq(A, d, rcond=None)  # (3, 2)
        affines[t] = M.T
    centroids = triangles.mean(axis=1)
    return PWAModel(
        triangles=triangles.astype(np.float32),
        affines=affines.astype(np.float32),
        centroids=centroids.astype(np.float32),
        src_points=src.astype(np.float32),
        dst_points=dst.astype(np.float32),
    )


@jax.jit
def pwa_transform(points: Array, triangles: Array, affines: Array, centroids: Array) -> Array:
    """Apply piecewise-affine transform to (N, 2) points -> (N, 2).

    For each point: barycentric containment test against all T triangles; if
    inside one, apply its affine; else apply the affine of the
    nearest-centroid triangle (reference extrapolation,
    piecewise_affine.py:138-153) — expressed as a masked argmin so the whole
    thing is one jitted broadcast.
    """
    p = points[:, None, :]  # (N, 1, 2)
    a = triangles[None, :, 0, :]  # (1, T, 2)
    b = triangles[None, :, 1, :]
    c = triangles[None, :, 2, :]

    v0 = c - a
    v1 = b - a
    v2 = p - a
    d00 = jnp.sum(v0 * v0, -1)
    d01 = jnp.sum(v0 * v1, -1)
    d11 = jnp.sum(v1 * v1, -1)
    d20 = jnp.sum(v2 * v0, -1)
    d21 = jnp.sum(v2 * v1, -1)
    denom = d00 * d11 - d01 * d01
    safe = jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
    u = (d11 * d20 - d01 * d21) / safe
    v = (d00 * d21 - d01 * d20) / safe
    eps = 1e-7
    inside = (u >= -eps) & (v >= -eps) & (u + v <= 1 + eps) & (jnp.abs(denom) > 1e-12)

    dist2 = jnp.sum((p - centroids[None]) ** 2, -1)  # (N, T)
    # Prefer containing triangles; among them (or among all, if none
    # contains) pick the nearest centroid.
    big = jnp.float32(1e30)
    score = jnp.where(inside, dist2, dist2 + big)
    tri_idx = jnp.argmin(score, axis=-1)  # (N,)

    M = affines[tri_idx]  # (N, 2, 3)
    ones = jnp.ones_like(points[:, :1])
    ph = jnp.concatenate([points, ones], axis=-1)  # (N, 3)
    return jnp.einsum("nij,nj->ni", M, ph)


# ----------------------------------------------------------------------- TPS


@dataclass(frozen=True)
class TPSModel:
    """Thin-plate-spline transform: w (N, 2) kernel weights, a (3, 2) affine
    part, control (N, 2) control points in *normalized* space, offset/scale
    for the normalization.

    Control points are normalized to O(1) range before the solve so the
    float32 device evaluation stays well-conditioned (the reference solves in
    float64 numpy; on TPU we normalize instead of upcasting).
    """

    control: np.ndarray
    w: np.ndarray
    a: np.ndarray
    offset: np.ndarray  # (2,)
    scale: float


def fit_tps(src: np.ndarray, dst: np.ndarray, reg: float = 0.0) -> TPSModel:
    """Fit TPS coefficients by the standard full linear solve
    (reference piecewise_affine.py:445-485)."""
    src = np.asarray(src, np.float64)
    dst = np.asarray(dst, np.float64)
    N = src.shape[0]
    if N < 3:
        raise ValueError("need >= 3 control points")
    offset = src.mean(axis=0)
    scale = float(max(np.abs(src - offset).max(), 1e-9))
    src = (src - offset) / scale
    d2 = np.sum((src[:, None, :] - src[None, :, :]) ** 2, -1)
    K = np.where(d2 > 0, d2 * np.log(np.maximum(d2, 1e-300)) * 0.5, 0.0)  # r^2 log r
    if reg:
        K = K + reg * np.eye(N)
    P = np.hstack([np.ones((N, 1)), src])  # (N, 3)
    L = np.zeros((N + 3, N + 3))
    L[:N, :N] = K
    L[:N, N:] = P
    L[N:, :N] = P.T
    rhs = np.zeros((N + 3, 2))
    rhs[:N] = dst
    sol = np.linalg.solve(L, rhs)
    return TPSModel(
        control=src.astype(np.float32),
        w=sol[:N].astype(np.float32),
        a=sol[N:].astype(np.float32),
        offset=offset.astype(np.float32),
        scale=scale,
    )


@jax.jit
def tps_transform(points: Array, control: Array, w: Array, a: Array, offset: Array, scale: Array) -> Array:
    """Evaluate TPS at (M, 2) points -> (M, 2). RBF phi(r) = r^2 log r.

    ``points`` are raw pixel coords; they are normalized by (offset, scale)
    into the space the model was fitted in.
    """
    pts = (points - offset[None, :]) / scale
    d2 = jnp.sum((pts[:, None, :] - control[None, :, :]) ** 2, -1)  # (M, N)
    phi = jnp.where(d2 > 0, 0.5 * d2 * jnp.log(jnp.maximum(d2, 1e-30)), 0.0)
    ones = jnp.ones_like(pts[:, :1])
    ph = jnp.concatenate([ones, pts], axis=-1)  # (M, 3)
    return phi @ w + ph @ a
