"""Homography estimation on device: normalized DLT + vectorized RANSAC.

TPU-native replacement for the estimation backends the reference tools call
out to — ``cv2.findHomography(..., cv2.RANSAC, 5.0)`` in
``tools/correspondence_analyzer.py:124`` and Kornia's
``find_homography_dlt`` in ``tools/poc_deep_homography.py:43-51``.

Instead of a sequential RANSAC loop, all hypotheses are evaluated at once:
every iteration's 4-point minimal sample is drawn up front, a batched
(vmapped) DLT solves all candidate homographies in one SVD batch on the MXU,
inlier counts are a single reduction, and the winner is refit on its inlier
set with a masked (weighted) DLT so shapes stay static under jit.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

Array = jax.Array


def _normalization(points: Array, mask: Array) -> Array:
    """Hartley normalization matrix: translate masked centroid to origin,
    scale mean distance to sqrt(2). (3, 3), float32."""
    w = mask.astype(jnp.float32)
    n = jnp.maximum(w.sum(), 1.0)
    centroid = (points * w[:, None]).sum(0) / n
    d = jnp.linalg.norm(points - centroid, axis=-1)
    mean_d = jnp.maximum((d * w).sum() / n, 1e-8)
    s = jnp.sqrt(2.0) / mean_d
    return jnp.array(
        [[s, 0.0, -s * centroid[0]], [0.0, s, -s * centroid[1]], [0.0, 0.0, 1.0]],
        jnp.float32,
    )


def _dlt(src: Array, dst: Array, mask: Array) -> Array:
    """Masked normalized DLT. src/dst (N, 2), mask (N,) bool -> H (3, 3)
    with H[2,2] == 1 (or NaNs for degenerate input).

    Geometry must not drop to bf16 on TPU (SURVEY.md §7.4 item 6): all
    matmuls here run under ``default_matmul_precision('highest')`` via the
    public wrappers below.
    """
    src = src.astype(jnp.float32)
    dst = dst.astype(jnp.float32)
    t_src = _normalization(src, mask)
    t_dst = _normalization(dst, mask)
    ones = jnp.ones((src.shape[0], 1), jnp.float32)
    sh = jnp.concatenate([src, ones], -1) @ t_src.T
    dh = jnp.concatenate([dst, ones], -1) @ t_dst.T
    x, y = sh[:, 0], sh[:, 1]
    u, v = dh[:, 0], dh[:, 1]
    zero = jnp.zeros_like(x)
    one = jnp.ones_like(x)
    # Standard 2-rows-per-point DLT system; outlier rows are weighted to 0 so
    # they do not constrain the solution but the shape stays (2N, 9).
    rows_u = jnp.stack([-x, -y, -one, zero, zero, zero, u * x, u * y, u], -1)
    rows_v = jnp.stack([zero, zero, zero, -x, -y, -one, v * x, v * y, v], -1)
    a = jnp.concatenate([rows_u, rows_v], 0)
    w = jnp.concatenate([mask, mask]).astype(jnp.float32)[:, None]
    a = a * w
    # h = eigenvector of A^T A with the smallest eigenvalue.
    _, _, vt = jnp.linalg.svd(a, full_matrices=False)
    h_norm = vt[-1].reshape(3, 3)
    h = jnp.linalg.inv(t_dst) @ h_norm @ t_src
    return h / h[2, 2]


def fit_homography_dlt(src: Array, dst: Array, mask: Array | None = None) -> Array:
    """Least-squares homography from (N>=4, 2) correspondences (DLT).

    Drop-in for Kornia's ``find_homography_dlt`` (reference
    tools/poc_deep_homography.py:43-51) running as one jitted SVD.
    """
    src = jnp.asarray(src, jnp.float32)
    if mask is None:
        mask = jnp.ones(src.shape[0], bool)
    with jax.default_matmul_precision("highest"):
        return jax.jit(_dlt)(src, jnp.asarray(dst, jnp.float32), jnp.asarray(mask))


def _transfer_errors(h: Array, src: Array, dst: Array) -> Array:
    """Forward transfer error per point, (N,)."""
    ones = jnp.ones((src.shape[0], 1), jnp.float32)
    p = jnp.concatenate([src, ones], -1) @ h.T
    w = jnp.where(jnp.abs(p[:, 2:3]) < 1e-12, 1e-12, p[:, 2:3])
    return jnp.linalg.norm(p[:, :2] / w - dst, axis=-1)


@partial(jax.jit, static_argnames=("iterations",))
def _ransac(src: Array, dst: Array, threshold: float, key: Array, iterations: int):
    n = src.shape[0]

    def hypothesis(k):
        idx = jax.random.choice(k, n, (4,), replace=False)
        m = jnp.zeros(n, bool).at[idx].set(True)
        h = _dlt(src, dst, m)
        err = _transfer_errors(h, src, dst)
        inl = (err < threshold) & jnp.isfinite(err)
        # Degenerate (collinear) samples yield NaN H -> zero inliers.
        return jnp.where(jnp.isfinite(h).all(), inl.sum(), 0), inl

    counts, inlier_sets = jax.vmap(hypothesis)(jax.random.split(key, iterations))
    best = jnp.argmax(counts)
    inliers = inlier_sets[best]
    # Refit on all inliers of the winning hypothesis (cv2.findHomography's
    # final LMEDS/least-squares polish step), masked so shapes are static.
    h = _dlt(src, dst, inliers)
    err = _transfer_errors(h, src, dst)
    inliers = (err < threshold) & jnp.isfinite(err)
    return h, inliers, err


def fit_homography_ransac(
    src: Array,
    dst: Array,
    threshold: float = 5.0,
    iterations: int = 512,
    seed: int = 0,
) -> tuple[Array, Array, Array]:
    """RANSAC homography: returns (H (3,3), inlier mask (N,), errors (N,)).

    Behavior-parity with the reference's ``cv2.findHomography(src, dst,
    cv2.RANSAC, 5.0)`` call (tools/correspondence_analyzer.py:124), but every
    RANSAC hypothesis runs in parallel via vmap instead of a host loop.
    """
    src = jnp.asarray(src, jnp.float32)
    dst = jnp.asarray(dst, jnp.float32)
    if src.shape[0] < 4:
        raise ValueError(f"need >=4 correspondences, got {src.shape[0]}")
    with jax.default_matmul_precision("highest"):
        return _ransac(src, dst, float(threshold), jax.random.PRNGKey(seed), iterations)
