"""Appearance-feature extraction from DETR encoder features, jitted.

Reimplements the reference FeatureExtractor contract
(src/tracking/feature_extractor.py:39-137): per-detection ROI mean-pool over
the encoder feature map, L2-normalized — but vectorized over the whole
(F, Q) detection batch in one jitted op instead of per-box Python loops.
A crop-histogram fallback (64-bin BGR + channel stats padded to 256-d,
reference :90-137) is provided for detectors without encoder features.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array


@partial(jax.jit, static_argnames=("feature_hw",))
def roi_mean_pool(
    enc_features: Array,  # (B, L, C) flattened encoder output
    feature_hw: tuple[int, int],
    boxes_xywh: Array,  # (B, Q, 4) in original-image pixels
    valid: Array,  # (B, Q)
    image_wh: Array,  # (2,) original (width, height)
) -> Array:
    """Mean-pool encoder cells under each box -> (B, Q, C), L2-normalized."""
    fh, fw = feature_hw
    B, L, C = enc_features.shape
    feats = enc_features.reshape(B, fh, fw, C)

    # Box corners in feature-grid coordinates.
    sx = fw / image_wh[0]
    sy = fh / image_wh[1]
    x0 = boxes_xywh[..., 0] * sx
    y0 = boxes_xywh[..., 1] * sy
    x1 = (boxes_xywh[..., 0] + boxes_xywh[..., 2]) * sx
    y1 = (boxes_xywh[..., 1] + boxes_xywh[..., 3]) * sy

    cy = jnp.arange(fh, dtype=jnp.float32) + 0.5  # cell centers
    cx = jnp.arange(fw, dtype=jnp.float32) + 0.5
    in_y = (cy[None, None, :] >= y0[..., None] - 0.5) & (cy[None, None, :] <= y1[..., None] + 0.5)
    in_x = (cx[None, None, :] >= x0[..., None] - 0.5) & (cx[None, None, :] <= x1[..., None] + 0.5)
    cell_mask = in_y[:, :, :, None] & in_x[:, :, None, :]  # (B, Q, fh, fw)
    cell_mask = cell_mask.astype(jnp.float32)

    pooled = jnp.einsum("bqhw,bhwc->bqc", cell_mask, feats.astype(jnp.float32))
    count = jnp.maximum(jnp.sum(cell_mask, axis=(2, 3)), 1.0)
    pooled = pooled / count[..., None]

    norm = jnp.linalg.norm(pooled, axis=-1, keepdims=True)
    pooled = pooled / jnp.maximum(norm, 1e-12)
    return jnp.where(valid[..., None], pooled, 0.0)


def crop_histogram_features(
    frame: np.ndarray, boxes_xywh: np.ndarray, dim: int = 256
) -> np.ndarray:
    """Host fallback: 64-bin per-channel BGR histograms + mean/std stats,
    padded to ``dim``, L2-normalized (reference feature_extractor.py:90-137)."""
    H, W = frame.shape[:2]
    out = np.zeros((len(boxes_xywh), dim), np.float32)
    for i, (x, y, w, h) in enumerate(boxes_xywh):
        x0, y0 = max(0, int(x)), max(0, int(y))
        x1, y1 = min(W, int(x + w)), min(H, int(y + h))
        if x1 <= x0 or y1 <= y0:
            continue
        crop = frame[y0:y1, x0:x1].reshape(-1, 3).astype(np.float32)
        feats: list[np.ndarray] = []
        for c in range(3):
            hist, _ = np.histogram(crop[:, c], bins=64, range=(0, 256))
            feats.append(hist.astype(np.float32))
        stats = np.concatenate([crop.mean(axis=0), crop.std(axis=0)])
        v = np.concatenate(feats + [stats])
        if len(v) < dim:
            v = np.pad(v, (0, dim - len(v)))
        v = v[:dim]
        n = np.linalg.norm(v)
        out[i] = v / n if n > 1e-12 else v
    return out
