"""Box utilities as pure jittable jax.numpy ops.

Covers the box math scattered through the reference
(xyxy->xywh + foot point: src/detection/yolov8_detector.py:210-241;
IoU: src/tracking/similarity.py:74-128; cxcywh conversion: DETR postprocess).
All functions are shape-polymorphic over leading batch dims and jit-safe.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array


def cxcywh_to_xyxy(boxes: Array) -> Array:
    """(..., 4) center-x, center-y, w, h -> x0, y0, x1, y1."""
    cx, cy, w, h = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1)


def xyxy_to_xywh(boxes: Array) -> Array:
    """(..., 4) x0, y0, x1, y1 -> top-left x, y, width, height."""
    x0, y0, x1, y1 = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate([x0, y0, x1 - x0, y1 - y0], axis=-1)


def xywh_to_xyxy(boxes: Array) -> Array:
    x, y, w, h = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate([x, y, x + w, y + h], axis=-1)


def xyxy_to_cxcywh(boxes: Array) -> Array:
    x0, y0, x1, y1 = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate(
        [(x0 + x1) / 2, (y0 + y1) / 2, x1 - x0, y1 - y0], axis=-1
    )


def foot_point_xywh(boxes_xywh: Array) -> Array:
    """Bottom-center floor-contact point of (..., 4) xywh boxes -> (..., 2).

    Matches reference _get_foot_position (yolov8_detector.py:229-241):
    (x + w/2, y + h).
    """
    x, y, w, h = jnp.split(boxes_xywh, 4, axis=-1)
    return jnp.concatenate([x + w / 2, y + h], axis=-1)


def center_xywh(boxes_xywh: Array) -> Array:
    x, y, w, h = jnp.split(boxes_xywh, 4, axis=-1)
    return jnp.concatenate([x + w / 2, y + h / 2], axis=-1)


def box_area_xyxy(boxes: Array) -> Array:
    w = jnp.maximum(boxes[..., 2] - boxes[..., 0], 0.0)
    h = jnp.maximum(boxes[..., 3] - boxes[..., 1], 0.0)
    return w * h


def iou_matrix_xyxy(a: Array, b: Array) -> Array:
    """Pairwise IoU: a (N, 4), b (M, 4) xyxy -> (N, M).

    One broadcasted expression: the TPU-native replacement for the reference's
    per-pair Python loop (similarity.py:191-220).
    """
    a = a[:, None, :]  # (N, 1, 4)
    b = b[None, :, :]  # (1, M, 4)
    lt = jnp.maximum(a[..., :2], b[..., :2])
    rb = jnp.minimum(a[..., 2:], b[..., 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    area_a = box_area_xyxy(a)
    area_b = box_area_xyxy(b)
    union = area_a + area_b - inter
    return jnp.where(union > 0, inter / union, 0.0)


def iou_matrix_xywh(a: Array, b: Array) -> Array:
    return iou_matrix_xyxy(xywh_to_xyxy(a), xywh_to_xyxy(b))


def iou_matrix_xywh_np(a, b):
    """Numpy IoU matrix for HOST-side tools (benchmarks, evaluation).

    Eval loops see a different (P, G) shape per image; routing them through
    jnp would dispatch (and compile) one tiny program per image on the
    accelerator — with a remote device that is seconds per image. Metrics
    are host code; keep them on the host.
    """
    import numpy as np

    a = np.asarray(a, np.float32).reshape(-1, 4)
    b = np.asarray(b, np.float32).reshape(-1, 4)
    ax0, ay0 = a[:, 0], a[:, 1]
    ax1, ay1 = a[:, 0] + a[:, 2], a[:, 1] + a[:, 3]
    bx0, by0 = b[:, 0], b[:, 1]
    bx1, by1 = b[:, 0] + b[:, 2], b[:, 1] + b[:, 3]
    lt_x = np.maximum(ax0[:, None], bx0[None, :])
    lt_y = np.maximum(ay0[:, None], by0[None, :])
    rb_x = np.minimum(ax1[:, None], bx1[None, :])
    rb_y = np.minimum(ay1[:, None], by1[None, :])
    inter = np.maximum(rb_x - lt_x, 0.0) * np.maximum(rb_y - lt_y, 0.0)
    area_a = np.maximum(ax1 - ax0, 0.0) * np.maximum(ay1 - ay0, 0.0)
    area_b = np.maximum(bx1 - bx0, 0.0) * np.maximum(by1 - by0, 0.0)
    union = area_a[:, None] + area_b[None, :] - inter
    # Guard the divide (not just the select): zero-area pairs would emit a
    # RuntimeWarning / trip np.seterr before np.where masks them.
    return np.where(union > 0, inter / np.maximum(union, 1e-12), 0.0).astype(
        np.float32
    )


def generalized_iou_xyxy(a: Array, b: Array) -> Array:
    """Pairwise GIoU (N, 4) x (M, 4) -> (N, M); used by the DETR matcher/loss."""
    iou = iou_matrix_xyxy(a, b)
    a_ = a[:, None, :]
    b_ = b[None, :, :]
    lt = jnp.minimum(a_[..., :2], b_[..., :2])
    rb = jnp.maximum(a_[..., 2:], b_[..., 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    enclose = wh[..., 0] * wh[..., 1]
    inter_lt = jnp.maximum(a_[..., :2], b_[..., :2])
    inter_rb = jnp.minimum(a_[..., 2:], b_[..., 2:])
    inter_wh = jnp.maximum(inter_rb - inter_lt, 0.0)
    inter = inter_wh[..., 0] * inter_wh[..., 1]
    union = box_area_xyxy(a_) + box_area_xyxy(b_) - inter
    return iou - jnp.where(enclose > 0, (enclose - union) / enclose, 0.0)


def nms_mask(boxes_xyxy: Array, scores: Array, iou_threshold: float, valid: Array | None = None) -> Array:
    """Greedy NMS as a fixed-shape mask op: (Q, 4), (Q,) -> (Q,) bool keep mask.

    The reference applies NMS in the generic detector contract
    (config.yaml.disabled:38 nms_threshold). Implemented as a static-length
    loop over score-sorted candidates — jit-friendly (no dynamic shapes).
    """
    Q = boxes_xyxy.shape[0]
    if valid is None:
        valid = jnp.ones((Q,), bool)
    order = jnp.argsort(-jnp.where(valid, scores, -jnp.inf))
    boxes_sorted = boxes_xyxy[order]
    valid_sorted = valid[order]
    iou = iou_matrix_xyxy(boxes_sorted, boxes_sorted)

    def body(i, keep):
        # Suppress j > i if IoU(i, j) > thr and i is kept.
        suppress = (iou[i] > iou_threshold) & keep[i] & valid_sorted[i]
        idx = jnp.arange(Q)
        suppress = suppress & (idx > i)
        return keep & ~suppress

    import jax

    keep_sorted = jax.lax.fori_loop(0, Q, body, valid_sorted)
    keep = jnp.zeros((Q,), bool).at[order].set(keep_sorted)
    return keep
