"""DETR set criterion (Hungarian-matched losses), jit/SPMD-native.

Losses per the DETR recipe (arXiv:2005.12872 §3.1):
  * classification cross-entropy over ALL queries, matched queries getting
    their target label and the rest "no-object" (last class), with the
    no-object term down-weighted by eos_coef=0.1;
  * L1 + GIoU box losses on matched pairs only, normalized by the global
    number of target boxes (a jnp.sum over the batch — under pjit the
    data-axis psum is inserted by GSPMD, which is exactly the
    "normalize by num_boxes across workers" all_reduce in torch DETR).

Everything is fixed-shape: targets are (B, T) label / (B, T, 4) box /
(B, T) valid pytrees with padding, matching SURVEY.md §7.1 capacity+mask.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
from jax import Array

from ..ops.boxes import cxcywh_to_xyxy, generalized_iou_xyxy
from .matcher import batch_hungarian_match


@dataclass(frozen=True)
class CriterionConfig:
    num_classes: int = 91  # real classes; no-object index = num_classes
    eos_coef: float = 0.1
    w_class: float = 1.0
    w_bbox: float = 5.0
    w_giou: float = 2.0
    matcher_iters: int = 200


def detr_loss(
    logits: Array,       # (B, Q, C+1)
    pred_boxes: Array,   # (B, Q, 4) cxcywh in [0,1]
    tgt_labels: Array,   # (B, T) int32
    tgt_boxes: Array,    # (B, T, 4) cxcywh in [0,1]
    tgt_valid: Array,    # (B, T) bool
    config: CriterionConfig = CriterionConfig(),
) -> tuple[Array, dict[str, Array]]:
    """Total weighted loss + per-component metrics dict."""
    B, Q, _ = logits.shape
    T = tgt_labels.shape[1]
    logits = logits.astype(jnp.float32)
    pred_boxes = pred_boxes.astype(jnp.float32)

    match = batch_hungarian_match(
        logits, pred_boxes, tgt_labels, tgt_boxes, tgt_valid, config.matcher_iters
    )  # (B, T) query index per target

    # ---------------------------------------------------------- class loss
    no_object = config.num_classes
    # Scatter matched target labels onto the (B, Q) query-label canvas.
    # Padded target slots scatter to the out-of-range index Q so mode="drop"
    # discards them — mapping them to 0 would clobber a real label matched
    # to query 0 (duplicate-index scatter, last writer wins).
    classes = jnp.full((B, Q), no_object, jnp.int32)
    b_idx = jnp.arange(B)[:, None].repeat(T, axis=1)  # (B, T)
    scatter_q = jnp.where(tgt_valid, match, Q)
    classes = classes.at[b_idx, scatter_q].set(tgt_labels, mode="drop")
    safe_q = jnp.where(tgt_valid, match, 0)  # for box gathers only
    log_probs = jax.nn.log_softmax(logits, axis=-1)  # (B, Q, C+1)
    nll = -jnp.take_along_axis(log_probs, classes[..., None], axis=-1)[..., 0]
    weights = jnp.where(classes == no_object, config.eos_coef, 1.0)
    loss_class = jnp.sum(nll * weights) / jnp.maximum(jnp.sum(weights), 1.0)

    # ------------------------------------------------------------ box loss
    matched_boxes = jnp.take_along_axis(
        pred_boxes, safe_q[..., None], axis=1
    )  # (B, T, 4)
    validf = tgt_valid.astype(jnp.float32)
    num_boxes = jnp.maximum(jnp.sum(validf), 1.0)  # global (psum under pjit)
    l1 = jnp.sum(jnp.abs(matched_boxes - tgt_boxes), axis=-1)  # (B, T)
    loss_bbox = jnp.sum(l1 * validf) / num_boxes
    giou = jax.vmap(
        lambda a, b: jnp.diagonal(
            generalized_iou_xyxy(cxcywh_to_xyxy(a), cxcywh_to_xyxy(b))
        )
    )(tgt_boxes, matched_boxes)  # (B, T)
    loss_giou = jnp.sum((1.0 - giou) * validf) / num_boxes

    total = (
        config.w_class * loss_class
        + config.w_bbox * loss_bbox
        + config.w_giou * loss_giou
    )
    # Cardinality error (diagnostic, not a gradient path).
    pred_count = jnp.sum(
        (jnp.argmax(logits, axis=-1) != no_object).astype(jnp.float32), axis=1
    )
    card_err = jnp.mean(jnp.abs(pred_count - jnp.sum(validf, axis=1)))
    return total, {
        "loss": total,
        "loss_class": loss_class,
        "loss_bbox": loss_bbox,
        "loss_giou": loss_giou,
        "cardinality_error": card_err,
    }


def pack_targets(
    per_image_boxes: list[Any],
    per_image_labels: list[Any],
    capacity: int,
) -> tuple[Array, Array, Array]:
    """Ragged host targets -> fixed-shape (labels, boxes, valid) arrays."""
    import numpy as np

    B = len(per_image_boxes)
    labels = np.zeros((B, capacity), np.int32)
    boxes = np.zeros((B, capacity, 4), np.float32)
    valid = np.zeros((B, capacity), bool)
    for i, (bx, lb) in enumerate(zip(per_image_boxes, per_image_labels)):
        n = min(len(bx), capacity)
        if n:
            boxes[i, :n] = np.asarray(bx, np.float32)[:n]
            labels[i, :n] = np.asarray(lb, np.int32)[:n]
            valid[i, :n] = True
    return jnp.asarray(labels), jnp.asarray(boxes), jnp.asarray(valid)
