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
    #: "ce" = DETR softmax cross-entropy with eos down-weighting
    #: (arXiv:2005.12872 §3.1); "focal" = Deformable-DETR per-class sigmoid
    #: focal loss (arXiv:2010.04159 §4.1 — their w_class default is 2.0).
    #: Focal removes the eos blend attractor: the symmetric state where all
    #: queries predict the same matched/unmatched mixture is a *stationary
    #: point* of the eos-weighted CE (measured: every DETR-small run pinned
    #: loss_class at the blend optimum ~ln 2 for hundreds of epochs,
    #: docs/training.md "DETR beyond tiny"), while under per-class sigmoid
    #: focal the unmatched queries' gradient pushes monotonically to 0 and
    #: the (1-p)^gamma factor concentrates learning on the matched ones.
    class_loss: str = "ce"
    focal_alpha: float = 0.25
    focal_gamma: float = 2.0
    #: weight of the dense encoder-token objectness loss (applied only when
    #: the model emits ``enc_obj_logits`` — DETRConfig.enc_objectness). The
    #: two-stage Deformable-DETR keeps encoder losses at the class weight.
    w_enc_obj: float = 2.0


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
        logits, pred_boxes, tgt_labels, tgt_boxes, tgt_valid,
        config.matcher_iters, config.class_loss,
        config.focal_alpha, config.focal_gamma,
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
    validf = tgt_valid.astype(jnp.float32)
    num_boxes = jnp.maximum(jnp.sum(validf), 1.0)  # global (psum under pjit)

    if config.class_loss == "focal":
        # Deformable-DETR sigmoid focal (arXiv:2010.04159 §4.1): per-class
        # binary targets over the REAL classes only; the no-object logit is
        # unused (background = every sigmoid low). Normalization follows
        # their reference code — loss.mean(1).sum()/num_boxes * Q, where the
        # mean is over QUERIES, which cancels the *Q and reduces to the plain
        # total sum / num_boxes. (A mean over classes here would scale the
        # effective class weight by Q/C and invalidate the imported
        # w_class=2.0 default.)
        cls_logits = logits[..., :no_object]  # (B, Q, C)
        onehot = jax.nn.one_hot(classes, no_object, dtype=jnp.float32)
        bce = -(onehot * jax.nn.log_sigmoid(cls_logits)
                + (1.0 - onehot) * jax.nn.log_sigmoid(-cls_logits))
        p = jax.nn.sigmoid(cls_logits)
        p_t = p * onehot + (1.0 - p) * (1.0 - onehot)
        a_t = (config.focal_alpha * onehot
               + (1.0 - config.focal_alpha) * (1.0 - onehot))
        focal = a_t * (1.0 - p_t) ** config.focal_gamma * bce
        loss_class = jnp.sum(focal) / num_boxes
    else:
        log_probs = jax.nn.log_softmax(logits, axis=-1)  # (B, Q, C+1)
        nll = -jnp.take_along_axis(log_probs, classes[..., None], axis=-1)[..., 0]
        weights = jnp.where(classes == no_object, config.eos_coef, 1.0)
        loss_class = jnp.sum(nll * weights) / jnp.maximum(jnp.sum(weights), 1.0)

    # ------------------------------------------------------------ box loss
    matched_boxes = jnp.take_along_axis(
        pred_boxes, safe_q[..., None], axis=1
    )  # (B, T, 4)
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
    if config.class_loss == "focal":
        # No no-object logit in the focal head semantics: a query "fires"
        # when its best real-class sigmoid clears 0.5.
        fired = jnp.max(jax.nn.sigmoid(logits[..., :no_object]), axis=-1) > 0.5
        pred_count = jnp.sum(fired.astype(jnp.float32), axis=1)
    else:
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


def encoder_objectness_loss(
    enc_logits: Array,    # (B, fh*fw) f32
    feature_mask: Array,  # (B, fh, fw) bool, True = real (non-letterbox)
    tgt_boxes: Array,     # (B, T, 4) cxcywh normalized to the VALID area
    tgt_valid: Array,     # (B, T) bool
    config: CriterionConfig = CriterionConfig(),
) -> Array:
    """Dense token-level objectness: sigmoid focal loss against "a valid GT
    box covers this token's center", normalized by the global box count
    (same convention as the class loss). The two-stage Deformable-DETR /
    DINO encoder supervision (arXiv:2010.04159 §4.4), which gives the
    backbone/encoder a gradient that does not route through decoder
    cross-attention — the fix for the measured from-scratch blind-anchor
    basin (docs/training.md "DETR beyond tiny").

    GT boxes are normalized to the valid (letterboxed-content) area while
    the token grid spans the padded canvas, so token centers are mapped
    into content coordinates via the per-image valid-row/column fractions
    of ``feature_mask`` (bottom/right letterbox padding convention).
    """
    B, fh, fw = feature_mask.shape
    maskf = feature_mask.astype(jnp.float32)
    # Fraction of the grid that is real content along each axis.
    frac_y = jnp.clip(jnp.max(maskf, axis=2).sum(1) / fh, 1e-6)  # (B,)
    frac_x = jnp.clip(jnp.max(maskf, axis=1).sum(1) / fw, 1e-6)  # (B,)

    cy = (jnp.arange(fh, dtype=jnp.float32) + 0.5) / fh  # padded-normalized
    cx = (jnp.arange(fw, dtype=jnp.float32) + 0.5) / fw
    # Content-normalized token centers, per image: (B, fh) / (B, fw).
    ty = cy[None, :] / frac_y[:, None]
    tx = cx[None, :] / frac_x[:, None]

    x0 = tgt_boxes[..., 0] - tgt_boxes[..., 2] / 2  # (B, T)
    x1 = tgt_boxes[..., 0] + tgt_boxes[..., 2] / 2
    y0 = tgt_boxes[..., 1] - tgt_boxes[..., 3] / 2
    y1 = tgt_boxes[..., 1] + tgt_boxes[..., 3] / 2
    in_y = (ty[:, None, :] >= y0[..., None]) & (ty[:, None, :] <= y1[..., None])
    in_x = (tx[:, None, :] >= x0[..., None]) & (tx[:, None, :] <= x1[..., None])
    # (B, T, fh, fw) -> any valid box covering the token.
    covered = (
        in_y[:, :, :, None] & in_x[:, :, None, :] & tgt_valid[..., None, None]
    )
    target = jnp.any(covered, axis=1).reshape(B, fh * fw).astype(jnp.float32)

    logits = enc_logits.astype(jnp.float32)
    p = jax.nn.sigmoid(logits)
    bce = -(target * jax.nn.log_sigmoid(logits)
            + (1.0 - target) * jax.nn.log_sigmoid(-logits))
    p_t = p * target + (1.0 - p) * (1.0 - target)
    a_t = (config.focal_alpha * target
           + (1.0 - config.focal_alpha) * (1.0 - target))
    focal = a_t * (1.0 - p_t) ** config.focal_gamma * bce
    # Letterbox-padding tokens carry no signal — mask them out.
    focal = focal * feature_mask.reshape(B, fh * fw).astype(jnp.float32)
    num_boxes = jnp.maximum(jnp.sum(tgt_valid.astype(jnp.float32)), 1.0)
    return jnp.sum(focal) / num_boxes


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
