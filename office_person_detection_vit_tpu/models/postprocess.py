"""DETR output post-processing -> fixed-shape DetectionBatch.

Matches HF ``post_process_object_detection`` semantics (softmax over classes,
drop the no-object column, per-query argmax) plus the reference detector
contract: person-class filter (COCO id 1, reference yolov8_detector.py:107-120),
confidence threshold, cxcywh->pixel xywh, foot point (bottom-center,
:229-241). Everything stays fixed-shape (Q slots + valid mask) — padding is
stripped by the host serializer, never on device (SURVEY.md §7.4 item 2).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import Array

from ..core.dto import DetectionBatch
from ..ops import boxes as box_ops


@partial(jax.jit, static_argnames=("person_class_id", "score_mode"))
def postprocess_detr(
    logits: Array,  # (F, Q, C+1)
    pred_boxes: Array,  # (F, Q, 4) sigmoid cxcywh normalized
    orig_size: Array,  # (2,) = (width, height) of the original frames
    confidence_threshold: float | Array = 0.5,
    person_class_id: int = 1,
    score_mode: str = "softmax",
    nms_iou: float | None = None,
) -> DetectionBatch:
    if score_mode == "sigmoid":
        # Deformable-DETR focal head (criterion class_loss="focal"):
        # per-class sigmoid scores; the no-object column is untrained noise
        # and must be ignored, not competed against.
        probs = jax.nn.sigmoid(logits[..., :-1])
    else:
        probs = jax.nn.softmax(logits, axis=-1)[..., :-1]  # drop no-object
    scores = jnp.max(probs, axis=-1)
    labels = jnp.argmax(probs, axis=-1)

    w, h = orig_size[0], orig_size[1]
    scale = jnp.stack([w, h, w, h]).astype(jnp.float32)
    boxes_xyxy = box_ops.cxcywh_to_xyxy(pred_boxes) * scale[None, None, :]
    boxes_xywh = box_ops.xyxy_to_xywh(boxes_xyxy)

    valid = (labels == person_class_id) & (scores >= confidence_threshold)
    if nms_iou is not None:
        # Optional greedy NMS (reference detector contract nms_threshold,
        # config.yaml.disabled:38). Paper-scale DETR needs no NMS — its set
        # loss learns suppression — but the from-scratch reduced-scale tier
        # emits ~2 confident queries per object (measured: val precision
        # capped at ~0.47 with recall climbing, docs/training.md), so the
        # sigmoid/focal path exposes it as an opt-in.
        keep = jax.vmap(
            lambda b, s, v: box_ops.nms_mask(b, s, nms_iou, v)
        )(boxes_xyxy, scores, valid)
        valid = valid & keep
    foot = box_ops.foot_point_xywh(boxes_xywh)
    return DetectionBatch(
        boxes_xywh=boxes_xywh,
        scores=scores,
        valid=valid,
        foot=foot,
    )


@partial(jax.jit, static_argnames=("person_class_id", "score_mode"))
def person_scores(logits: Array, person_class_id: int = 1,
                  score_mode: str = "softmax") -> Array:
    """(F, Q, C+1) -> (F, Q) probability of the person class (softmax over
    the CE head, per-class sigmoid for the focal head)."""
    if score_mode == "sigmoid":
        return jax.nn.sigmoid(logits[..., person_class_id])
    probs = jax.nn.softmax(logits, axis=-1)
    return probs[..., person_class_id]
