"""FCOS-style training loss for the single-shot detector
(models/single_shot.py) — the trainable path for the alternate detector
family (the reference fine-tuned its alternate detector via ultralytics,
tools/train_yolov8.py; here it is a jitted criterion like the DETR one).

Anchor-free center-sampling assignment, fully vectorized:
  * a grid cell is positive for a GT box if the cell center falls inside
    the box's central region (center_radius * stride);
  * overlapping GTs resolve to the smallest-area box (FCOS rule);
  * losses: BCE on objectness over all cells (positives=1), BCE on class
    scores and IoU loss on the (l,t,r,b) regression over positive cells,
    normalized by the global positive count (GSPMD-friendly sum).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
from jax import Array


@dataclass(frozen=True)
class SSDCriterionConfig:
    strides: tuple[int, ...] = (8, 16, 32)
    center_radius: float = 1.5
    w_obj: float = 1.0
    w_cls: float = 1.0
    w_iou: float = 2.0

    def size_ranges(self) -> list[tuple[float, float]]:
        """FCOS-style per-level object-size gates on max(w, h) in pixels:
        finest level takes small boxes, coarsest takes the rest."""
        bounds = [8.0 * s for s in self.strides[:-1]]
        lows = [0.0] + bounds
        highs = bounds + [float("inf")]
        return list(zip(lows, highs))


def _bce(logits: Array, targets: Array) -> Array:
    return jnp.maximum(logits, 0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )


def assign_targets(
    tgt_boxes: Array,   # (T, 4) cxcywh normalized [0,1]
    tgt_valid: Array,   # (T,)
    grid_hw: tuple[int, int],
    input_hw: tuple[int, int],
    center_radius: float,
    stride: int,
    size_range: tuple[float, float] = (0.0, float("inf")),
    content_hw: tuple[int, int] | None = None,
):
    """Per-cell assignment for ONE image. Returns (pos (fh,fw) bool,
    box_idx (fh,fw) int32 — index of the assigned GT).

    ``content_hw`` is the letterboxed valid-content extent: normalized GT
    boxes map to ``content_hw`` pixels (the region the image actually
    occupies after an aspect-preserving resize into ``input_hw``), while
    the anchor grid spans the full ``input_hw`` canvas. Defaults to
    ``input_hw`` (no letterbox padding)."""
    fh, fw = grid_hw
    ih, iw = content_hw if content_hw is not None else input_hw
    cy = (jnp.arange(fh, dtype=jnp.float32) + 0.5) * stride  # pixels
    cx = (jnp.arange(fw, dtype=jnp.float32) + 0.5) * stride
    gcx = tgt_boxes[:, 0] * iw   # (T,)
    gcy = tgt_boxes[:, 1] * ih
    gw = tgt_boxes[:, 2] * iw
    gh = tgt_boxes[:, 3] * ih

    # (T, fh, fw): center-sampling region AND inside the box AND the box's
    # size belongs on this pyramid level.
    dx = jnp.abs(cx[None, None, :] - gcx[:, None, None])
    dy = jnp.abs(cy[None, :, None] - gcy[:, None, None])
    in_center = (dx <= center_radius * stride) & (dy <= center_radius * stride)
    in_box = (dx <= gw[:, None, None] / 2) & (dy <= gh[:, None, None] / 2)
    max_side = jnp.maximum(gw, gh)  # (T,)
    lo, hi = size_range
    in_range = (max_side > lo) & (max_side <= hi)
    candidate = (
        in_center & in_box & (tgt_valid & in_range)[:, None, None]
    )

    area = jnp.where(tgt_valid, gw * gh, jnp.inf)  # (T,)
    # Smallest-area GT wins each cell.
    cell_area = jnp.where(candidate, area[:, None, None], jnp.inf)  # (T, fh, fw)
    box_idx = jnp.argmin(cell_area, axis=0)  # (fh, fw)
    pos = jnp.any(candidate, axis=0)
    return pos, box_idx


def _level_loss(
    level: dict,
    tgt_labels: Array,
    tgt_boxes: Array,
    tgt_valid: Array,
    input_hw: tuple[int, int],
    stride: int,
    size_range: tuple[float, float],
    config: SSDCriterionConfig,
    content_hw: tuple[int, int] | None = None,
):
    """Unnormalized loss sums + positive count for ONE pyramid level."""
    obj = level["objectness"]        # (B, fh, fw)
    cls = level["class_logits"]      # (B, fh, fw, C)
    ltrb = level["ltrb"]             # (B, fh, fw, 4) stride units, >=0
    B, fh, fw = obj.shape
    C = cls.shape[-1]
    # Normalized GT scales by the valid-content extent (see assign_targets).
    ih, iw = content_hw if content_hw is not None else input_hw

    pos, box_idx = jax.vmap(
        lambda tb, tv: assign_targets(
            tb, tv, (fh, fw), input_hw, config.center_radius, stride,
            size_range, content_hw,
        )
    )(tgt_boxes, tgt_valid)  # (B, fh, fw) bool / int32

    posf = pos.astype(jnp.float32)
    num_pos = jnp.sum(posf)

    sum_obj = jnp.sum(_bce(obj, posf))

    assigned_labels = jnp.take_along_axis(
        tgt_labels, box_idx.reshape(B, -1), axis=1
    ).reshape(B, fh, fw)
    onehot = jax.nn.one_hot(jnp.clip(assigned_labels - 1, 0, C - 1), C)
    sum_cls = jnp.sum(_bce(cls, onehot) * posf[..., None])

    cy = (jnp.arange(fh, dtype=jnp.float32) + 0.5) * stride
    cx = (jnp.arange(fw, dtype=jnp.float32) + 0.5) * stride
    l, t, r, b = (ltrb[..., i] * stride for i in range(4))
    px0 = cx[None, None, :] - l
    py0 = cy[None, :, None] - t
    px1 = cx[None, None, :] + r
    py1 = cy[None, :, None] + b

    gb = jnp.take_along_axis(
        tgt_boxes, box_idx.reshape(B, -1, 1), axis=1
    ).reshape(B, fh, fw, 4)
    gx0 = (gb[..., 0] - gb[..., 2] / 2) * iw
    gy0 = (gb[..., 1] - gb[..., 3] / 2) * ih
    gx1 = (gb[..., 0] + gb[..., 2] / 2) * iw
    gy1 = (gb[..., 1] + gb[..., 3] / 2) * ih

    ix0 = jnp.maximum(px0, gx0)
    iy0 = jnp.maximum(py0, gy0)
    ix1 = jnp.minimum(px1, gx1)
    iy1 = jnp.minimum(py1, gy1)
    inter = jnp.clip(ix1 - ix0, 0) * jnp.clip(iy1 - iy0, 0)
    area_p = jnp.clip(px1 - px0, 0) * jnp.clip(py1 - py0, 0)
    area_g = jnp.clip(gx1 - gx0, 0) * jnp.clip(gy1 - gy0, 0)
    iou = inter / jnp.maximum(area_p + area_g - inter, 1e-9)
    sum_iou = jnp.sum((1.0 - iou) * posf)
    return sum_obj, sum_cls, sum_iou, num_pos


def ssd_loss(
    outputs: dict,      # {"levels": [per-level raw head outputs], ...}
    tgt_labels: Array,  # (B, T) int32 (1-based class ids; 0 allowed)
    tgt_boxes: Array,   # (B, T, 4) cxcywh normalized
    tgt_valid: Array,   # (B, T)
    input_hw: tuple[int, int],
    config: SSDCriterionConfig = SSDCriterionConfig(),
    content_hw: tuple[int, int] | None = None,
) -> tuple[Array, dict[str, Array]]:
    """Multi-level FCOS loss: per-level sums, normalized by the GLOBAL
    positive count (a plain sum — GSPMD inserts the data-axis all-reduce
    under pjit). ``content_hw``: letterboxed valid-content extent the
    normalized GT boxes refer to (default: the full canvas)."""
    levels = outputs["levels"]
    sums = [
        _level_loss(level, tgt_labels, tgt_boxes, tgt_valid, input_hw,
                    stride, size_range, config, content_hw)
        for level, stride, size_range in zip(
            levels, config.strides, config.size_ranges()
        )
    ]
    num_pos = jnp.maximum(sum(s[3] for s in sums), 1.0)
    loss_obj = sum(s[0] for s in sums) / num_pos
    loss_cls = sum(s[1] for s in sums) / num_pos
    loss_iou = sum(s[2] for s in sums) / num_pos

    total = (
        config.w_obj * loss_obj + config.w_cls * loss_cls + config.w_iou * loss_iou
    )
    return total, {
        "loss": total,
        "loss_obj": loss_obj,
        "loss_cls": loss_cls,
        "loss_iou": loss_iou,
        "num_pos": num_pos,
    }


def make_ssd_train_step(model, tx, input_hw: tuple[int, int], config=None,
                        ema_decay=None, augment=None,
                        content_hw: tuple[int, int] | None = None):
    """Jitted (state, batch, rng) -> (state, metrics) for the single-shot
    detector (same TrainState/batch contract as the DETR step, incl.
    optional EMA + fused on-device augmentation). ``content_hw``: the
    letterboxed valid-content extent GT boxes are normalized to — pass it
    whenever training frames are letterboxed into ``input_hw``."""
    from .train_step import TrainState, apply_update

    if config is None:
        config = SSDCriterionConfig(strides=model.config.strides)

    def loss_fn(params, batch):
        out = model.apply({"params": params}, batch["pixels"], deterministic=True)
        return ssd_loss(
            out, batch["labels"], batch["boxes"], batch["valid"], input_hw,
            config, content_hw,
        )

    @jax.jit
    def step(state: TrainState, batch: dict, rng):
        if augment is not None:
            from .augment import augment_batch

            rng, k_aug = jax.random.split(rng)
            batch = augment_batch(k_aug, batch, augment)
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch
        )
        return apply_update(state, grads, tx, ema_decay), metrics

    return step
