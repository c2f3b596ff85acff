"""YOLOv8 training loss — the trainable path for the YOLO family
(models/yolo.py), mirroring what the reference's ultralytics fine-tune did
for its shipping detector (reference tools/train_yolov8.py:18-40).

Losses are the YOLOv8 triple:
  * BCE on class logits,
  * CIoU on the DFL-decoded boxes,
  * Distribution Focal Loss on the per-side distance distributions
    (cross-entropy against the two integer bins bracketing the true
    distance — Li et al. 2020, the signature YOLOv8 regression loss).

Assignment uses the same vectorized center-sampling + per-level size-range
rule as the FCOS criterion (ssd_criterion.assign_targets) — a documented
simplification of ultralytics' task-aligned assigner (TAL ranks candidates
by cls^a * IoU^b; center sampling is its warmup prior and keeps the whole
criterion shape-static and jit-friendly).

Fully vectorized, GSPMD-friendly (plain sums; pjit inserts the data-axis
all-reduces), same TrainState/batch contract as the DETR and SSD steps.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
from jax import Array

from ..models.yolo import dfl_expectation
from .ssd_criterion import _bce, assign_targets


@dataclass(frozen=True)
class YOLOCriterionConfig:
    strides: tuple[int, ...] = (8, 16, 32)
    reg_max: int = 16
    center_radius: float = 1.5
    # ultralytics default loss gains (box=7.5, cls=0.5, dfl=1.5).
    w_box: float = 7.5
    w_cls: float = 0.5
    w_dfl: float = 1.5

    def size_ranges(self) -> list[tuple[float, float]]:
        bounds = [8.0 * s for s in self.strides[:-1]]
        lows = [0.0] + bounds
        highs = bounds + [float("inf")]
        return list(zip(lows, highs))


def ciou(px: Array, gx: Array) -> Array:
    """Complete IoU (Zheng et al. 2020) between xyxy boxes, elementwise on
    broadcastable leading dims. Returns CIoU in [-1.5, 1]."""
    px0, py0, px1, py1 = (px[..., i] for i in range(4))
    gx0, gy0, gx1, gy1 = (gx[..., i] for i in range(4))
    ix0 = jnp.maximum(px0, gx0)
    iy0 = jnp.maximum(py0, gy0)
    ix1 = jnp.minimum(px1, gx1)
    iy1 = jnp.minimum(py1, gy1)
    inter = jnp.clip(ix1 - ix0, 0) * jnp.clip(iy1 - iy0, 0)
    pw = jnp.clip(px1 - px0, 0)
    ph = jnp.clip(py1 - py0, 0)
    gw = jnp.clip(gx1 - gx0, 0)
    gh = jnp.clip(gy1 - gy0, 0)
    union = pw * ph + gw * gh - inter
    iou = inter / jnp.maximum(union, 1e-9)
    # Enclosing-box diagonal and center distance.
    cw = jnp.maximum(px1, gx1) - jnp.minimum(px0, gx0)
    chh = jnp.maximum(py1, gy1) - jnp.minimum(py0, gy0)
    c2 = cw * cw + chh * chh + 1e-9
    rho2 = ((px0 + px1 - gx0 - gx1) ** 2 + (py0 + py1 - gy0 - gy1) ** 2) / 4.0
    # Aspect-ratio consistency term.
    v = (4.0 / jnp.pi**2) * (
        jnp.arctan(gw / jnp.maximum(gh, 1e-9))
        - jnp.arctan(pw / jnp.maximum(ph, 1e-9))
    ) ** 2
    alpha = v / jnp.maximum(1.0 - iou + v, 1e-9)
    alpha = jax.lax.stop_gradient(alpha)
    return iou - rho2 / c2 - alpha * v


def dfl_loss(box_dist: Array, target: Array) -> Array:
    """Distribution focal loss for ONE side set: ``box_dist``
    (..., 4, reg_max) logits, ``target`` (..., 4) distances in cell units
    already clipped to [0, reg_max - 1 - eps]. Returns (..., 4)."""
    logp = jax.nn.log_softmax(box_dist, axis=-1)
    tl = jnp.floor(target).astype(jnp.int32)
    tr = tl + 1
    wl = tr.astype(jnp.float32) - target
    wr = target - tl.astype(jnp.float32)
    reg_max = box_dist.shape[-1]
    pick = lambda idx: jnp.take_along_axis(  # noqa: E731
        logp, jnp.clip(idx, 0, reg_max - 1)[..., None], axis=-1
    )[..., 0]
    return -(wl * pick(tl) + wr * pick(tr))


def _level_loss(level, tgt_labels, tgt_boxes, tgt_valid, input_hw, stride,
                size_range, config: YOLOCriterionConfig,
                content_hw: tuple[int, int] | None = None):
    cls = level["class_logits"]   # (B, fh, fw, C)
    box_dist = level["box_dist"]  # (B, fh, fw, 4*reg_max)
    B, fh, fw, C = cls.shape
    # Normalized GT scales by the letterboxed valid-content extent; the
    # anchor grid spans the full canvas (see ssd_criterion.assign_targets).
    ih, iw = content_hw if content_hw is not None else input_hw
    R = config.reg_max

    pos, box_idx = jax.vmap(
        lambda tb, tv: assign_targets(
            tb, tv, (fh, fw), input_hw, config.center_radius, stride,
            size_range, content_hw,
        )
    )(tgt_boxes, tgt_valid)  # (B, fh, fw)
    posf = pos.astype(jnp.float32)
    num_pos = jnp.sum(posf)

    # Classification: BCE over all cells, one-hot targets on positives.
    assigned_labels = jnp.take_along_axis(
        tgt_labels, box_idx.reshape(B, -1), axis=1
    ).reshape(B, fh, fw)
    onehot = jax.nn.one_hot(jnp.clip(assigned_labels - 1, 0, C - 1), C) * posf[..., None]
    sum_cls = jnp.sum(_bce(cls, onehot))

    # Assigned GT boxes in input pixels (xyxy).
    gb = jnp.take_along_axis(
        tgt_boxes, box_idx.reshape(B, -1, 1), axis=1
    ).reshape(B, fh, fw, 4)
    gx0 = (gb[..., 0] - gb[..., 2] / 2) * iw
    gy0 = (gb[..., 1] - gb[..., 3] / 2) * ih
    gx1 = (gb[..., 0] + gb[..., 2] / 2) * iw
    gy1 = (gb[..., 1] + gb[..., 3] / 2) * ih
    gxyxy = jnp.stack([gx0, gy0, gx1, gy1], axis=-1)

    # DFL-decoded predicted boxes (cell units -> pixels).
    ltrb = dfl_expectation(box_dist, R)  # (B, fh, fw, 4)
    cx = (jnp.arange(fw, dtype=jnp.float32) + 0.5)[None, None, :]
    cy = (jnp.arange(fh, dtype=jnp.float32) + 0.5)[None, :, None]
    pxyxy = jnp.stack(
        [
            (cx - ltrb[..., 0]) * stride,
            (cy - ltrb[..., 1]) * stride,
            (cx + ltrb[..., 2]) * stride,
            (cy + ltrb[..., 3]) * stride,
        ],
        axis=-1,
    )
    sum_box = jnp.sum((1.0 - ciou(pxyxy, gxyxy)) * posf)

    # DFL targets: true distances anchor->GT sides in cell units.
    tgt_ltrb = jnp.stack(
        [
            cx - gx0 / stride,
            cy - gy0 / stride,
            gx1 / stride - cx,
            gy1 / stride - cy,
        ],
        axis=-1,
    )
    tgt_ltrb = jnp.clip(tgt_ltrb, 0.0, R - 1 - 0.01)
    per_side = dfl_loss(
        box_dist.reshape(B, fh, fw, 4, R), tgt_ltrb
    )  # (B, fh, fw, 4)
    sum_dfl = jnp.sum(jnp.mean(per_side, axis=-1) * posf)

    return sum_cls, sum_box, sum_dfl, num_pos


def yolo_loss(
    outputs: dict,      # {"levels": [{box_dist, class_logits}, ...]}
    tgt_labels: Array,  # (B, T) int32 (1-based ids; 0 allowed = background)
    tgt_boxes: Array,   # (B, T, 4) cxcywh normalized
    tgt_valid: Array,   # (B, T)
    input_hw: tuple[int, int],
    config: YOLOCriterionConfig = YOLOCriterionConfig(),
    content_hw: tuple[int, int] | None = None,
) -> tuple[Array, dict[str, Array]]:
    sums = [
        _level_loss(level, tgt_labels, tgt_boxes, tgt_valid, input_hw,
                    stride, size_range, config, content_hw)
        for level, stride, size_range in zip(
            outputs["levels"], config.strides, config.size_ranges()
        )
    ]
    num_pos = jnp.maximum(sum(s[3] for s in sums), 1.0)
    loss_cls = sum(s[0] for s in sums) / num_pos
    loss_box = sum(s[1] for s in sums) / num_pos
    loss_dfl = sum(s[2] for s in sums) / num_pos
    total = (
        config.w_cls * loss_cls + config.w_box * loss_box + config.w_dfl * loss_dfl
    )
    return total, {
        "loss": total,
        "loss_cls": loss_cls,
        "loss_box": loss_box,
        "loss_dfl": loss_dfl,
        "num_pos": num_pos,
    }


def _make_loss_fn(model, input_hw, config, content_hw=None):
    def loss_fn(params, batch):
        out = model.apply({"params": params}, batch["pixels"], deterministic=True)
        return yolo_loss(
            out, batch["labels"], batch["boxes"], batch["valid"], input_hw,
            config, content_hw,
        )

    return loss_fn


def make_yolo_train_step(model, tx, input_hw: tuple[int, int], config=None,
                         ema_decay=None, augment=None,
                         content_hw: tuple[int, int] | None = None):
    """Jitted (state, batch, rng) -> (state, metrics) — same contract as
    make_ssd_train_step / the DETR step (incl. optional EMA + fused
    on-device augmentation). ``content_hw``: the letterboxed valid-content
    extent GT boxes are normalized to — pass it whenever training frames
    are letterboxed into ``input_hw``."""
    from .train_step import TrainState, apply_update

    if config is None:
        config = YOLOCriterionConfig(
            strides=model.config.strides, reg_max=model.config.reg_max
        )
    loss_fn = _make_loss_fn(model, input_hw, config, content_hw)

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


def make_yolo_sharded_train_step(model, tx, mesh, params_template,
                                 input_hw: tuple[int, int], config=None,
                                 ema_decay=None, augment=None,
                                 content_hw: tuple[int, int] | None = None):
    """The same step jitted over the device mesh — pure data parallelism
    (the conv param tree matches no TP rule, so parallel/sharding.py
    replicates it; GSPMD derives the gradient all-reduce over ``data``
    from the batch sharding alone). Exposes ``.shard_state`` /
    ``.shard_batch`` like make_sharded_train_step."""
    from functools import partial

    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..parallel.mesh import DATA_AXIS
    from ..parallel.sharding import param_specs
    from .train_step import (
        TrainState,
        _donate_argnums,
        _opt_state_specs,
        apply_update,
    )

    if config is None:
        config = YOLOCriterionConfig(
            strides=model.config.strides, reg_max=model.config.reg_max
        )
    loss_fn = _make_loss_fn(model, input_hw, config, content_hw)

    pspecs = param_specs(params_template)
    opt_specs = _opt_state_specs(tx, params_template, pspecs)
    state_specs = TrainState(
        step=P(), params=pspecs, opt_state=opt_specs,
        ema_params=pspecs if ema_decay is not None else None,
    )
    batch_specs = {
        "pixels": P(DATA_AXIS),
        "labels": P(DATA_AXIS),
        "boxes": P(DATA_AXIS),
        "valid": P(DATA_AXIS),
    }

    def _shard(tree, specs):
        return jax.tree_util.tree_map(
            lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), tree, specs
        )

    def step_fn(state: TrainState, batch: dict, rng):
        if augment is not None:
            from .augment import augment_batch

            rng, k_aug = jax.random.split(rng)
            batch = augment_batch(k_aug, batch, augment)
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch
        )
        return apply_update(state, grads, tx, ema_decay), metrics

    jitted = jax.jit(
        step_fn,
        donate_argnums=_donate_argnums(),
        in_shardings=(
            jax.tree_util.tree_map(
                lambda s: NamedSharding(mesh, s), state_specs,
                is_leaf=lambda x: isinstance(x, P),
            ),
            {k: NamedSharding(mesh, v) for k, v in batch_specs.items()},
            NamedSharding(mesh, P()),
        ),
        out_shardings=(
            jax.tree_util.tree_map(
                lambda s: NamedSharding(mesh, s), state_specs,
                is_leaf=lambda x: isinstance(x, P),
            ),
            NamedSharding(mesh, P()),
        ),
    )
    jitted.shard_state = partial(_shard, specs=state_specs)  # type: ignore[attr-defined]
    jitted.shard_batch = partial(_shard, specs=batch_specs)  # type: ignore[attr-defined]
    return jitted
