"""DETR training step — single-chip and mesh-sharded variants.

The reference fine-tunes its detector offline through ultralytics
(tools/train_yolov8.py:18-40); here fine-tuning is a first-class jitted
program: forward (with deep supervision over decoder layers) -> Hungarian
matching -> set losses -> AdamW, the whole step one XLA computation.

Scaling story (SURVEY.md §2.9): ``make_sharded_train_step`` jits the SAME
step over a (data, model) mesh — batch sharded over ``data``, transformer
params sharded per parallel/sharding.py TP rules — and GSPMD inserts the
gradient all-reduces / TP collectives. No NCCL analog, no hand-written
collectives.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable

import functools

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.detr import DETR, DETRConfig
from ..parallel.mesh import DATA_AXIS
from ..parallel.sharding import param_specs
from .criterion import CriterionConfig, detr_loss, encoder_objectness_loss


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    step: jax.Array
    params: Any
    opt_state: Any
    #: exponential moving average of params (None unless created with
    #: ``ema=True``); evaluation/serving should prefer it when present
    #: (the reference's ultralytics trainer keeps a ModelEMA by default).
    ema_params: Any = None

    @classmethod
    def create(
        cls,
        params: Any,
        tx: optax.GradientTransformation,
        ema: bool = False,
    ) -> "TrainState":
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=tx.init(params),
            ema_params=jax.tree_util.tree_map(jnp.array, params) if ema else None,
        )


def make_schedule(
    learning_rate: float,
    schedule: str | None = None,
    total_steps: int | None = None,
    warmup_steps: int = 0,
    drop_at: int | None = None,
    drop_factor: float = 0.1,
):
    """LR schedule factory.

    - ``None`` -> constant (optionally linear-warmed-up).
    - ``"cosine"`` -> linear warmup then cosine decay to 0 over
      ``total_steps`` (the ultralytics-style recipe).
    - ``"step"`` -> constant with a x``drop_factor`` drop at ``drop_at``
      (the DETR paper recipe: drop 10x at epoch 200/300).

    All counts (``total_steps``, ``warmup_steps``, ``drop_at``) are in the
    same units the schedule is stepped in — global steps, including
    during warmup (the drop of a warmed-up "step" schedule fires at
    global step ``drop_at``, not ``warmup_steps + drop_at``).
    """
    if schedule == "cosine":
        if total_steps is None:
            raise ValueError("cosine schedule requires total_steps")
        return optax.warmup_cosine_decay_schedule(
            init_value=0.0 if warmup_steps else learning_rate,
            peak_value=learning_rate,
            warmup_steps=max(1, warmup_steps),
            decay_steps=max(total_steps, warmup_steps + 1),
        )
    if schedule == "step":
        if drop_at is None:
            raise ValueError("step schedule requires drop_at")
        if warmup_steps and drop_at <= warmup_steps:
            raise ValueError("drop_at must exceed warmup_steps")
        # join_schedules passes (step - warmup_steps) to this schedule, so
        # shift the boundary to keep drop_at in global-step units.
        sched = optax.piecewise_constant_schedule(
            learning_rate, {int(drop_at) - warmup_steps: drop_factor}
        )
    elif schedule in (None, "none", "constant"):
        sched = learning_rate
    else:
        raise ValueError(f"unknown schedule: {schedule}")
    if warmup_steps:
        warm = optax.linear_schedule(0.0, learning_rate, warmup_steps)
        base = sched if callable(sched) else (lambda _v: (lambda s: _v))(sched)
        return optax.join_schedules([warm, base], [warmup_steps])
    return sched


def make_optimizer(
    learning_rate: float = 1e-4,
    backbone_lr: float = 1e-5,
    weight_decay: float = 1e-4,
    max_grad_norm: float = 0.1,
    schedule: str | None = None,
    total_steps: int | None = None,
    warmup_steps: int = 0,
    drop_at: int | None = None,
    drop_factor: float = 0.1,
    accum_steps: int = 1,
) -> optax.GradientTransformation:
    """AdamW with the DETR recipe: 10x lower backbone LR, grad clipping.

    ``schedule`` (see :func:`make_schedule`) applies to both groups with
    the backbone scaled by ``backbone_lr/learning_rate``. ``accum_steps>1``
    wraps the chain in ``optax.MultiSteps`` — gradients accumulate for k
    micro-batches and the update applies on the k-th (large effective
    batch on one chip; jit-native, no host logic).

    Schedule counts (``total_steps``/``warmup_steps``/``drop_at``) are in
    MICRO-steps — the steps the training loop actually takes. MultiSteps
    advances the inner schedule only on applied updates, so the counts are
    converted to applied-update units here; callers keep one unit
    regardless of accumulation.
    """

    def lr_for(path, _leaf):
        is_backbone = any(
            getattr(k, "key", None) == "backbone" for k in path
        )
        return "backbone" if is_backbone else "main"

    def label_fn(params):
        return jax.tree_util.tree_map_with_path(lr_for, params)

    def _applied(n):  # micro-step count -> applied-update count
        return None if n is None else max(1, round(n / accum_steps))

    sched_args = dict(
        schedule=schedule,
        total_steps=_applied(total_steps),
        warmup_steps=_applied(warmup_steps) if warmup_steps else 0,
        drop_at=_applied(drop_at),
        drop_factor=drop_factor,
    )
    tx = optax.chain(
        optax.clip_by_global_norm(max_grad_norm),
        optax.multi_transform(
            {
                "main": optax.adamw(
                    make_schedule(learning_rate, **sched_args),
                    weight_decay=weight_decay,
                ),
                "backbone": optax.adamw(
                    make_schedule(backbone_lr, **sched_args),
                    weight_decay=weight_decay,
                ),
            },
            label_fn,
        ),
    )
    if accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum_steps)
    return tx


def apply_update(
    state: TrainState,
    grads: Any,
    tx: optax.GradientTransformation,
    ema_decay: float | None = None,
) -> TrainState:
    """Optimizer update + optional EMA track — shared by every family's
    train step. Under ``optax.MultiSteps`` accumulation the EMA advances
    only on APPLIED updates (detected from ``mini_step`` wrapping to 0),
    so ``ema_decay`` means decay-per-update regardless of ``accum_steps``
    — micro-steps leave both params and EMA untouched."""
    if ema_decay is not None and state.ema_params is None:
        # Fail at trace time, not silently: a caller that asked for EMA but
        # created the state without ema=True would otherwise train believing
        # the average is tracked and later serve raw weights (ADVICE r2).
        raise ValueError(
            "ema_decay was requested but the TrainState carries no "
            "ema_params; create it with TrainState.create(..., ema=True)"
        )
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    ema = state.ema_params
    if ema_decay is not None and ema is not None:
        d = jnp.asarray(ema_decay, jnp.float32)
        mini_step = getattr(opt_state, "mini_step", None)
        if mini_step is not None:  # MultiSteps: decay 1.0 on micro-steps
            d = jnp.where(mini_step == 0, d, 1.0)
        ema = jax.tree_util.tree_map(
            lambda e, p: (e * d + (1.0 - d) * p.astype(e.dtype)), ema, params
        )
    return TrainState(
        step=state.step + 1, params=params, opt_state=opt_state, ema_params=ema
    )


def _loss_fn(
    params: Any,
    model: DETR,
    criterion: CriterionConfig,
    pixels: jax.Array,
    pixel_mask: jax.Array,
    tgt_labels: jax.Array,
    tgt_boxes: jax.Array,
    tgt_valid: jax.Array,
    rng: jax.Array,
    aux_loss: bool,
) -> tuple[jax.Array, dict[str, jax.Array]]:
    out = model.apply(
        {"params": params},
        pixels,
        pixel_mask,
        deterministic=False,
        return_aux=aux_loss,
        rngs={"dropout": rng},
    )
    total, metrics = detr_loss(
        out["logits"], out["boxes"], tgt_labels, tgt_boxes, tgt_valid, criterion
    )
    if aux_loss:
        # Deep supervision: same matched loss at every intermediate decoder
        # layer (DETR paper §3.2). scan over the layer axis keeps one
        # compiled body regardless of depth.
        def layer_loss(carry, layer_out):
            lg, bx = layer_out
            t, _ = detr_loss(lg, bx, tgt_labels, tgt_boxes, tgt_valid, criterion)
            return carry + t, None

        aux_total, _ = jax.lax.scan(
            layer_loss, jnp.zeros((), jnp.float32),
            (out["aux_logits"], out["aux_boxes"]),
        )
        total = total + aux_total
        metrics["loss_aux"] = aux_total
        metrics["loss"] = total
    if "enc_obj_logits" in out:
        # Dense encoder supervision (DETRConfig.enc_objectness): gradient
        # into the backbone/encoder that bypasses decoder cross-attention.
        enc = encoder_objectness_loss(
            out["enc_obj_logits"], out["feature_mask"],
            tgt_boxes, tgt_valid, criterion,
        )
        total = total + criterion.w_enc_obj * enc
        metrics["loss_enc_obj"] = enc
        metrics["loss"] = total
    return total, metrics


def _donate_argnums() -> tuple[int, ...]:
    """Donate the input TrainState's buffers to the output state so params +
    optimizer state are not held twice in HBM during the step (~3x param
    bytes saved at peak). CPU ignores
    donation with a warning, so only request it on accelerators."""
    import jax as _jax

    return (0,) if _jax.default_backend() != "cpu" else ()


def make_train_step(
    model: DETR,
    tx: optax.GradientTransformation,
    criterion: CriterionConfig | None = None,
    aux_loss: bool = True,
    donate_state: bool = True,
    ema_decay: float | None = None,
    augment: "AugmentConfig | None" = None,
) -> Callable:
    """Jitted (state, batch, rng) -> (state, metrics) on the default device.

    ``ema_decay`` requires a state created with ``TrainState.create(...,
    ema=True)``. ``augment`` fuses on-device augmentation (training/
    augment.py) into the step.
    """
    if criterion is None:
        criterion = CriterionConfig(num_classes=model.config.num_classes)

    @functools.partial(
        jax.jit, donate_argnums=_donate_argnums() if donate_state else ()
    )
    def train_step(state: TrainState, batch: dict, rng: jax.Array):
        if augment is not None:
            from .augment import augment_batch

            rng, k_aug = jax.random.split(rng)
            batch = augment_batch(k_aug, batch, augment)
        (_, metrics), grads = jax.value_and_grad(_loss_fn, has_aux=True)(
            state.params, model, criterion,
            batch["pixels"], batch["pixel_mask"],
            batch["labels"], batch["boxes"], batch["valid"],
            rng, aux_loss,
        )
        return apply_update(state, grads, tx, ema_decay), metrics

    return train_step


def make_sharded_train_step(
    model: DETR,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    params_template: Any,
    criterion: CriterionConfig | None = None,
    aux_loss: bool = True,
    ema_decay: float | None = None,
    augment: "AugmentConfig | None" = None,
) -> Callable:
    """The same step jitted over the (data, model) mesh.

    in_shardings: TrainState params/opt_state per TP rules, batch over
    ``data``. Collectives (grad all-reduce over data, TP psums over model)
    are derived by GSPMD from these annotations alone.
    """
    if criterion is None:
        criterion = CriterionConfig(num_classes=model.config.num_classes)

    pspecs = param_specs(params_template)
    opt_state_specs = _opt_state_specs(tx, params_template, pspecs)
    state_specs = TrainState(
        step=P(), params=pspecs, opt_state=opt_state_specs,
        # EMA params shard exactly like params (present only when enabled).
        ema_params=pspecs if ema_decay is not None else None,
    )

    batch_specs = {
        "pixels": P(DATA_AXIS),
        "pixel_mask": P(DATA_AXIS),
        "labels": P(DATA_AXIS),
        "boxes": P(DATA_AXIS),
        "valid": P(DATA_AXIS),
    }

    def _shard(tree, specs):
        return jax.tree_util.tree_map(
            lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), tree, specs
        )

    def step_fn(state: TrainState, batch: dict, rng: jax.Array):
        if augment is not None:
            from .augment import augment_batch

            rng, k_aug = jax.random.split(rng)
            batch = augment_batch(k_aug, batch, augment)
        (_, metrics), grads = jax.value_and_grad(_loss_fn, has_aux=True)(
            state.params, model, criterion,
            batch["pixels"], batch["pixel_mask"],
            batch["labels"], batch["boxes"], batch["valid"],
            rng, aux_loss,
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


def _opt_state_specs(
    tx: optax.GradientTransformation, params_template: Any, pspecs: Any
) -> Any:
    """PartitionSpecs for the optax state: per-param moment trees inherit
    the param's spec; everything else replicates."""
    opt_shape = jax.eval_shape(tx.init, params_template)
    param_tree_def = jax.tree_util.tree_structure(params_template)

    def walk(node):
        # A subtree whose structure matches the param tree (Adam mu/nu,
        # trace, ...) inherits the param specs wholesale.
        try:
            if jax.tree_util.tree_structure(node) == param_tree_def:
                return pspecs
        except Exception:
            pass
        if isinstance(node, tuple) and hasattr(node, "_fields"):  # NamedTuple
            return type(node)(*(walk(c) for c in node))
        if isinstance(node, (list, tuple)):
            return type(node)(walk(c) for c in node)
        if isinstance(node, dict):
            return {k: walk(v) for k, v in node.items()}
        return P()

    return walk(opt_shape)
