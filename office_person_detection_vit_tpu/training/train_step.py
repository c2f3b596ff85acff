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
from .criterion import CriterionConfig, detr_loss


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    step: jax.Array
    params: Any
    opt_state: Any

    @classmethod
    def create(cls, params: Any, tx: optax.GradientTransformation) -> "TrainState":
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=tx.init(params),
        )


def make_optimizer(
    learning_rate: float = 1e-4,
    backbone_lr: float = 1e-5,
    weight_decay: float = 1e-4,
    max_grad_norm: float = 0.1,
) -> optax.GradientTransformation:
    """AdamW with the DETR recipe: 10x lower backbone LR, grad clipping."""

    def lr_for(path, _leaf):
        is_backbone = any(
            getattr(k, "key", None) == "backbone" for k in path
        )
        return "backbone" if is_backbone else "main"

    def label_fn(params):
        return jax.tree_util.tree_map_with_path(lr_for, params)

    return optax.chain(
        optax.clip_by_global_norm(max_grad_norm),
        optax.multi_transform(
            {
                "main": optax.adamw(learning_rate, weight_decay=weight_decay),
                "backbone": optax.adamw(backbone_lr, weight_decay=weight_decay),
            },
            label_fn,
        ),
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
) -> Callable:
    """Jitted (state, batch, rng) -> (state, metrics) on the default device."""
    if criterion is None:
        criterion = CriterionConfig(num_classes=model.config.num_classes)

    @functools.partial(
        jax.jit, donate_argnums=_donate_argnums() if donate_state else ()
    )
    def train_step(state: TrainState, batch: dict, rng: jax.Array):
        (_, metrics), grads = jax.value_and_grad(_loss_fn, has_aux=True)(
            state.params, model, criterion,
            batch["pixels"], batch["pixel_mask"],
            batch["labels"], batch["boxes"], batch["valid"],
            rng, aux_loss,
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            TrainState(step=state.step + 1, params=params, opt_state=opt_state),
            metrics,
        )

    return train_step


def make_sharded_train_step(
    model: DETR,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    params_template: Any,
    criterion: CriterionConfig | None = None,
    aux_loss: bool = True,
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
    state_specs = TrainState(step=P(), params=pspecs, opt_state=opt_state_specs)

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
        (_, metrics), grads = jax.value_and_grad(_loss_fn, has_aux=True)(
            state.params, model, criterion,
            batch["pixels"], batch["pixel_mask"],
            batch["labels"], batch["boxes"], batch["valid"],
            rng, aux_loss,
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            TrainState(step=state.step + 1, params=params, opt_state=opt_state),
            metrics,
        )

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
