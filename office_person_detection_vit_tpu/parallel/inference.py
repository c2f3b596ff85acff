"""Mesh-sharded batched detection (SURVEY.md §2.9 "Data parallelism: shard
the frame batch across chips — the natural analog of the reference's frame
loop").

``make_sharded_detect`` jits the detector's fused preprocess->DETR->
postprocess program over a (data, model) mesh: the frame batch splits over
``data`` (each chip detects its shard), params are replicated (or TP-sharded
over ``model`` via parallel/sharding.py rules). GSPMD handles the rest; on a
1-device mesh this degrades to the single-chip program.
"""

from __future__ import annotations

from typing import Callable

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.detr import DETR
from ..models.postprocess import postprocess_detr
from ..ops.preprocessing import preprocess_frames
from .mesh import DATA_AXIS
from .sharding import param_specs


def detect_shardings(
    mesh: Mesh, variables, tensor_parallel: bool = False
) -> tuple:
    """(var_shardings, data_sharding, replicated) for the detect program.

    ``var_shardings`` is the variables pytree mapped to NamedShardings:
    TP-partitioned via parallel/sharding.py rules when ``tensor_parallel``,
    fully replicated otherwise. ``data_sharding`` shards a leading frame
    axis over the ``data`` mesh axis. Shared by :func:`make_sharded_detect`
    and the product detector (detection/detector.py) so the pipeline and the
    bare API build identical programs.
    """
    if tensor_parallel:
        pspecs = param_specs(variables)
        var_shardings = jax.tree_util.tree_map(
            lambda s: NamedSharding(mesh, s), pspecs,
            is_leaf=lambda x: isinstance(x, P),
        )
    else:
        var_shardings = jax.tree_util.tree_map(
            lambda _: NamedSharding(mesh, P()), variables
        )
    return (
        var_shardings,
        NamedSharding(mesh, P(DATA_AXIS)),
        NamedSharding(mesh, P()),
    )


def make_sharded_detect(
    model: DETR,
    mesh: Mesh,
    variables,
    target_hw: tuple[int, int],
    confidence_threshold: float,
    tensor_parallel: bool = False,
) -> Callable:
    """Returns jitted fn(variables, frames_u8 (F,H,W,3), orig_wh) ->
    DetectionBatch with F sharded over the data axis (F must divide by the
    data-axis size)."""
    person = model.config.person_class_id
    var_shardings, data_sharding, replicated_s = detect_shardings(
        mesh, variables, tensor_parallel
    )

    def detect(variables, frames_u8, orig_wh):
        pixels, mask = preprocess_frames(
            frames_u8, target_hw=target_hw, out_dtype=model.config.jnp_dtype
        )
        out = model.apply(variables, pixels, mask, deterministic=True)
        return postprocess_detr(
            out["logits"], out["boxes"], orig_wh,
            confidence_threshold, person_class_id=person,
        )

    jitted = jax.jit(
        detect,
        in_shardings=(var_shardings, data_sharding, replicated_s),
        out_shardings=data_sharding,
    )

    def shard_inputs(variables_in, frames):
        v = jax.tree_util.tree_map(
            lambda x, s: jax.device_put(x, s), variables_in, var_shardings
        )
        f = jax.device_put(frames, data_sharding)
        return v, f

    jitted.shard_inputs = shard_inputs  # type: ignore[attr-defined]
    return jitted
