"""Parameter partition rules for DETR tensor parallelism.

Megatron-style TP over the ``model`` mesh axis, expressed as path-pattern
rules over the Flax param tree (models/detr.py layout):

* q/k/v projections: column-parallel — kernel (d, d) -> P(None, "model"),
  bias -> P("model"). Each shard holds a head subset; the attention kernel
  is head-parallel with no communication.
* attention out_proj: row-parallel — kernel -> P("model", None); the
  implicit psum over the contracted dim is inserted by GSPMD.
* FFN fc1 column-parallel / fc2 row-parallel (one psum per FFN).
* Backbone convs, norms, embeddings, heads: replicated (tiny fraction of
  FLOPs; sharding them would cost more in collectives than it saves).

The rules are *annotations only* — GSPMD derives the collective schedule
(scaling-book recipe: pick mesh, annotate, let XLA insert collectives).
"""

from __future__ import annotations

import re
from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import MODEL_AXIS

#: (path regex, spec builder) — first match wins.
_TP_RULES: list[tuple[str, Any]] = [
    (r"(self_attn|encoder_attn)/(q|k|v)_proj/kernel$", P(None, MODEL_AXIS)),
    (r"(self_attn|encoder_attn)/(q|k|v)_proj/bias$", P(MODEL_AXIS)),
    (r"(self_attn|encoder_attn)/out_proj/kernel$", P(MODEL_AXIS, None)),
    (r"fc1/kernel$", P(None, MODEL_AXIS)),
    (r"fc1/bias$", P(MODEL_AXIS)),
    (r"fc2/kernel$", P(MODEL_AXIS, None)),
    # ViT backbone blocks (models/vit.py) — the FLOPs bulk when
    # detection.backbone=vit, so its attention/MLP get the same
    # column/row split (the conv backbone stays replicated).
    (r"backbone/layer_\d+/attention/(q|k|v)_proj/kernel$", P(None, MODEL_AXIS)),
    (r"backbone/layer_\d+/attention/(q|k|v)_proj/bias$", P(MODEL_AXIS)),
    (r"backbone/layer_\d+/attention/out_proj/kernel$", P(MODEL_AXIS, None)),
    (r"backbone/layer_\d+/intermediate/kernel$", P(None, MODEL_AXIS)),
    (r"backbone/layer_\d+/intermediate/bias$", P(MODEL_AXIS)),
    (r"backbone/layer_\d+/output/kernel$", P(MODEL_AXIS, None)),
]


def _path_str(path: tuple) -> str:
    return "/".join(
        str(k.key) if hasattr(k, "key") else str(k) for k in path
    )


def param_specs(variables: Any) -> Any:
    """PartitionSpec pytree matching ``variables`` (P() = replicated)."""

    def spec_for(path: tuple, leaf: Any):
        p = _path_str(path)
        for pattern, spec in _TP_RULES:
            if re.search(pattern, p):
                return spec
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, variables)


def shard_params(variables: Any, mesh: Mesh) -> Any:
    """Place the param tree onto the mesh per the TP rules."""
    specs = param_specs(variables)
    return jax.tree_util.tree_map(
        lambda leaf, spec: jax.device_put(leaf, NamedSharding(mesh, spec)),
        variables,
        specs,
    )
