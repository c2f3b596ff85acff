"""Torch DETR checkpoint -> Flax params conversion.

Converts a HF transformers ``DetrForObjectDetection`` state_dict (either the
HF-native ResNet backbone naming, ``use_timm_backbone=False``, or the timm
naming used by the published ``facebook/detr-resnet-50`` hub checkpoint) into
the param pytree of :class:`office_person_detection_vit_tpu.models.detr.DETR`.

Conventions (SURVEY.md §7.4 item 1):
- conv weights OIHW -> HWIO transpose;
- linear weights (out, in) -> (in, out) transpose;
- BatchNorm running stats folded into FrozenBatchNorm scale/bias:
  scale = gamma / sqrt(var + eps), bias = beta - mean * scale.
"""

from __future__ import annotations

import re
from typing import Any, Mapping

import numpy as np

BN_EPS = 1e-5


def _fold_bn(sd: Mapping[str, Any], prefix: str) -> dict[str, np.ndarray]:
    gamma = np.asarray(sd[f"{prefix}.weight"], np.float32)
    beta = np.asarray(sd[f"{prefix}.bias"], np.float32)
    mean = np.asarray(sd[f"{prefix}.running_mean"], np.float32)
    var = np.asarray(sd[f"{prefix}.running_var"], np.float32)
    scale = gamma / np.sqrt(var + BN_EPS)
    return {"scale": scale, "bias": beta - mean * scale}


def _conv(sd: Mapping[str, Any], key: str) -> dict[str, np.ndarray]:
    w = np.asarray(sd[key], np.float32)
    return {"kernel": np.transpose(w, (2, 3, 1, 0))}


def _dense(sd: Mapping[str, Any], prefix: str) -> dict[str, np.ndarray]:
    out = {"kernel": np.transpose(np.asarray(sd[f"{prefix}.weight"], np.float32))}
    if f"{prefix}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{prefix}.bias"], np.float32)
    return out


def _ln(sd: Mapping[str, Any], prefix: str) -> dict[str, np.ndarray]:
    return {
        "scale": np.asarray(sd[f"{prefix}.weight"], np.float32),
        "bias": np.asarray(sd[f"{prefix}.bias"], np.float32),
    }


def _convert_backbone(sd: Mapping[str, Any]) -> dict[str, Any]:
    """Handle both HF-native and timm backbone naming."""
    out: dict[str, Any] = {}
    hf_stem = "model.backbone.conv_encoder.model.embedder.embedder"
    timm_stem = "model.backbone.conv_encoder.model.conv1"
    if f"{hf_stem}.convolution.weight" in sd:
        out["embedder_conv"] = _conv(sd, f"{hf_stem}.convolution.weight")
        out["embedder_bn"] = _fold_bn(sd, f"{hf_stem}.normalization")
        stage_fmt = "model.backbone.conv_encoder.model.encoder.stages.{s}.layers.{l}"
        for key in sd:
            m = re.match(
                r"model\.backbone\.conv_encoder\.model\.encoder\.stages\.(\d+)\.layers\.(\d+)\.layer\.(\d+)\.convolution\.weight",
                key,
            )
            if m:
                s, l, j = (int(g) for g in m.groups())
                blk = out.setdefault(f"stage{s}_layer{l}", {})
                blk[f"conv{j}"] = _conv(sd, key)
                blk[f"bn{j}"] = _fold_bn(
                    sd, stage_fmt.format(s=s, l=l) + f".layer.{j}.normalization"
                )
            m = re.match(
                r"model\.backbone\.conv_encoder\.model\.encoder\.stages\.(\d+)\.layers\.(\d+)\.shortcut\.convolution\.weight",
                key,
            )
            if m:
                s, l = (int(g) for g in m.groups())
                blk = out.setdefault(f"stage{s}_layer{l}", {})
                blk["shortcut_conv"] = _conv(sd, key)
                blk["shortcut_bn"] = _fold_bn(
                    sd, stage_fmt.format(s=s, l=l) + ".shortcut.normalization"
                )
    elif f"{timm_stem}.weight" in sd:
        base = "model.backbone.conv_encoder.model"
        out["embedder_conv"] = _conv(sd, f"{base}.conv1.weight")
        out["embedder_bn"] = _fold_bn(sd, f"{base}.bn1")
        for key in sd:
            m = re.match(
                rf"{re.escape(base)}\.layer(\d)\.(\d+)\.conv(\d)\.weight", key
            )
            if m:
                s, l, j = int(m.group(1)) - 1, int(m.group(2)), int(m.group(3)) - 1
                blk = out.setdefault(f"stage{s}_layer{l}", {})
                blk[f"conv{j}"] = _conv(sd, key)
                blk[f"bn{j}"] = _fold_bn(sd, f"{base}.layer{s + 1}.{l}.bn{j + 1}")
            m = re.match(
                rf"{re.escape(base)}\.layer(\d)\.(\d+)\.downsample\.0\.weight", key
            )
            if m:
                s, l = int(m.group(1)) - 1, int(m.group(2))
                blk = out.setdefault(f"stage{s}_layer{l}", {})
                blk["shortcut_conv"] = _conv(sd, key)
                blk["shortcut_bn"] = _fold_bn(sd, f"{base}.layer{s + 1}.{l}.downsample.1")
    else:
        raise ValueError("unrecognized backbone naming in state_dict")
    return out


def _convert_attention(sd: Mapping[str, Any], prefix: str) -> dict[str, Any]:
    return {
        name: _dense(sd, f"{prefix}.{name}")
        for name in ("q_proj", "k_proj", "v_proj", "out_proj")
    }


def _convert_enc_layer(sd: Mapping[str, Any], prefix: str) -> dict[str, Any]:
    return {
        "self_attn": _convert_attention(sd, f"{prefix}.self_attn"),
        "self_attn_layer_norm": _ln(sd, f"{prefix}.self_attn_layer_norm"),
        "fc1": _dense(sd, f"{prefix}.fc1"),
        "fc2": _dense(sd, f"{prefix}.fc2"),
        "final_layer_norm": _ln(sd, f"{prefix}.final_layer_norm"),
    }


def _convert_dec_layer(sd: Mapping[str, Any], prefix: str) -> dict[str, Any]:
    out = _convert_enc_layer(sd, prefix)
    out["encoder_attn"] = _convert_attention(sd, f"{prefix}.encoder_attn")
    out["encoder_attn_layer_norm"] = _ln(sd, f"{prefix}.encoder_attn_layer_norm")
    return out


def convert_torch_state_dict(
    sd: Mapping[str, Any],
    num_encoder_layers: int = 6,
    num_decoder_layers: int = 6,
) -> dict[str, Any]:
    """Full state_dict -> flax ``{"params": ...}`` pytree."""
    sd = {k: (v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)) for k, v in sd.items()}
    params: dict[str, Any] = {}
    params["backbone"] = _convert_backbone(sd)

    w = np.asarray(sd["model.input_projection.weight"], np.float32)  # (256, 2048, 1, 1)
    params["input_projection"] = {
        "kernel": np.transpose(w, (2, 3, 1, 0)),
        "bias": np.asarray(sd["model.input_projection.bias"], np.float32),
    }
    params["query_position_embeddings"] = np.asarray(
        sd["model.query_position_embeddings.weight"], np.float32
    )
    params["encoder"] = {
        f"layer_{i}": _convert_enc_layer(sd, f"model.encoder.layers.{i}")
        for i in range(num_encoder_layers)
    }
    params["decoder"] = {
        f"layer_{i}": _convert_dec_layer(sd, f"model.decoder.layers.{i}")
        for i in range(num_decoder_layers)
    }
    params["decoder"]["layernorm"] = _ln(sd, "model.decoder.layernorm")
    params["class_labels_classifier"] = _dense(sd, "class_labels_classifier")
    params["bbox_predictor"] = {
        f"dense{j}": _dense(sd, f"bbox_predictor.layers.{j}") for j in range(3)
    }
    return {"params": params}


def convert_vit_state_dict(
    sd: Mapping[str, Any], num_layers: int = 12
) -> dict[str, Any]:
    """torch ``transformers.ViTModel`` state_dict -> flax params for
    models/vit.py::ViTBackbone (usable as the ``backbone`` subtree of a
    DETR param tree when ``DETRConfig.backbone == "vit"``)."""
    sd = {
        k: (v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v))
        for k, v in sd.items()
    }
    params: dict[str, Any] = {
        "cls_token": np.asarray(sd["embeddings.cls_token"], np.float32),
        "position_embeddings": np.asarray(
            sd["embeddings.position_embeddings"], np.float32
        ),
        "patch_embed": {
            **_conv(sd, "embeddings.patch_embeddings.projection.weight"),
            "bias": np.asarray(
                sd["embeddings.patch_embeddings.projection.bias"], np.float32
            ),
        },
        "layernorm": _ln(sd, "layernorm"),
    }
    for i in range(num_layers):
        p = f"encoder.layer.{i}"
        params[f"layer_{i}"] = {
            "attention": {
                "q_proj": _dense(sd, f"{p}.attention.attention.query"),
                "k_proj": _dense(sd, f"{p}.attention.attention.key"),
                "v_proj": _dense(sd, f"{p}.attention.attention.value"),
                "out_proj": _dense(sd, f"{p}.attention.output.dense"),
            },
            "layernorm_before": _ln(sd, f"{p}.layernorm_before"),
            "layernorm_after": _ln(sd, f"{p}.layernorm_after"),
            "intermediate": _dense(sd, f"{p}.intermediate.dense"),
            "output": _dense(sd, f"{p}.output.dense"),
        }
    return {"params": params}


#: ultralytics BatchNorm2d eps (their Conv block overrides torch's 1e-5).
YOLO_BN_EPS = 1e-3


def _fold_bn_eps(sd: Mapping[str, Any], prefix: str, eps: float) -> dict[str, np.ndarray]:
    gamma = np.asarray(sd[f"{prefix}.weight"], np.float32)
    beta = np.asarray(sd[f"{prefix}.bias"], np.float32)
    mean = np.asarray(sd[f"{prefix}.running_mean"], np.float32)
    var = np.asarray(sd[f"{prefix}.running_var"], np.float32)
    scale = gamma / np.sqrt(var + eps)
    return {"scale": scale, "bias": beta - mean * scale}


def convert_yolov8_state_dict(sd: Mapping[str, Any]) -> dict[str, Any]:
    """ultralytics ``DetectionModel.state_dict()`` -> flax params for
    :class:`office_person_detection_vit_tpu.models.yolo.YOLOv8`.

    Key mapping (mechanical — module names mirror yolov8.yaml indices):

    - ``model.{i}.conv.weight`` + ``model.{i}.bn.*``      -> ``m{i}/conv|bn``
    - ``model.{i}.cv1|cv2.(conv|bn).*``                    -> ``m{i}/cv1|cv2/…``
    - ``model.{i}.m.{j}.cv1|cv2.(conv|bn).*``              -> ``m{i}/m{j}/…``
    - ``model.22.cv2.{l}.{0,1}.(conv|bn).*``               -> ``detect/cv2_{l}_{0,1}/…``
    - ``model.22.cv2.{l}.2.weight|bias`` (plain conv)      -> ``detect/cv2_{l}_2``
    - same for ``cv3``; ``model.22.dfl.conv.weight`` (the fixed arange
      kernel) is dropped — the decode computes the expectation in closed
      form (models/yolo.py::dfl_expectation).

    BN running stats fold into FrozenBatchNorm with the ultralytics eps
    (1e-3).  Accepts either bare ``model.N…`` keys (``DetectionModel``)
    or a ``model.model.N…`` wrapper and ignores non-tensor bookkeeping.
    """
    sd = {
        k: (v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v))
        for k, v in sd.items()
    }
    if any(k.startswith("model.model.") for k in sd):
        sd = {
            k[len("model."):]: v for k, v in sd.items()
            if k.startswith("model.model.")
        }

    def set_path(tree: dict, path: list[str], leaf: dict | np.ndarray) -> None:
        for p in path[:-1]:
            tree = tree.setdefault(p, {})
        tree[path[-1]] = leaf

    params: dict[str, Any] = {}
    for key in sd:
        m = re.match(r"model\.(\d+)\.(.*)$", key)
        if not m:
            continue
        idx, rest = int(m.group(1)), m.group(2)
        # Conv blocks / C2f / SPPF inside modules m{i}.
        cm = re.match(r"((?:m\.\d+\.)?cv\d\.|)(conv)\.weight$", rest)
        if cm:
            inner = cm.group(1).rstrip(".")
            # "m.{j}.cv1" -> ["m{j}", "cv1"]; "cv1" -> ["cv1"]; "" -> [].
            norm: list[str] = []
            toks = [t for t in inner.split(".") if t]
            i = 0
            while i < len(toks):
                if toks[i] == "m" and i + 1 < len(toks) and toks[i + 1].isdigit():
                    norm.append(f"m{toks[i + 1]}")
                    i += 2
                else:
                    norm.append(toks[i])
                    i += 1
            set_path(params, [f"m{idx}"] + norm + ["conv"], _conv(sd, key))
            set_path(
                params,
                [f"m{idx}"] + norm + ["bn"],
                _fold_bn_eps(sd, f"model.{idx}.{inner + '.' if inner else ''}bn",
                             YOLO_BN_EPS),
            )
            continue
        # Detect head branches: cv2/cv3 . level . stage.
        hm = re.match(r"(cv[23])\.(\d+)\.(\d+)\.conv\.weight$", rest)
        if hm:
            br, l, s = hm.group(1), int(hm.group(2)), int(hm.group(3))
            set_path(params, ["detect", f"{br}_{l}_{s}", "conv"], _conv(sd, key))
            set_path(
                params,
                ["detect", f"{br}_{l}_{s}", "bn"],
                _fold_bn_eps(sd, f"model.{idx}.{br}.{l}.{s}.bn", YOLO_BN_EPS),
            )
            continue
        hm = re.match(r"(cv[23])\.(\d+)\.2\.weight$", rest)
        if hm:
            br, l = hm.group(1), int(hm.group(2))
            leaf = _conv(sd, key)
            bias_key = f"model.{idx}.{br}.{l}.2.bias"
            if bias_key in sd:
                leaf["bias"] = np.asarray(sd[bias_key], np.float32)
            set_path(params, ["detect", f"{br}_{l}_2"], leaf)
            continue
        # dfl.conv.weight (fixed arange), biases already handled, bn stats
        # consumed alongside their conv: nothing else to map.
    return {"params": params}


def load_torch_checkpoint(path: str, **kw) -> dict[str, Any]:
    """Load a torch .pt/.bin/.safetensors DETR checkpoint file -> flax params."""
    if str(path).endswith(".safetensors"):
        from safetensors.numpy import load_file

        sd = load_file(path)
    else:
        import torch

        sd = torch.load(path, map_location="cpu", weights_only=True)
        if "model" in sd and isinstance(sd["model"], dict):
            sd = sd["model"]
    return convert_torch_state_dict(sd, **kw)


def load_any_checkpoint(path, template=None, **converter_kw):
    """Load DETR params from any format the framework produces or consumes:
    orbax directory, flat-leaf .npz (tools/train_detr.py output), or a torch
    .pt/.bin/.safetensors file (converted). ``template`` (a variables pytree)
    is required for .npz (tree structure) and ignored otherwise."""
    from pathlib import Path as _Path

    p = _Path(str(path))
    if p.is_dir():
        import orbax.checkpoint as ocp

        return ocp.StandardCheckpointer().restore(p.resolve())
    if p.suffix == ".npz":
        if template is None:
            raise ValueError(".npz checkpoints need a template pytree")
        import jax
        import numpy as _np

        with _np.load(p) as data:
            leaves = [data[f"leaf_{i}"] for i in range(len(data.files))]
        treedef = jax.tree_util.tree_structure(template)
        return jax.tree_util.tree_unflatten(treedef, leaves)
    return load_torch_checkpoint(str(p), **converter_kw)
