"""Single-shot anchor-free detector (the framework's alternate detector
family — the reference swapped in YOLOv8 behind the DETR-shaped interface,
src/detection/yolov8_detector.py:19-24; this is its TPU-native counterpart).

Architecture (FCOS/YOLOv8-flavored, built for the MXU):
  * the shared ResNet backbone (models/resnet.py) at stride 32,
  * a small convolutional neck,
  * an anchor-free head predicting per-cell objectness, class scores and
    an (l, t, r, b) box around the cell center,
  * fixed-capacity top-K + on-device NMS (ops/boxes.nms_mask) -> the same
    fixed-shape detection tensors DETR produces.

Everything static-shape, batched, and bf16-ready; postprocessing runs in the
same jitted program as the forward pass.
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import Array

from ..ops.boxes import nms_mask
from .resnet import ResNet


@dataclass(frozen=True)
class SingleShotConfig:
    num_classes: int = 1  # person-only by default
    head_dim: int = 256
    max_detections: int = 100
    stride: int = 32
    backbone_depths: tuple[int, ...] = (3, 4, 6, 3)
    backbone_hidden: tuple[int, ...] = (256, 512, 1024, 2048)
    backbone_embedding: int = 64
    dtype: str = "bfloat16"
    nms_iou_threshold: float = 0.45

    @property
    def jnp_dtype(self):
        return {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[self.dtype]

    @classmethod
    def tiny(cls, **kw) -> "SingleShotConfig":
        defaults = dict(
            head_dim=32,
            max_detections=10,
            backbone_depths=(1, 1, 1, 1),
            backbone_hidden=(32, 64, 128, 256),
            backbone_embedding=16,
            dtype="float32",
        )
        defaults.update(kw)
        return cls(**defaults)


class SingleShotDetector(nn.Module):
    config: SingleShotConfig

    @nn.compact
    def __call__(self, pixel_values: Array, deterministic: bool = True) -> dict:
        """(B, H, W, 3) normalized pixels -> raw head outputs on the
        (H/32, W/32) grid."""
        cfg = self.config
        dtype = cfg.jnp_dtype
        feat = ResNet(
            depths=cfg.backbone_depths,
            hidden_sizes=cfg.backbone_hidden,
            embedding_size=cfg.backbone_embedding,
            dtype=dtype,
            name="backbone",
        )(pixel_values.astype(dtype))

        x = feat
        for i in range(2):
            x = nn.Conv(cfg.head_dim, (3, 3), padding="SAME", dtype=dtype,
                        name=f"neck_conv{i}")(x)
            x = nn.GroupNorm(num_groups=32 if cfg.head_dim % 32 == 0 else 1,
                             dtype=dtype, name=f"neck_gn{i}")(x)
            x = nn.silu(x)

        obj = nn.Conv(1, (3, 3), padding="SAME", dtype=dtype, name="obj_head")(x)
        cls = nn.Conv(cfg.num_classes, (3, 3), padding="SAME", dtype=dtype,
                      name="cls_head")(x)
        # (l, t, r, b) distances in stride units, softplus-positive.
        ltrb = nn.Conv(4, (3, 3), padding="SAME", dtype=dtype, name="box_head")(x)
        return {
            "objectness": obj[..., 0].astype(jnp.float32),   # (B, fh, fw)
            "class_logits": cls.astype(jnp.float32),          # (B, fh, fw, C)
            "ltrb": jax.nn.softplus(ltrb.astype(jnp.float32)),  # (B, fh, fw, 4)
            "features": feat,
        }


def decode_single_shot(
    outputs: dict,
    orig_wh: Array,
    input_hw: tuple[int, int],
    config: SingleShotConfig,
    confidence_threshold: float,
):
    """Raw head outputs -> fixed-shape DetectionBatch (same contract as
    postprocess_detr): top-K by score, on-device NMS, pixel xywh + foot."""
    from ..core.dto import DetectionBatch

    obj = outputs["objectness"]
    cls = outputs["class_logits"]
    ltrb = outputs["ltrb"]
    B, fh, fw = obj.shape
    stride = config.stride
    K = config.max_detections

    score = jax.nn.sigmoid(obj) * jnp.max(jax.nn.sigmoid(cls), axis=-1)  # (B, fh, fw)
    cy = (jnp.arange(fh, dtype=jnp.float32) + 0.5) * stride
    cx = (jnp.arange(fw, dtype=jnp.float32) + 0.5) * stride
    l, t, r, b = (ltrb[..., i] * stride for i in range(4))
    x0 = cx[None, None, :] - l
    y0 = cy[None, :, None] - t
    x1 = cx[None, None, :] + r
    y1 = cy[None, :, None] + b

    # Scale from model-input space back to original pixels. The resize is
    # aspect-preserving and top-left anchored (ops/preprocessing.py), so one
    # scalar scale maps both axes.
    W, H = orig_wh[0], orig_wh[1]
    th, tw = input_hw
    scale = jnp.minimum(th / H, tw / W)
    inv = 1.0 / scale

    flat_score = score.reshape(B, fh * fw)
    boxes = jnp.stack(
        [x0.reshape(B, -1), y0.reshape(B, -1), x1.reshape(B, -1), y1.reshape(B, -1)],
        axis=-1,
    ) * inv  # xyxy in original pixels

    top_scores, top_idx = jax.lax.top_k(flat_score, K)  # (B, K)
    top_boxes = jnp.take_along_axis(boxes, top_idx[..., None], axis=1)  # (B, K, 4)

    def per_image(scores_k, boxes_k):
        keep = nms_mask(boxes_k, scores_k, config.nms_iou_threshold)
        valid = keep & (scores_k >= confidence_threshold)
        x0, y0, x1, y1 = (boxes_k[:, i] for i in range(4))
        x0 = jnp.clip(x0, 0.0, W)
        x1 = jnp.clip(x1, 0.0, W)
        y0 = jnp.clip(y0, 0.0, H)
        y1 = jnp.clip(y1, 0.0, H)
        xywh = jnp.stack([x0, y0, x1 - x0, y1 - y0], axis=-1)
        foot = jnp.stack([(x0 + x1) / 2, y1], axis=-1)
        return xywh, scores_k, valid, foot

    xywh, scores_k, valid, foot = jax.vmap(per_image)(top_scores, top_boxes)
    return DetectionBatch(
        boxes_xywh=xywh.astype(jnp.float32),
        scores=scores_k.astype(jnp.float32),
        valid=valid,
        foot=foot.astype(jnp.float32),
    )


def init_single_shot(config: SingleShotConfig, rng, input_hw=(128, 160)):
    model = SingleShotDetector(config)
    variables = model.init(
        rng, jnp.zeros((1, *input_hw, 3), jnp.float32), deterministic=True
    )
    return model, variables
