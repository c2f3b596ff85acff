"""Single-shot anchor-free detector (the framework's alternate detector
family — the reference swapped in YOLOv8 behind the DETR-shaped interface,
src/detection/yolov8_detector.py:19-24; this is its TPU-native counterpart).

Architecture (FCOS/YOLOv8-flavored, built for the MXU):
  * the shared ResNet backbone (models/resnet.py) returning a C3/C4/C5
    pyramid (strides 8/16/32),
  * an FPN neck (lateral 1x1 + top-down nearest-upsample add + 3x3 smooth),
  * a SHARED anchor-free head across levels predicting per-cell objectness,
    class scores and an (l, t, r, b) box in stride units — multi-scale like
    the reference's YOLOv8, so small/distant people land on stride 8,
  * per-level decode -> cross-level candidate concat -> fixed-capacity
    top-K + on-device NMS (ops/boxes.nms_mask) -> the same fixed-shape
    detection tensors DETR produces.

Everything static-shape, batched, and bf16-ready; postprocessing runs in the
same jitted program as the forward pass.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

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
    #: FPN levels, finest first. Must match the backbone's C3/C4/C5 strides.
    strides: tuple[int, ...] = (8, 16, 32)
    backbone_depths: tuple[int, ...] = (3, 4, 6, 3)
    backbone_hidden: tuple[int, ...] = (256, 512, 1024, 2048)
    backbone_embedding: int = 64
    dtype: str = "bfloat16"
    nms_iou_threshold: float = 0.45

    @property
    def jnp_dtype(self):
        return {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[self.dtype]

    # Back-compat alias used by older callers/tests.
    @property
    def stride(self) -> int:
        return self.strides[-1]

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


class _Head(nn.Module):
    """Shared per-level head: two 3x3 conv blocks -> obj/cls/ltrb."""

    head_dim: int
    num_classes: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x: Array) -> dict:
        for i in range(2):
            x = nn.Conv(self.head_dim, (3, 3), padding="SAME", dtype=self.dtype,
                        name=f"conv{i}")(x)
            x = nn.GroupNorm(num_groups=32 if self.head_dim % 32 == 0 else 1,
                             dtype=self.dtype, name=f"gn{i}")(x)
            x = nn.silu(x)
        # Focal-style prior bias (RetinaNet sec. 4.1 / ultralytics
        # Detect.bias_init analog): start obj/cls at ~1% positive rate so
        # the first steps don't sum ~0.69 nats over every cell — the
        # loss-spike mechanism diagnosed in the round-3 replicate re-run
        # (docs/artifacts/train_recipe_replicates.json).
        prior = nn.initializers.constant(-4.595)  # logit(0.01)
        obj = nn.Conv(1, (3, 3), padding="SAME", dtype=self.dtype,
                      bias_init=prior, name="obj")(x)
        cls = nn.Conv(self.num_classes, (3, 3), padding="SAME", dtype=self.dtype,
                      bias_init=prior, name="cls")(x)
        ltrb = nn.Conv(4, (3, 3), padding="SAME", dtype=self.dtype, name="box")(x)
        return {
            "objectness": obj[..., 0].astype(jnp.float32),
            "class_logits": cls.astype(jnp.float32),
            "ltrb": jax.nn.softplus(ltrb.astype(jnp.float32)),
        }


class SingleShotDetector(nn.Module):
    config: SingleShotConfig

    @nn.compact
    def __call__(self, pixel_values: Array, deterministic: bool = True) -> dict:
        """(B, H, W, 3) normalized pixels -> per-level raw head outputs."""
        cfg = self.config
        dtype = cfg.jnp_dtype
        c3, c4, c5 = ResNet(
            depths=cfg.backbone_depths,
            hidden_sizes=cfg.backbone_hidden,
            embedding_size=cfg.backbone_embedding,
            dtype=dtype,
            return_pyramid=True,
            name="backbone",
        )(pixel_values.astype(dtype))

        # FPN: lateral 1x1, top-down nearest upsample + add, 3x3 smooth.
        laterals = [
            nn.Conv(cfg.head_dim, (1, 1), dtype=dtype, name=f"lateral{i}")(c)
            for i, c in enumerate((c3, c4, c5))
        ]
        p5 = laterals[2]
        p4 = laterals[1] + _upsample2x(p5)
        p3 = laterals[0] + _upsample2x(p4)
        pyramid = [
            nn.Conv(cfg.head_dim, (3, 3), padding="SAME", dtype=dtype,
                    name=f"smooth{i}")(p)
            for i, p in enumerate((p3, p4, p5))
        ]

        head = _Head(cfg.head_dim, cfg.num_classes, dtype, name="head")
        levels = [head(p) for p in pyramid]  # shared weights across levels
        return {
            "levels": levels,  # finest (stride 8) first
            "features": c5,
        }


def _upsample2x(x: Array) -> Array:
    """Nearest-neighbor 2x spatial upsample (NHWC)."""
    B, H, W, C = x.shape
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


def decode_single_shot(
    outputs: dict,
    orig_wh: Array,
    input_hw: tuple[int, int],
    config: SingleShotConfig,
    confidence_threshold,
):
    """Per-level raw head outputs -> fixed-shape DetectionBatch (same
    contract as postprocess_detr): decode each level, concat candidates,
    top-K by score, on-device NMS, pixel xywh + foot."""
    from ..core.dto import DetectionBatch

    K = config.max_detections
    W, H = orig_wh[0], orig_wh[1]
    th, tw = input_hw
    # Aspect-preserving top-left-anchored resize (ops/preprocessing.py):
    # one scalar maps model-input pixels back to original pixels.
    inv = 1.0 / jnp.minimum(th / H, tw / W)

    all_scores, all_boxes = [], []
    for level, stride in zip(outputs["levels"], config.strides):
        obj = level["objectness"]      # (B, fh, fw)
        cls = level["class_logits"]    # (B, fh, fw, C)
        ltrb = level["ltrb"]           # (B, fh, fw, 4) in stride units
        B, fh, fw = obj.shape
        score = jax.nn.sigmoid(obj) * jnp.max(jax.nn.sigmoid(cls), axis=-1)
        cy = (jnp.arange(fh, dtype=jnp.float32) + 0.5) * stride
        cx = (jnp.arange(fw, dtype=jnp.float32) + 0.5) * stride
        l, t, r, b = (ltrb[..., i] * stride for i in range(4))
        x0 = cx[None, None, :] - l
        y0 = cy[None, :, None] - t
        x1 = cx[None, None, :] + r
        y1 = cy[None, :, None] + b
        all_scores.append(score.reshape(B, -1))
        all_boxes.append(
            jnp.stack(
                [x0.reshape(B, -1), y0.reshape(B, -1),
                 x1.reshape(B, -1), y1.reshape(B, -1)],
                axis=-1,
            ) * inv
        )

    return candidates_to_batch(
        jnp.concatenate(all_scores, axis=1),
        jnp.concatenate(all_boxes, axis=1),
        orig_wh,
        K,
        config.nms_iou_threshold,
        confidence_threshold,
    )


def candidates_to_batch(
    flat_score: Array,   # (B, N) candidate scores
    boxes: Array,        # (B, N, 4) candidate boxes, xyxy in original pixels
    orig_wh: Array,
    max_detections: int,
    nms_iou_threshold: float,
    confidence_threshold,
):
    """Shared decode tail for the single-shot families (FCOS/SSD, YOLOv8):
    fixed-capacity top-K, per-image on-device NMS, clip to the original
    image, xywh + foot point — the same fixed-shape DetectionBatch contract
    DETR's postprocess emits."""
    from ..core.dto import DetectionBatch

    K = max_detections
    W, H = orig_wh[0], orig_wh[1]
    k = min(K, flat_score.shape[1])
    top_scores, top_idx = jax.lax.top_k(flat_score, k)  # (B, k)
    if k < K:  # pad candidate slots up to capacity
        pad = K - k
        top_scores = jnp.pad(top_scores, [(0, 0), (0, pad)])
        top_idx = jnp.pad(top_idx, [(0, 0), (0, pad)])
    top_boxes = jnp.take_along_axis(boxes, top_idx[..., None], axis=1)  # (B, K, 4)

    def per_image(scores_k, boxes_k):
        keep = nms_mask(boxes_k, scores_k, nms_iou_threshold)
        valid = keep & (scores_k >= confidence_threshold) & (scores_k > 0)
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
    # One jitted init program (not eager): see models/detr.py init_detr —
    # eager flax init is hundreds of per-op dispatches on a remote backend.
    variables = jax.jit(partial(model.init, deterministic=True))(
        rng, jnp.zeros((1, *input_hw, 3), jnp.float32)
    )
    return model, variables
