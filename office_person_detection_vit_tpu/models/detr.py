"""DETR object detector in Flax — the framework's primary person detector.

Reimplements the architecture the reference system was specified around
(facebook/detr-resnet-50 — reference .kiro/specs/office-person-detection/
design.md:235-268, config.yaml.disabled:32-44): ResNet-50 frozen-BN backbone,
1x1 input projection, 6+6 post-norm transformer encoder/decoder with sine
spatial and learned query embeddings, linear class head (num_classes + 1
no-object) and 3-layer MLP box head with sigmoid cxcywh output.

Weight parity with the HF torch implementation is tested in
tests/test_detr_parity.py via models/weights.py conversion.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import Array

from .position_encoding import sine_position_embedding
from .resnet import ResNet
from .transformer import Decoder, Encoder


@dataclass(frozen=True)
class DETRConfig:
    num_queries: int = 100
    d_model: int = 256
    num_heads: int = 8
    num_encoder_layers: int = 6
    num_decoder_layers: int = 6
    ffn_dim: int = 2048
    num_classes: int = 91  # COCO labels; +1 no-object is implicit in the head
    dropout: float = 0.1
    #: "resnet50" (the HF facebook/detr-resnet-50 backbone) or "vit" (the
    #: spec'd ViT-era backbone, reference config.yaml.disabled:32-44 —
    #: models/vit.py; feature stride = vit_patch_size instead of 32).
    backbone: str = "resnet50"
    backbone_depths: tuple[int, ...] = (3, 4, 6, 3)
    backbone_hidden: tuple[int, ...] = (256, 512, 1024, 2048)
    backbone_embedding: int = 64
    #: DETR-DC5 (dilated C5): last ResNet stage at stride 1 / dilation 2,
    #: halving the feature stride to 16 — 4x the encoder tokens, the
    #: paper's small-object variant. The same checkpoints load either way
    #: (dilation changes no weight shapes).
    dilate_c5: bool = False
    #: When set (e.g. 0.01), initialize the class head's real-class bias to
    #: -log((1-p)/p) — the RetinaNet prior for sigmoid/focal classification
    #: (use together with CriterionConfig.class_loss="focal" and
    #: score_mode="sigmoid"). None = zeros (softmax/CE mode).
    class_prior: float | None = None
    #: Dense encoder-token objectness head (the two-stage Deformable-DETR /
    #: DINO idea, arXiv:2010.04159 §4.4): a 1-logit head on the encoder
    #: output trained against "does a GT box cover this token" — dense
    #: supervision that forces the backbone/encoder to learn content
    #: features even while the decoder is still anchor-blind. Without it, a
    #: FROM-SCRATCH reduced-scale DETR settles into the measured
    #: blind-anchor basin (decoder ignores memory -> no gradient into the
    #: encoder -> features stay uninformative; docs/training.md "DETR
    #: beyond tiny"). Inference ignores the head (XLA dead-code-eliminates
    #: it from the detect program); it only adds (d_model+1) params.
    enc_objectness: bool = False
    #: How postprocess turns logits into scores: "softmax" (DETR CE head,
    #: no-object column competes) | "sigmoid" (Deformable-DETR focal head,
    #: per-class sigmoid, no-object column ignored). Must match the
    #: criterion the checkpoint was trained with.
    score_mode: str = "softmax"
    vit_patch_size: int = 16
    vit_hidden: int = 768
    vit_layers: int = 12
    vit_heads: int = 12
    vit_mlp: int = 3072
    vit_pos_grid: int = 14
    dtype: str = "float32"
    use_pallas_attention: bool = False
    #: rematerialize transformer layers under grad (jax.checkpoint) — trades
    #: ~1 extra forward of FLOPs for not storing per-layer activations.
    remat: bool = False
    person_class_id: int = 1  # COCO "person"

    @property
    def jnp_dtype(self):
        return {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[self.dtype]

    @classmethod
    def tiny(cls, **kw) -> "DETRConfig":
        """Small config for tests / multi-chip dry runs.

        dropout defaults to 0 here (vs the paper's 0.1 at full size):
        at d_model=64 / Q=10 the dropout noise randomizes the Hungarian
        match every step, so queries never specialize — the class head
        converges to the collapsed blend (every query predicting "person"
        at p≈1/(1+(Q-1)·eos)), the round-2 precision-0.10 plateau.
        Measured head-to-head in docs/training.md §"DETR at tiny scale"."""
        defaults = dict(
            num_queries=10,
            d_model=64,
            num_heads=4,
            num_encoder_layers=2,
            num_decoder_layers=2,
            ffn_dim=128,
            backbone_depths=(1, 1, 1, 1),
            backbone_hidden=(32, 64, 128, 256),
            backbone_embedding=16,
            dropout=0.0,
        )
        defaults.update(kw)
        return cls(**defaults)

    @classmethod
    def small(cls, **kw) -> "DETRConfig":
        """Middle capacity tier (~2.5M params): enough transformer width
        for queries to specialize on multi-object scenes (the d_model=64
        tiny tier memorizes its train set but does not generalize —
        measured in docs/training.md §"DETR at tiny scale"), while staying
        minutes-per-hundred-epochs trainable on one chip. The analog of
        the reference's selectable detector sizes (yolov8n..x,
        reference tools/train_yolov8.py / config.yaml:32)."""
        defaults = dict(
            num_queries=25,
            d_model=128,
            num_heads=8,
            num_encoder_layers=3,
            num_decoder_layers=3,
            ffn_dim=512,
            backbone_depths=(2, 2, 2, 2),
            backbone_hidden=(64, 128, 256, 512),
            backbone_embedding=32,
            dropout=0.0,
            # From-scratch training (no pretrained R50 in this deployment)
            # needs the dense encoder supervision to escape the
            # blind-anchor basin — measured in docs/training.md.
            enc_objectness=True,
        )
        defaults.update(kw)
        return cls(**defaults)


class DETR(nn.Module):
    """Full detector. Input NHWC pixel values + bool pixel mask.

    Returns dict:
      logits : (B, Q, num_classes + 1)
      boxes  : (B, Q, 4) sigmoid cxcywh, normalized to the *valid* image area
      aux    : optional (L, B, Q, ...) per-decoder-layer logits/boxes when
               ``return_aux`` (used by the training criterion).
    """

    config: DETRConfig = field(default_factory=DETRConfig)
    sow_attn: bool = False  # capture decoder cross-attention weights into
    # the "intermediates" collection (get_attention_map support)

    @nn.compact
    def __call__(
        self,
        pixel_values: Array,  # (B, H, W, 3) float, ImageNet-normalized
        pixel_mask: Array | None = None,  # (B, H, W) bool, True = real pixel
        deterministic: bool = True,
        return_aux: bool = False,
    ) -> dict[str, Array]:
        cfg = self.config
        dtype = cfg.jnp_dtype
        B, H, W, _ = pixel_values.shape
        if pixel_mask is None:
            pixel_mask = jnp.ones((B, H, W), bool)

        if cfg.backbone == "vit":
            from .vit import ViTBackbone, ViTConfig

            feat = ViTBackbone(
                ViTConfig(
                    patch_size=cfg.vit_patch_size,
                    hidden_size=cfg.vit_hidden,
                    num_layers=cfg.vit_layers,
                    num_heads=cfg.vit_heads,
                    mlp_dim=cfg.vit_mlp,
                    pos_grid=cfg.vit_pos_grid,
                    dtype=cfg.dtype,
                ),
                use_pallas=cfg.use_pallas_attention,
                name="backbone",
            )(pixel_values.astype(dtype), deterministic)
        else:
            feat = ResNet(
                depths=cfg.backbone_depths,
                hidden_sizes=cfg.backbone_hidden,
                embedding_size=cfg.backbone_embedding,
                dilate_last_stage=cfg.dilate_c5,
                dtype=dtype,
                name="backbone",
            )(pixel_values.astype(dtype))
        fh, fw = feat.shape[1], feat.shape[2]

        # Downsample the pixel mask to the feature grid. Match torch
        # F.interpolate(mode="nearest") exactly: src index = floor(dst * scale)
        # (jax.image.resize "nearest" samples pixel centers, which differs at
        # region boundaries).
        idx_y = jnp.floor(jnp.arange(fh) * (H / fh)).astype(jnp.int32)
        idx_x = jnp.floor(jnp.arange(fw) * (W / fw)).astype(jnp.int32)
        fmask = pixel_mask[:, idx_y][:, :, idx_x]

        pos = sine_position_embedding(fmask, embedding_dim=cfg.d_model // 2)
        pos = pos.astype(dtype)

        proj = nn.Conv(cfg.d_model, (1, 1), dtype=dtype, name="input_projection")(feat)

        src = proj.reshape(B, fh * fw, cfg.d_model)
        pos_flat = pos.reshape(B, fh * fw, cfg.d_model)
        key_mask = fmask.reshape(B, fh * fw)

        memory = Encoder(
            cfg.d_model, cfg.num_heads, cfg.ffn_dim, cfg.num_encoder_layers,
            cfg.dropout, dtype, cfg.use_pallas_attention, remat=cfg.remat,
            name="encoder",
        )(src, pos_flat, key_mask, deterministic)

        query_embed = self.param(
            "query_position_embeddings",
            nn.initializers.normal(1.0),
            (cfg.num_queries, cfg.d_model),
            jnp.float32,
        ).astype(dtype)
        query_pos = jnp.broadcast_to(query_embed[None], (B, cfg.num_queries, cfg.d_model))
        tgt = jnp.zeros_like(query_pos)

        hs = Decoder(
            cfg.d_model, cfg.num_heads, cfg.ffn_dim, cfg.num_decoder_layers,
            cfg.dropout, dtype, cfg.use_pallas_attention, sow_attn=self.sow_attn,
            remat=cfg.remat, name="decoder",
        )(tgt, query_pos, memory, pos_flat, key_mask, deterministic)
        # hs: (L, B, Q, C)

        if cfg.class_prior is not None:
            # Focal-mode prior bias (RetinaNet §4.1 / Deformable-DETR):
            # real-class sigmoids start at class_prior (e.g. 0.01) so the
            # background loss does not swamp step 0; the no-object slot
            # (unused under the focal criterion) stays at 0. Same param
            # tree/shapes — checkpoints load across the modes.
            b0 = -math.log((1.0 - cfg.class_prior) / cfg.class_prior)

            def _prior_bias(key, shape, dtype=jnp.float32):
                del key
                return jnp.full(shape, b0, dtype).at[-1].set(0.0)

            class_head = nn.Dense(
                cfg.num_classes + 1, dtype=dtype, bias_init=_prior_bias,
                name="class_labels_classifier",
            )
        else:
            class_head = nn.Dense(cfg.num_classes + 1, dtype=dtype, name="class_labels_classifier")
        bbox_mlp = BBoxMLP(cfg.d_model, dtype=dtype, name="bbox_predictor")

        logits_all = class_head(hs)  # (L, B, Q, num_classes+1)
        boxes_all = jax.nn.sigmoid(bbox_mlp(hs).astype(jnp.float32))

        out = {
            "logits": logits_all[-1].astype(jnp.float32),
            "boxes": boxes_all[-1],
            "encoder_output": memory,
            "feature_hw": (fh, fw),
        }
        if cfg.enc_objectness:
            b0 = -math.log((1.0 - 0.01) / 0.01)  # RetinaNet prior

            def _obj_bias(key, shape, dtype=jnp.float32):
                del key
                return jnp.full(shape, b0, dtype)

            enc_obj = nn.Dense(
                1, dtype=dtype, bias_init=_obj_bias,
                name="encoder_objectness",
            )(memory)  # (B, L, 1)
            out["enc_obj_logits"] = enc_obj[..., 0].astype(jnp.float32)
            out["feature_mask"] = fmask  # (B, fh, fw) bool
        if return_aux:
            out["aux_logits"] = logits_all[:-1].astype(jnp.float32)
            out["aux_boxes"] = boxes_all[:-1]
        return out


class BBoxMLP(nn.Module):
    """3-layer MLP box head (DETR bbox_predictor)."""

    hidden: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = nn.relu(nn.Dense(self.hidden, dtype=self.dtype, name="dense0")(x))
        x = nn.relu(nn.Dense(self.hidden, dtype=self.dtype, name="dense1")(x))
        return nn.Dense(4, dtype=self.dtype, name="dense2")(x)


def init_detr(config: DETRConfig, rng: jax.Array, input_hw: tuple[int, int] = (128, 160)):
    """Initialize a DETR model + params.

    Init runs as ONE jitted program on the default backend: eager flax init
    is hundreds of tiny per-op dispatches (each a round trip on a remote
    accelerator, ~1 min total observed), while a single program compiles
    once and then persists in the compilation cache (~6 s warm loads).
    """
    import dataclasses

    model = DETR(config)
    h, w = input_hw
    # The einsum-attention twin has an identical parameter tree and
    # initializers, so init with it — it also lowers on the CPU backend
    # where Pallas kernels don't.
    init_model = (
        DETR(dataclasses.replace(config, use_pallas_attention=False))
        if config.use_pallas_attention
        else model
    )
    params = jax.jit(init_model.init)(
        rng,
        jnp.zeros((1, h, w, 3), jnp.float32),
        jnp.ones((1, h, w), bool),
    )
    return model, params
