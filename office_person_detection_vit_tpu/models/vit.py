"""ViT backbone for the detector — the system's namesake.

The reference was specified around a ViT-era detector (its disabled config
carries ``patch_size: 16`` — reference config.yaml.disabled:32-44 — and the
deleted ``vit_detector.py``'s contract survives in the spec,
.kiro/specs/office-person-detection/design.md:235-268). This module is a
faithful HF-ViT encoder (pre-norm blocks, CLS token, learned position
embeddings with bicubic grid interpolation for detection resolutions) that
plugs into DETR as an alternate backbone (`detection.backbone: vit`),
producing a (B, H/P, W/P, hidden) feature map.

TPU notes: a ViT is pure matmuls — MXU-dense with none of the conv
emitter's scheduling overhead — so it runs at higher MFU than the ResNet
path; at patch 32 the DETR token count is unchanged (920 @736×1280), at
the spec's patch 16 the encoder sees 4× the tokens (use the flash
attention path for those shapes).

Weight conversion from a torch ``transformers.ViTModel`` state_dict lives
in models/weights.py::convert_vit_state_dict; parity is tested in
tests/test_vit_backbone.py.
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import Array

from .transformer import MultiHeadAttention


@dataclass(frozen=True)
class ViTConfig:
    patch_size: int = 16
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    mlp_dim: int = 3072
    #: native position-embedding grid (14 for the 224-trained HF models)
    pos_grid: int = 14
    layer_norm_eps: float = 1e-12
    dtype: str = "float32"

    @property
    def jnp_dtype(self):
        return {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[self.dtype]

    @classmethod
    def tiny(cls, **kw) -> "ViTConfig":
        defaults = dict(
            patch_size=8, hidden_size=64, num_layers=2, num_heads=4,
            mlp_dim=128, pos_grid=4,
        )
        defaults.update(kw)
        return cls(**defaults)


class ViTBlock(nn.Module):
    """Pre-norm transformer block (HF ViTLayer):
    x += attn(LN_before(x)); x += mlp(LN_after(x))."""

    config: ViTConfig
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        cfg = self.config
        dtype = cfg.jnp_dtype
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=dtype,
                         name="layernorm_before")(x)
        h = MultiHeadAttention(
            cfg.hidden_size, cfg.num_heads, dtype, self.use_pallas,
            name="attention",
        )(h, h, h, None)
        x = x + h
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=dtype,
                         name="layernorm_after")(x)
        h = nn.Dense(cfg.mlp_dim, dtype=dtype, name="intermediate")(h)
        h = nn.gelu(h, approximate=False)  # HF ViT uses exact gelu
        h = nn.Dense(cfg.hidden_size, dtype=dtype, name="output")(h)
        return x + h


class ViTBackbone(nn.Module):
    """HF-compatible ViT encoder returning a dense feature map.

    Input (B, H, W, 3) pixels (H, W multiples of patch_size) -> output
    (B, H/P, W/P, hidden). The CLS token participates in attention (so
    features match ``ViTModel.last_hidden_state[:, 1:]`` exactly at the
    native grid) and is dropped from the output.
    """

    config: ViTConfig
    use_pallas: bool = False

    @nn.compact
    def __call__(self, pixels: Array, deterministic: bool = True) -> Array:
        cfg = self.config
        dtype = cfg.jnp_dtype
        P = cfg.patch_size
        B, H, W, _ = pixels.shape
        if H % P or W % P:
            raise ValueError(f"input {H}x{W} not a multiple of patch {P}")

        x = nn.Conv(
            cfg.hidden_size, (P, P), strides=(P, P), dtype=dtype,
            name="patch_embed",
        )(pixels.astype(dtype))
        fh, fw = x.shape[1], x.shape[2]
        tokens = x.reshape(B, fh * fw, cfg.hidden_size)

        cls = self.param(
            "cls_token", nn.initializers.normal(0.02),
            (1, 1, cfg.hidden_size), jnp.float32,
        ).astype(dtype)
        pos = self.param(
            "position_embeddings", nn.initializers.normal(0.02),
            (1, 1 + cfg.pos_grid * cfg.pos_grid, cfg.hidden_size), jnp.float32,
        )
        cls_pos = pos[:, :1]
        grid_pos = pos[:, 1:].reshape(1, cfg.pos_grid, cfg.pos_grid,
                                      cfg.hidden_size)
        if (fh, fw) != (cfg.pos_grid, cfg.pos_grid):
            # Bicubic grid interpolation for detection resolutions (the HF
            # interpolate_pos_encoding convention).
            grid_pos = jax.image.resize(
                grid_pos, (1, fh, fw, cfg.hidden_size), "bicubic"
            )
        pos_all = jnp.concatenate(
            [cls_pos, grid_pos.reshape(1, fh * fw, cfg.hidden_size)], axis=1
        ).astype(dtype)

        x = jnp.concatenate(
            [jnp.broadcast_to(cls, (B, 1, cfg.hidden_size)), tokens], axis=1
        )
        x = x + pos_all

        for i in range(cfg.num_layers):
            x = ViTBlock(cfg, self.use_pallas, name=f"layer_{i}")(
                x, deterministic
            )
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=dtype,
                         name="layernorm")(x)
        return x[:, 1:].reshape(B, fh, fw, cfg.hidden_size)
