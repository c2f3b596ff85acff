"""2D sine positional embeddings for DETR, mask-aware.

Numerically matches HF transformers DetrSinePositionEmbedding (normalize=True,
temperature 10000, scale 2*pi): cumulative-sum of the pixel mask per axis,
normalized by the per-row/column totals, expanded with interleaved sin/cos,
concatenated (y-part first), NHWC output.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
from jax import Array


def sine_position_embedding(
    mask: Array,
    embedding_dim: int = 128,
    temperature: float = 10000.0,
    normalize: bool = True,
    scale: float | None = None,
) -> Array:
    """mask: (B, H, W) bool/float valid-pixel mask -> (B, H, W, 2*embedding_dim)."""
    if scale is None:
        scale = 2 * math.pi
    m = mask.astype(jnp.float32)
    y_embed = jnp.cumsum(m, axis=1)
    x_embed = jnp.cumsum(m, axis=2)
    if normalize:
        y_embed = y_embed / (y_embed[:, -1:, :] + 1e-6) * scale
        x_embed = x_embed / (x_embed[:, :, -1:] + 1e-6) * scale

    dim_t = jnp.arange(embedding_dim, dtype=jnp.float32)
    dim_t = temperature ** (2 * jnp.floor(dim_t / 2) / embedding_dim)

    pos_x = x_embed[..., None] / dim_t  # (B, H, W, D)
    pos_y = y_embed[..., None] / dim_t
    # Interleave sin(even) / cos(odd): stack then flatten the last two dims.
    pos_x = jnp.stack([jnp.sin(pos_x[..., 0::2]), jnp.cos(pos_x[..., 1::2])], axis=-1)
    pos_x = pos_x.reshape(*pos_x.shape[:-2], -1)
    pos_y = jnp.stack([jnp.sin(pos_y[..., 0::2]), jnp.cos(pos_y[..., 1::2])], axis=-1)
    pos_y = pos_y.reshape(*pos_y.shape[:-2], -1)
    return jnp.concatenate([pos_y, pos_x], axis=-1)
