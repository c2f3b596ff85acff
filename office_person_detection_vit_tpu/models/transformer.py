"""DETR transformer encoder/decoder (post-norm), Flax.

Semantics match HF transformers DetrEncoder/DetrDecoder (modeling_detr):
- positional embeddings are added to queries/keys only, never to values;
- post-norm residual blocks (attn -> add -> LN, FFN -> add -> LN);
- decoder returns all intermediate layer outputs for auxiliary losses;
- attention runs through ops.attention (einsum reference or the Pallas
  fused kernel, selected by ``use_pallas``).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
from jax import Array

from ..ops.attention import attention_reference, multi_head_attention


class MultiHeadAttention(nn.Module):
    d_model: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False
    sow_weights: bool = False  # store attention probs in the "intermediates"
    # collection (forces the einsum path; used by get_attention_map)

    @nn.compact
    def __call__(
        self,
        query: Array,  # (B, Lq, C) — *with* positional embedding already added
        key: Array,  # (B, Lk, C) — with positional embedding
        value: Array,  # (B, Lk, C) — WITHOUT positional embedding
        key_padding_mask: Array | None = None,  # (B, Lk) True=valid
    ) -> Array:
        B, Lq, C = query.shape
        Lk = key.shape[1]
        H = self.num_heads
        D = C // H
        dense = lambda name: nn.Dense(C, dtype=self.dtype, name=name)
        q = dense("q_proj")(query).reshape(B, Lq, H, D).transpose(0, 2, 1, 3)
        k = dense("k_proj")(key).reshape(B, Lk, H, D).transpose(0, 2, 1, 3)
        v = dense("v_proj")(value).reshape(B, Lk, H, D).transpose(0, 2, 1, 3)
        if self.sow_weights:
            out, probs = attention_reference(q, k, v, key_padding_mask, return_probs=True)
            self.sow("intermediates", "attn_weights", probs)
        else:
            out = multi_head_attention(q, k, v, key_padding_mask, use_pallas=self.use_pallas)
        out = out.transpose(0, 2, 1, 3).reshape(B, Lq, C)
        return dense("out_proj")(out)


class EncoderLayer(nn.Module):
    d_model: int
    num_heads: int
    ffn_dim: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(
        self,
        src: Array,
        pos: Array,
        key_padding_mask: Array | None,
        deterministic: bool = True,
    ) -> Array:
        residual = src
        qk = src + pos
        attn = MultiHeadAttention(
            self.d_model, self.num_heads, self.dtype, self.use_pallas, name="self_attn"
        )(qk, qk, src, key_padding_mask)
        attn = nn.Dropout(self.dropout, deterministic=deterministic)(attn)
        src = nn.LayerNorm(dtype=self.dtype, name="self_attn_layer_norm")(residual + attn)

        residual = src
        y = nn.Dense(self.ffn_dim, dtype=self.dtype, name="fc1")(src)
        y = nn.relu(y)
        y = nn.Dropout(self.dropout, deterministic=deterministic)(y)
        y = nn.Dense(self.d_model, dtype=self.dtype, name="fc2")(y)
        y = nn.Dropout(self.dropout, deterministic=deterministic)(y)
        return nn.LayerNorm(dtype=self.dtype, name="final_layer_norm")(residual + y)


class DecoderLayer(nn.Module):
    d_model: int
    num_heads: int
    ffn_dim: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False
    sow_attn: bool = False

    @nn.compact
    def __call__(
        self,
        tgt: Array,  # (B, Q, C) decoder state
        query_pos: Array,  # (B, Q, C) learned query embeddings
        memory: Array,  # (B, L, C) encoder output
        memory_pos: Array,  # (B, L, C) spatial position embeddings
        memory_key_padding_mask: Array | None,
        deterministic: bool = True,
    ) -> Array:
        # Self-attention among object queries.
        residual = tgt
        qk = tgt + query_pos
        attn = MultiHeadAttention(
            self.d_model, self.num_heads, self.dtype, self.use_pallas, name="self_attn"
        )(qk, qk, tgt, None)
        attn = nn.Dropout(self.dropout, deterministic=deterministic)(attn)
        tgt = nn.LayerNorm(dtype=self.dtype, name="self_attn_layer_norm")(residual + attn)

        # Cross-attention into the encoder memory.
        residual = tgt
        attn = MultiHeadAttention(
            self.d_model, self.num_heads, self.dtype, self.use_pallas,
            sow_weights=self.sow_attn, name="encoder_attn"
        )(tgt + query_pos, memory + memory_pos, memory, memory_key_padding_mask)
        attn = nn.Dropout(self.dropout, deterministic=deterministic)(attn)
        tgt = nn.LayerNorm(dtype=self.dtype, name="encoder_attn_layer_norm")(residual + attn)

        residual = tgt
        y = nn.Dense(self.ffn_dim, dtype=self.dtype, name="fc1")(tgt)
        y = nn.relu(y)
        y = nn.Dropout(self.dropout, deterministic=deterministic)(y)
        y = nn.Dense(self.d_model, dtype=self.dtype, name="fc2")(y)
        y = nn.Dropout(self.dropout, deterministic=deterministic)(y)
        return nn.LayerNorm(dtype=self.dtype, name="final_layer_norm")(residual + y)


class Encoder(nn.Module):
    d_model: int
    num_heads: int
    ffn_dim: int
    num_layers: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False
    remat: bool = False  # rematerialize per layer: trade FLOPs for HBM

    @nn.compact
    def __call__(self, src, pos, key_padding_mask, deterministic: bool = True):
        layer_cls = (
            nn.remat(EncoderLayer, static_argnums=(4,))
            if self.remat else EncoderLayer
        )
        for i in range(self.num_layers):
            src = layer_cls(
                self.d_model, self.num_heads, self.ffn_dim, self.dropout,
                self.dtype, self.use_pallas, name=f"layer_{i}",
            )(src, pos, key_padding_mask, deterministic)
        return src


class Decoder(nn.Module):
    d_model: int
    num_heads: int
    ffn_dim: int
    num_layers: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False
    sow_attn: bool = False
    remat: bool = False

    @nn.compact
    def __call__(
        self, tgt, query_pos, memory, memory_pos, memory_key_padding_mask,
        deterministic: bool = True,
    ):
        layer_cls = (
            nn.remat(DecoderLayer, static_argnums=(6,))
            if self.remat else DecoderLayer
        )
        intermediate = []
        for i in range(self.num_layers):
            tgt = layer_cls(
                self.d_model, self.num_heads, self.ffn_dim, self.dropout,
                self.dtype, self.use_pallas, sow_attn=self.sow_attn, name=f"layer_{i}",
            )(tgt, query_pos, memory, memory_pos, memory_key_padding_mask, deterministic)
            intermediate.append(tgt)
        norm = nn.LayerNorm(dtype=self.dtype, name="layernorm")
        # HF DetrDecoder applies the final layernorm to the last hidden state;
        # auxiliary heads consume the *unnormalized* intermediates normalized
        # by the same layernorm (original DETR norms every intermediate).
        stacked = jnp.stack([norm(h) for h in intermediate], axis=0)
        return stacked  # (num_layers, B, Q, C); last entry == final output
