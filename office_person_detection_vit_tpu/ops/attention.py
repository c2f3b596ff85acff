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

    The MXU dots take the inputs in their native dtype (bf16 in production)
    with f32 accumulation via preferred_element_type — casting operands to
    f32 first would run the MXU at a fraction of bf16 throughput, which is
    exactly how the round-1 kernel lost to XLA. Softmax stays f32.
    """
    scores = jax.lax.dot_general(
        q_ref[0],
        k_ref[0],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    scores = scores * scale
    valid = mask_ref[0, 0, :] > 0.5
    scores = jnp.where(valid[None, :], scores, NEG_INF)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    s = jnp.sum(e, axis=-1, keepdims=True)
    probs = (e / s).astype(v_ref.dtype)
    out = jnp.dot(probs, v_ref[0], preferred_element_type=jnp.float32)
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


def _flash_attn_kernel(
    q_ref, k_ref, v_ref, mask_ref, o_ref, m_ref, l_ref, acc_ref, *, scale: float
):
    """Flash-attention forward: online softmax over KV blocks.

    Grid: (BH, n_q_blocks, n_k_blocks), k innermost. Blocks:
      q_ref (1, BQ, D), k_ref/v_ref (1, BK, D), mask_ref (1, 1, BK),
      o_ref (1, BQ, D). Scratch: m/l (BQ, 128) f32 running max / normalizer
      (value broadcast across lanes), acc (BQ, D) f32.
    """
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    s = jax.lax.dot_general(
        q_ref[0], k_ref[0], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # (BQ, BK) — bf16 MXU inputs, f32 accumulation
    valid = mask_ref[0, 0, :] > 0.5
    s = jnp.where(valid[None, :], s, NEG_INF)

    m_prev = m_ref[:, :1]  # (BQ, 1)
    l_prev = l_ref[:, :1]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    # Zero out fully-masked columns explicitly: when every key so far is
    # invalid m_new == NEG_INF and exp(s - m_new) would be exp(0) = 1.
    p = jnp.where(valid[None, :], jnp.exp(s - m_new), 0.0)  # (BQ, BK)
    l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
    acc_ref[...] = acc_ref[...] * alpha + jnp.dot(
        p.astype(v_ref.dtype), v_ref[0], preferred_element_type=jnp.float32
    )
    m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)
    l_ref[...] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(ki == nk - 1)
    def _finalize():
        l = jnp.maximum(l_ref[:, :1], 1e-30)
        o_ref[0] = (acc_ref[...] / l).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("block_q", "block_k", "interpret")
)
def attention_pallas_flash(
    q: Array,
    k: Array,
    v: Array,
    key_padding_mask: Array | None = None,
    *,
    block_q: int = 256,
    block_k: int = 512,
    interpret: bool = False,
) -> Array:
    """Flash-style streaming attention (same contract as
    attention_reference). The (Lq, Lk) score matrix never materializes —
    VMEM holds one (block_q, block_k) tile + a (block_q, D) accumulator, so
    sequence length is bounded by HBM, not VMEM (SURVEY.md §5.7
    "blockwise ... so long-context variants are possible")."""
    B, H, Lq, D = q.shape
    Lk = k.shape[2]
    scale = 1.0 / float(D) ** 0.5

    block_q = min(block_q, _round_up(Lq, 128))
    block_k = min(block_k, _round_up(Lk, 128))
    Lq_p = _round_up(Lq, block_q)
    Lk_p = _round_up(Lk, block_k)
    D_p = _round_up(D, 8)

    qp = jnp.pad(q, [(0, 0), (0, 0), (0, Lq_p - Lq), (0, D_p - D)])
    kp = jnp.pad(k, [(0, 0), (0, 0), (0, Lk_p - Lk), (0, D_p - D)])
    vp = jnp.pad(v, [(0, 0), (0, 0), (0, Lk_p - Lk), (0, D_p - D)])
    if key_padding_mask is None:
        mask = jnp.ones((B, Lk), jnp.float32)
    else:
        mask = key_padding_mask.astype(jnp.float32)
    mask = jnp.pad(mask, [(0, 0), (0, Lk_p - Lk)])

    BH = B * H
    qf = qp.reshape(BH, Lq_p, D_p)
    kf = kp.reshape(BH, Lk_p, D_p)
    vf = vp.reshape(BH, Lk_p, D_p)
    maskf = jnp.repeat(mask, H, axis=0).reshape(BH, 1, Lk_p)

    grid = (BH, Lq_p // block_q, Lk_p // block_k)
    out = pl.pallas_call(
        functools.partial(_flash_attn_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((BH, Lq_p, D_p), q.dtype),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (1, block_q, D_p), lambda i, qi, ki: (i, qi, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, block_k, D_p), lambda i, qi, ki: (i, ki, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, block_k, D_p), lambda i, qi, ki: (i, ki, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, 1, block_k), lambda i, qi, ki: (i, 0, ki),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, block_q, D_p), lambda i, qi, ki: (i, qi, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((block_q, 128), jnp.float32),  # running max
                pltpu.VMEM((block_q, 128), jnp.float32),  # running normalizer
                pltpu.VMEM((block_q, D_p), jnp.float32),  # output accumulator
            ],
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * BH * Lq_p * Lk_p * D_p,
            bytes_accessed=BH * (Lq_p * D_p + 2 * Lk_p * D_p + Lq_p * D_p) * 4,
            transcendentals=BH * Lq_p * Lk_p,
        ),
    )(qf, kf, vf, maskf)
    return out.reshape(B, H, Lq_p, D_p)[:, :, :Lq, :D]


#: Above this score-matrix footprint (f32 bytes) the whole-KV kernel would
#: pressure VMEM; switch to the streaming kernel.
_FLASH_BYTES_THRESHOLD = 8 * 1024 * 1024


def _pallas_dispatch(q, k, v, key_padding_mask, interpret):
    Lq_p = _round_up(q.shape[2], 128)
    Lk_p = _round_up(k.shape[2], 128)
    if Lq_p * Lk_p * 4 > _FLASH_BYTES_THRESHOLD:
        return attention_pallas_flash(q, k, v, key_padding_mask, interpret=interpret)
    return attention_pallas(q, k, v, key_padding_mask, interpret=interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _attention_pallas_diff(q, k, v, key_padding_mask, interpret=False):
    """Differentiable wrapper: Pallas kernel forward, einsum-recompute
    backward (guide 'Custom VJP' pattern). pallas_call has no autodiff
    rule, so training through the fused kernel needs this; the backward
    recomputes attention with the reference path and differentiates it —
    a flash-style fused backward kernel is a drop-in upgrade later."""
    return _pallas_dispatch(q, k, v, key_padding_mask, interpret)


def _attn_fwd(q, k, v, key_padding_mask, interpret):
    return _pallas_dispatch(q, k, v, key_padding_mask, interpret), (
        q, k, v, key_padding_mask,
    )


def _attn_bwd(interpret, residuals, g):
    q, k, v, key_padding_mask = residuals
    _, vjp = jax.vjp(
        lambda q, k, v: attention_reference(q, k, v, key_padding_mask), q, k, v
    )
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


_attention_pallas_diff.defvjp(_attn_fwd, _attn_bwd)


def multi_head_attention(
    q: Array,
    k: Array,
    v: Array,
    key_padding_mask: Array | None = None,
    *,
    use_pallas: bool = False,
    interpret: bool = False,
) -> Array:
    """Dispatch: einsum reference, whole-KV fused kernel (DETR-sized
    sequences), or flash streaming kernel (long sequences). The Pallas
    paths are differentiable via a custom VJP."""
    if use_pallas:
        return _attention_pallas_diff(q, k, v, key_padding_mask, interpret)
    return attention_reference(q, k, v, key_padding_mask)
