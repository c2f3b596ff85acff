"""Pallas-fused ResNet bottleneck block (1x1 -> 3x3 -> 1x1 + residual).

The round-2 roofline (docs/performance.md) put the DETR-R50 backbone at
~37% of MXU peak with XLA scheduling the convs, and left ONE lever
unmeasured: a hand-fused bottleneck that keeps the two intermediate
activations (B, H, W, 64) in VMEM instead of round-tripping them through
HBM. XLA materializes y1/y2 between the convs and re-reads x for the
residual — at stage-1 geometry (184x320, C=256, batch 16) that is ~1.9 GB
of HBM traffic per block vs the fused kernel's ~0.96 GB (read x + write
out once).

This kernel computes the *identity* (non-projection, stride-1) bottleneck
with frozen-BN weights folded into the convs (models/resnet.py Bottleneck
semantics, reference src/detection/detector.py's torchvision backbone):

    y1 = relu(x @ W1 + b1)            # 1x1 reduce  C -> M
    y2 = relu(conv3x3(y1, W2) + b2)   # 3x3, SAME   M -> M
    out = relu(x + y2 @ W3 + b3)      # 1x1 expand  M -> C

Design (pallas_guide.md): grid over (batch, row-tiles); x stays in HBM
(BlockSpec can't express overlapping halo windows) and each step manually
DMAs a (tile_h+2)-row haloed slice into a double-buffered VMEM scratch,
prefetching the next tile's rows while computing the current one. The
3x3 conv is 9 shifted (tile_h*W, M) @ (M, M) MXU matmuls accumulated in
f32 — no im2col materialization. Halos at the image border are handled
by clamping the DMA start and re-aligning rows in a zero-filled VMEM
staging buffer, so the input is never physically padded (a (B,H,W,256)
pad would itself cost ~1 GB of HBM traffic at stage-1 geometry).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: Horizontal-pad offset in the y1 staging buffer. Must be a multiple of
#: the sublane tile (8 for f32, 16 for bf16) so the staging store is
#: tile-aligned on the second-minor dim; 16 covers both dtypes.
PAD = 16


def _kernel(w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,  # VMEM weights
            x_hbm,                                            # (B, H, W, C) HBM
            out_ref,                                          # (1, TH, W, C) VMEM
            xh, y1_buf, sem,                                  # scratch
            *, tile_h: int, H: int, W: int):
    TH = tile_h
    b, j = pl.program_id(0), pl.program_id(1)
    nb, nj = pl.num_programs(0), pl.num_programs(1)
    step = b * nj + j

    def dma(slot, bb, jj):
        # Haloed rows jj*TH-1 .. jj*TH+TH, clamped into the image; the
        # residual misalignment d = jj*TH-1-start in {-1,0,1} is fixed up
        # when y1 lands in the staging buffer. The destination is the whole
        # (TH+2, W, C) slot — Mosaic requires DMA slices on the tiled
        # (sublane, lane) dims to be tile-aligned, so the horizontal SAME
        # padding lives in the y1 staging buffer (aligned offset) instead
        # of pad columns here.
        start = jnp.clip(jj * TH - 1, 0, H - (TH + 2))
        return pltpu.make_async_copy(
            x_hbm.at[bb, pl.ds(start, TH + 2)],
            xh.at[slot],
            sem.at[slot],
        )

    @pl.when(step == 0)
    def _():
        dma(0, b, j).start()

    nxt_b = jnp.where(j + 1 < nj, b, b + 1)
    nxt_j = jnp.where(j + 1 < nj, j + 1, 0)

    @pl.when(step + 1 < nb * nj)
    def _():
        dma((step + 1) % 2, nxt_b, nxt_j).start()

    slot = step % 2
    dma(slot, b, j).wait()

    xt = xh[slot]                         # (TH+2, W, C) bf16
    C = xt.shape[-1]
    M = w1_ref.shape[1]
    start = jnp.clip(j * TH - 1, 0, H - (TH + 2))
    d = j * TH - 1 - start                # {-1, 0, 1}

    # --- 1x1 reduce on the haloed tile (one (TH+2)*W x C matmul).
    y1 = jnp.dot(xt.reshape(-1, C), w1_ref[...],
                 preferred_element_type=jnp.float32) + b1_ref[...]
    y1 = jnp.maximum(y1, 0.0).astype(xt.dtype).reshape(TH + 2, W, M)

    # --- Stage y1 so buffer row v+1 = original image row j*TH + v - 1 and
    # buffer col PAD+u = image col u; rows/cols outside the image stay zero
    # (the 3x3's SAME padding). d only takes {-1, 0, +1} (top tile /
    # interior / bottom tile), and Mosaic can't lower dynamically-offset
    # stores — predicated static stores cover the three cases at zero
    # cost. PAD=16 keeps the store's sublane (column) offset tile-aligned.
    y1_buf[...] = jnp.zeros_like(y1_buf)

    @pl.when(d == -1)
    def _():
        y1_buf[2:TH + 4, PAD:PAD + W] = y1

    @pl.when(d == 0)
    def _():
        y1_buf[1:TH + 3, PAD:PAD + W] = y1

    @pl.when(d == 1)
    def _():
        y1_buf[0:TH + 2, PAD:PAD + W] = y1

    # --- 3x3 as 9 shifted MXU matmuls, f32 accumulation.
    acc = jnp.zeros((TH * W, M), jnp.float32)
    for ky in range(3):
        for kx in range(3):
            patch = y1_buf[ky + 1:ky + 1 + TH,
                           PAD - 1 + kx:PAD - 1 + kx + W].reshape(TH * W, M)
            acc += jnp.dot(patch, w2_ref[ky * 3 + kx],
                           preferred_element_type=jnp.float32)
    y2 = jnp.maximum(acc + b2_ref[...], 0.0).astype(xt.dtype)

    # --- 1x1 expand + residual + relu.
    y3 = jnp.dot(y2, w3_ref[...], preferred_element_type=jnp.float32) \
        + b3_ref[...]
    # Residual rows j*TH..j*TH+TH-1 sit at xt rows d+1..d+1+TH; same
    # {-1, 0, +1} story as the staging above (dynamic_slice won't lower).
    res = jnp.where(
        d == -1, xt[0:TH],
        jnp.where(d == 1, xt[2:2 + TH], xt[1:1 + TH]),
    ).reshape(TH * W, C)
    out = jnp.maximum(y3 + res.astype(jnp.float32), 0.0)
    out_ref[...] = out.astype(out_ref.dtype).reshape(1, TH, W, C)


@functools.partial(jax.jit, static_argnames=("tile_h", "interpret"))
def fused_bottleneck(x: Array, w1: Array, b1: Array, w2: Array, b2: Array,
                     w3: Array, b3: Array, *, tile_h: int = 8,
                     interpret: bool = False) -> Array:
    """relu(x + conv1x1(relu(conv3x3(relu(conv1x1(x)))))) fused in VMEM.

    x: (B, H, W, C); w1: (C, M); w2: (3, 3, M, M) HWIO; w3: (M, C);
    biases are the folded frozen-BN affine terms. H must be divisible by
    tile_h. Returns x.dtype.
    """
    B, H, W, C = x.shape
    M = w1.shape[1]
    if H % tile_h:
        raise ValueError(f"H={H} not divisible by tile_h={tile_h}")
    w2k = w2.reshape(9, M, M)
    kern = functools.partial(_kernel, tile_h=tile_h, H=H, W=W)
    flops = 2 * B * H * W * (C * M + 9 * M * M + M * C)
    return pl.pallas_call(
        kern,
        grid=(B, H // tile_h),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # w1
            pl.BlockSpec(memory_space=pltpu.VMEM),   # b1
            pl.BlockSpec(memory_space=pltpu.VMEM),   # w2 (9, M, M)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # b2
            pl.BlockSpec(memory_space=pltpu.VMEM),   # w3
            pl.BlockSpec(memory_space=pltpu.VMEM),   # b3
            pl.BlockSpec(memory_space=pl.ANY),       # x stays in HBM
        ],
        out_specs=pl.BlockSpec(
            (1, tile_h, W, C), lambda b, j: (b, j, 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, tile_h + 2, W, C), x.dtype),        # haloed x tiles
            pltpu.VMEM((tile_h + 4, W + 2 * PAD, M), x.dtype),  # staged y1
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=2 * B * H * W * C * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(w1, b1, w2k, b2, w3, b3, x)


def bottleneck_reference(x: Array, w1: Array, b1: Array, w2: Array,
                         b2: Array, w3: Array, b3: Array) -> Array:
    """The same block in plain XLA (the measured baseline)."""
    dn = ("NHWC", "HWIO", "NHWC")
    y = jax.lax.conv_general_dilated(
        x, w1[None, None], (1, 1), "VALID", dimension_numbers=dn,
        preferred_element_type=jnp.float32) + b1
    y = jnp.maximum(y, 0.0).astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        y, w2, (1, 1), "SAME", dimension_numbers=dn,
        preferred_element_type=jnp.float32) + b2
    y = jnp.maximum(y, 0.0).astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        y, w3[None, None], (1, 1), "VALID", dimension_numbers=dn,
        preferred_element_type=jnp.float32) + b3
    return jnp.maximum(y + x.astype(jnp.float32), 0.0).astype(x.dtype)
