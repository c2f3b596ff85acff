"""ResNet-50 backbone with frozen BatchNorm, NHWC/HWIO, Flax.

The DETR detector's convolutional backbone (reference spec
.kiro/specs/office-person-detection/design.md:235-268 — facebook/detr-resnet-50).
Structure mirrors torchvision/HF ResNet v1.5 (stride on the 3x3 bottleneck
conv) so pretrained torch checkpoints convert 1:1 (see models/weights.py).

BatchNorm is *frozen* (DETR convention): running stats are folded into a
per-channel affine at weight-conversion time, so on TPU it is a fused
scale+bias — no batch statistics, no train/eval divergence, and XLA folds it
straight into the preceding conv.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp
from jax import Array


class FrozenBatchNorm(nn.Module):
    """Per-channel affine y = x * scale + bias (folded BN)."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        scale = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        return x * scale.astype(self.dtype) + bias.astype(self.dtype)


class Bottleneck(nn.Module):
    """ResNet v1.5 bottleneck: 1x1 reduce -> 3x3 (stride) -> 1x1 expand."""

    in_features: int
    mid_features: int
    out_features: int
    stride: int = 1
    #: kernel dilation on the 3x3 (DETR-DC5: last stage stride->1,
    #: dilation 2 — torchvision replace_stride_with_dilation semantics).
    #: Weight shapes are unchanged, so checkpoints load either way.
    dilation: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        residual = x
        needs_proj = self.stride != 1 or self.in_features != self.out_features
        if needs_proj:
            residual = nn.Conv(
                self.out_features, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, dtype=self.dtype, name="shortcut_conv",
            )(x)
            residual = FrozenBatchNorm(self.out_features, self.dtype, name="shortcut_bn")(residual)

        y = nn.Conv(self.mid_features, (1, 1), use_bias=False, dtype=self.dtype, name="conv0")(x)
        y = FrozenBatchNorm(self.mid_features, self.dtype, name="bn0")(y)
        y = nn.relu(y)
        d = self.dilation
        y = nn.Conv(
            self.mid_features, (3, 3), strides=(self.stride, self.stride),
            padding=[(d, d), (d, d)], kernel_dilation=(d, d),
            use_bias=False, dtype=self.dtype, name="conv1",
        )(y)
        y = FrozenBatchNorm(self.mid_features, self.dtype, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.out_features, (1, 1), use_bias=False, dtype=self.dtype, name="conv2")(y)
        y = FrozenBatchNorm(self.out_features, self.dtype, name="bn2")(y)
        return nn.relu(y + residual)


class ResNet(nn.Module):
    """ResNet backbone returning the final stage feature map (stride 32).

    depths (3, 4, 6, 3) + hidden (256, 512, 1024, 2048) = ResNet-50.
    """

    depths: Sequence[int] = (3, 4, 6, 3)
    hidden_sizes: Sequence[int] = (256, 512, 1024, 2048)
    embedding_size: int = 64
    dtype: jnp.dtype = jnp.float32
    #: return the last 3 stage outputs (strides 8/16/32) instead of just C5
    #: — the FPN input for multi-scale detection heads. Param names/tree are
    #: unchanged, so checkpoints load either way.
    return_pyramid: bool = False
    #: DETR-DC5: last stage keeps spatial resolution (stride 1) with
    #: dilation 2 on its 3x3 convs -> C5 at stride 16. Param tree is
    #: unchanged; any ResNet checkpoint loads in either mode.
    dilate_last_stage: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        # Stem: 7x7/2 conv + frozen BN + relu + 3x3/2 maxpool.
        y = nn.Conv(
            self.embedding_size, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
            use_bias=False, dtype=self.dtype, name="embedder_conv",
        )(x)
        y = FrozenBatchNorm(self.embedding_size, self.dtype, name="embedder_bn")(y)
        y = nn.relu(y)
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        in_feat = self.embedding_size
        stage_outputs = []
        n_stages = len(self.depths)
        for s, (depth, hidden) in enumerate(zip(self.depths, self.hidden_sizes)):
            mid = hidden // 4
            dilate = self.dilate_last_stage and s == n_stages - 1
            for layer in range(depth):
                stride = 2 if (layer == 0 and s > 0 and not dilate) else 1
                y = Bottleneck(
                    in_features=in_feat,
                    mid_features=mid,
                    out_features=hidden,
                    stride=stride,
                    dilation=2 if dilate else 1,
                    dtype=self.dtype,
                    name=f"stage{s}_layer{layer}",
                )(y)
                in_feat = hidden
            stage_outputs.append(y)
        if self.return_pyramid:
            return tuple(stage_outputs[-3:])  # (C3 s8, C4 s16, C5 s32)
        return y
