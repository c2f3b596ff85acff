"""Fused on-device image preprocessing for the detector.

The reference round-trips every frame host->device individually
(yolov8_detector.py:122, SURVEY.md §3.1 "the #1 thing the TPU rebuild batches
away"). Here the host hands over one uint8 frame batch and a single jitted
program does BGR->RGB, float conversion, ImageNet normalization,
aspect-preserving bilinear resize and letterbox padding — all fused by XLA,
no intermediate HBM round-trips, bf16-castable output feeding the backbone.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import Array

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def compute_resize_geometry(
    src_hw: tuple[int, int], dst_hw: tuple[int, int]
) -> tuple[int, int]:
    """Aspect-preserving target size (h, w) fitting src into dst."""
    sh, sw = src_hw
    dh, dw = dst_hw
    scale = min(dh / sh, dw / sw)
    return (min(dh, round(sh * scale)), min(dw, round(sw * scale)))


@partial(jax.jit, static_argnames=("target_hw", "bgr", "out_dtype"))
def preprocess_frames(
    frames: Array,  # (F, H, W, 3) uint8
    target_hw: tuple[int, int] = (768, 1344),
    bgr: bool = True,
    out_dtype: jnp.dtype = jnp.float32,
) -> tuple[Array, Array]:
    """Returns (pixel_values (F, th, tw, 3), pixel_mask (F, th, tw) bool)."""
    F, H, W, _ = frames.shape
    th, tw = target_hw
    rh, rw = compute_resize_geometry((H, W), (th, tw))

    x = frames.astype(jnp.float32) / 255.0
    if bgr:
        x = x[..., ::-1]
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(IMAGENET_STD, jnp.float32)
    x = (x - mean) / std

    x = jax.image.resize(x, (F, rh, rw, 3), method="bilinear")
    x = jnp.pad(x, [(0, 0), (0, th - rh), (0, tw - rw), (0, 0)])

    mask = jnp.zeros((F, th, tw), bool).at[:, :rh, :rw].set(True)
    return x.astype(out_dtype), mask


def valid_fraction(src_hw: tuple[int, int], target_hw: tuple[int, int]) -> tuple[float, float]:
    """(valid_h/th, valid_w/tw) — for mapping normalized boxes back if needed."""
    rh, rw = compute_resize_geometry(src_hw, target_hw)
    return rh / target_hw[0], rw / target_hw[1]
