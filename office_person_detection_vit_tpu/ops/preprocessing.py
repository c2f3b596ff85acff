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
    target_hw: tuple[int, int] = (736, 1280),
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


# ---------------------------------------------------------------------------
# YUV 4:2:0 transfer path — halve host->device bytes
# ---------------------------------------------------------------------------
# The source video is already chroma-subsampled 4:2:0, so shipping I420
# instead of decoded BGR carries the SAME information at 1.5 bytes/px instead
# of 3 — a 2x cut in the host->device transfer that dominates end-to-end
# latency when the device link is slow (PCIe contention, remote tunnels).
# The YUV->RGB matrix runs on-device, fused into the same program as resize
# and normalization.


def bgr_to_i420(frames) -> "np.ndarray":
    """Host-side: (F, H, W, 3) uint8 BGR -> (F, H*3//2, W) uint8 I420.

    Requires H % 4 == 0 and W % 2 == 0 — the device-side de-interleave
    reshapes the chroma block as (2, H//4, W) (cv2's I420 itself only needs
    even H, but an odd half-height chroma block can't be split that way).

    Dispatches to the native multithreaded encoder (native/staging.cpp,
    byte-identical to cv2 — measured ~15x faster than the per-frame
    cv2.cvtColor loop) when the library is available; cv2 otherwise.
    """
    import cv2
    import numpy as np

    from .. import native

    H, W = frames.shape[1:3]
    if H % 4 or W % 2:
        raise ValueError(
            f"i420 transfer needs H%4==0 and W%2==0, got {H}x{W}; "
            "use detection.transfer_format=bgr for this input"
        )
    out = native.bgr_to_i420(np.asarray(frames))
    if out is not None:
        return out
    return np.stack(
        [cv2.cvtColor(f, cv2.COLOR_BGR2YUV_I420) for f in frames]
    )


@partial(jax.jit, static_argnames=("target_hw", "out_dtype"))
def preprocess_frames_i420(
    planes: Array,  # (F, H*3//2, W) uint8 I420
    target_hw: tuple[int, int] = (736, 1280),
    out_dtype: jnp.dtype = jnp.float32,
) -> tuple[Array, Array]:
    """I420 -> RGB (BT.601) -> ImageNet-normalize -> resize -> pad, fused.

    Same contract as :func:`preprocess_frames`.
    """
    F, HH, W = planes.shape
    H = HH * 2 // 3
    th, tw = target_hw
    rh, rw = compute_resize_geometry((H, W), (th, tw))

    y = planes[:, :H, :].astype(jnp.float32)  # (F, H, W)
    # I420 layout after the Y plane: U then V, each (H/2, W/2), stored as
    # (H/4, W)-shaped rows.
    chroma = planes[:, H:, :].reshape(F, 2, H // 4, W)
    u = chroma[:, 0].reshape(F, H // 2, W // 2)
    v = chroma[:, 1].reshape(F, H // 2, W // 2)
    # Nearest-neighbor 2x chroma upsample (matches cv2 I420->BGR).
    u = jnp.repeat(jnp.repeat(u, 2, axis=1), 2, axis=2).astype(jnp.float32)
    v = jnp.repeat(jnp.repeat(v, 2, axis=1), 2, axis=2).astype(jnp.float32)

    # BT.601 studio-swing YUV -> RGB (matches cv2's I420 convention:
    # Y in [16, 235], chroma in [16, 240]).
    yy = 1.163999557 * (y - 16.0)
    cb = u - 128.0
    cr = v - 128.0
    r = yy + 1.595999718 * cr
    g = yy - 0.390999794 * cb - 0.812999725 * cr
    b = yy + 2.017999649 * cb
    x = jnp.stack([r, g, b], axis=-1) / 255.0  # (F, H, W, 3) RGB
    x = jnp.clip(x, 0.0, 1.0)

    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(IMAGENET_STD, jnp.float32)
    x = (x - mean) / std

    x = jax.image.resize(x, (F, rh, rw, 3), method="bilinear")
    x = jnp.pad(x, [(0, 0), (0, th - rh), (0, tw - rw), (0, 0)])
    mask = jnp.zeros((F, th, tw), bool).at[:, :rh, :rw].set(True)
    return x.astype(out_dtype), mask


def i420_delta_encode(i420_frames, prev_last):
    """Host-side XOR delta encoding for the compressing tunnel.

    Timelapse/dense-tracking frames are mostly static, so
    ``frame[i] ^ frame[i-1]`` is near-zero almost everywhere and the
    tunnel's wire compression collapses it — the same bytes that cost
    ~1.4 MB/frame as raw i420 ship as a few KB of deltas. Exactly
    reversible on device (:func:`reconstruct_i420_delta`), so the decoded
    pixels are byte-identical to the i420 path.

    i420_frames: (F, H*3//2, W) uint8; prev_last: (H*3//2, W) uint8 — the
    last frame of the previous chunk (zeros for the first chunk).
    Returns deltas of the same shape as ``i420_frames``.
    """
    import numpy as np

    from .. import native

    out = native.i420_delta_encode(np.asarray(i420_frames), prev_last)
    if out is not None:
        return out
    deltas = i420_frames.copy()
    deltas[1:] ^= i420_frames[:-1]
    deltas[0] ^= np.asarray(prev_last, np.uint8)
    return deltas


def reconstruct_i420_delta(deltas: Array, prev_last: Array) -> Array:
    """Device-side inverse of :func:`i420_delta_encode`.

    XOR is associative, so the inclusive XOR-scan over the frame axis
    telescopes ``delta[0..i]`` back to ``frame[i] ^ prev_last``; one more
    XOR with ``prev_last`` recovers the frames exactly.
    """
    frames = jax.lax.associative_scan(jnp.bitwise_xor, deltas, axis=0)
    return frames ^ prev_last[None]
