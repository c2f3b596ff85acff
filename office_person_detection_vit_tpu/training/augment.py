"""On-device training augmentation, fused into the jitted train step.

The reference trains through ultralytics, which augments on the host CPU
per worker (hsv/flip/mosaic defaults baked into `model.train`, reference
tools/train_yolov8.py:18-40). TPU-first inverts that: augmentation is a
few vectorized ops on tensors already resident in HBM, so it fuses into
the training program and costs ~nothing — no host preprocessing pipeline
to keep fed.

Implemented (per-sample, driven by the step's PRNG key):
- horizontal flip (probability ``hflip_prob``), box-aware: normalized
  cx -> 1 - cx. Letterbox-aware: when ``content_w`` is set, the flip
  mirrors only the valid content columns (flip full canvas + roll the
  right-edge padding back), so the pixel mask and the box normalization
  to the valid area stay untouched.
- photometric jitter: per-sample brightness (additive) and contrast
  (multiplicative) on the ImageNet-normalized tensor. Magnitudes are in
  normalized units (std ~0.22), so the defaults ~0.2 correspond to a
  visually mild +-4% raw-pixel shift / +-20% contrast scale.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class AugmentConfig:
    hflip_prob: float = 0.5
    brightness: float = 0.2
    contrast: float = 0.2
    #: static width (pixels) of the letterboxed valid content; None = full
    #: canvas (no horizontal padding).
    content_w: int | None = None


def augment_batch(rng: jax.Array, batch: dict, cfg: AugmentConfig) -> dict:
    """Returns a new batch dict with augmented ``pixels`` / ``boxes``
    (``pixel_mask``, when present, is geometry-invariant — see module
    docstring — and passes through)."""
    pixels = batch["pixels"]
    boxes = batch["boxes"]
    B, _, W, _ = pixels.shape
    k_flip, k_bright, k_contrast = jax.random.split(rng, 3)

    flip = jax.random.bernoulli(k_flip, cfg.hflip_prob, (B,))
    flipped = pixels[:, :, ::-1, :]
    if cfg.content_w is not None and cfg.content_w != W:
        # Mirror only the valid columns: after a full-canvas flip the
        # right-edge padding sits on the left; roll it back to the right.
        flipped = jnp.roll(flipped, shift=-(W - cfg.content_w), axis=2)
    pixels = jnp.where(flip[:, None, None, None], flipped, pixels)

    # Normalized cxcywh targets: mirror the center within the valid area.
    cx = jnp.where(flip[:, None], 1.0 - boxes[..., 0], boxes[..., 0])
    boxes = boxes.at[..., 0].set(cx)

    c = jax.random.uniform(k_contrast, (B,), minval=-cfg.contrast,
                           maxval=cfg.contrast)
    b = jax.random.uniform(k_bright, (B,), minval=-cfg.brightness,
                           maxval=cfg.brightness)
    pixels = pixels * (1.0 + c[:, None, None, None]).astype(pixels.dtype)
    pixels = pixels + b[:, None, None, None].astype(pixels.dtype)

    out = dict(batch)
    out["pixels"] = pixels
    out["boxes"] = boxes
    return out


def content_width(target_hw: tuple[int, int],
                  source_wh: tuple[int, int] = (1280, 720)) -> int:
    """Static letterbox content width for augment's ``content_w``: the
    number of valid columns after aspect-preserving resize of a
    ``source_wh`` frame into ``target_hw`` (matches
    ops/preprocessing.py's letterbox geometry)."""
    from ..ops.preprocessing import compute_resize_geometry

    sw, sh = source_wh
    _, rw = compute_resize_geometry((sh, sw), target_hw)
    return rw
