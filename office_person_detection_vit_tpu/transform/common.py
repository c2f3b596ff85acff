"""Shared detection-coordinate writing for all transformer facades."""

from __future__ import annotations

import numpy as np

from ..core.dto import Detection
from .floormap_config import FloorMapConfig


def apply_floor_transform(
    transform_batch, floormap: FloorMapConfig, dets: list[Detection]
) -> list[Detection]:
    """foot points -> transform_batch -> mm scaling -> write floor coords
    onto the detections (single definition for homography / PWA / TPS)."""
    if not dets:
        return dets
    feet = np.asarray([d.foot_point for d in dets], np.float32)
    floor_px = transform_batch(feet)
    floor_mm = floormap.px_to_mm(floor_px)
    for d, px, mm in zip(dets, floor_px, floor_mm):
        d.floor_coords_px = (float(px[0]), float(px[1]))
        d.floor_coords_mm = (float(mm[0]), float(mm[1]))
    return dets
