"""Host-side annotated-image rendering (reference src/utils/image_utils.py).

Deterministic per-track colors (reference image_utils.py:13), bbox + label
rendering with simple overlap avoidance (:131-230), and detection/tracked
image saving (:47,131). Pure OpenCV on host — runs while the TPU works on
the next batch.
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Sequence

import cv2
import numpy as np

from ..core.dto import Detection

logger = logging.getLogger(__name__)

_DETECTION_COLOR = (0, 200, 0)  # BGR green
_LABEL_TEXT = (255, 255, 255)


def track_id_color(track_id: int) -> tuple[int, int, int]:
    """Deterministic, well-spread BGR color for a track id (golden-angle hue)."""
    hue = int((track_id * 137.508) % 180)  # OpenCV hue range is [0, 180)
    hsv = np.array([[[hue, 220, 255]]], np.uint8)
    b, g, r = cv2.cvtColor(hsv, cv2.COLOR_HSV2BGR)[0, 0]
    return int(b), int(g), int(r)


def _draw_label(
    img: np.ndarray,
    text: str,
    x: int,
    y: int,
    color: tuple[int, int, int],
    used_rows: list[tuple[int, int, int]],
) -> None:
    """Filled label box above (x, y), nudged down if it would overlap a
    previously placed label (reference image_utils.py:131-230)."""
    (tw, th), baseline = cv2.getTextSize(text, cv2.FONT_HERSHEY_SIMPLEX, 0.5, 1)
    ty = max(th + baseline, y)
    for ux, uw, uy in used_rows:
        if abs(uy - ty) < th + baseline + 2 and ux < x + tw and x < ux + uw:
            ty = uy + th + baseline + 4
    used_rows.append((x, tw, ty))
    cv2.rectangle(img, (x, ty - th - baseline), (x + tw + 4, ty + 2), color, -1)
    cv2.putText(
        img, text, (x + 2, ty - baseline // 2),
        cv2.FONT_HERSHEY_SIMPLEX, 0.5, _LABEL_TEXT, 1, cv2.LINE_AA,
    )


def draw_detections(
    frame: np.ndarray,
    detections: Sequence[Detection],
    *,
    draw_track_ids: bool = False,
    draw_confidence: bool = True,
    draw_foot_point: bool = True,
) -> np.ndarray:
    """Return a copy of the frame with bboxes / labels / foot points drawn."""
    img = frame.copy()
    used_rows: list[tuple[int, int, int]] = []
    for det in detections:
        x, y, w, h = (int(round(v)) for v in det.bbox)
        color = (
            track_id_color(det.track_id)
            if draw_track_ids and det.track_id is not None
            else _DETECTION_COLOR
        )
        cv2.rectangle(img, (x, y), (x + w, y + h), color, 2)
        parts = []
        if draw_track_ids and det.track_id is not None:
            parts.append(f"ID{det.track_id}")
        if draw_confidence:
            parts.append(f"{det.confidence:.2f}")
        if parts:
            _draw_label(img, " ".join(parts), x, y, color, used_rows)
        if draw_foot_point and det.foot_point is not None:
            fx, fy = (int(round(v)) for v in det.foot_point)
            cv2.circle(img, (fx, fy), 4, color, -1)
    return img


def save_detection_image(
    frame: np.ndarray,
    detections: Sequence[Detection],
    output_path: str | Path,
    **kwargs,
) -> Path:
    """Annotate and write a detection frame (reference image_utils.py:47)."""
    out = Path(output_path)
    out.parent.mkdir(parents=True, exist_ok=True)
    cv2.imwrite(str(out), draw_detections(frame, detections, **kwargs))
    return out


def save_tracked_detection_image(
    frame: np.ndarray,
    detections: Sequence[Detection],
    output_path: str | Path,
) -> Path:
    """Tracked variant: per-ID colors + ID labels (reference :131)."""
    return save_detection_image(
        frame, detections, output_path, draw_track_ids=True
    )
