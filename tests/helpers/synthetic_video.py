"""Synthetic test-video generation: burned-in timestamps + moving "people".

Renders the timestamp with the Hershey font family the template OCR engine
is calibrated for, in the reference's ROI region (right-top,
config.yaml timestamp.extraction.roi), so Phase-1 extraction can be tested
end-to-end without tesseract.
"""

from __future__ import annotations

from datetime import datetime, timedelta
from pathlib import Path

import numpy as np


#: Distinct per-identity looks (BGR): (shirt, trousers, head). Used when a
#: person is given as ``(x, y, appearance_id)`` — real people are visually
#: distinct, so appearance-based Re-ID has signal to work with (the
#: pixel-identical 2-tuple form remains the motion-only stressor case).
APPEARANCES = [
    ((70, 60, 150), (60, 40, 40), (90, 120, 180)),   # red shirt (legacy look)
    ((150, 80, 40), (40, 40, 60), (90, 120, 180)),   # blue shirt
    ((50, 140, 60), (90, 90, 90), (120, 150, 190)),  # green shirt, grey legs
    ((40, 150, 170), (30, 30, 30), (90, 120, 180)),  # yellow shirt
    ((140, 60, 140), (70, 40, 40), (120, 150, 190)), # purple shirt
    ((200, 200, 200), (50, 50, 120), (90, 120, 180)),# white shirt, red legs
]


def render_frame(
    timestamp: datetime,
    width: int = 1280,
    height: int = 720,
    people: list[tuple[int, ...]] | None = None,
    seed: int = 0,
    font: str = "FONT_HERSHEY_SIMPLEX",
) -> np.ndarray:
    """One BGR frame with timestamp text burned into the top-right ROI.

    ``people`` entries are ``(x, y)`` (all identical — the legacy
    pixel-identical look) or ``(x, y, appearance_id)`` (distinct shirt /
    trouser / head colors from ``APPEARANCES``). Geometry is identical in
    both forms: body 50x130 at (x, y), head r14 at (x+25, y-12), so the GT
    bbox is always (x, y-26, 50, 156).
    """
    import cv2

    rng = np.random.default_rng(seed)
    frame = np.full((height, width, 3), 40, np.uint8)
    frame += rng.integers(0, 12, frame.shape, np.uint8)
    for p in people or []:
        x, y = int(p[0]), int(p[1])
        if len(p) >= 3:
            shirt, trousers, head = APPEARANCES[int(p[2]) % len(APPEARANCES)]
            # torso (upper 60%) + trousers (lower 40%) + head
            split = y + 78
            cv2.rectangle(frame, (x, y), (x + 50, split), shirt, -1)
            cv2.rectangle(frame, (x, split), (x + 50, y + 130), trousers, -1)
            cv2.circle(frame, (x + 25, y - 12), 14, head, -1)
        else:  # legacy pixel-identical look (motion-only stressor)
            cv2.rectangle(frame, (x, y), (x + 50, y + 130), (70, 60, 150), -1)
            cv2.circle(frame, (x + 25, y - 12), 14, (90, 120, 180), -1)
    text = timestamp.strftime("%Y/%m/%d %H:%M:%S")
    # ROI: x >= 0.70w, y in [0.045h, 0.105h): put text inside it.
    org = (int(width * 0.715), int(height * 0.09))
    cv2.putText(frame, text, org, getattr(cv2, font), 0.85,
                (255, 255, 255), 2, cv2.LINE_AA)
    return frame


def write_video(
    path: str | Path,
    num_frames: int = 60,
    fps: float = 30.0,
    start_time: datetime | None = None,
    time_compression_ratio: float = 313.0,
    width: int = 1280,
    height: int = 720,
    people_fn=None,
    font: str = "FONT_HERSHEY_SIMPLEX",
) -> Path:
    """Timelapse video: wall-clock advances ratio/fps seconds per frame."""
    import cv2

    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    start_time = start_time or datetime(2025, 1, 20, 9, 0, 0)
    writer = cv2.VideoWriter(
        str(path), cv2.VideoWriter_fourcc(*"mp4v"), fps, (width, height)
    )
    if not writer.isOpened():
        raise IOError("VideoWriter failed to open (mp4v codec unavailable?)")
    for i in range(num_frames):
        wall = start_time + timedelta(seconds=i / fps * time_compression_ratio)
        people = people_fn(i) if people_fn else [(300 + 2 * i, 300), (700 - 2 * i, 350)]
        writer.write(render_frame(wall, width, height, people, seed=i,
                                  font=font))
    writer.release()
    return path
