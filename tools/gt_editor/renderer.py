"""Camera + floormap rendering for the GT editor (analog of reference
tools/gt_editor/renderer.py:1-474).

CameraRenderer draws the current frame's boxes/ids and trajectory tails;
FloormapRenderer projects foot points through the session homography onto
the floormap. Both return BGR arrays; compose() hstacks them for display.
"""

from __future__ import annotations

import numpy as np

from office_person_detection_vit_tpu.utils.image_utils import track_id_color


class CameraRenderer:
    def __init__(self, tail_frames: int = 10):
        self.tail_frames = int(tail_frames)

    def render(
        self,
        frame: np.ndarray,
        manager,
        frame_number: int,
        selected: tuple[int, int] | None = None,
    ) -> np.ndarray:
        import cv2

        img = frame.copy()
        for tid, p in manager.points_at_frame(frame_number):
            x, y, w, h = (int(v) for v in p["bbox"])
            color = track_id_color(tid)
            thick = 3 if selected and selected[0] == tid else 2
            cv2.rectangle(img, (x, y), (x + w, y + h), color, thick)
            cv2.putText(
                img, f"#{tid}", (x, max(y - 6, 12)),
                cv2.FONT_HERSHEY_SIMPLEX, 0.6, color, 2,
            )
        # trajectory tails: last N points per track up to this frame
        for t in manager.tracks:
            pts = [
                p for p in t["trajectory"]
                if frame_number - self.tail_frames <= int(p["frame"]) <= frame_number
            ]
            centers = [
                (int(p["bbox"][0] + p["bbox"][2] / 2), int(p["bbox"][1] + p["bbox"][3]))
                for p in pts
            ]
            for a, b in zip(centers, centers[1:]):
                cv2.line(img, a, b, track_id_color(t["track_id"]), 2)
        cv2.putText(
            img, f"frame {frame_number}", (10, 28),
            cv2.FONT_HERSHEY_SIMPLEX, 0.8, (255, 255, 255), 2,
        )
        return img


class FloormapRenderer:
    """Foot points -> floormap via homography (reference renderer.py floormap
    half; projection uses the framework's HomographyTransformer)."""

    def __init__(
        self,
        floormap: np.ndarray | None,
        homography: np.ndarray | None,
        size: tuple[int, int] = (640, 480),
    ):
        self.base = floormap
        self.size = size
        self.transformer = None
        if homography is not None:
            from office_person_detection_vit_tpu.transform.homography import (
                HomographyTransformer,
            )

            self.transformer = HomographyTransformer(np.asarray(homography, np.float64))

    def render(self, manager, frame_number: int) -> np.ndarray:
        import cv2

        if self.base is not None:
            img = self.base.copy()
        else:
            img = np.full((self.size[1], self.size[0], 3), 245, np.uint8)
        if self.transformer is None:
            cv2.putText(
                img, "(no homography)", (10, 28),
                cv2.FONT_HERSHEY_SIMPLEX, 0.7, (0, 0, 0), 2,
            )
            return img
        sx = img.shape[1] / 1878.0  # display scale vs floormap px space
        sy = img.shape[0] / 1369.0
        for t in manager.tracks:
            color = track_id_color(t["track_id"])
            pts = sorted(t["trajectory"], key=lambda p: int(p["frame"]))
            feet = np.asarray(
                [
                    (p["bbox"][0] + p["bbox"][2] / 2.0, p["bbox"][1] + p["bbox"][3])
                    for p in pts
                ],
                np.float32,
            )
            if not len(feet):
                continue
            floor = np.asarray(self.transformer.transform_batch(feet))
            drawn = [(int(fx * sx), int(fy * sy)) for fx, fy in floor]
            for a, b in zip(drawn, drawn[1:]):
                cv2.line(img, a, b, color, 1)
            for p, d in zip(pts, drawn):
                r = 6 if int(p["frame"]) == int(frame_number) else 2
                cv2.circle(img, d, r, color, -1)
        return img


def compose(camera: np.ndarray, floormap: np.ndarray) -> np.ndarray:
    """Side-by-side view, heights matched (reference renderer compose)."""
    import cv2

    h = camera.shape[0]
    fw = int(floormap.shape[1] * h / floormap.shape[0])
    floor = cv2.resize(floormap, (fw, h))
    return np.hstack([camera, floor])
