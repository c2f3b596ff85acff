"""Pure track-editing logic with undo (analog of reference
tools/gt_editor/track_manager.py:11-274).

Operates on the editor track document (data_loader.py shape). All methods
are side-effecting on the in-memory document and push inverse operations on
an undo stack; no I/O or UI here, so everything is unit-testable headless.
"""

from __future__ import annotations

import copy

import numpy as np


class TrackManager:
    def __init__(self, tracks: list[dict]):
        self.tracks = tracks
        self._undo: list[list[dict]] = []

    # ------------------------------------------------------------- queries
    def get_track_by_id(self, track_id: int) -> dict | None:
        for t in self.tracks:
            if t["track_id"] == track_id:
                return t
        return None

    def get_point_at_frame(self, track_id: int, frame: int) -> dict | None:
        t = self.get_track_by_id(track_id)
        if t is None:
            return None
        for p in t["trajectory"]:
            if int(p["frame"]) == int(frame):
                return p
        return None

    def points_at_frame(self, frame: int) -> list[tuple[int, dict]]:
        """All (track_id, point) pairs visible on a frame."""
        out = []
        for t in self.tracks:
            for p in t["trajectory"]:
                if int(p["frame"]) == int(frame):
                    out.append((t["track_id"], p))
        return out

    def find_nearest_point(
        self, frame: int, x: float, y: float, max_distance: float = 40.0
    ) -> tuple[int, dict] | None:
        """Nearest bbox-center on the frame within max_distance px
        (reference track_manager.py:62-129 hit test)."""
        best, best_d = None, float(max_distance)
        for tid, p in self.points_at_frame(frame):
            bx, by, bw, bh = p["bbox"]
            d = float(np.hypot(bx + bw / 2.0 - x, by + bh / 2.0 - y))
            if d < best_d:
                best, best_d = (tid, p), d
        return best

    def get_max_frame(self) -> int:
        frames = [int(p["frame"]) for t in self.tracks for p in t["trajectory"]]
        return max(frames) if frames else 0

    def frame_numbers(self) -> list[int]:
        return sorted({int(p["frame"]) for t in self.tracks for p in t["trajectory"]})

    # --------------------------------------------------------------- edits
    def _checkpoint(self) -> None:
        self._undo.append(copy.deepcopy(self.tracks))
        if len(self._undo) > 50:
            self._undo.pop(0)

    def undo(self) -> bool:
        if not self._undo:
            return False
        self.tracks[:] = self._undo.pop()
        return True

    def checkpoint(self) -> None:
        """Push an undo checkpoint explicitly (one per user gesture — e.g.
        drag start — NOT per mouse-move increment)."""
        self._checkpoint()

    def update_point(
        self, track_id: int, frame: int, x: float, y: float, checkpoint: bool = True
    ) -> bool:
        """Move a point's bbox so its center lands on (x, y)
        (reference :130-168). Pass checkpoint=False for continuous drags
        that already pushed one checkpoint at gesture start."""
        p = self.get_point_at_frame(track_id, frame)
        if p is None:
            return False
        if checkpoint:
            self._checkpoint()
        _, _, w, h = p["bbox"]
        p["bbox"] = [float(x) - w / 2.0, float(y) - h / 2.0, w, h]
        return True

    def delete_point(self, track_id: int, frame: int) -> bool:
        """Remove one trajectory point; drop the track when it empties
        (reference :169-196)."""
        t = self.get_track_by_id(track_id)
        if t is None:
            return False
        for i, p in enumerate(t["trajectory"]):
            if int(p["frame"]) == int(frame):
                self._checkpoint()
                t["trajectory"].pop(i)
                if not t["trajectory"]:
                    self.tracks.remove(t)
                return True
        return False

    def change_track_id(self, old_id: int, new_id: int) -> bool:
        """Re-id a track; merging into an existing id combines trajectories
        (reference :197-219)."""
        src = self.get_track_by_id(old_id)
        if src is None or old_id == new_id:
            return False
        self._checkpoint()
        dst = self.get_track_by_id(new_id)
        if dst is None:
            src["track_id"] = int(new_id)
            return True
        have = {int(p["frame"]) for p in dst["trajectory"]}
        dst["trajectory"].extend(
            p for p in src["trajectory"] if int(p["frame"]) not in have
        )
        dst["trajectory"].sort(key=lambda p: int(p["frame"]))
        self.tracks.remove(src)
        return True

    def add_new_track(
        self, frame: int, x: float, y: float, box_wh: tuple[float, float] = (60.0, 140.0)
    ) -> int:
        """New single-point track centered at (x, y) (reference :220-252)."""
        self._checkpoint()
        new_id = 1 + max((t["track_id"] for t in self.tracks), default=0)
        w, h = box_wh
        self.tracks.append(
            {
                "track_id": new_id,
                "trajectory": [
                    {"frame": int(frame), "bbox": [float(x) - w / 2, float(y) - h / 2, w, h]}
                ],
            }
        )
        return new_id

    def add_point(
        self, track_id: int, frame: int, x: float, y: float,
        box_wh: tuple[float, float] | None = None,
    ) -> bool:
        """Extend an existing track to a frame (size copied from its nearest
        existing point unless given)."""
        t = self.get_track_by_id(track_id)
        if t is None or self.get_point_at_frame(track_id, frame) is not None:
            return False
        self._checkpoint()
        if box_wh is None:
            nearest = min(
                t["trajectory"], key=lambda p: abs(int(p["frame"]) - int(frame))
            )
            box_wh = (nearest["bbox"][2], nearest["bbox"][3])
        w, h = box_wh
        t["trajectory"].append(
            {"frame": int(frame), "bbox": [float(x) - w / 2, float(y) - h / 2, w, h]}
        )
        t["trajectory"].sort(key=lambda p: int(p["frame"]))
        return True
