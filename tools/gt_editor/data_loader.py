"""GT-editor data loading (analog of reference tools/gt_editor/data_loader.py).

Track documents are held in the pipeline's tracks.json shape
(utils/export_utils.py export_json): ``{"tracks": [{"track_id", "trajectory":
[{"frame", "timestamp", "bbox" [x,y,w,h], ...}, ...]}, ...]}``. Loaders for
the gold tracking-GT format and raw detections are converted into that shape
so the editor operates on one representation.
"""

from __future__ import annotations

import json
import re
from pathlib import Path

import numpy as np


class TrackDataLoader:
    """Load/save track documents in the pipeline tracks.json shape."""

    @staticmethod
    def load(path: str | Path) -> list[dict]:
        doc = json.loads(Path(path).read_text(encoding="utf-8"))
        if "tracks" in doc:
            return [dict(t) for t in doc["tracks"]]
        if "frames" in doc:  # gold tracking-GT (tools/convert_gt.py)
            return TrackDataLoader._from_gold(doc)
        raise ValueError(f"unrecognized track document: {path}")

    @staticmethod
    def _from_gold(doc: dict) -> list[dict]:
        tracks: dict[int, dict] = {}
        for frame in doc.get("frames", []):
            fnum = int(frame.get("frame_number", frame.get("frame", 0)))
            for ann in frame.get("annotations", []):
                b = ann["bbox"]
                bbox = (
                    [b["x"], b["y"], b["width"], b["height"]]
                    if isinstance(b, dict)
                    else list(b)
                )
                t = tracks.setdefault(
                    int(ann["track_id"]),
                    {"track_id": int(ann["track_id"]), "trajectory": []},
                )
                t["trajectory"].append({"frame": fnum, "bbox": bbox})
        for t in tracks.values():
            t["trajectory"].sort(key=lambda p: p["frame"])
        return list(tracks.values())

    @staticmethod
    def save(tracks: list[dict], path: str | Path) -> Path:
        path = Path(path)
        path.write_text(
            json.dumps({"num_tracks": len(tracks), "tracks": tracks}, indent=2),
            encoding="utf-8",
        )
        return path

    @staticmethod
    def to_gold(tracks: list[dict]) -> dict:
        """Editor document -> gold tracking-GT (benchmark input format)."""
        frames: dict[int, list] = {}
        for t in tracks:
            for p in t["trajectory"]:
                x, y, w, h = p["bbox"]
                frames.setdefault(int(p["frame"]), []).append(
                    {
                        "track_id": int(t["track_id"]),
                        "bbox": {"x": x, "y": y, "width": w, "height": h},
                    }
                )
        return {
            "format": "gold_tracking_gt",
            "frames": [
                {"frame_number": f, "annotations": anns}
                for f, anns in sorted(frames.items())
            ],
        }


class FrameImageLoader:
    """Map frame numbers to extracted frame images (reference
    data_loader.py FrameImageLoader role).

    Filenames like ``frame_20250826_160500_idx4.jpg`` carry the frame index
    as ``idx<N>``; plain ``000123.jpg`` stems are parsed as the number.
    """

    def __init__(self, frames_dir: str | Path):
        self.frames_dir = Path(frames_dir)
        self.by_number: dict[int, Path] = {}
        self.paths: list[Path] = sorted(
            p for p in self.frames_dir.glob("*") if p.suffix.lower() in (".jpg", ".png")
        )
        for i, p in enumerate(self.paths):
            m = re.search(r"idx(\d+)", p.stem)
            if m:
                self.by_number[int(m.group(1))] = p
            elif p.stem.isdigit():
                self.by_number[int(p.stem)] = p
            else:
                self.by_number.setdefault(i, p)

    def load(self, frame_number: int) -> np.ndarray | None:
        import cv2

        path = self.by_number.get(int(frame_number))
        if path is None:
            return None
        return cv2.imread(str(path))

    def frame_numbers(self) -> list[int]:
        return sorted(self.by_number)


class SessionTrackLoader:
    """Load tracks + frames + homography from a pipeline session directory
    (reference data_loader.py SessionTrackLoader: session artifacts in,
    editable document out)."""

    def __init__(self, session_dir: str | Path):
        self.session_dir = Path(session_dir)

    def load_tracks(self) -> list[dict]:
        for cand in ("03_tracking/tracks.json", "tracks.json"):
            p = self.session_dir / cand
            if p.exists():
                return TrackDataLoader.load(p)
        raise FileNotFoundError(f"no tracks.json under {self.session_dir}")

    def frame_loader(self) -> FrameImageLoader:
        for cand in ("01_extraction/frames", "frames"):
            p = self.session_dir / cand
            if p.is_dir():
                return FrameImageLoader(p)
        raise FileNotFoundError(f"no frames dir under {self.session_dir}")

    def load_homography(self) -> np.ndarray | None:
        """Homography from the session's saved config copy, if present."""
        import yaml

        for cand in ("config.yaml", "metadata.json"):
            p = self.session_dir / cand
            if not p.exists():
                continue
            doc = (
                yaml.safe_load(p.read_text())
                if p.suffix == ".yaml"
                else json.loads(p.read_text())
            )
            matrix = (doc.get("homography") or {}).get("matrix") if doc else None
            if matrix:
                return np.asarray(matrix, np.float64)
        return None


class TrackGenerator:
    """Bootstrap GT tracks from raw per-frame detections by greedy
    nearest-center linking (reference data_loader.py TrackGenerator role:
    give the annotator something to correct rather than a blank slate)."""

    def __init__(self, max_link_distance: float = 80.0):
        self.max_link_distance = float(max_link_distance)

    def generate(self, detections_doc: dict) -> list[dict]:
        """detections.json ({"frames": [{"frame_number", "detections":
        [{"bbox", ...}]}]}) -> editor track document."""
        tracks_by_id: dict[int, dict] = {}
        active: dict[int, tuple[float, float]] = {}  # id -> last center
        next_id = 1
        for frame in detections_doc.get("frames", []):
            fnum = int(frame.get("frame_number", frame.get("frame", 0)))
            centers = []
            for det in frame.get("detections", []):
                x, y, w, h = det["bbox"]
                centers.append((x + w / 2.0, y + h / 2.0, [x, y, w, h]))
            assigned: dict[int, int] = {}
            if active and centers:
                ids = list(active)
                prev = np.asarray([active[i] for i in ids], np.float32)
                cur = np.asarray([(c[0], c[1]) for c in centers], np.float32)
                d = np.linalg.norm(prev[:, None] - cur[None, :], axis=-1)
                order = np.dstack(np.unravel_index(np.argsort(d, axis=None), d.shape))[0]
                used_t, used_d = set(), set()
                for ti, di in order:
                    if ti in used_t or di in used_d or d[ti, di] > self.max_link_distance:
                        continue
                    assigned[di] = ids[ti]
                    used_t.add(ti)
                    used_d.add(di)
            new_active: dict[int, tuple[float, float]] = {}
            for di, (cx, cy, bbox) in enumerate(centers):
                tid = assigned.get(di)
                if tid is None:
                    tid = next_id
                    next_id += 1
                    tracks_by_id[tid] = {"track_id": tid, "trajectory": []}
                tracks_by_id[tid]["trajectory"].append({"frame": fnum, "bbox": bbox})
                new_active[tid] = (cx, cy)
            active = new_active
        return list(tracks_by_id.values())
