"""PoC: assign track ids to a detections JSON with switchable tracker
backends (analog of reference tools/poc_tracking_pytracking.py:1-175).

The reference switches between PyTracking (optional dependency) and its
DeepSORT-style Tracker. Here both backends are first-class in the rebuild:
``deepsort`` (tracking/tracker.py cascade + ByteTrack rescue) and
``lightweight`` (tracking/lightweight_tracker.py greedy-IoU + Kalman), so
the PoC compares them instead of gating on an uninstalled library.

Input detections JSON (reference's format, poc_tracking_pytracking.py:9-16):
  [{"frame": 0, "timestamp": "...", "detections":
      [{"bbox": [x, y, w, h], "score": 0.9}, ...]}, ...]

Usage:
  python tools/poc_tracking_backends.py --detections dets.json \
      [--backend deepsort|lightweight|both] [--output tracked.json]
"""

from __future__ import annotations

import argparse
import json
import logging
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from office_person_detection_vit_tpu.core.dto import Detection  # noqa: E402
from office_person_detection_vit_tpu.tracking.lightweight_tracker import (  # noqa: E402
    LightweightTracker,
)
from office_person_detection_vit_tpu.tracking.tracker import Tracker  # noqa: E402

logger = logging.getLogger("poc_tracking_backends")


def load_detections(path: Path) -> list[tuple[int, str, list[Detection]]]:
    """Detections JSON -> per-frame Detection lists (reference :38-67)."""
    raw = json.loads(path.read_text(encoding="utf-8"))
    frames = []
    for item in raw:
        dets = []
        for d in item.get("detections", []):
            bbox = d.get("bbox") or d.get("bbox_xywh")
            if not bbox or len(bbox) != 4:
                continue
            score = float(d.get("score", d.get("confidence", 0.0)))
            feature = d.get("feature")
            dets.append(
                Detection(
                    bbox=tuple(float(v) for v in bbox),
                    confidence=score,
                    feature=np.asarray(feature, np.float32) if feature else None,
                )
            )
        frames.append((int(item.get("frame", 0)), str(item.get("timestamp", "")), dets))
    return frames


def run_backend(
    backend: str, frames: list[tuple[int, str, list[Detection]]]
) -> tuple[list[dict], dict]:
    """Run one tracker backend over all frames; returns (records, stats)."""
    if backend == "deepsort":
        tracker = Tracker()
    elif backend == "lightweight":
        tracker = LightweightTracker(use_optical_flow=False)
    else:
        raise ValueError(f"unknown backend {backend!r}")

    records = []
    track_ids: set[int] = set()
    start = time.perf_counter()
    for i, (frame_id, ts, dets) in enumerate(frames):
        if backend == "deepsort":
            tracker.update(dets, timestamp=float(i))
        else:
            tracker.update_with_detections(dets, timestamp=float(i))
        out = []
        for d in dets:
            if d.track_id is not None:
                track_ids.add(d.track_id)
            out.append(
                {
                    "bbox": list(d.bbox),
                    "score": d.confidence,
                    "track_id": d.track_id,
                }
            )
        records.append({"frame": frame_id, "timestamp": ts, "detections": out})
    elapsed = time.perf_counter() - start
    n_dets = sum(len(dets) for _, _, dets in frames)
    stats = {
        "backend": backend,
        "frames": len(frames),
        "detections": n_dets,
        "unique_tracks": len(track_ids),
        "seconds": elapsed,
        "fps": len(frames) / elapsed if elapsed > 0 else float("inf"),
    }
    return records, stats


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(description="Tracking-backend comparison PoC")
    parser.add_argument("--detections", required=True, type=Path)
    parser.add_argument(
        "--backend", choices=["deepsort", "lightweight", "both"], default="both"
    )
    parser.add_argument("--output", type=Path, default=None)
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO, format="%(message)s")

    frames = load_detections(args.detections)
    backends = ["deepsort", "lightweight"] if args.backend == "both" else [args.backend]

    all_results = {}
    for backend in backends:
        records, stats = run_backend(backend, frames)
        all_results[backend] = {"stats": stats, "frames": records}
        logger.info(
            "%-12s frames=%d dets=%d tracks=%d time=%.3fs (%.1f fps)",
            backend,
            stats["frames"],
            stats["detections"],
            stats["unique_tracks"],
            stats["seconds"],
            stats["fps"],
        )

    if args.output is not None:
        args.output.parent.mkdir(parents=True, exist_ok=True)
        args.output.write_text(json.dumps(all_results, indent=2))
        logger.info("wrote %s", args.output)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
