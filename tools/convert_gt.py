"""Ground-truth format conversion (analogs of reference
tools/convert_to_gold_gt.py / convert_mot_to_gold.py / convert_coco_to_yolo.py).

Subcommands:
  mot-to-gold   MOTChallenge CSV -> gold tracking-GT JSON
  coco-to-gold  COCO detection GT -> gold tracking-GT JSON (ids from ann ids)
  gold-to-mot   gold tracking-GT JSON -> MOTChallenge CSV
"""

from __future__ import annotations

import argparse
import csv
import json
import sys
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def mot_to_gold(mot_path: Path, out_path: Path) -> None:
    frames: dict[int, list] = defaultdict(list)
    with mot_path.open() as f:
        for row in csv.reader(f):
            if not row or row[0].startswith(("frame", "#")):
                continue
            frame, tid = int(float(row[0])), int(float(row[1]))
            x, y, w, h = (float(v) for v in row[2:6])
            frames[frame].append(
                {"track_id": tid, "bbox": {"x": x, "y": y, "width": w, "height": h}}
            )
    doc = {
        "format": "gold_tracking_gt",
        "frames": [
            {"frame_number": f, "annotations": anns}
            for f, anns in sorted(frames.items())
        ],
    }
    out_path.write_text(json.dumps(doc, indent=2))


def coco_to_gold(coco_path: Path, out_path: Path) -> None:
    doc = json.loads(coco_path.read_text())
    image_order = {img["id"]: i + 1 for i, img in enumerate(doc.get("images", []))}
    frames: dict[int, list] = defaultdict(list)
    for ann in doc.get("annotations", []):
        frame = image_order.get(ann["image_id"])
        if frame is None:
            continue
        x, y, w, h = ann["bbox"]
        frames[frame].append(
            {
                "track_id": int(ann.get("track_id", ann.get("id", 0))),
                "bbox": {"x": x, "y": y, "width": w, "height": h},
            }
        )
    out = {
        "format": "gold_tracking_gt",
        "frames": [
            {"frame_number": f, "annotations": anns}
            for f, anns in sorted(frames.items())
        ],
    }
    out_path.write_text(json.dumps(out, indent=2))


def gold_to_mot(gold_path: Path, out_path: Path) -> None:
    doc = json.loads(gold_path.read_text())
    with out_path.open("w", newline="") as f:
        writer = csv.writer(f)
        for frame in doc.get("frames", []):
            fnum = frame.get("frame_number", frame.get("frame", 0))
            for ann in frame.get("annotations", frame.get("tracks", [])):
                b = ann["bbox"]
                if isinstance(b, dict):
                    vals = [b["x"], b["y"], b["width"], b["height"]]
                else:
                    vals = list(b)
                writer.writerow(
                    [fnum, ann["track_id"], *[f"{v:.2f}" for v in vals], 1.0, -1, -1, -1]
                )


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(description="GT format conversion")
    parser.add_argument("command", choices=["mot-to-gold", "coco-to-gold", "gold-to-mot"])
    parser.add_argument("--input", required=True, type=Path)
    parser.add_argument("--output", required=True, type=Path)
    args = parser.parse_args(argv)
    {
        "mot-to-gold": mot_to_gold,
        "coco-to-gold": coco_to_gold,
        "gold-to-mot": gold_to_mot,
    }[args.command](args.input, args.output)
    print(f"{args.command}: {args.input} -> {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
