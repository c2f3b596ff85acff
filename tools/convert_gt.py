"""Ground-truth format conversion (analogs of reference
tools/convert_to_gold_gt.py / convert_mot_to_gold.py / convert_coco_to_yolo.py).

Subcommands:
  mot-to-gold   MOTChallenge CSV -> gold tracking-GT JSON
  coco-to-gold  COCO detection GT -> gold tracking-GT JSON (ids from ann ids)
  gold-to-mot   gold tracking-GT JSON -> MOTChallenge CSV
  coco-to-yolo  COCO detection GT -> YOLO txt labels + data.yaml train/val split
                (reference tools/convert_coco_to_yolo.py:27-131)
  transforms-to-gold  Phase-3 coordinate_transformations.json -> gold GT
                (+ --mot-output CSV; reference tools/convert_to_gold_gt.py)
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


def transforms_to_gold(
    transforms_path: Path, out_path: Path, mot_output: Path | None = None
) -> None:
    """Phase-3 coordinate_transformations.json -> gold tracking-GT (+ optional
    MOT Challenge CSV for CVAT import) — the reference's GT-bootstrap flow
    (tools/convert_to_gold_gt.py:67-158, Makefile gt-prepare). Only tracked
    detections (with an id) become annotations. Accepts both the full-key and
    compact-key artifact layouts (bbox/track_id vs bb/id)."""
    doc = json.loads(transforms_path.read_text())
    frames: list[dict] = []
    for fdoc in doc.get("frames", []):
        fnum = int(fdoc.get("frame_number", fdoc.get("idx", 0)))
        anns = []
        for det in fdoc.get("detections", fdoc.get("det", [])):
            tid = det.get("track_id", det.get("id"))
            bbox = det.get("bbox", det.get("bb"))
            if tid is None or bbox is None:
                continue
            if isinstance(bbox, dict):
                bbox = {"x": bbox["x"], "y": bbox["y"],
                        "width": bbox["width"], "height": bbox["height"]}
            else:
                x, y, w, h = bbox
                bbox = {"x": x, "y": y, "width": w, "height": h}
            ann = {"track_id": int(tid), "bbox": bbox}
            conf = det.get("confidence", det.get("conf"))
            if conf is not None:
                ann["confidence"] = float(conf)
            zones = det.get("zone_ids", det.get("zones"))
            if zones:
                ann["zone_ids"] = list(zones)
            anns.append(ann)
        frames.append({"frame_number": fnum, "annotations": anns})
    gold = {"format": "gold_tracking_gt", "frames": frames}
    out_path.parent.mkdir(parents=True, exist_ok=True)
    out_path.write_text(json.dumps(gold, indent=2))
    if mot_output is not None:
        mot_output.parent.mkdir(parents=True, exist_ok=True)
        with mot_output.open("w", newline="") as f:
            writer = csv.writer(f)
            for frame in frames:
                for ann in frame["annotations"]:
                    b = ann["bbox"]
                    writer.writerow([
                        frame["frame_number"] + 1,  # MOT is 1-indexed
                        ann["track_id"],
                        f"{b['x']:.2f}", f"{b['y']:.2f}",
                        f"{b['width']:.2f}", f"{b['height']:.2f}",
                        ann.get("confidence", 1.0), -1, -1, -1,
                    ])


def coco_to_yolo(
    coco_path: Path, out_dir: Path, images_dir: Path | None = None, val_ratio: float = 0.2
) -> None:
    """COCO -> YOLO dataset layout: images/{train,val}, labels/{train,val},
    data.yaml; bboxes normalized to center format, single 'person' class
    (reference tools/convert_coco_to_yolo.py:17-131). Images are copied when
    ``images_dir`` is given; labels are always written."""
    import shutil

    doc = json.loads(coco_path.read_text())
    images_info = {
        img["id"]: (img["file_name"], img["width"], img["height"])
        for img in doc.get("images", [])
    }
    by_image: dict[int, list] = defaultdict(list)
    for ann in doc.get("annotations", []):
        by_image[ann["image_id"]].append(ann["bbox"])

    for sub in ("images/train", "images/val", "labels/train", "labels/val"):
        (out_dir / sub).mkdir(parents=True, exist_ok=True)

    ids = list(images_info)
    # Tail-of-file split (matches the reference's deterministic behavior,
    # convert_coco_to_yolo.py:71-74) but never empties the train split.
    val_count = max(1, int(len(ids) * val_ratio)) if len(ids) > 1 else 0
    val_ids = set(ids[len(ids) - val_count :]) if val_count else set()

    for img_id, (file_name, width, height) in images_info.items():
        split = "val" if img_id in val_ids else "train"
        lines = []
        for x, y, w, h in by_image.get(img_id, []):
            xc, yc = (x + w / 2) / width, (y + h / 2) / height
            lines.append(f"0 {xc:.6f} {yc:.6f} {w / width:.6f} {h / height:.6f}")
        label = out_dir / "labels" / split / (Path(file_name).stem + ".txt")
        label.write_text("\n".join(lines) + ("\n" if lines else ""))
        if images_dir is not None:
            src = images_dir / file_name
            if src.exists():
                shutil.copy2(src, out_dir / "images" / split / file_name)

    (out_dir / "data.yaml").write_text(
        f"path: {out_dir.resolve()}\n"
        "train: images/train\nval: images/val\n"
        "names:\n  0: person\nnc: 1\n"
    )


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(description="GT format conversion")
    parser.add_argument(
        "command",
        choices=[
            "mot-to-gold", "coco-to-gold", "gold-to-mot", "coco-to-yolo",
            "transforms-to-gold",
        ],
    )
    parser.add_argument("--input", required=True, type=Path)
    parser.add_argument("--output", required=True, type=Path)
    parser.add_argument("--images", type=Path, default=None, help="coco-to-yolo: image dir to copy")
    parser.add_argument("--val-ratio", type=float, default=0.2, help="coco-to-yolo: val split")
    parser.add_argument("--mot-output", type=Path, default=None,
                        help="transforms-to-gold: also write MOT CSV (CVAT import)")
    args = parser.parse_args(argv)
    if args.command == "coco-to-yolo":
        coco_to_yolo(args.input, args.output, args.images, args.val_ratio)
    elif args.command == "transforms-to-gold":
        transforms_to_gold(args.input, args.output, args.mot_output)
    else:
        {
            "mot-to-gold": mot_to_gold,
            "coco-to-gold": coco_to_gold,
            "gold-to-mot": gold_to_mot,
        }[args.command](args.input, args.output)
    print(f"{args.command}: {args.input} -> {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
