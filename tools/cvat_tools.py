"""CVAT interchange tools.

The reference Makefile advertises ``coco-to-cvat`` / ``cvat-to-mot`` targets
(reference Makefile: tools/coco_to_cvat_tracks.py, tools/cvat_to_mot_gt.py)
but ships neither script — like its HOTA target, the recipe exists and the
implementation doesn't. These are working equivalents.

Subcommands:
  coco-to-cvat  COCO detection/track JSON -> CVAT XML 1.1 "tracks" for
                import into CVAT (human GT correction loop).
  cvat-to-mot   CVAT annotation XML (tracks) -> MOTChallenge GT CSV
                (frame, id, x, y, w, h, conf, -1, -1, -1).
"""

from __future__ import annotations

import argparse
import csv
import json
import sys
import xml.etree.ElementTree as ET
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def coco_to_cvat_tracks(
    coco_path: Path,
    out_path: Path,
    images_dir: Path | None = None,
    label: str = "person",
) -> int:
    """COCO -> CVAT XML tracks. Annotations sharing a ``track_id`` become one
    track; untracked annotations each get their own single-box track.
    Returns the number of tracks written."""
    doc = json.loads(coco_path.read_text())
    images = sorted(doc.get("images", []), key=lambda im: im.get("file_name", ""))
    frame_of_image = {im["id"]: i for i, im in enumerate(images)}
    width = images[0].get("width", 0) if images else 0
    height = images[0].get("height", 0) if images else 0

    tracks: dict[int, list[tuple[int, list[float]]]] = defaultdict(list)
    next_auto = -1
    for ann in doc.get("annotations", []):
        frame = frame_of_image.get(ann["image_id"])
        if frame is None:
            continue
        tid = ann.get("track_id")
        if tid is None:
            tid = next_auto
            next_auto -= 1
        tracks[int(tid)].append((frame, [float(v) for v in ann["bbox"]]))

    root = ET.Element("annotations")
    ET.SubElement(root, "version").text = "1.1"
    meta = ET.SubElement(root, "meta")
    task = ET.SubElement(meta, "task")
    ET.SubElement(task, "name").text = coco_path.stem
    ET.SubElement(task, "size").text = str(len(images))
    orig = ET.SubElement(task, "original_size")
    ET.SubElement(orig, "width").text = str(width)
    ET.SubElement(orig, "height").text = str(height)

    n_frames = len(images)
    for out_id, (_tid, boxes) in enumerate(sorted(tracks.items())):
        tr = ET.SubElement(root, "track", id=str(out_id), label=label, source="manual")
        boxes.sort(key=lambda fb: fb[0])
        for i, (frame, (x, y, w, h)) in enumerate(boxes):
            ET.SubElement(
                tr, "box",
                frame=str(frame),
                xtl=f"{x:.2f}", ytl=f"{y:.2f}",
                xbr=f"{x + w:.2f}", ybr=f"{y + h:.2f}",
                outside="0", occluded="0", keyframe="1",
            )
            # CVAT tracks are interpolated between keyframes; close each
            # track with an outside=1 sentinel on the following frame so a
            # gap is not filled with phantom boxes. A keyframe on the task's
            # final frame needs no sentinel (frame+1 would exceed the
            # declared task size and can fail CVAT import validation).
            is_last = i == len(boxes) - 1
            next_frame = boxes[i + 1][0] if not is_last else frame + 1
            if (next_frame > frame + 1 or is_last) and frame + 1 < n_frames:
                ET.SubElement(
                    tr, "box",
                    frame=str(frame + 1),
                    xtl=f"{x:.2f}", ytl=f"{y:.2f}",
                    xbr=f"{x + w:.2f}", ybr=f"{y + h:.2f}",
                    outside="1", occluded="0", keyframe="1",
                )
    ET.indent(root)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    out_path.write_bytes(ET.tostring(root, encoding="utf-8", xml_declaration=True))
    return len(tracks)


def cvat_to_mot(xml_path: Path, out_path: Path) -> int:
    """CVAT XML (tracks) -> MOT CSV rows (1-based frame/id). Skips
    ``outside="1"`` sentinel boxes. Returns the number of rows written."""
    root = ET.parse(xml_path).getroot()
    rows: list[list] = []
    for track in root.iter("track"):
        tid = int(track.get("id", 0)) + 1
        for box in track.iter("box"):
            if box.get("outside") == "1":
                continue
            xtl, ytl = float(box.get("xtl")), float(box.get("ytl"))
            xbr, ybr = float(box.get("xbr")), float(box.get("ybr"))
            rows.append(
                [
                    int(box.get("frame", 0)) + 1, tid,
                    f"{xtl:.2f}", f"{ytl:.2f}",
                    f"{xbr - xtl:.2f}", f"{ybr - ytl:.2f}",
                    1, -1, -1, -1,
                ]
            )
    rows.sort(key=lambda r: (r[0], r[1]))
    out_path.parent.mkdir(parents=True, exist_ok=True)
    with out_path.open("w", newline="") as f:
        csv.writer(f).writerows(rows)
    return len(rows)


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    sub = parser.add_subparsers(dest="cmd", required=True)

    p1 = sub.add_parser("coco-to-cvat", help="COCO JSON -> CVAT XML tracks")
    p1.add_argument("--input", required=True, type=Path)
    p1.add_argument("--images", type=Path, default=None)
    p1.add_argument("--output", required=True, type=Path)
    p1.add_argument("--label", default="person")

    p2 = sub.add_parser("cvat-to-mot", help="CVAT XML -> MOT GT CSV")
    p2.add_argument("--input", required=True, type=Path)
    p2.add_argument("--output", required=True, type=Path)

    args = parser.parse_args(argv)
    if args.cmd == "coco-to-cvat":
        n = coco_to_cvat_tracks(args.input, args.output, args.images, args.label)
        print(f"wrote {n} tracks -> {args.output}")
    else:
        n = cvat_to_mot(args.input, args.output)
        print(f"wrote {n} MOT rows -> {args.output}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
