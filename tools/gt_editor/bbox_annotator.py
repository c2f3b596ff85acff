"""Per-image bbox GT annotator (the simple half of the reference gt_editor;
the full interactive TRACK editor is tools/gt_editor/editor.py).

OpenCV-window annotator over an image directory producing COCO-format GT:
drag to draw a person box, keys: u=undo, n/space=next image, p=prev,
t=cycle track-id for tracking GT, s=save, q=save+quit.

Usage:
  python tools/gt_editor/bbox_annotator.py --images DIR --output gt.json [--resume gt.json]

Headless environments can't run this (it needs a display); the conversion
tools (tools/convert_gt.py) cover scripted GT workflows.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


class GTEditor:
    def __init__(self, image_paths: list[Path], output: Path, resume: Path | None):
        self.paths = image_paths
        self.output = output
        self.idx = 0
        self.track_id = 1
        self.drawing = False
        self.start = (0, 0)
        self.cursor = (0, 0)
        # {file_name: [{"bbox": [x,y,w,h], "track_id": int}]}
        self.annotations: dict[str, list[dict]] = {}
        if resume and resume.exists():
            doc = json.loads(resume.read_text())
            images = {img["id"]: img["file_name"] for img in doc.get("images", [])}
            for ann in doc.get("annotations", []):
                name = images.get(ann["image_id"])
                if name:
                    self.annotations.setdefault(name, []).append(
                        {"bbox": list(ann["bbox"]),
                         "track_id": int(ann.get("track_id", 0))}
                    )

    # ------------------------------------------------------------------ UI
    def on_mouse(self, event, x, y, flags, param) -> None:
        import cv2

        if event == cv2.EVENT_LBUTTONDOWN:
            self.drawing = True
            self.start = (x, y)
        elif event == cv2.EVENT_MOUSEMOVE:
            self.cursor = (x, y)
        elif event == cv2.EVENT_LBUTTONUP and self.drawing:
            self.drawing = False
            x0, y0 = self.start
            bx, by = min(x0, x), min(y0, y)
            bw, bh = abs(x - x0), abs(y - y0)
            if bw > 4 and bh > 4:
                name = self.paths[self.idx].name
                self.annotations.setdefault(name, []).append(
                    {"bbox": [float(bx), float(by), float(bw), float(bh)],
                     "track_id": self.track_id}
                )

    def render(self):
        import cv2

        img = cv2.imread(str(self.paths[self.idx]))
        name = self.paths[self.idx].name
        for ann in self.annotations.get(name, []):
            x, y, w, h = (int(v) for v in ann["bbox"])
            cv2.rectangle(img, (x, y), (x + w, y + h), (0, 200, 0), 2)
            cv2.putText(img, str(ann["track_id"]), (x, y - 4),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.5, (0, 200, 0), 1)
        if self.drawing:
            cv2.rectangle(img, self.start, self.cursor, (0, 140, 255), 1)
        header = (f"[{self.idx + 1}/{len(self.paths)}] {name}  id={self.track_id}  "
                  f"(drag=box u=undo t=id n/p=nav s=save q=quit)")
        cv2.putText(img, header, (8, 22), cv2.FONT_HERSHEY_SIMPLEX, 0.55,
                    (255, 255, 255), 1, cv2.LINE_AA)
        return img

    # ---------------------------------------------------------------- save
    def to_coco(self) -> dict:
        images, annotations = [], []
        ann_id = 1
        for i, p in enumerate(self.paths, start=1):
            images.append({"id": i, "file_name": p.name})
            for ann in self.annotations.get(p.name, []):
                annotations.append(
                    {
                        "id": ann_id,
                        "image_id": i,
                        "category_id": 1,
                        "bbox": ann["bbox"],
                        "track_id": ann["track_id"],
                        "area": ann["bbox"][2] * ann["bbox"][3],
                        "iscrowd": 0,
                    }
                )
                ann_id += 1
        return {
            "images": images,
            "annotations": annotations,
            "categories": [{"id": 1, "name": "person"}],
        }

    def save(self) -> None:
        self.output.write_text(json.dumps(self.to_coco(), indent=2))
        print(f"saved {sum(len(v) for v in self.annotations.values())} boxes -> {self.output}")

    # ---------------------------------------------------------------- loop
    def run(self) -> None:  # pragma: no cover - requires display
        import cv2

        cv2.namedWindow("gt_editor")
        cv2.setMouseCallback("gt_editor", self.on_mouse)
        while True:
            cv2.imshow("gt_editor", self.render())
            key = cv2.waitKey(30) & 0xFF
            name = self.paths[self.idx].name
            if key in (ord("n"), ord(" ")):
                self.idx = min(self.idx + 1, len(self.paths) - 1)
            elif key == ord("p"):
                self.idx = max(self.idx - 1, 0)
            elif key == ord("u") and self.annotations.get(name):
                self.annotations[name].pop()
            elif key == ord("t"):
                self.track_id = self.track_id % 50 + 1
            elif key == ord("s"):
                self.save()
            elif key == ord("q"):
                self.save()
                break
        cv2.destroyAllWindows()


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(description="interactive GT bbox editor")
    parser.add_argument("--images", required=True, type=Path)
    parser.add_argument("--output", required=True, type=Path)
    parser.add_argument("--resume", type=Path, default=None)
    args = parser.parse_args(argv)
    paths = sorted(
        p for p in args.images.iterdir() if p.suffix.lower() in (".jpg", ".png", ".jpeg")
    )
    if not paths:
        print(f"no images under {args.images}", file=sys.stderr)
        return 1
    GTEditor(paths, args.output, args.resume).run()
    return 0


if __name__ == "__main__":
    sys.exit(main())
