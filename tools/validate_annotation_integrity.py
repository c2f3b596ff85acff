"""Annotation integrity validation.

The reference Makefile's ``validate-annotation`` target points at
``tools/validate_annotation_integrity.py`` which does not exist in its repo;
this is a working equivalent. Checks a COCO annotation file against an image
directory:

  * every annotation references an existing image entry
  * bboxes have positive size and lie within the image bounds
  * annotation ids are unique
  * image files referenced by the annotation exist on disk
  * images on disk that carry no annotations (reported, non-fatal)

Exit code 0 when no errors (warnings allowed), 1 otherwise.
"""

from __future__ import annotations

import argparse
import json
import sys
from collections import Counter
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

IMAGE_SUFFIXES = {".jpg", ".jpeg", ".png", ".bmp"}


def validate(
    annotation_path: Path, images_dir: Path | None = None, fmt: str = "coco"
) -> tuple[list[str], list[str]]:
    """Returns (errors, warnings)."""
    if fmt != "coco":
        return [f"unsupported format: {fmt}"], []
    errors: list[str] = []
    warnings: list[str] = []
    try:
        doc = json.loads(annotation_path.read_text())
    except Exception as e:
        return [f"cannot parse {annotation_path}: {e}"], []

    images = {im["id"]: im for im in doc.get("images", [])}
    if not images:
        errors.append("no images in annotation file")

    id_counts = Counter(
        ann.get("id") for ann in doc.get("annotations", []) if "id" in ann
    )
    for ann_id, n in id_counts.items():
        if n > 1:
            errors.append(f"duplicate annotation id {ann_id} ({n} occurrences)")

    annotated_images: set[int] = set()
    for i, ann in enumerate(doc.get("annotations", [])):
        im = images.get(ann.get("image_id"))
        if im is None:
            errors.append(f"annotation[{i}] references unknown image_id {ann.get('image_id')}")
            continue
        annotated_images.add(ann["image_id"])
        bbox = ann.get("bbox")
        if not bbox or len(bbox) != 4:
            errors.append(f"annotation[{i}] has malformed bbox {bbox}")
            continue
        x, y, w, h = (float(v) for v in bbox)
        if w <= 0 or h <= 0:
            errors.append(f"annotation[{i}] has non-positive bbox size {w}x{h}")
        iw, ih = im.get("width"), im.get("height")
        if iw and ih and (x < 0 or y < 0 or x + w > iw + 1e-6 or y + h > ih + 1e-6):
            errors.append(
                f"annotation[{i}] bbox [{x}, {y}, {w}, {h}] exceeds "
                f"image {im.get('file_name')} bounds {iw}x{ih}"
            )

    for im_id, im in images.items():
        if im_id not in annotated_images:
            warnings.append(f"image {im.get('file_name')} has no annotations")

    if images_dir is not None:
        on_disk = {
            p.name for p in images_dir.iterdir() if p.suffix.lower() in IMAGE_SUFFIXES
        } if images_dir.is_dir() else set()
        if not images_dir.is_dir():
            errors.append(f"images dir not found: {images_dir}")
        for im in images.values():
            if im.get("file_name") and im["file_name"] not in on_disk:
                errors.append(f"annotated image missing on disk: {im['file_name']}")
        listed = {im.get("file_name") for im in images.values()}
        for name in sorted(on_disk - listed):
            warnings.append(f"image on disk not in annotation file: {name}")

    return errors, warnings


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--annotation", required=True, type=Path)
    parser.add_argument("--images", type=Path, default=None)
    parser.add_argument("--format", default="coco")
    args = parser.parse_args(argv)

    errors, warnings = validate(args.annotation, args.images, args.format)
    for w in warnings:
        print(f"WARN  {w}")
    for e in errors:
        print(f"ERROR {e}")
    print(f"{len(errors)} errors, {len(warnings)} warnings")
    return 1 if errors else 0


if __name__ == "__main__":
    raise SystemExit(main())
