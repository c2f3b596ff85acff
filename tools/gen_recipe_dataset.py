"""Generate the synthetic recipe-protocol COCO dataset (docs/training.md
§"Measured: the recipe is more robust under distribution shift").

Train split: N 720p frames, one "person" each — a dark-red body rectangle
with a bright stripe on its LEFT third, on a mid-gray noisy background at
fixed global brightness; random positions/sizes.

Val split: M frames distribution-shifted two ways the augmentation covers:
half the persons MIRRORED (stripe on the right; convs are not
reflection-invariant) and every frame under a global gain alternating
0.75 / 1.3 (never seen in training).

The reference's analog is its domain dataset for ultralytics fine-tuning
(reference tools/train_yolov8.py:18-40, data under dataset/); this tool
makes the protocol reproducible end-to-end with zero data dependencies.

Usage:
  python tools/gen_recipe_dataset.py --out /tmp/recipe_data \
      [--train 64] [--val 16] [--seed 0]
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np


def make_frame(rng: np.random.Generator, *, mirrored: bool = False,
               gain: float = 1.0, wh: tuple[int, int] = (1280, 720)):
    """-> (frame_bgr_uint8, (x, y, w, h) person bbox in pixels)."""
    W, H = wh
    frame = np.full((H, W, 3), 110, np.uint8)
    noise = rng.integers(-18, 18, (H, W, 3), np.int16)
    frame = np.clip(frame.astype(np.int16) + noise, 0, 255).astype(np.uint8)

    w = int(rng.integers(70, 160))
    h = int(rng.integers(180, 340))
    x = int(rng.integers(10, W - w - 10))
    y = int(rng.integers(10, H - h - 10))
    # Dark-red body (BGR) + bright stripe on the LEFT third (right if
    # mirrored — the val-shift case).
    frame[y:y + h, x:x + w] = (28, 24, 150)
    sw = max(1, w // 3)
    sx = x + (w - sw) if mirrored else x
    frame[y:y + h, sx:sx + sw] = (90, 230, 250)

    if gain != 1.0:
        frame = np.clip(frame.astype(np.float32) * gain, 0, 255).astype(np.uint8)
    return frame, (x, y, w, h)


def write_split(out: Path, n: int, seed: int, *, shifted: bool) -> None:
    import cv2

    img_dir = out / "images"
    img_dir.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    images, anns = [], []
    for i in range(n):
        frame, (x, y, w, h) = make_frame(
            rng,
            mirrored=shifted and (i % 2 == 1),
            gain=(0.75 if i % 2 == 0 else 1.3) if shifted else 1.0,
        )
        name = f"{i:04d}.png"
        cv2.imwrite(str(img_dir / name), frame)
        images.append({"id": i, "file_name": name, "width": 1280, "height": 720})
        anns.append({"id": i, "image_id": i, "category_id": 1,
                     "bbox": [x, y, w, h], "area": w * h, "iscrowd": 0})
    (out / "coco.json").write_text(json.dumps({
        "images": images, "annotations": anns,
        "categories": [{"id": 1, "name": "person"}],
    }))


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--out", type=Path, required=True)
    p.add_argument("--train", type=int, default=64)
    p.add_argument("--val", type=int, default=16)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    write_split(args.out / "train", args.train, args.seed, shifted=False)
    write_split(args.out / "val", args.val, args.seed + 1000, shifted=True)
    print(f"wrote {args.train} train / {args.val} val frames under {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
