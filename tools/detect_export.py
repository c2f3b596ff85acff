"""Run the DETR detector over an image directory and export COCO-results
JSON (analog of reference tools/detect_yolov8.py:19 — "same format as DETR"
benchmark-compat exporter).

Usage:
  python tools/detect_export.py --images DIR --output detections.json \
      [--checkpoint CKPT] [--conf 0.5] [--batch 8]
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

logger = logging.getLogger("detect_export")


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(description="DETR batch detection exporter")
    parser.add_argument("--images", required=True, type=Path)
    parser.add_argument("--output", required=True, type=Path)
    parser.add_argument("--checkpoint", type=str, default=None)
    parser.add_argument("--conf", type=float, default=0.5)
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--tiny", action="store_true")
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")

    import cv2

    from office_person_detection_vit_tpu.config.config_manager import ConfigManager
    from office_person_detection_vit_tpu.detection.detector import DETRDetector

    paths = sorted(
        p for p in args.images.iterdir() if p.suffix.lower() in (".jpg", ".jpeg", ".png")
    )
    if not paths:
        logger.error("no images under %s", args.images)
        return 1

    det_cfg = {
        "confidence_threshold": args.conf,
        "batch_size": args.batch,
        "checkpoint_path": args.checkpoint,
    }
    if args.tiny:
        det_cfg.update(model_size="tiny", input_height=96, input_width=128,
                       dtype="float32", use_pallas_attention=False)
    detector = DETRDetector(ConfigManager.from_dict({"detection": det_cfg}))
    detector.load_model()

    results = []
    t0 = time.perf_counter()
    # All frames must share one shape per compiled program; group by size.
    by_shape: dict[tuple[int, int], list[tuple[Path, np.ndarray]]] = {}
    for p in paths:
        img = cv2.imread(str(p))
        if img is None:
            logger.warning("unreadable image %s", p)
            continue
        by_shape.setdefault(img.shape[:2], []).append((p, img))

    for shape, items in by_shape.items():
        # Feed detect_batch in batch-sized slices: stacking thousands of
        # frames at once would blow host RAM and accumulate every chunk's
        # encoder output in HBM.
        results_iter = []
        for i in range(0, len(items), args.batch):
            chunk = items[i : i + args.batch]
            frames = np.stack([img for _, img in chunk])
            results_iter.extend(detector.detect_batch(frames).to_frame_results())
        for (p, _), frame_result in zip(items, results_iter):
            for d in frame_result.detections:
                results.append(
                    {
                        "file_name": p.name,
                        "bbox": [round(float(v), 2) for v in d.bbox],
                        "score": round(float(d.confidence), 4),
                        "category_id": 1,
                    }
                )
    elapsed = time.perf_counter() - t0
    logger.info(
        "%d detections over %d images in %.2fs (%.1f img/s)",
        len(results), len(paths), elapsed, len(paths) / max(elapsed, 1e-9),
    )
    args.output.parent.mkdir(parents=True, exist_ok=True)
    args.output.write_text(json.dumps(results, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
