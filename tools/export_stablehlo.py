"""Export the fused detect program as a portable StableHLO artifact.

The deployment analog of the reference's ultralytics ``.pt`` checkpoint
handoff (reference src/detection/yolov8_detector.py:70-88) — except the
artifact is a compiler-level module (jax.export serialization) that
reloads and executes WITHOUT the model's Python code, on CPU or TPU, and
takes the weights pytree at call time so one artifact serves every
fine-tune of the architecture.

Usage:
  python tools/export_stablehlo.py --output runs/detect.stablehlo \
      [--config config.yaml] [--tiny] [--batch 8] [--source-hw 720x1280] \
      [--platforms cpu,tpu] [--weights-out runs/detect_weights.npz] \
      [--validate]

Reload (no framework model code needed):
  from office_person_detection_vit_tpu.detection.export import (
      load_exported, run_exported)
  out = run_exported(load_exported(path), variables, frames_u8)
"""

from __future__ import annotations

import argparse
import logging
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

logger = logging.getLogger("export_stablehlo")


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("--output", required=True, type=Path)
    parser.add_argument("--config", default=None)
    parser.add_argument("--tiny", action="store_true",
                        help="tiny model config (smoke tests)")
    parser.add_argument("--batch", type=int, default=None,
                        help="fixed exported batch size (default: "
                             "symbolic - one artifact, any batch)")
    parser.add_argument("--source-hw", default="720x1280",
                        help="input frame HxW baked into the export")
    parser.add_argument("--platforms", default="cpu,tpu",
                        help="comma-separated lowering targets")
    parser.add_argument("--weights-out", type=Path, default=None,
                        help="also save the variables pytree as flat npz")
    parser.add_argument("--validate", action="store_true",
                        help="round-trip the artifact and compare against "
                             "the live detector on random frames")
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")

    from office_person_detection_vit_tpu.config.config_manager import ConfigManager
    from office_person_detection_vit_tpu.detection.export import (
        export_detect,
        load_exported,
        run_exported,
        save_exported,
    )
    from office_person_detection_vit_tpu.detection.ssd_detector import build_detector

    if args.config:
        cfg = ConfigManager(args.config)  # honors detection.model
    else:
        det_cfg = {"confidence_threshold": 0.5, "batch_size": 8}
        if args.tiny:
            det_cfg.update(model_size="tiny", input_height=96,
                           input_width=128, dtype="float32",
                           use_pallas_attention=False)
        cfg = ConfigManager.from_dict(
            {"detection": det_cfg, "parallel": {"mesh": {"data": 1}}}
        )

    h, w = (int(x) for x in args.source_hw.split("x"))
    detector = build_detector(cfg)
    detector.load_model()
    exported = export_detect(
        detector, batch_size=args.batch, source_hw=(h, w),
        platforms=tuple(p for p in args.platforms.split(",") if p) or None,
    )
    args.output.parent.mkdir(parents=True, exist_ok=True)
    size = save_exported(exported, args.output)
    logger.info("wrote %s (%d bytes, platforms %s)", args.output, size,
                exported.platforms)

    if args.weights_out:
        from office_person_detection_vit_tpu.detection.export import (
            save_weights_npz,
        )

        n = save_weights_npz(detector.variables, args.weights_out)
        logger.info("wrote weights %s (%d path-keyed leaves; reload with "
                    "load_weights_npz or serve.py --weights)",
                    args.weights_out, n)

    if args.validate:
        B = args.batch or detector.batch_size
        frames = np.random.default_rng(0).integers(
            0, 255, (B, h, w, 3), np.uint8
        )
        out = run_exported(load_exported(args.output), detector.variables,
                           frames, orig_wh=(float(w), float(h)))
        ref = detector.detect_batch(frames)
        np.testing.assert_allclose(out["boxes_xywh"],
                                   np.asarray(ref.boxes_xywh),
                                   rtol=1e-4, atol=1e-3)
        np.testing.assert_array_equal(out["valid"], np.asarray(ref.valid))
        logger.info("validated: exported artifact matches the live detector")
    return 0


if __name__ == "__main__":
    sys.exit(main())
