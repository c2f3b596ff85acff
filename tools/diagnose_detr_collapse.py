"""Diagnose DETR query-collapse pathologies in a trained checkpoint.

Round 3 identified the symmetric query collapse at tiny scale (every query
converging to the same blended class distribution — docs/training.md
"DETR at tiny scale"); round 4's first DETR-small run on the showcase set
surfaced a second signature on top of it: *blind anchors* — the decoder
predicts image-INDEPENDENT boxes (exact dataset-median box size at fixed
canonical positions, repeated verbatim across different images), i.e. the
cross-attention path carries no content and the model regresses the
dataset's average geometry. This tool measures both signatures directly
from a checkpoint so a failed run is diagnosable in one command instead
of a hand-written probe:

- per-image Hungarian match (the criterion's own matcher) -> matched-query
  person probability vs the max person probability among UNMATCHED queries.
  Collapse <=> the two coincide (the "blend"); healthy <=> matched >> unmatched.
- fire rate: fraction of queries above --conf. Collapse fires all queries.
- matched-box IoU vs GT: localization quality of the matched predictions.
- anchor frozenness: std of each query's predicted box center across
  images. A content-driven decoder moves its boxes per image; a blind
  decoder's centers are constant (std ~ 0) regardless of input.

The reference has no analog (its detector is pretrained —
reference src/detection/yolov8_detector.py:70-88 just loads weights); this
exists because the rebuild trains DETR from scratch at reduced scale where
these failure modes live.

Usage:
  python tools/diagnose_detr_collapse.py --weights runs/detr_ft/weights.npz \
      --images data/train/images --annotations data/train/coco.json \
      --model-size small [--height 224 --width 384] [--limit 16] \
      [--json-out diag.json] [--platform cpu]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def _xyxy(b: np.ndarray) -> np.ndarray:
    cx, cy, w, h = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)


def _iou(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Elementwise IoU of aligned (N,4) xyxy arrays."""
    x1 = np.maximum(a[:, 0], b[:, 0])
    y1 = np.maximum(a[:, 1], b[:, 1])
    x2 = np.minimum(a[:, 2], b[:, 2])
    y2 = np.minimum(a[:, 3], b[:, 3])
    inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
    area = lambda r: (r[:, 2] - r[:, 0]) * (r[:, 3] - r[:, 1])  # noqa: E731
    return inter / np.maximum(area(a) + area(b) - inter, 1e-9)


def summarize_predictions(logits: np.ndarray, boxes: np.ndarray,
                          gt_boxes_list: list[np.ndarray], *,
                          person_class_id: int, conf: float = 0.25,
                          class_loss: str = "ce") -> dict:
    """Pure metric core: (N,Q,C+1) logits + (N,Q,4) cxcywh preds + per-image
    GT -> collapse signature report (unit-testable without a model).

    ``class_loss`` mirrors ``CriterionConfig.class_loss``: a checkpoint
    trained with the focal/sigmoid head has an untrained no-object column,
    so its scores must be per-class sigmoids (and the match cost focal),
    not softmax over C+1.
    """
    import jax.numpy as jnp

    from office_person_detection_vit_tpu.training.matcher import hungarian_match

    N, Q = logits.shape[:2]
    if class_loss == "focal":
        person = 1.0 / (1.0 + np.exp(-logits[..., person_class_id]))
    else:
        e = np.exp(logits - logits.max(-1, keepdims=True))
        probs = e / e.sum(-1, keepdims=True)
        person = probs[..., person_class_id]

    per_image = []
    for i, gt_boxes in enumerate(gt_boxes_list):
        T = len(gt_boxes)
        m = np.asarray(hungarian_match(
            jnp.asarray(logits[i]), jnp.asarray(boxes[i]),
            jnp.full((T,), person_class_id, jnp.int32), jnp.asarray(gt_boxes),
            jnp.ones((T,), bool), 200, class_loss))
        unmatched = np.setdiff1d(np.arange(Q), m)
        iou = _iou(_xyxy(boxes[i, m]), _xyxy(np.asarray(gt_boxes)))
        per_image.append({
            "n_gt": T,
            "matched_p": float(person[i, m].mean()),
            "unmatched_max_p": float(person[i, unmatched].max())
            if len(unmatched) else 0.0,
            "fire": int((person[i] > conf).sum()),
            "matched_iou_mean": float(iou.mean()),
        })

    matched_p = float(np.mean([r["matched_p"] for r in per_image]))
    unmatched_p = float(np.mean([r["unmatched_max_p"] for r in per_image]))
    fire_rate = float(np.mean([r["fire"] for r in per_image]) / Q)
    iou_mean = float(np.mean([r["matched_iou_mean"] for r in per_image]))
    # Per-query center spread across images: ~0 = the query ignores content.
    center_std = boxes[..., :2].std(axis=0).mean(axis=-1)  # (Q,)
    frozen_frac = float((center_std < 0.01).mean())

    return {
        "n_images": N,
        "num_queries": Q,
        "conf": conf,
        "class_loss": class_loss,
        "matched_p": round(matched_p, 4),
        "unmatched_max_p": round(unmatched_p, 4),
        "blend_gap": round(matched_p - unmatched_p, 4),
        "fire_rate": round(fire_rate, 4),
        "matched_iou_mean": round(iou_mean, 4),
        "query_center_std_mean": round(float(center_std.mean()), 4),
        "frozen_query_frac": round(frozen_frac, 4),
        "flags": {
            # matched vs unmatched indistinguishable AND (almost) all
            # queries firing = the round-3 symmetric blend.
            "symmetric_collapse": bool(
                matched_p - unmatched_p < 0.1 and fire_rate > 0.8),
            # decoder output does not move with image content.
            "blind_anchors": bool(frozen_frac > 0.5),
            "weak_localization": bool(iou_mean < 0.5),
        },
        "per_image": per_image,
    }


def diagnose(weights: Path, images: Path, annotations: Path, *,
             model_size: str = "small", target_hw: tuple[int, int] = (224, 384),
             limit: int = 16, conf: float = 0.25, batch: int = 8,
             class_loss: str = "ce") -> dict:
    import cv2
    import jax
    import jax.numpy as jnp

    from office_person_detection_vit_tpu.models.detr import DETRConfig, init_detr
    from office_person_detection_vit_tpu.ops.preprocessing import preprocess_frames
    from tools.train_detr import EVAL_WH, _load_pytree, load_coco_dataset

    cfg = (DETRConfig() if model_size == "full"
           else getattr(DETRConfig, model_size)())
    model, variables = init_detr(cfg, jax.random.PRNGKey(0), input_hw=(64, 64))
    variables = _load_pytree(weights, variables)
    params = variables["params"] if "params" in variables else variables

    samples = [s for s in load_coco_dataset(images, annotations)
               if len(s[1])][:limit]
    if not samples:
        raise SystemExit(f"no annotated samples under {images}")

    @jax.jit
    def fwd(frames_u8):
        pixels, mask = preprocess_frames(
            frames_u8, target_hw=target_hw, out_dtype=cfg.jnp_dtype)
        out = model.apply({"params": params}, pixels, mask)
        return out["logits"].astype(jnp.float32), out["boxes"].astype(jnp.float32)

    logits_all, boxes_all = [], []
    for start in range(0, len(samples), batch):
        chunk = samples[start:start + batch]
        padded = chunk + [chunk[0]] * (batch - len(chunk))
        frames = []
        for p, _, _ in padded:
            img = cv2.imread(str(p))
            frames.append(cv2.resize(img, EVAL_WH) if img is not None
                          else np.zeros((EVAL_WH[1], EVAL_WH[0], 3), np.uint8))
        frames = np.stack(frames)
        lg, bx = fwd(jnp.asarray(frames))
        logits_all.append(np.asarray(lg)[:len(chunk)])
        boxes_all.append(np.asarray(bx)[:len(chunk)])
    logits = np.concatenate(logits_all)   # (N, Q, C+1)
    boxes = np.concatenate(boxes_all)     # (N, Q, 4)

    report = summarize_predictions(
        logits, boxes, [np.asarray(gt) for _, gt, _ in samples],
        person_class_id=cfg.person_class_id, conf=conf, class_loss=class_loss)
    return {"weights": str(weights), "model_size": model_size, **report}


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--weights", required=True, type=Path)
    p.add_argument("--images", required=True, type=Path)
    p.add_argument("--annotations", required=True, type=Path)
    p.add_argument("--model-size", default="small",
                   choices=["tiny", "small", "full"])
    p.add_argument("--height", type=int, default=224)
    p.add_argument("--width", type=int, default=384)
    p.add_argument("--limit", type=int, default=16)
    p.add_argument("--conf", type=float, default=0.25)
    p.add_argument("--class-loss", choices=("ce", "focal"), default="ce",
                   help="the CriterionConfig.class_loss the checkpoint was "
                        "trained with — focal checkpoints have an untrained "
                        "no-object column, so scores/matching must use "
                        "per-class sigmoids")
    p.add_argument("--json-out", type=Path, default=None)
    p.add_argument("--platform", default=None,
                   help="force a jax platform (e.g. cpu)")
    args = p.parse_args(argv)

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    report = diagnose(
        args.weights, args.images, args.annotations,
        model_size=args.model_size, target_hw=(args.height, args.width),
        limit=args.limit, conf=args.conf, class_loss=args.class_loss)

    flags = [k for k, v in report["flags"].items() if v]
    print(f"{report['n_images']} images, Q={report['num_queries']}: "
          f"matched_p {report['matched_p']:.3f} vs unmatched_max_p "
          f"{report['unmatched_max_p']:.3f} (gap {report['blend_gap']:.3f}), "
          f"fire rate {report['fire_rate']:.2f}, matched IoU "
          f"{report['matched_iou_mean']:.3f}, frozen queries "
          f"{report['frozen_query_frac']:.2f}")
    print("flags:", ", ".join(flags) if flags else "none (healthy)")
    if args.json_out:
        args.json_out.parent.mkdir(parents=True, exist_ok=True)
        args.json_out.write_text(json.dumps(report, indent=2))
        print(f"wrote {args.json_out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
