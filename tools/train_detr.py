"""Fine-tune the DETR detector on a COCO-format dataset
(analog of reference tools/train_yolov8.py:18-40, rebuilt on the
framework's jitted training stack: Hungarian-matched set loss, AdamW with
the DETR LR recipe, optional (data, model) mesh sharding).

Usage:
  python tools/train_detr.py --images DIR --annotations coco.json \
      [--epochs 10] [--batch 8] [--height 768] [--width 1344] \
      [--checkpoint out_dir] [--init torch_or_orbax_ckpt] [--model-parallel 1]
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

logger = logging.getLogger("train_detr")


def _save_pytree(path: Path, tree) -> None:
    """Flat-leaf npz persistence (treedef comes from the in-memory template
    at load time — robust to dataclass/NamedTuple nesting)."""
    import jax

    leaves = jax.tree_util.tree_leaves(tree)
    np.savez(path, **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)})


def _load_leaves(path: Path) -> list[np.ndarray]:
    with np.load(path) as data:
        return [data[f"leaf_{i}"] for i in range(len(data.files))]


def _load_pytree(path: Path, template):
    import jax

    leaves = _load_leaves(path)
    treedef = jax.tree_util.tree_structure(template)
    return jax.tree_util.tree_unflatten(treedef, leaves)


def _load_train_state(path: Path, template):
    """Resume a TrainState npz, adapting when the checkpoint's EMA presence
    differs from the current ``--ema`` flag: resuming a pre-EMA checkpoint
    with EMA on restarts the average from the resumed weights; resuming an
    EMA checkpoint with EMA off drops the average. Any other leaf-count
    mismatch (e.g. a changed --accum-steps optimizer shape) fails with a
    clear message instead of an unflatten error."""
    import dataclasses

    import jax

    leaves = _load_leaves(path)

    def try_unflatten(tmpl):
        t_leaves, treedef = jax.tree_util.tree_flatten(tmpl)
        if len(leaves) != len(t_leaves):
            return None
        bad = [
            f"leaf_{i}: checkpoint {l.shape} vs expected {np.shape(t)}"
            for i, (l, t) in enumerate(zip(leaves, t_leaves))
            if l.shape != np.shape(t)
        ]
        if bad:  # same tree arity, different model geometry
            raise ValueError(
                f"checkpoint {path} matches the train-state structure but "
                f"{len(bad)} leaves differ in shape (different model "
                f"size/backbone?), e.g. {bad[0]}"
            )
        return jax.tree_util.tree_unflatten(treedef, leaves)

    state = try_unflatten(template)
    if state is not None:
        return state
    want_ema = template.ema_params is not None
    alt = dataclasses.replace(
        template,
        ema_params=None if want_ema
        else jax.tree_util.tree_map(np.asarray, template.params),
    )
    state = try_unflatten(alt)
    if state is None:
        n_tmpl = len(jax.tree_util.tree_leaves(template))
        raise ValueError(
            f"checkpoint {path} has {len(leaves)} leaves but the current "
            f"train state expects {n_tmpl}; the optimizer configuration "
            "(e.g. --accum-steps) must match the saving run"
        )
    if want_ema:
        logger.info("resumed checkpoint has no EMA; restarting the average "
                    "from the resumed weights")
        return dataclasses.replace(
            state, ema_params=jax.tree_util.tree_map(np.asarray, state.params)
        )
    logger.info("resumed checkpoint carries EMA weights; --ema 0 drops them")
    return dataclasses.replace(state, ema_params=None)


#: Working resolution the trainer resizes every frame to before the jitted
#: letterbox (matches the pipeline's 1280x720 input contract); evaluation
#: scores boxes in this pixel space.
EVAL_WH = (1280, 720)


def evaluate_detector(model, params, samples, *, target_hw, cfg,
                      is_yolo: bool = False, batch: int = 8,
                      conf: float = 0.25, iou: float = 0.5,
                      nms_iou: float | None = None):
    """Score the model on COCO samples with the framework's own
    DetectionBenchmark (P/R/F1, AP@50/75, mAP@[.5:.95]).

    The reference's trainer gets validation metrics for free from
    ultralytics' built-in val loop (reference tools/train_yolov8.py:18-40,
    reference output/benchmark_yolov8_ft/detection_metrics.json); here the
    same numbers come from one jitted forward+decode per batch feeding
    `benchmark/detection_benchmark.py`. Returns a BenchmarkResult.
    """
    import cv2
    import jax
    import jax.numpy as jnp

    from office_person_detection_vit_tpu.benchmark.detection_benchmark import (
        DetectionBenchmark,
        DetectionRecord,
    )
    from office_person_detection_vit_tpu.ops.preprocessing import (
        preprocess_frames,
    )

    if is_yolo:
        from office_person_detection_vit_tpu.models.yolo import decode_yolo

        def _fwd(params, frames_u8, orig_wh, conf):
            pixels, _ = preprocess_frames(
                frames_u8, target_hw=target_hw, out_dtype=cfg.jnp_dtype
            )
            out = model.apply({"params": params}, pixels)
            return decode_yolo(out, orig_wh, target_hw, cfg, conf)
    else:
        from office_person_detection_vit_tpu.models.postprocess import (
            postprocess_detr,
        )

        def _fwd(params, frames_u8, orig_wh, conf):
            pixels, mask = preprocess_frames(
                frames_u8, target_hw=target_hw, out_dtype=cfg.jnp_dtype
            )
            out = model.apply({"params": params}, pixels, mask)
            return postprocess_detr(
                out["logits"], out["boxes"], orig_wh, conf,
                score_mode=getattr(cfg, "score_mode", "softmax"),
                nms_iou=nms_iou,
            )

    fwd = jax.jit(_fwd)
    orig_wh = jnp.asarray(EVAL_WH, jnp.float32)
    conf_arr = jnp.float32(conf)

    # Key detections/GT by the full path string, not the basename — COCO
    # sets with duplicate file names in different subdirectories must not
    # collide in the GT join (ADVICE r2).
    records: list[DetectionRecord] = []
    for start in range(0, len(samples), batch):
        chunk = samples[start : start + batch]
        n = len(chunk)
        padded = chunk + [chunk[0]] * (batch - n)  # static batch shape
        imgs = []
        for path, _, _ in padded:
            img = cv2.imread(str(path))
            if img is None:
                img = np.zeros((720, 1280, 3), np.uint8)
            imgs.append(cv2.resize(img, EVAL_WH))
        out = fwd(params, jnp.asarray(np.stack(imgs)), orig_wh, conf_arr)
        boxes = np.asarray(out.boxes_xywh)
        scores = np.asarray(out.scores)
        valid = np.asarray(out.valid)
        for f in range(n):
            name = str(chunk[f][0])
            for q in np.flatnonzero(valid[f]):
                records.append(
                    DetectionRecord(
                        name,
                        tuple(float(v) for v in boxes[f, q]),
                        float(scores[f, q]),
                    )
                )

    w, h = EVAL_WH
    gt: dict[str, np.ndarray] = {}
    for path, bxs, _ in samples:
        if len(bxs):
            xywh = np.stack(
                [
                    (bxs[:, 0] - bxs[:, 2] / 2) * w,
                    (bxs[:, 1] - bxs[:, 3] / 2) * h,
                    bxs[:, 2] * w,
                    bxs[:, 3] * h,
                ],
                axis=-1,
            ).astype(np.float32)
        else:
            xywh = np.zeros((0, 4), np.float32)
        gt[str(path)] = xywh
    return DetectionBenchmark(iou_threshold=iou).evaluate(records, gt)


def load_coco_dataset(images_dir: Path, annotations: Path):
    """-> list of (image_path, boxes_cxcywh_norm, labels)."""
    doc = json.loads(annotations.read_text())
    images = {img["id"]: img for img in doc["images"]}
    per_image: dict[int, list] = {img_id: [] for img_id in images}
    for ann in doc.get("annotations", []):
        if ann["image_id"] in per_image:
            per_image[ann["image_id"]].append(ann)
    samples = []
    for img_id, anns in per_image.items():
        info = images[img_id]
        path = images_dir / info["file_name"]
        if not path.exists():
            continue
        w, h = float(info["width"]), float(info["height"])
        boxes, labels = [], []
        for ann in anns:
            x, y, bw, bh = ann["bbox"]
            boxes.append([(x + bw / 2) / w, (y + bh / 2) / h, bw / w, bh / h])
            labels.append(int(ann.get("category_id", 1)))
        samples.append((path, np.asarray(boxes, np.float32).reshape(-1, 4), labels))
    return samples


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(description="Fine-tune DETR (JAX/TPU)")
    parser.add_argument("--images", required=True, type=Path)
    parser.add_argument("--annotations", required=True, type=Path)
    parser.add_argument("--epochs", type=int, default=10)
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--height", type=int, default=768)
    parser.add_argument("--width", type=int, default=1344)
    parser.add_argument("--lr", type=float, default=1e-4)
    parser.add_argument("--checkpoint", type=Path, default=Path("runs/detr_ft"))
    parser.add_argument("--init", type=Path, default=None,
                        help="initial weights (torch .pt/.safetensors or orbax dir)")
    parser.add_argument("--model-parallel", type=int, default=1)
    parser.add_argument("--max-targets", type=int, default=32)
    parser.add_argument("--tiny", action="store_true", help="tiny model (smoke tests)")
    parser.add_argument("--model-size", choices=["full", "small", "tiny"],
                        default=None,
                        help="DETR capacity tier (DETRConfig.small/tiny); "
                             "--tiny is shorthand for --model-size tiny")
    parser.add_argument("--model", choices=["detr", "yolo"], default="detr",
                        help="detector family: detr (Hungarian-matched set "
                             "loss) or yolo (YOLOv8, BCE+CIoU+DFL — the "
                             "reference's tools/train_yolov8.py analog)")
    parser.add_argument("--yolo-variant", default="s",
                        help="YOLO family size n|s|m|l|x (--model yolo)")
    parser.add_argument("--backbone", choices=["resnet50", "vit"],
                        default="resnet50",
                        help="detector backbone (vit = models/vit.py, the "
                             "spec'd ViT-era path; --patch-size sets stride)")
    parser.add_argument("--patch-size", type=int, default=16)
    parser.add_argument("--enc-layers", type=int, default=None,
                        help="override encoder depth (ablations)")
    parser.add_argument("--dec-layers", type=int, default=None,
                        help="override decoder depth (ablations)")
    parser.add_argument("--dilate-c5", action="store_true",
                        help="DETR-DC5: dilate the last backbone stage to "
                             "stride 16 (small-object variant)")
    parser.add_argument("--class-loss", choices=("ce", "focal"), default="ce",
                        help="DETR classification: 'ce' = softmax CE with "
                             "eos down-weighting (the paper); 'focal' = "
                             "Deformable-DETR per-class sigmoid focal "
                             "(+ prior-bias head init, sigmoid eval scores) "
                             "— removes the symmetric-blend attractor "
                             "measured at reduced scale (docs/training.md)")
    parser.add_argument("--w-class", type=float, default=None,
                        help="classification loss weight override (defaults: "
                             "1.0 for ce, the Deformable-DETR 2.0 for focal). "
                             "Raising it is the lever for a class-confidence "
                             "fine-tune phase on a box-converged checkpoint")
    parser.add_argument("--focal-alpha", type=float, default=0.25,
                        help="focal alpha (positive-term weight) when "
                             "--class-loss focal")
    parser.add_argument("--remat", action="store_true",
                        help="rematerialize transformer layers (less HBM, ~1 extra fwd)")
    parser.add_argument("--dropout", type=float, default=None,
                        help="transformer dropout override (DETR family). "
                             "Default: 0.1 full-size (the paper recipe), "
                             "0.0 for --tiny — dropout noise destabilizes "
                             "the Hungarian match at tiny scale and "
                             "collapses the queries (docs/training.md)")
    parser.add_argument("--save-every", type=int, default=1,
                        help="save a checkpoint every N epochs")
    parser.add_argument("--seed", type=int, default=0,
                        help="seed for init, shuffling and the train-step "
                             "rng (reproducible runs; vary for replicates)")
    parser.add_argument("--schedule", choices=["none", "cosine", "step"],
                        default="none",
                        help="LR schedule: cosine (warmup + cosine decay, "
                             "the ultralytics-style recipe) or step (10x "
                             "drop at --drop-at, the DETR paper recipe)")
    parser.add_argument("--warmup-steps", type=int, default=0)
    parser.add_argument("--backbone-lr-scale", type=float, default=0.1,
                        help="backbone LR as a fraction of --lr. 0.1 is the "
                             "DETR paper's FINE-TUNING recipe (pretrained "
                             "R50); training the backbone from scratch "
                             "(no egress here) usually wants 1.0")
    parser.add_argument("--drop-at", type=int, default=None,
                        help="step at which --schedule step drops the LR")
    parser.add_argument("--accum-steps", type=int, default=1,
                        help="gradient accumulation micro-steps per update "
                             "(optax.MultiSteps; large effective batch on "
                             "one chip)")
    parser.add_argument("--ema", type=float, default=0.0,
                        help="EMA decay for a weight average (e.g. 0.999; "
                             "0 = off). Eval and the final weights.npz use "
                             "the EMA weights — the ultralytics ModelEMA "
                             "analog")
    parser.add_argument("--augment", action="store_true",
                        help="fused on-device augmentation (hflip + "
                             "photometric, training/augment.py)")
    parser.add_argument("--evaluate", action="store_true",
                        help="score P/R/F1 + AP@50/75 + mAP on the val set "
                             "with the native DetectionBenchmark (the "
                             "reference trainer's ultralytics val-loop "
                             "analog); recorded in history.json")
    parser.add_argument("--eval-every", type=int, default=0,
                        help="evaluate every N epochs (0 = final epoch only)")
    parser.add_argument("--eval-conf", type=float, default=0.25,
                        help="confidence threshold for evaluation "
                             "(reference best_threshold 0.20-0.25)")
    parser.add_argument("--eval-iou", type=float, default=0.5)
    parser.add_argument("--eval-nms", type=float, default=None,
                        help="apply greedy NMS at this IoU during --evaluate "
                             "(match detection.nms_threshold used in the "
                             "pipeline for reduced-scale focal checkpoints)")
    parser.add_argument("--val-images", type=Path, default=None,
                        help="val image dir (default: --images)")
    parser.add_argument("--val-annotations", type=Path, default=None,
                        help="val COCO json (default: --annotations)")
    parser.add_argument("--resume-from", type=Path, default=None,
                        help="resume training from a saved train_state.npz")
    parser.add_argument("--platform", default=None,
                        help="force a jax platform (e.g. cpu). The axon TPU "
                             "plugin overrides JAX_PLATFORMS env after "
                             "import, so this flag is the reliable way to "
                             "train on host CPU")
    args = parser.parse_args(argv)
    # --tiny is shorthand for --model-size tiny; either spelling wins.
    size = args.model_size or ("tiny" if args.tiny else "full")
    args.tiny = size == "tiny"

    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from office_person_detection_vit_tpu.models.detr import DETR, DETRConfig, init_detr
    from office_person_detection_vit_tpu.ops.preprocessing import preprocess_frames
    from office_person_detection_vit_tpu.parallel.mesh import make_mesh
    from office_person_detection_vit_tpu.training import (
        TrainState,
        make_optimizer,
        make_sharded_train_step,
        make_train_step,
    )
    from office_person_detection_vit_tpu.training.data import COCOBatchLoader

    samples = load_coco_dataset(args.images, args.annotations)
    if not samples:
        logger.error("no usable samples under %s", args.images)
        return 1
    if len(samples) < args.batch:
        logger.warning(
            "dataset (%d) smaller than --batch %d; clamping batch",
            len(samples), args.batch,
        )
        args.batch = len(samples)
    logger.info("dataset: %d images", len(samples))

    target_hw = (args.height, args.width)
    if args.model == "yolo":
        from office_person_detection_vit_tpu.models.yolo import (
            YOLOConfig,
            init_yolo,
        )
        from office_person_detection_vit_tpu.training import (
            make_yolo_sharded_train_step,
            make_yolo_train_step,
        )

        cfg = (YOLOConfig.tiny() if args.tiny
               else YOLOConfig(variant=args.yolo_variant))
        model, variables = init_yolo(cfg, jax.random.PRNGKey(args.seed), input_hw=(64, 64))
        if args.init:
            if args.init.exists():
                from office_person_detection_vit_tpu.models.weights import (
                    convert_yolov8_state_dict,
                )

                if args.init.suffix in (".pt", ".pth", ".bin"):
                    import torch

                    sd = torch.load(str(args.init), map_location="cpu",
                                    weights_only=True)
                    if isinstance(sd, dict) and isinstance(sd.get("model"), dict):
                        sd = sd["model"]
                    variables = convert_yolov8_state_dict(sd)
                else:
                    variables = _load_pytree(args.init, variables)
                logger.info("initialized from %s", args.init)
            else:
                logger.warning("--init %s not found; training from random init",
                               args.init)
        from office_person_detection_vit_tpu.ops.preprocessing import (
            compute_resize_geometry,
        )

        # GT boxes are normalized to the source frame == the letterboxed
        # valid content; the criterion must scale them by the content
        # extent, not the padded canvas (the grid still spans the canvas).
        src_h, src_w = EVAL_WH[1], EVAL_WH[0]
        content_hw = compute_resize_geometry((src_h, src_w), target_hw)
        make_single = lambda m, t, **kw: make_yolo_train_step(  # noqa: E731
            m, t, target_hw, content_hw=content_hw, **kw)
        make_sharded = lambda m, t, mesh, p, **kw: make_yolo_sharded_train_step(  # noqa: E731
            m, t, mesh, p, target_hw, content_hw=content_hw, **kw)
    else:
        make_single = make_train_step
        make_sharded = make_sharded_train_step

    if args.model != "yolo":
        extra = {}
        if args.backbone == "vit":
            extra = dict(backbone="vit", vit_patch_size=args.patch_size)
            if args.tiny:
                from office_person_detection_vit_tpu.models.vit import ViTConfig

                t = ViTConfig.tiny()
                extra.update(vit_patch_size=min(args.patch_size, t.patch_size),
                             vit_hidden=t.hidden_size, vit_layers=t.num_layers,
                             vit_heads=t.num_heads, vit_mlp=t.mlp_dim,
                             vit_pos_grid=t.pos_grid)
        if args.dropout is not None:
            extra["dropout"] = args.dropout
        if args.dilate_c5:
            extra["dilate_c5"] = True
        if args.class_loss == "focal":
            # Focal head: prior-biased init + sigmoid score semantics
            # (postprocess/eval/export all read cfg.score_mode).
            extra["class_prior"] = 0.01
            extra["score_mode"] = "sigmoid"
        if args.enc_layers is not None:
            extra["num_encoder_layers"] = args.enc_layers
        if args.dec_layers is not None:
            extra["num_decoder_layers"] = args.dec_layers
        cfg = (
            getattr(DETRConfig, size)(use_pallas_attention=False,
                                      remat=args.remat, **extra)
            if size in ("tiny", "small")
            else DETRConfig(dtype="bfloat16", remat=args.remat,
                            use_pallas_attention=False,  # XLA attention faster at DETR scale (measured)
                            **extra)
        )
        model, variables = init_detr(cfg, jax.random.PRNGKey(args.seed), input_hw=(64, 64))
        if args.init:
            if args.init.exists():
                from office_person_detection_vit_tpu.models.weights import (
                    load_any_checkpoint,
                )

                variables = load_any_checkpoint(
                    args.init, template=variables,
                    num_encoder_layers=cfg.num_encoder_layers,
                    num_decoder_layers=cfg.num_decoder_layers,
                )
                logger.info("initialized from %s", args.init)
            else:
                logger.warning("--init %s not found; training from random init",
                               args.init)
    params = variables["params"]

    steps_per_epoch = max(1, len(samples) // args.batch)
    tx = make_optimizer(
        learning_rate=args.lr,
        backbone_lr=args.lr * args.backbone_lr_scale,
        schedule=None if args.schedule == "none" else args.schedule,
        total_steps=args.epochs * steps_per_epoch,
        warmup_steps=args.warmup_steps,
        drop_at=args.drop_at,
        accum_steps=args.accum_steps,
    )
    use_ema = args.ema > 0
    state0 = TrainState.create(params, tx, ema=use_ema)

    from office_person_detection_vit_tpu.training import (
        AugmentConfig,
        content_width,
    )

    aug_cfg = (
        AugmentConfig(content_w=content_width(target_hw))
        if args.augment else None
    )
    step_kwargs = dict(
        ema_decay=args.ema if use_ema else None, augment=aug_cfg,
    )
    if args.model != "yolo" and (args.class_loss == "focal"
                                 or args.w_class is not None):
        from office_person_detection_vit_tpu.training import CriterionConfig

        # Deformable-DETR loss weights: w_class 2.0 under focal (their
        # reference config); box weights unchanged. --w-class overrides for
        # class-confidence fine-tune phases.
        default_w = 2.0 if args.class_loss == "focal" else 1.0
        step_kwargs["criterion"] = CriterionConfig(
            num_classes=cfg.num_classes, class_loss=args.class_loss,
            w_class=args.w_class if args.w_class is not None else default_w,
            focal_alpha=args.focal_alpha,
        )
    start_epoch = 0
    if args.resume_from and args.resume_from.exists():
        state0 = _load_train_state(args.resume_from, state0)
        params = state0.params
        meta = args.resume_from.parent / "train_state_meta.json"
        if meta.exists():
            start_epoch = json.loads(meta.read_text()).get("epoch", 0)
        logger.info("resumed train state from %s (epoch %d)",
                    args.resume_from, start_epoch)

    n_dev = jax.device_count()
    data_parallel = n_dev // args.model_parallel
    if n_dev > 1 and args.batch % max(data_parallel, 1) == 0:
        mesh = make_mesh(n_dev, model_parallel=args.model_parallel)
        step = make_sharded(model, tx, mesh, params, **step_kwargs)
        state = step.shard_state(state0)
        shard_batch = step.shard_batch
    else:
        if n_dev > 1:
            logger.warning(
                "batch %d not divisible by data axis %d; single-device step",
                args.batch, data_parallel,
            )
        step = make_single(model, tx, **step_kwargs)
        state = state0
        shard_batch = lambda b: b  # noqa: E731

    val_samples = samples
    if args.val_images or args.val_annotations:
        val_samples = load_coco_dataset(
            args.val_images or args.images,
            args.val_annotations or args.annotations,
        )

    def eval_params():
        """EMA weights when tracked (the served/exported weights), else raw."""
        p = state.ema_params if use_ema and state.ema_params is not None \
            else state.params
        return jax.device_get(p)

    def run_eval(epoch: int) -> None:
        res = evaluate_detector(
            model, eval_params(), val_samples,
            target_hw=target_hw, cfg=cfg, is_yolo=args.model == "yolo",
            batch=min(args.batch, len(val_samples)),
            conf=args.eval_conf, iou=args.eval_iou,
            nms_iou=args.eval_nms,
        )
        entry = {"epoch": epoch, **res.to_dict()}
        history.setdefault("evals", []).append(entry)
        logger.info(
            "eval epoch %d: P %.3f R %.3f F1 %.3f AP50 %.3f mAP %.3f "
            "(tp %d fp %d fn %d)",
            epoch, res.precision, res.recall, res.f1, res.ap50,
            res.map_5095, res.tp, res.fp, res.fn,
        )

    key = jax.random.PRNGKey(args.seed + 1)

    # Input pipeline: decode-once LRU frame cache + a background producer
    # assembling the next batches while the device runs the current step
    # (training/data.py — the ultralytics-DataLoader analog).
    if args.model != "yolo" and args.max_targets > cfg.num_queries:
        # The jittable matcher needs padded capacity <= Q (an assignment of
        # more target slots than queries is infeasible and silently breaks
        # matching — see training/matcher.py::hungarian_match). Boxes past
        # capacity are dropped by the loader; warn only if that can happen.
        logger.warning(
            "--max-targets %d exceeds the model's %d queries; clamping "
            "(images with more than %d boxes lose the excess)",
            args.max_targets, cfg.num_queries, cfg.num_queries,
        )
        args.max_targets = cfg.num_queries
    loader = COCOBatchLoader(samples, args.batch, capacity=args.max_targets,
                             seed=args.seed, depth=2)

    def to_device(host_batch: dict) -> dict:
        pixels, mask = preprocess_frames(
            jnp.asarray(host_batch["frames_u8"]), target_hw=target_hw,
            out_dtype=cfg.jnp_dtype,
        )
        batch = {
            "pixels": pixels,
            "pixel_mask": mask,
            "labels": jnp.asarray(host_batch["labels"]),
            "boxes": jnp.asarray(host_batch["boxes"]),
            "valid": jnp.asarray(host_batch["valid"]),
        }
        if args.model == "yolo":  # no mask input; keep batch == shard specs
            del batch["pixel_mask"]
        return batch

    def save_state(epoch: int) -> None:
        args.checkpoint.mkdir(parents=True, exist_ok=True)
        _save_pytree(args.checkpoint / "train_state.npz", jax.device_get(state))
        (args.checkpoint / "train_state_meta.json").write_text(
            json.dumps({"epoch": epoch})
        )

    history_path = args.checkpoint / "history.json"
    history: dict = {"step_losses": [], "epoch_losses": [], "config": {
        "batch": args.batch, "lr": args.lr, "devices": n_dev,
        "data_parallel": int(max(data_parallel, 1)),
        "model_parallel": args.model_parallel, "tiny": args.tiny,
        "model_size": size,
        "schedule": args.schedule, "warmup_steps": args.warmup_steps,
        "accum_steps": args.accum_steps, "ema": args.ema,
        "augment": bool(args.augment),
        "class_loss": args.class_loss,
        "w_class": args.w_class, "focal_alpha": args.focal_alpha,
        "backbone_lr_scale": args.backbone_lr_scale,
        "eval_nms": args.eval_nms, "max_targets": args.max_targets,
        "enc_objectness": bool(
            args.model != "yolo" and getattr(cfg, "enc_objectness", False)
        ),
    }}
    if args.resume_from and history_path.exists():
        prev = json.loads(history_path.read_text())
        history["step_losses"] = prev.get("step_losses", [])
        history["epoch_losses"] = prev.get("epoch_losses", [])
        if prev.get("evals"):
            history["evals"] = prev["evals"]
        history["resumed_at_step"] = len(history["step_losses"])

    if args.evaluate:
        run_eval(start_epoch)  # pre-training baseline (epoch = start)

    # Full-batch mode (batch == dataset): every epoch is the SAME single
    # batch, so keep it device-resident instead of re-uploading it each
    # epoch — over a remote tunnel the re-upload dominates the step
    # (265 MB/epoch measured at 96x720p, ~6 s/epoch at ~50 MB/s, and the
    # runtime's deferred-upload bookkeeping leaked the host copy: 130 GB
    # RSS after 494 epochs). On-device augmentation still varies per step
    # (it draws from the per-step rng inside the jitted program).
    # Covers plain full-batch (batch == dataset) and accumulated full-batch
    # (batch x accum_steps >= dataset): in both, every epoch consumes the
    # whole dataset and the gradient is the full-batch gradient regardless
    # of batch composition, so epoch-0's device batches can be reused
    # verbatim. On-device augmentation still varies per step (per-step rng
    # inside the jitted program).
    cache_device_batch = args.batch * args.accum_steps >= len(samples)
    if cache_device_batch:
        logger.info("full-batch run: caching device batches across epochs")
    device_batches: list | None = None

    for epoch in range(start_epoch, args.epochs):
        t0 = time.perf_counter()
        losses = []  # device scalars; fetched once per epoch so async
        comps: dict[str, list] = {}
        filling = cache_device_batch and device_batches is None
        if filling:
            device_batches = []
        for host_batch in (
            device_batches if (cache_device_batch and not filling)
            else loader.epoch(epoch)
        ):
            if cache_device_batch and not filling:
                batch = host_batch  # already a device batch
            else:
                batch = shard_batch(to_device(host_batch))
                if filling:
                    device_batches.append(batch)
            key, sub = jax.random.split(key)
            state, metrics = step(state, batch, sub)
            losses.append(metrics["loss"])
            for k, v in metrics.items():
                if k != "loss":
                    comps.setdefault(k, []).append(v)
        losses = [float(l) for l in jax.device_get(losses)]
        comp_means = {
            k: float(np.mean(jax.device_get(v))) for k, v in comps.items()
        }
        logger.info(
            "epoch %d/%d: loss %.4f [%s] (%.1fs)",
            epoch + 1, args.epochs,
            float(np.mean(losses)) if losses else float("nan"),
            " ".join(f"{k}={v:.3f}" for k, v in sorted(comp_means.items())),
            time.perf_counter() - t0,
        )
        history["step_losses"].extend(losses)
        history["epoch_losses"].append(
            float(np.mean(losses)) if losses else None
        )
        history.setdefault("epoch_metrics", []).append(comp_means)
        if args.evaluate and (
            epoch + 1 == args.epochs
            or (args.eval_every and (epoch + 1) % args.eval_every == 0)
        ):
            run_eval(epoch + 1)
        args.checkpoint.mkdir(parents=True, exist_ok=True)
        history_path.write_text(json.dumps(history))
        if (epoch + 1) % args.save_every == 0:
            save_state(epoch + 1)

    args.checkpoint.mkdir(parents=True, exist_ok=True)
    ckpt_path = args.checkpoint / "weights.npz"
    _save_pytree(ckpt_path, {"params": eval_params() if use_ema
                             else jax.device_get(state.params)})
    logger.info("saved checkpoint -> %s%s", ckpt_path,
                " (EMA weights)" if use_ema else "")
    return 0


if __name__ == "__main__":
    sys.exit(main())
