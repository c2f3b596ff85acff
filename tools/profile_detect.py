"""Per-stage on-chip profile of the DETR detect program + MFU accounting.

Breaks the batch-16 compute ceiling (bench.py `compute_ceiling_fps`) into
preprocess / backbone / encoder / decoder+heads / postprocess using the same
scan-chain methodology as the bench: each stage is a jitted program whose
iterations are data-dependent inside ONE dispatch (`lax.scan`), timed by
materializing a scalar on host — the only sync the remote tunnel honors
(CLAUDE.md "TPU timing").

FLOPs come from XLA's own cost model (`compiled.cost_analysis()["flops"]`),
falling back to an analytic DETR-R50 estimate. MFU = achieved FLOP/s over
the chip's bf16 peak.

Usage: python tools/profile_detect.py [--batch 16] [--height 736] [--width 1280]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

# Published bf16 peaks (dense, per chip), TFLOP/s.
PEAK_BF16_TFLOPS = {
    "v5e": 197.0,  # aka v5 lite
    "v5p": 459.0,
    "v4": 275.0,
    "v6e": 918.0,
}


def detect_peak_tflops() -> tuple[float, str]:
    import jax

    kind = jax.devices()[0].device_kind.lower()
    for key, peak in PEAK_BF16_TFLOPS.items():
        if key in kind.replace(" ", "").replace("lite", "e"):
            return peak, kind
    if "v5" in kind:  # "TPU v5 lite" etc.
        return PEAK_BF16_TFLOPS["v5e"], kind
    return PEAK_BF16_TFLOPS["v5e"], kind  # conservative default


def chain_time(fn, *args, iters: int = 8, reps: int = 3, perturb=None):
    """Best wall time per iteration of `fn` scan-chained inside one jit.

    `fn(*args) -> pytree`; the chain feeds a data-dependent scalar back into
    args via `perturb(args, carry)` (default: bitwise-xor into the first
    arg) so XLA cannot parallelize or elide iterations.
    """
    import jax
    import jax.numpy as jnp

    if perturb is None:
        def perturb(args, carry):
            a0 = args[0]
            eps = carry.astype(a0.dtype) * jnp.asarray(0, a0.dtype)
            return (a0 + eps, *args[1:]) if jnp.issubdtype(a0.dtype, jnp.floating) \
                else (a0 ^ carry.astype(a0.dtype), *args[1:])

    @jax.jit
    def chained(*args):
        def body(carry, _):
            out = fn(*perturb(args, carry))
            s = jax.tree_util.tree_reduce(
                lambda acc, leaf: acc + jnp.sum(leaf).astype(jnp.float32),
                out, jnp.float32(0),
            )
            return (s * 0).astype(jnp.int32) + 1, s

        _, sums = jax.lax.scan(body, jnp.int32(0), None, length=iters)
        return sums

    args_d = jax.device_put(args)
    np.asarray(chained(*args_d))  # compile + upload
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(chained(*args_d))
        best = min(best, time.perf_counter() - t0)
    return best / iters, chained, args_d


def program_flops(jitted, *args) -> float | None:
    """XLA cost-model FLOPs for a compiled program.

    NOTE: for a program whose body sits inside lax.scan, XLA counts the
    loop body ONCE (verified: the chained full-detect program reports
    1/iters of the analytic total) — so callers must pass the *single-call*
    program, not the chained one."""
    try:
        compiled = jitted.lower(*args).compile()
        stats = compiled.cost_analysis()
        if isinstance(stats, list):
            stats = stats[0]
        return float(stats["flops"])
    except Exception:
        return None


def analytic_detr_flops(B, H, W, cfg) -> float:
    """FLOPs = 2*MACs throughout. ResNet backbone scaled from ResNet-50's
    4.09 GMACs @224²; ViT backbone (cfg.backbone == "vit") computed from
    its token/width geometry, with the DETR token count following the
    patch stride. Cross-check (R50): XLA cost_analysis reports 177.7
    GFLOPs/frame @736x1280, this returns ~178.5."""
    if getattr(cfg, "backbone", "resnet50") == "vit":
        P_ = cfg.vit_patch_size
        Lv = (H // P_) * (W // P_) + 1  # + CLS token
        dv, fv = cfg.vit_hidden, cfg.vit_mlp
        per_layer = 8 * Lv * dv * dv + 4 * Lv * Lv * dv + 4 * Lv * dv * fv
        backbone = (
            cfg.vit_layers * per_layer
            + 2 * Lv * (P_ * P_ * 3) * dv  # patch embed
        )
        L = (H // P_) * (W // P_)
        proj_in = dv
    else:
        backbone = 2 * 4.09e9 * (H * W) / (224 * 224)
        L = (H // 32) * (W // 32)
        proj_in = 2048
    d, f = cfg.d_model, cfg.ffn_dim
    enc = cfg.num_encoder_layers * (8 * L * d * d + 4 * L * L * d + 4 * L * d * f)
    Q = cfg.num_queries
    dec = cfg.num_decoder_layers * (
        8 * Q * d * d + 4 * Q * Q * d          # self-attn
        + 4 * Q * d * d + 4 * L * d * d + 4 * Q * L * d  # cross-attn
        + 4 * Q * d * f                         # ffn
    )
    proj = 2 * L * proj_in * d
    return B * (backbone + enc + dec + proj)


def _profile_yolo(args) -> int:
    """Full-program ceiling + MFU for the YOLOv8 family (models/yolo.py):
    model forward and the DFL decode + NMS stage chained separately, plus
    the full fused detect program (the production path)."""
    import jax
    import jax.numpy as jnp

    from office_person_detection_vit_tpu.config.config_manager import ConfigManager
    from office_person_detection_vit_tpu.detection.yolo_detector import YOLODetector
    from office_person_detection_vit_tpu.models.yolo import decode_yolo
    from office_person_detection_vit_tpu.ops.preprocessing import preprocess_frames

    B, H, W = args.batch, args.height, args.width
    cfgm = ConfigManager.from_dict(
        {"detection": {"batch_size": B, "input_height": H, "input_width": W,
                       "dtype": "bfloat16", "model": "yolo",
                       "yolo_variant": args.yolo_variant,
                       "confidence_threshold": 0.5}}
    )
    det = YOLODetector(cfgm)
    det.load_model()
    cfg = det.yolo_config
    dtype = cfg.jnp_dtype
    model = det.model

    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (B, 720, 1280, 3), np.uint8)
    pixels = np.asarray(rng.normal(size=(B, H, W, 3)), np.float32).astype(dtype)
    orig_wh = np.asarray([1280.0, 720.0], np.float32)

    stages = {}

    def add(name, fn, *inputs, **kw):
        sec, _, args_d = chain_time(fn, *inputs, iters=args.iters, **kw)
        fl = program_flops(jax.jit(fn), *args_d)
        stages[name] = {"ms": 1e3 * sec, "flops": fl}

    add("preprocess", lambda f: preprocess_frames(f, target_hw=(H, W),
                                                  out_dtype=dtype)[0], frames)
    # Params ride as TRACED arguments, never closures: closed-over arrays
    # get baked into the HLO as constants, and for the large variants the
    # remote-compile request then exceeds the tunnel's body-size limit
    # (HTTP 413 observed with yolov8-x).
    add("forward", lambda x, v: model.apply(v, x, deterministic=True)[
        "levels"][0]["class_logits"], pixels, det.variables)

    raw = jax.jit(lambda v, x: model.apply(v, x, deterministic=True))(
        det.variables, jnp.asarray(pixels)
    )
    levels_host = jax.device_get(raw["levels"])

    def decode_stage(*flat):
        levels = [
            {"box_dist": flat[2 * i], "class_logits": flat[2 * i + 1]}
            for i in range(len(flat) // 2)
        ]
        out = decode_yolo({"levels": levels}, jnp.asarray(orig_wh), (H, W),
                          cfg, 0.5)
        return out.scores
    flat_levels = [a for lv in levels_host for a in (lv["box_dist"],
                                                     lv["class_logits"])]
    add("decode+nms", decode_stage, *flat_levels)

    def full(f, v):
        batch, _ = det._jit_detect.jitted(
            v, f, jnp.asarray(orig_wh), jnp.float32(0.5)
        )
        return batch.scores
    sec_full, _, args_full = chain_time(full, frames, det.variables,
                                        iters=args.iters)
    fl_full = program_flops(jax.jit(full), *args_full)

    peak, kind = detect_peak_tflops()
    achieved = (fl_full or 0.0) / sec_full
    report = {
        "device": kind,
        "model": f"yolov8-{args.yolo_variant}",
        "batch": B, "input_hw": [H, W],
        "stages_ms": {k: round(v["ms"], 2) for k, v in stages.items()},
        "full_ms": round(1e3 * sec_full, 2),
        "fps": round(B / sec_full, 1),
        "flops_per_batch": fl_full,
        "gflops_per_frame": round((fl_full or 0.0) / B / 1e9, 1),
        "achieved_tflops": round(achieved / 1e12, 1),
        "peak_bf16_tflops": peak,
        "mfu_pct": round(100 * achieved / (peak * 1e12), 1),
    }
    if args.json:
        print(json.dumps(report))
    else:
        for k, v in report.items():
            print(f"{k}: {v}")
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--height", type=int, default=736)
    p.add_argument("--width", type=int, default=1280)
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--backbone", choices=["resnet50", "vit"], default="resnet50")
    p.add_argument("--patch-size", type=int, default=16)
    p.add_argument("--model", choices=["detr", "yolo"], default="detr")
    p.add_argument("--yolo-variant", default="x",
                   help="YOLO family size (n|s|m|l|x) when --model yolo")
    p.add_argument("--json", action="store_true", help="print one JSON line")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from office_person_detection_vit_tpu.utils.jax_cache import (
        enable_persistent_cache,
    )

    enable_persistent_cache()

    if args.model == "yolo":
        return _profile_yolo(args)

    from office_person_detection_vit_tpu.config.config_manager import ConfigManager
    from office_person_detection_vit_tpu.detection.detector import DETRDetector
    from office_person_detection_vit_tpu.models.postprocess import postprocess_detr
    from office_person_detection_vit_tpu.models.resnet import ResNet
    from office_person_detection_vit_tpu.models.transformer import Decoder, Encoder
    from office_person_detection_vit_tpu.models.position_encoding import (
        sine_position_embedding,
    )
    from office_person_detection_vit_tpu.ops.preprocessing import preprocess_frames

    B, H, W = args.batch, args.height, args.width
    cfgm = ConfigManager.from_dict(
        {"detection": {"batch_size": B, "input_height": H, "input_width": W,
                       "dtype": "bfloat16", "use_pallas_attention": False,
                       "backbone": args.backbone,
                       "patch_size": args.patch_size}}
    )
    det = DETRDetector(cfgm)
    det.load_model()
    cfg = det.detr_config
    dtype = cfg.jnp_dtype
    params = det.variables["params"]

    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (B, 720, 1280, 3), np.uint8)
    pixels = np.asarray(rng.normal(size=(B, H, W, 3)), np.float32).astype(dtype)
    stride = det.feature_stride
    fh, fw = H // stride, W // stride
    L = fh * fw
    memory = np.asarray(rng.normal(size=(B, L, cfg.d_model)), np.float32).astype(dtype)
    src = np.asarray(rng.normal(size=(B, L, cfg.d_model)), np.float32).astype(dtype)
    logits = np.asarray(rng.normal(size=(B, cfg.num_queries, cfg.num_classes + 1)),
                        np.float32)
    boxes = np.asarray(rng.uniform(0.2, 0.6, (B, cfg.num_queries, 4)), np.float32)

    # Stage isolation uses the standalone backbone module; for the ViT
    # backbone only the per-stage backbone row differs.
    if args.backbone == "vit":
        from office_person_detection_vit_tpu.models.vit import (
            ViTBackbone,
            ViTConfig,
        )

        backbone = ViTBackbone(ViTConfig(
            patch_size=cfg.vit_patch_size, hidden_size=cfg.vit_hidden,
            num_layers=cfg.vit_layers, num_heads=cfg.vit_heads,
            mlp_dim=cfg.vit_mlp, pos_grid=cfg.vit_pos_grid, dtype=cfg.dtype,
        ))
    else:
        backbone = ResNet(depths=cfg.backbone_depths,
                          hidden_sizes=cfg.backbone_hidden,
                          embedding_size=cfg.backbone_embedding, dtype=dtype)
    encoder = Encoder(cfg.d_model, cfg.num_heads, cfg.ffn_dim,
                      cfg.num_encoder_layers, cfg.dropout, dtype,
                      cfg.use_pallas_attention)
    decoder = Decoder(cfg.d_model, cfg.num_heads, cfg.ffn_dim,
                      cfg.num_decoder_layers, cfg.dropout, dtype,
                      cfg.use_pallas_attention)

    mask2d = np.ones((B, L), bool)
    posf = np.asarray(
        sine_position_embedding(jnp.ones((B, fh, fw), bool),
                                embedding_dim=cfg.d_model // 2)
    ).reshape(B, L, cfg.d_model).astype(dtype)
    qpos = np.asarray(rng.normal(size=(B, cfg.num_queries, cfg.d_model)),
                      np.float32).astype(dtype)

    stages = {}

    def add(name, fn, *inputs, **kw):
        sec, _, args_d = chain_time(fn, *inputs, iters=args.iters, **kw)
        fl = program_flops(jax.jit(fn), *args_d)  # single call, not chained
        stages[name] = {"ms": 1e3 * sec, "flops": fl}

    orig_wh = np.asarray([1280.0, 720.0], np.float32)
    add("preprocess", lambda f: preprocess_frames(f, target_hw=(H, W),
                                                  out_dtype=dtype)[0], frames)
    # Params as traced args, not closures (closed-over arrays become HLO
    # constants and bloat the remote-compile request — see _profile_yolo).
    add("backbone",
        lambda x, p: backbone.apply({"params": p}, x),
        pixels, params["backbone"])
    add("input_proj+encoder",
        lambda f, pos, m, p: encoder.apply(
            {"params": p},
            f, pos, m, True),
        src, posf, mask2d, params["encoder"])
    add("decoder+heads",
        lambda mem, pos, qp, m, p: decoder.apply(
            {"params": p},
            jnp.zeros_like(qp), qp, mem, pos, m, True),
        memory, posf, qpos, mask2d, params["decoder"])
    add("postprocess",
        lambda lg, bx: postprocess_detr(lg, bx, jnp.asarray(orig_wh), 0.5,
                                        person_class_id=cfg.person_class_id),
        logits, boxes)

    # Full fused program for the total + MFU.
    jit_detect = det._jits["bgr"].jitted

    def full(f, v):
        out = jit_detect(v, f, jnp.asarray(orig_wh), jnp.float32(0.5))
        return out[0].scores
    sec_full, _, args_full = chain_time(full, frames, det.variables,
                                        iters=args.iters)
    fl_full = program_flops(jax.jit(full), *args_full)
    fl_full = fl_full or analytic_detr_flops(B, H, W, cfg)

    peak, kind = detect_peak_tflops()
    achieved = fl_full / sec_full
    report = {
        "device": kind,
        "batch": B, "input_hw": [H, W],
        "stages_ms": {k: round(v["ms"], 2) for k, v in stages.items()},
        "stage_sum_ms": round(sum(v["ms"] for v in stages.values()), 2),
        "full_ms": round(1e3 * sec_full, 2),
        "fps": round(B / sec_full, 1),
        "flops_per_batch": fl_full,
        "gflops_per_frame": round(fl_full / B / 1e9, 1),
        "achieved_tflops": round(achieved / 1e12, 1),
        "peak_bf16_tflops": peak,
        "mfu_pct": round(100 * achieved / (peak * 1e12), 1),
    }
    if args.json:
        print(json.dumps(report))
    else:
        for k, v in report.items():
            print(f"{k}: {v}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
