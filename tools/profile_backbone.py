"""Per-ResNet-stage on-chip roofline of the DETR backbone (VERDICT r4 #2).

`tools/profile_detect.py` breaks the detect program into coarse stages and
showed the ResNet-50 backbone owns ~75% of batch time at ~33% whole-program
MFU. This tool goes one level deeper: it times the stem conv, the maxpool,
and each of the four bottleneck stages as separate scan-chained programs at
the production geometry (736x1280 bf16 batch 16), attaches XLA's own FLOP
count plus an explicit HBM-byte model to each, and computes the per-segment
roofline:

  compute floor  = flops / peak_bf16
  bandwidth floor = bytes / peak_hbm
  attainable     = max(floors);   utilization = attainable / measured

The point is to settle WHERE the chip's idle 2/3 lives: which segments are
bandwidth-bound (low arithmetic intensity: stem with 3 input channels,
maxpool with 0 FLOPs, stage0 at 184x320 spatial), which are genuinely
MXU-limited, and what the weighted best-case ceiling of the whole backbone
is if every segment hit its own roofline. That weighted bound is the honest
answer to "67% of the chip is idle and nobody knows which op owns it".

The reference has no analog (its backbone is torchvision's, never profiled
— reference src/detection/detector.py loads pretrained weights); this
analysis exists because the rebuild owns its conv pipeline end to end.

Usage:
  python tools/profile_backbone.py [--batch 16] [--height 736] [--width 1280]
      [--json-out docs/artifacts/backbone_stage_roofline.json]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from tools.profile_detect import (  # noqa: E402
    chain_time,
    detect_peak_tflops,
    program_flops,
)

#: v5e HBM bandwidth (GB/s, per chip) — the scaling-book / datasheet figure
#: used by the round-2 roofline in docs/performance.md.
PEAK_HBM_GBPS = {"v5e": 819.0, "v5p": 2765.0, "v4": 1228.0, "v6e": 1640.0}


def peak_hbm(kind: str) -> float:
    k = kind.replace(" ", "").replace("lite", "e")
    for key, bw in PEAK_HBM_GBPS.items():
        if key in k:
            return bw
    return PEAK_HBM_GBPS["v5e"]


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--height", type=int, default=736)
    p.add_argument("--width", type=int, default=1280)
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--json-out", type=Path, default=None)
    args = p.parse_args(argv)

    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from office_person_detection_vit_tpu.models.detr import DETRConfig, init_detr
    from office_person_detection_vit_tpu.models.resnet import (
        Bottleneck,
        FrozenBatchNorm,
    )
    from office_person_detection_vit_tpu.utils.jax_cache import (
        enable_persistent_cache,
    )

    enable_persistent_cache()

    cfg = DETRConfig(dtype="bfloat16", use_pallas_attention=False)
    _, variables = init_detr(cfg, jax.random.PRNGKey(0), input_hw=(64, 64))
    bparams = variables["params"]["backbone"]
    dtype = cfg.jnp_dtype
    B, H, W = args.batch, args.height, args.width

    class Stem(nn.Module):
        @nn.compact
        def __call__(self, x):
            y = nn.Conv(cfg.backbone_embedding, (7, 7), strides=(2, 2),
                        padding=[(3, 3), (3, 3)], use_bias=False, dtype=dtype,
                        name="embedder_conv")(x)
            y = FrozenBatchNorm(cfg.backbone_embedding, dtype,
                                name="embedder_bn")(y)
            return nn.relu(y)

    class Stage(nn.Module):
        s: int
        in_feat: int

        @nn.compact
        def __call__(self, x):
            depth = cfg.backbone_depths[self.s]
            hidden = cfg.backbone_hidden[self.s]
            in_feat = self.in_feat
            for layer in range(depth):
                stride = 2 if (layer == 0 and self.s > 0) else 1
                x = Bottleneck(in_features=in_feat, mid_features=hidden // 4,
                               out_features=hidden, stride=stride, dtype=dtype,
                               name=f"stage{self.s}_layer{layer}")(x)
                in_feat = hidden
            return x

    rng = np.random.default_rng(0)

    def act(shape):
        return np.asarray(rng.normal(size=shape), np.float32).astype(dtype)

    h2, w2 = H // 2, W // 2      # after stem conv
    h4, w4 = H // 4, W // 4      # after maxpool
    segments = []

    # (name, module_or_fn, params subtree, input array, weight-byte count)
    stem = Stem()
    stem_params = {k: bparams[k] for k in ("embedder_conv", "embedder_bn")}

    def seg_bytes(inp, out, params):
        """Minimal HBM traffic: read input once, write output once, read
        weights once (all at their stored dtypes)."""
        wbytes = sum(np.asarray(l).nbytes
                     for l in jax.tree_util.tree_leaves(params))
        return inp.nbytes + out_nbytes(out) + wbytes

    def out_nbytes(shape):
        return int(np.prod(shape)) * np.dtype(np.float32).itemsize // 2  # bf16

    runs = [
        ("stem_conv7x7", lambda x, pr: stem.apply({"params": pr}, x),
         stem_params, act((B, H, W, 3)), (B, h2, w2, 64)),
        ("maxpool3x3", lambda x, _: nn.max_pool(
            x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)]),
         {}, act((B, h2, w2, 64)), (B, h4, w4, 64)),
        ("stage0_184x320_c256", None, None, act((B, h4, w4, 64)),
         (B, h4, w4, 256)),
        ("stage1_92x160_c512", None, None, act((B, h4, w4, 256)),
         (B, h4 // 2, w4 // 2, 512)),
        ("stage2_46x80_c1024", None, None, act((B, h4 // 2, w4 // 2, 512)),
         (B, h4 // 4, w4 // 4, 1024)),
        ("stage3_23x40_c2048", None, None, act((B, h4 // 4, w4 // 4, 1024)),
         (B, h4 // 8, w4 // 8, 2048)),
    ]
    in_feats = {2: 64, 3: 256, 4: 512, 5: 1024}
    peak_tf, kind = detect_peak_tflops()
    bw = peak_hbm(kind)

    report = {"device": kind, "batch": B, "input_hw": [H, W],
              "peak_bf16_tflops": peak_tf, "peak_hbm_gbps": bw,
              "segments": {}}

    for i, (name, fn, pr, inp, out_shape) in enumerate(runs):
        if fn is None:
            s = i - 2
            mod = Stage(s=s, in_feat=in_feats[i])
            pr = {f"stage{s}_layer{l}": bparams[f"stage{s}_layer{l}"]
                  for l in range(cfg.backbone_depths[s])}
            fn = lambda x, p, m=mod: m.apply({"params": p}, x)  # noqa: E731
        sec, _, args_d = chain_time(fn, inp, pr, iters=args.iters)
        fl = program_flops(jax.jit(fn), *args_d) or 0.0
        nbytes = seg_bytes(inp, out_shape, pr)
        t_flops = fl / (peak_tf * 1e12)
        t_bw = nbytes / (bw * 1e9)
        attain = max(t_flops, t_bw)
        report["segments"][name] = {
            "ms": round(1e3 * sec, 2),
            "gflops": round(fl / 1e9, 1),
            "hbm_mbytes_min": round(nbytes / 1e6, 1),
            "arith_intensity_flop_per_byte": round(fl / max(nbytes, 1), 1),
            "bound": "bandwidth" if t_bw > t_flops else "compute",
            "compute_floor_ms": round(1e3 * t_flops, 2),
            "bandwidth_floor_ms": round(1e3 * t_bw, 2),
            "roofline_attainable_ms": round(1e3 * attain, 2),
            "pct_of_roofline": round(100 * attain / sec, 1),
            "pct_of_mxu_peak": round(100 * t_flops / sec, 1),
        }

    segs = report["segments"]
    total_ms = sum(v["ms"] for v in segs.values())
    total_floor = sum(v["roofline_attainable_ms"] for v in segs.values())
    report["backbone_sum_ms"] = round(total_ms, 2)
    report["backbone_roofline_floor_ms"] = round(total_floor, 2)
    report["backbone_pct_of_roofline"] = round(100 * total_floor / total_ms, 1)

    print(json.dumps(report, indent=2))
    if args.json_out:
        args.json_out.parent.mkdir(parents=True, exist_ok=True)
        args.json_out.write_text(json.dumps(report, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
