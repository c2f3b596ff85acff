"""XLA vs Pallas-fused ResNet bottleneck on REAL hardware (VERDICT r2 #4).

The round-2 roofline declined the last MFU lever — a hand-fused
bottleneck block — by argument; this tool measures it. Head-to-head at
the stage-1 geometry the roofline named the worst offender (184x320,
C=256, M=64, batch 16, bf16) plus stage-2, with the scan-chain timing
methodology (CLAUDE.md "TPU timing": host materialization is the only
honest sync over the tunnel).

Usage: python tools/bottleneck_kernel_bench.py [--json-out docs/artifacts/bottleneck_kernel_bench.json]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

#: (label, (B, H, W, C, M), tile_h sweep)
SHAPES = [
    ("stage1-184x320-c256", (16, 184, 320, 256, 64), (4, 8)),
    ("stage2-92x160-c512", (16, 92, 160, 512, 128), (4,)),
]


def chain(fn, args, iters=16, reps=4):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chained(*args):
        def body(c, _):
            x = args[0] + (c * 0).astype(args[0].dtype)
            out = fn(x, *args[1:])
            s = jnp.sum(out).astype(jnp.float32)
            return s * 0 + 1, s

        _, sums = jax.lax.scan(body, jnp.float32(0), None, length=iters)
        return sums

    ad = jax.device_put(args)
    np.asarray(chained(*ad))  # compile + upload
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(chained(*ad))
        best = min(best, time.perf_counter() - t0)
    return 1e3 * best / iters


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--json-out", type=Path)
    p.add_argument("--iters", type=int, default=16)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--interpret", action="store_true",
                   help="CPU interpret-mode drive of the full tool path "
                        "(no timing validity; for plumbing checks when "
                        "the chip is unreachable)")
    p.add_argument("--platform", default=None)
    args = p.parse_args(argv)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from office_person_detection_vit_tpu.ops.fused_bottleneck import (
        bottleneck_reference,
        fused_bottleneck,
    )
    from office_person_detection_vit_tpu.utils.jax_cache import (
        enable_persistent_cache,
    )

    enable_persistent_cache()
    dev = jax.devices()[0]
    dt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    print(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}")

    results = {"device": str(dev), "dtype": args.dtype, "shapes": {}}
    for label, (B, H, W, C, M), tiles in SHAPES:
        if args.interpret:
            # Small-shape plumbing drive only.
            B, H, W = 2, 16, 24
        # Generate inputs ON DEVICE (jax.random inside jit): a 482 MB
        # incompressible host->device upload takes minutes over the tunnel
        # and times out exactly when the measurement matters most.
        key = jax.random.PRNGKey(0)
        ks = jax.random.split(key, 7)

        @jax.jit
        def make_inputs(ks=ks, B=B, H=H, W=W):
            x = jax.random.normal(ks[0], (B, H, W, C), dt)
            ws = (
                (0.1 * jax.random.normal(ks[1], (C, M))).astype(dt),
                0.1 * jax.random.normal(ks[2], (M,)),
                (0.1 * jax.random.normal(ks[3], (3, 3, M, M))).astype(dt),
                0.1 * jax.random.normal(ks[4], (M,)),
                (0.1 * jax.random.normal(ks[5], (M, C))).astype(dt),
                0.1 * jax.random.normal(ks[6], (C,)),
            )
            return x, ws

        x, ws = make_inputs()
        gflop = 2 * B * H * W * (C * M + 9 * M * M + M * C) / 1e9
        io_gb = 2 * B * H * W * C * x.dtype.itemsize / 1e9
        entry = {"gflop": round(gflop, 1), "io_gb": round(io_gb, 3)}
        t_ref = chain(lambda xx, *w: bottleneck_reference(xx, *w),
                      (x, *ws), iters=args.iters)
        entry["xla_ms"] = round(t_ref, 3)
        entry["xla_tflops"] = round(gflop / t_ref, 1)
        print(f"{label}: XLA {t_ref:.3f} ms ({gflop / t_ref:.0f} TFLOP/s)",
              flush=True)

        for th in tiles:
            if H % th:
                continue
            # Parity ON DEVICE too — only the max|diff| scalar crosses the
            # wire (the full f32 output is ~1 GB of incompressible traffic).
            @jax.jit
            def maxerr(xx, *w, th=th):
                ref = bottleneck_reference(xx, *w).astype(jnp.float32)
                got = fused_bottleneck(
                    xx, *w, tile_h=th, interpret=args.interpret
                ).astype(jnp.float32)
                return jnp.abs(got - ref).max()

            err = float(np.asarray(maxerr(x, *ws)))
            t = chain(lambda xx, *w: fused_bottleneck(xx, *w, tile_h=th, interpret=args.interpret),
                      (x, *ws), iters=args.iters)
            entry[f"pallas_th{th}_ms"] = round(t, 3)
            entry[f"pallas_th{th}_tflops"] = round(gflop / t, 1)
            entry[f"pallas_th{th}_maxerr"] = round(err, 5)
            print(f"{label}: pallas tile_h={th} {t:.3f} ms "
                  f"({gflop / t:.0f} TFLOP/s, maxerr {err:.4f})", flush=True)
        results["shapes"][label] = entry

    if args.json_out:
        args.json_out.write_text(json.dumps(results, indent=1))
        print(f"wrote {args.json_out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
