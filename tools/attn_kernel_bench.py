"""XLA vs Pallas attention at DETR production shapes on REAL hardware.

Parity + timing for the three attention sites (encoder self, decoder
self/cross at 736x1280 -> 920 tokens + 100 queries) and a long-context
shape. Timing uses the scan-chain methodology (iterations data-dependent
inside one jit; host materialization is the only honest sync over the
tunnel — CLAUDE.md "TPU timing"). Results recorded in docs/performance.md
and used to pick the default attention path.

pytest runs on CPU by design (tests/conftest.py), so Pallas parity there is
interpret-mode only; THIS tool is the real-hardware check
(`python tools/attn_kernel_bench.py`, optionally `--json-out path`).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SHAPES = [
    ("enc-self-B16", (16, 8, 920, 920, 32)),
    ("dec-cross-B16", (16, 8, 100, 920, 32)),
    ("dec-self-B16", (16, 8, 100, 100, 32)),
    ("long-ctx-B4", (4, 8, 2048, 2048, 32)),
]


def chain(fn, args, iters=16, reps=4):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chained(*args):
        def body(c, _):
            q = args[0] + (c * 0).astype(args[0].dtype)
            out = fn(q, *args[1:])
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
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from office_person_detection_vit_tpu.utils.jax_cache import (
        enable_persistent_cache,
    )

    enable_persistent_cache()

    from office_person_detection_vit_tpu.ops.attention import (
        _FLASH_BYTES_THRESHOLD,
        _round_up,
        attention_pallas,
        attention_pallas_flash,
        attention_reference,
    )

    rng = np.random.default_rng(0)
    rows = []
    for name, (B, H, Lq, Lk, D) in SHAPES:
        q = jnp.asarray(rng.normal(size=(B, H, Lq, D)), jnp.bfloat16)
        k = jnp.asarray(rng.normal(size=(B, H, Lk, D)), jnp.bfloat16)
        v = jnp.asarray(rng.normal(size=(B, H, Lk, D)), jnp.bfloat16)
        mask = np.ones((B, Lk), bool)
        mask[:, -37:] = False  # letterbox-like key padding
        a = (q, k, v, jnp.asarray(mask))

        # The whole-seq kernel's VMEM envelope is what _pallas_dispatch
        # enforces in production: beyond the threshold only flash runs
        # (whole-seq at 2048x2048 is a compile-time scoped-VMEM OOM).
        whole_seq_fits = (
            _round_up(Lq, 128) * _round_up(Lk, 128) * 4 <= _FLASH_BYTES_THRESHOLD
        )

        t_xla = chain(lambda q, k, v, m: attention_reference(q, k, v, m), a,
                      iters=args.iters)
        t_pal = (
            chain(lambda q, k, v, m: attention_pallas(q, k, v, m), a,
                  iters=args.iters)
            if whole_seq_fits else None
        )
        t_fla = chain(lambda q, k, v, m: attention_pallas_flash(q, k, v, m), a,
                      iters=args.iters)

        r = np.asarray(attention_reference(*a), np.float32)
        pe = (
            np.abs(r - np.asarray(attention_pallas(*a), np.float32)).max()
            if whole_seq_fits else None
        )
        fe = np.abs(r - np.asarray(attention_pallas_flash(*a), np.float32)).max()
        candidates = [("xla", t_xla), ("flash", t_fla)]
        if t_pal is not None:
            candidates.append(("pallas", t_pal))
        row = {
            "shape": name, "dims": [B, H, Lq, Lk, D],
            "xla_ms": round(t_xla, 3),
            "pallas_ms": round(t_pal, 3) if t_pal is not None else None,
            "flash_ms": round(t_fla, 3),
            "pallas_max_err": float(pe) if pe is not None else None,
            "flash_max_err": float(fe),
            "winner": min(candidates, key=lambda kv: kv[1])[0],
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    doc = {"device": jax.devices()[0].device_kind, "rows": rows}
    if args.json_out:
        args.json_out.write_text(json.dumps(doc, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
