"""Tracking-quality benchmark — puts a MOTA/IDF1 number on the board.

The reference's committed result on its own predictions is MOTA -111.76% /
IDF1 12.20% (reference output/benchmark/tracking_metrics.json). This tool
runs OUR tracker (tracking/tracker.py: 5-stage cascade + ByteTrack + ORU)
over two scenarios and scores it with the native CLEAR-MOT implementation
(benchmark/mot_metrics.py):

(a) ``--gt <gold.json>`` — the reference's committed gold GT
    (output/ground_truth/gt_tracking.json, 7 frames). The source video is
    not shipped, so detections are the GT boxes perturbed by detector-like
    noise (``--noise`` px jitter, ``--drop`` missed-detection rate,
    ``--fp`` false positives per frame) — i.e. the tracker is scored on
    association quality under controlled detector error, not on detection
    quality the detector benchmark already covers.
(b) ``--synthetic`` — a multi-person crossing sequence with known
    identities (people walk across the frame and pass each other, the
    canonical ID-switch hazard).

Per-person appearance features are stable unit vectors + noise, mimicking
the Re-ID chain so the appearance cascade is exercised.

Examples (documented in BASELINE.md):
  python tools/track_quality_benchmark.py \
      --gt /root/reference/output/ground_truth/gt_tracking.json \
      --noise 2.0 --drop 0.1 --fp 1
  python tools/track_quality_benchmark.py --synthetic --people 6 --frames 40
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from office_person_detection_vit_tpu.benchmark.mot_metrics import (  # noqa: E402
    evaluate_hota,
    evaluate_mot,
    load_gold_gt,
)
from office_person_detection_vit_tpu.core.dto import Detection  # noqa: E402
from office_person_detection_vit_tpu.tracking.tracker import Tracker  # noqa: E402


def _person_feature(tid: int, dim: int = 256):
    """Stable per-identity unit feature (seeded by the id)."""
    r = np.random.default_rng(1000 + tid)
    f = r.normal(size=dim).astype(np.float32)
    return f / np.linalg.norm(f)


def synthetic_gt(
    people: int = 6, frames: int = 40, w: int = 1280, h: int = 720
) -> dict[int, list[tuple[int, tuple[float, float, float, float]]]]:
    """People crossing the frame on straight paths (IDs collide mid-frame)."""
    gt: dict[int, list] = {}
    for f in range(1, frames + 1):
        rows = []
        for p in range(people):
            # alternate left->right and right->left walkers at mixed heights
            speed = 8.0 + 2.0 * (p % 3)
            if p % 2 == 0:
                x = 40 + speed * f + 60.0 * p
            else:
                x = (w - 120) - speed * f - 40.0 * p
            y = 120.0 + 70.0 * p + 6.0 * np.sin(f / 5 + p)
            if -80 < x < w + 20:
                rows.append((p + 1, (float(x), float(y), 60.0, 140.0)))
        gt[f] = rows
    return gt


def run_tracker(
    gt: dict[int, list],
    noise: float = 0.0,
    drop: float = 0.0,
    fp_per_frame: float = 0.0,
    use_features: bool = True,
    seed: int = 0,
    tracker: Tracker | None = None,
    engine: str = "cascade",
) -> dict[int, list]:
    """GT boxes (+ detector-like noise) -> our tracker -> hypothesis tracks.

    engine="cascade" runs the reference-semantics host tracker per frame;
    engine="scan" packs the whole noisy sequence and associates it in one
    jitted lax.scan program (tracking/scan_tracker.py).
    """
    rng = np.random.default_rng(seed)
    if engine == "scan":
        return _run_scan_tracker(gt, noise, drop, fp_per_frame, use_features, rng)
    tracker = tracker or Tracker(max_age=5, min_hits=1, iou_threshold=0.5)
    hyp: dict[int, list] = {}
    for f in sorted(gt):
        dets = _noisy_detections(gt, f, noise, drop, fp_per_frame,
                                 use_features, rng)
        tracker.update(dets, timestamp=float(f))
        hyp[f] = [
            (d.track_id, tuple(map(float, d.bbox)))
            for d in dets
            if d.track_id is not None
        ]
    return hyp


def _noisy_detections(gt, f, noise, drop, fp_per_frame, use_features, rng):
    """One frame's detector-noise detections (shared by both engines)."""
    dets = []
    for tid, (x, y, bw, bh) in gt[f]:
        if drop and rng.uniform() < drop:
            continue
        jitter = rng.normal(0, noise, 4) if noise else np.zeros(4)
        d = Detection(
            bbox=(x + jitter[0], y + jitter[1],
                  max(4.0, bw + jitter[2]), max(4.0, bh + jitter[3])),
            confidence=float(rng.uniform(0.6, 0.95)),
        )
        if use_features:
            base = _person_feature(tid)
            nse = rng.normal(0, 0.05, base.shape).astype(np.float32)
            feat = base + nse
            d.feature = feat / np.linalg.norm(feat)
        dets.append(d)
    n_fp = rng.poisson(fp_per_frame) if fp_per_frame else 0
    for _ in range(n_fp):
        d = Detection(
            bbox=(float(rng.uniform(0, 1200)), float(rng.uniform(0, 560)),
                  60.0, 140.0),
            confidence=float(rng.uniform(0.3, 0.6)),
        )
        if use_features:
            f_ = rng.normal(size=256).astype(np.float32)
            d.feature = f_ / np.linalg.norm(f_)
        dets.append(d)
    return dets


def _run_scan_tracker(gt, noise, drop, fp_per_frame, use_features, rng):
    from office_person_detection_vit_tpu.core.dto import FrameResult
    from office_person_detection_vit_tpu.tracking.scan_tracker import (
        assign_track_ids,
    )

    frame_results = [
        FrameResult(f, None, _noisy_detections(
            gt, f, noise, drop, fp_per_frame, use_features, rng))
        for f in sorted(gt)
    ]
    assign_track_ids(frame_results, timestamps=False)
    return {
        fr.frame_number: [
            (d.track_id, tuple(map(float, d.bbox)))
            for d in fr.detections if d.track_id is not None
        ]
        for fr in frame_results
    }


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--gt", help="gold-GT json (reference format)")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--people", type=int, default=6)
    p.add_argument("--frames", type=int, default=40)
    p.add_argument("--noise", type=float, default=2.0, help="bbox jitter px")
    p.add_argument("--drop", type=float, default=0.1, help="miss rate")
    p.add_argument("--fp", type=float, default=1.0, help="false positives/frame")
    p.add_argument("--no-features", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--engine", choices=["cascade", "scan"], default="cascade",
                   help="cascade = reference-semantics host tracker; "
                        "scan = fully-jitted lax.scan tracker")
    p.add_argument("--json-out", help="write metrics JSON here")
    args = p.parse_args(argv)

    if not args.gt and not args.synthetic:
        p.error("need --gt or --synthetic")

    gt = load_gold_gt(args.gt) if args.gt else synthetic_gt(
        args.people, args.frames
    )
    hyp = run_tracker(
        gt, noise=args.noise, drop=args.drop, fp_per_frame=args.fp,
        use_features=not args.no_features, seed=args.seed,
        engine=args.engine,
    )
    res = evaluate_mot(gt, hyp)
    doc = res.to_dict()
    doc["hota"] = evaluate_hota(gt, hyp).to_dict()
    doc["scenario"] = args.gt or f"synthetic({args.people}p,{args.frames}f)"
    doc["engine"] = args.engine
    doc["detector_noise"] = {
        "noise_px": args.noise, "drop": args.drop, "fp_per_frame": args.fp,
    }
    doc["reference_committed"] = {"mota": -1.1176, "idf1": 0.1220}
    print(json.dumps(doc, indent=2))
    if args.json_out:
        Path(args.json_out).write_text(json.dumps(doc, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
