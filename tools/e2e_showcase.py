"""Closed-loop showcase driver: train on-chip -> full pipeline -> MOT score.

The reference proves its system end-to-end by fine-tuning a detector and
benchmarking the pipeline's own outputs against gold GT (reference
output/benchmark_yolov8_ft/detection_metrics.json F1 0.8306; reference
docs/baseline_verification_guide.md:80-97 targets MOTA >= 0.7 / IDF1 >= 0.8).
This tool makes that loop reproducible here, for either detector family:

  1. ``gen-data``  — synthetic-office COCO train/val sets whose people carry
     DISTINCT appearances (tests/helpers/synthetic_video.APPEARANCES), the
     realistic Re-ID regime. Exact GT from the drawn geometry.
  2. ``gen-video`` — a scripted timelapse scenario: people follow known
     wall-clock-time trajectory functions (incl. one true crossing, the
     canonical ID-switch hazard). Writes ``scenario.json`` next to the video.
  3. ``gold-gt``   — rebuilds gold GT (reference gt_tracking.json format)
     by evaluating the scenario trajectories AT THE SESSION'S OWN sampled
     timestamps (positions come from the script, never from predictions).
  4. ``score``     — native CLEAR-MOT/IDF1 + HOTA of the session's
     ``tracks_mot.csv`` against the gold GT.

Train/run steps use the existing tools (tools/train_detr.py, main.py); this
file only adds what they don't have: scenario scripting + session-aligned GT.
"""

from __future__ import annotations

import argparse
import json
import math
import sys
from datetime import datetime, timedelta
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tests"))

#: Drawn-person geometry (helpers/synthetic_video.render_frame): body rect
#: (x, y)+(50, 130), head circle r14 at (x+25, y-12) => bbox (x, y-26, 50, 156).
BODY_W, BBOX_H, HEAD = 50, 156, 26
START_TIME = datetime(2025, 1, 20, 9, 0, 0)


# --------------------------------------------------------------- scenario
def scenario_positions(t: float, duration: float) -> list[tuple[float, float, int]]:
    """Person positions (x, y, appearance_id) at wall-time t seconds.

    Four distinct-appearance people; P1/P2 genuinely cross mid-sequence at
    the same y (boxes overlap through the pass), P3 wanders on a slow
    Lissajous path, P4 drifts slowly in place. All positions are exact
    closed-form functions of t, so gold GT is exact at any sampled time.
    """
    u = t / duration
    p1 = (80.0 + 1040.0 * u, 300.0, 1)          # left -> right (blue)
    p2 = (1120.0 - 1040.0 * u, 300.0, 2)        # right -> left (green)
    p3 = (
        300.0 + 160.0 * math.sin(2 * math.pi * 1.7 * u),
        420.0 + 90.0 * math.sin(2 * math.pi * 0.9 * u + 1.0),
        3,
    )                                            # wanderer (yellow)
    p4 = (950.0 + 40.0 * math.sin(2 * math.pi * u), 150.0, 5)  # near-static
    return [p1, p2, p3, p4]


def gt_boxes_at(t: float, duration: float) -> list[tuple[int, tuple[float, float, float, float]]]:
    """[(person_id, xywh bbox)] at wall-time t."""
    return [
        (pid + 1, (x, y - HEAD, float(BODY_W), float(BBOX_H)))
        for pid, (x, y, _a) in enumerate(scenario_positions(t, duration))
    ]


def cmd_gen_video(args) -> int:
    from helpers.synthetic_video import write_video

    fps, ratio = 30.0, 313.0
    duration = args.frames / fps * ratio  # wall seconds spanned

    def people_fn(i: int):
        t = i / fps * ratio
        return [
            (int(round(x)), int(round(y)), a)
            for x, y, a in scenario_positions(t, duration)
        ]

    out = Path(args.out)
    write_video(out, num_frames=args.frames, fps=fps, start_time=START_TIME,
                time_compression_ratio=ratio, people_fn=people_fn)
    spec = {
        "start_time": START_TIME.isoformat(),
        "fps": fps,
        "time_compression_ratio": ratio,
        "num_frames": args.frames,
        "duration_wall_s": duration,
        "scenario": "e2e_showcase.scenario_positions",
    }
    (out.parent / "scenario.json").write_text(json.dumps(spec, indent=2))
    print(f"{out}: {args.frames} frames, {duration:.0f} wall-s "
          f"({duration / 3600:.2f} h), scenario.json written")
    return 0


# ------------------------------------------------------------------- data
def cmd_gen_data(args) -> int:
    import cv2

    from helpers.synthetic_video import APPEARANCES, render_frame

    for split, n, seed in (("train", args.train_n, args.seed),
                           ("val", args.val_n, args.seed + 1000)):
        root = Path(args.out) / split
        img_dir = root / "images"
        img_dir.mkdir(parents=True, exist_ok=True)
        rng = np.random.default_rng(seed)
        images, anns = [], []
        aid = 1
        for i in range(n):
            k = int(rng.integers(1, args.max_people + 1))
            people = []
            for _ in range(k):
                people.append((int(rng.integers(10, 1200)),
                               int(rng.integers(60, 560)),
                               int(rng.integers(0, len(APPEARANCES)))))
            frame = render_frame(START_TIME + timedelta(seconds=37 * i),
                                 people=people, seed=seed * 100000 + i)
            cv2.imwrite(str(img_dir / f"f{i:03d}.jpg"), frame)
            images.append({"id": i, "file_name": f"f{i:03d}.jpg",
                           "width": 1280, "height": 720})
            for x, y, _a in people:
                bw, bh = BODY_W, BBOX_H
                anns.append({"id": aid, "image_id": i, "category_id": 1,
                             "bbox": [x, y - HEAD, bw, bh], "area": bw * bh,
                             "iscrowd": 0})
                aid += 1
        (root / "coco.json").write_text(json.dumps(
            {"images": images, "annotations": anns,
             "categories": [{"id": 1, "name": "person"}]}))
        print(f"{root}: {n} images, {aid - 1} boxes")
    return 0


# ------------------------------------------------------------------ config
def cmd_gen_config(args) -> int:
    """Write the full-pipeline config for the showcase run: trained tiny
    DETR checkpoint, dense 60 s tracking grid over the scenario video,
    identity homography + left/right floor zones (the scenario's geometry
    is already in floor pixels)."""
    import yaml

    cfg = {
        "video": {
            "input_path": str(Path(args.video).resolve()),
            "fps": 30,
            "frame_interval_minutes": 5,
            "tolerance_seconds": 60,
            "time_compression_ratio": 313.0,
            "dense_tracking": {
                "enabled": True,
                "tracking_interval_seconds": args.interval_s,
            },
        },
        "detection": {
            "model": args.model,
            "yolo_variant": args.yolo_variant,
            "confidence_threshold": args.conf,
            "batch_size": 8,
            "device": args.device,
            "model_size": args.size,
            "score_mode": args.score_mode,
            "nms_threshold": args.nms,
            "checkpoint_path": str(Path(args.weights).resolve()),
            "input_height": args.height,
            "input_width": args.width,
            "dtype": "float32" if args.device == "cpu" else "bfloat16",
            "use_pallas_attention": False,
        },
        "tracking": {"enabled": True},
        "transform": {"method": "homography"},
        "homography": {"matrix": [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]},
        "zones": [
            {"id": "zone_a", "name": "A",
             "polygon": [[0, 0], [640, 0], [640, 720], [0, 720]]},
            {"id": "zone_b", "name": "B",
             "polygon": [[640, 0], [1280, 0], [1280, 720], [640, 720]]},
        ],
        "output": {"directory": str(Path(args.out_dir).resolve())},
        "timestamp": {
            "extraction_mode": "auto_targets",
            "auto_targets": {"disable_validation": True},
            "sampling": {"coarse_interval_seconds": 0.5},
            "extraction": {"confidence_threshold": 0.3},
        },
    }
    Path(args.out).write_text(yaml.safe_dump(cfg, sort_keys=False))
    print(f"{args.out}: pipeline config (video={args.video}, "
          f"weights={args.weights}, {args.interval_s}s grid)")
    return 0


# ---------------------------------------------------------------- gold GT
def _session_frame_times(session: Path) -> list[float]:
    """Wall-seconds-since-start for each tracked frame (in MOT frame order),
    from the session's frames_index.csv (written by TrajectoryExporter for
    every tracked frame, detections or not)."""
    import csv

    path = next(Path(session).glob("**/frames_index.csv"))
    times = []
    with path.open() as f:
        for row in csv.DictReader(f):
            t = datetime.fromisoformat(row["timestamp"])
            times.append((t - START_TIME).total_seconds())
    return times


def cmd_gold_gt(args) -> int:
    spec = json.loads(Path(args.scenario).read_text())
    duration = float(spec["duration_wall_s"])
    times = _session_frame_times(Path(args.session))
    frames = []
    for idx, t in enumerate(times, start=1):
        anns = [
            {"person_id": pid, "bbox": list(bb)}
            for pid, bb in gt_boxes_at(t, duration)
        ]
        frames.append({"frame_number": idx, "annotations": anns})
    Path(args.out).write_text(json.dumps({"frames": frames}))
    print(f"{args.out}: {len(frames)} frames x {len(frames[0]['annotations'])} people "
          f"(sampled {times[0]:.0f}..{times[-1]:.0f} wall-s)")
    return 0


# ------------------------------------------------------------------ score
def cmd_score(args) -> int:
    from office_person_detection_vit_tpu.benchmark.mot_metrics import (
        evaluate_hota,
        evaluate_mot,
        load_gold_gt,
        load_mot_csv,
    )

    gt = load_gold_gt(args.gt)
    pred = load_mot_csv(next(Path(args.session).glob("**/tracks_mot.csv")))
    mot = evaluate_mot(gt, pred)
    hota = evaluate_hota(gt, pred)
    out = {
        **mot.to_dict(),
        "hota": hota.hota, "det_a": hota.det_a, "ass_a": hota.ass_a,
    }
    for kv in args.meta or []:
        k, _, v = kv.partition("=")
        out.setdefault("meta", {})[k] = v
    print(json.dumps(out, indent=2))
    if args.out:
        Path(args.out).write_text(json.dumps(out, indent=2))
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("gen-data")
    g.add_argument("--out", required=True)
    g.add_argument("--train-n", type=int, default=96)
    g.add_argument("--val-n", type=int, default=16)
    g.add_argument("--seed", type=int, default=7)
    g.add_argument("--max-people", type=int, default=4,
                   help="people per image drawn uniformly from "
                        "1..max; 1 = the single-object curriculum "
                        "stage (docs/training.md)")
    g.set_defaults(fn=cmd_gen_data)

    v = sub.add_parser("gen-video")
    v.add_argument("--out", required=True)
    v.add_argument("--frames", type=int, default=600)
    v.set_defaults(fn=cmd_gen_video)

    c = sub.add_parser("gen-config")
    c.add_argument("--video", required=True)
    c.add_argument("--weights", required=True)
    c.add_argument("--out", required=True)
    c.add_argument("--out-dir", required=True)
    c.add_argument("--model", default="detr", choices=["detr", "yolo", "ssd"])
    c.add_argument("--yolo-variant", default="n")
    c.add_argument("--size", default="tiny", choices=["full", "small", "tiny"])
    c.add_argument("--nms", type=float, default=None,
                   help="detection.nms_threshold (reduced-scale focal "
                        "DETR checkpoints emit duplicate queries)")
    c.add_argument("--score-mode", default="softmax",
                   choices=["softmax", "sigmoid"],
                   help="must match the checkpoint's training criterion "
                        "(sigmoid for --class-loss focal checkpoints)")
    c.add_argument("--device", default="auto")
    c.add_argument("--conf", type=float, default=0.5)
    c.add_argument("--height", type=int, default=224)
    c.add_argument("--width", type=int, default=384)
    c.add_argument("--interval-s", type=float, default=60.0)
    c.set_defaults(fn=cmd_gen_config)

    q = sub.add_parser("gold-gt")
    q.add_argument("--session", required=True)
    q.add_argument("--scenario", required=True)
    q.add_argument("--out", required=True)
    q.set_defaults(fn=cmd_gold_gt)

    s = sub.add_parser("score")
    s.add_argument("--session", required=True)
    s.add_argument("--gt", required=True)
    s.add_argument("--out", default=None)
    s.add_argument("--meta", action="append", default=None,
                   help="key=value provenance entries embedded in the "
                        "score JSON (detector, platform, protocol ...)")
    s.set_defaults(fn=cmd_score)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
