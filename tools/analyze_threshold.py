"""Confidence-threshold sweep (analog of reference tools/analyze_threshold.py;
output contract matches output/benchmark/threshold_yolov8.json with
"best_threshold").

Usage:
  python tools/analyze_threshold.py --gt coco_gt.json --pred detections.json \
      [--output threshold_analysis.json]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(description="confidence-threshold sweep")
    parser.add_argument("--gt", required=True, type=Path)
    parser.add_argument("--pred", required=True, type=Path)
    parser.add_argument("--output", type=Path, default=Path("threshold_analysis.json"))
    args = parser.parse_args(argv)

    from office_person_detection_vit_tpu.benchmark.detection_benchmark import (
        DetectionBenchmark,
        threshold_sweep,
    )

    bench = DetectionBenchmark()
    sweep = threshold_sweep(
        bench.load_predictions(args.pred), bench.load_coco(args.gt)
    )
    args.output.write_text(json.dumps(sweep, indent=2))
    best = sweep["best_threshold"]

    # P/R/F1-vs-threshold curve PNG beside the JSON (the reference commits
    # threshold_yolov8.png next to threshold_yolov8.json).
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        rows = sweep["sweep"]
        ts = [r["threshold"] for r in rows]
        fig, ax = plt.subplots(figsize=(9, 5))
        for key, style in (("precision", "--"), ("recall", ":"), ("f1", "-")):
            ax.plot(ts, [r[key] for r in rows], style, marker="o", ms=3, label=key)
        ax.axvline(best, color="gray", alpha=0.5, lw=1)
        ax.annotate(f"best {best}", (best, sweep["best_f1"]),
                    textcoords="offset points", xytext=(6, 6), fontsize=8)
        ax.set_xlabel("confidence threshold")
        ax.set_ylabel("score")
        ax.set_title("Detection threshold sweep")
        ax.grid(alpha=0.3)
        ax.legend()
        png = args.output.with_suffix(".png")
        fig.tight_layout()
        fig.savefig(png, dpi=120)
        plt.close(fig)
        print(f"plot -> {png}")
    except Exception as e:  # plotting is best-effort
        print(f"plot skipped: {e}")

    print(f"best threshold {best} (F1 {sweep['best_f1']:.4f}) -> {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
