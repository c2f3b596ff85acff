"""Correspondence-point quality analyzer (analog of reference
tools/correspondence_analyzer.py:40-537).

Analyzes a calibration correspondence set for Phase-3 transform accuracy:
  - spatial distribution over a 5x4 camera-image grid (coverage, sparse and
    empty cells — reference :40-109),
  - homography fit quality with RANSAC outlier detection (reference :111-175;
    here the RANSAC runs as a vmapped batch of DLT solves on device,
    ops/homography_fit.py, instead of cv2.findHomography),
  - distribution and error-map visualizations (reference :176-354),
  - a markdown report with recommendations (reference :355-448).

Usage:
  python tools/correspondence_analyzer.py --correspondences points.json \
      [--image-size 1280x720] [--floormap-size 1878x1369] \
      [--reference-image frame.jpg] [--floormap floormap.png] \
      [--output-dir output/calibration/analysis]
"""

from __future__ import annotations

import argparse
import json
import logging
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from office_person_detection_vit_tpu.ops.homography_fit import (  # noqa: E402
    fit_homography_ransac,
)
from office_person_detection_vit_tpu.transform.piecewise_affine import (  # noqa: E402
    load_correspondences,
)

logger = logging.getLogger("correspondence_analyzer")

GRID_COLS, GRID_ROWS = 5, 4
SPARSE_THRESHOLD = 3


def analyze_distribution(src: np.ndarray, image_size: tuple[int, int]) -> dict:
    """Grid-coverage statistics of camera-side points (reference :40-109)."""
    width, height = image_size
    cell_w, cell_h = width / GRID_COLS, height / GRID_ROWS
    cols = np.clip((src[:, 0] / cell_w).astype(int), 0, GRID_COLS - 1)
    rows = np.clip((src[:, 1] / cell_h).astype(int), 0, GRID_ROWS - 1)
    grid = np.zeros((GRID_ROWS, GRID_COLS), int)
    np.add.at(grid, (rows, cols), 1)

    regions = []
    for r in range(GRID_ROWS):
        for c in range(GRID_COLS):
            regions.append(
                {
                    "row": r,
                    "col": c,
                    "x_range": (c * cell_w, (c + 1) * cell_w),
                    "y_range": (r * cell_h, (r + 1) * cell_h),
                    "count": int(grid[r, c]),
                    "is_sparse": int(grid[r, c]) < SPARSE_THRESHOLD,
                    "is_empty": int(grid[r, c]) == 0,
                }
            )
    sparse = [r for r in regions if r["is_sparse"]]
    return {
        "total_points": int(len(src)),
        "image_size": list(image_size),
        "grid_size": [GRID_COLS, GRID_ROWS],
        "grid_counts": grid.tolist(),
        "empty_cells": int((grid == 0).sum()),
        "min_count": int(grid.min()),
        "max_count": int(grid.max()),
        "mean_count": float(grid.mean()),
        "std_count": float(grid.std()),
        "coverage_ratio": float((grid > 0).sum() / grid.size),
        "regions": regions,
        "sparse_regions": sparse,
        "num_sparse_regions": len(sparse),
    }


def compute_homography_error(
    src: np.ndarray, dst: np.ndarray, threshold: float = 5.0
) -> dict:
    """RANSAC homography fit + per-point transfer errors (reference :111-175)."""
    if len(src) < 4:
        return {"error": f"need >=4 correspondences, got {len(src)}"}
    h, inliers, errors = fit_homography_ransac(src, dst, threshold=threshold)
    h = np.asarray(h, np.float64)
    inliers = np.asarray(inliers)
    errors = np.asarray(errors, np.float64)
    if not np.isfinite(h).all():
        return {"error": "Failed to compute homography"}

    src_h = np.hstack([src, np.ones((len(src), 1))])
    proj = src_h @ h.T
    transformed = proj[:, :2] / proj[:, 2:3]

    point_errors = [
        {
            "index": i,
            "src_point": src[i].tolist(),
            "dst_point": dst[i].tolist(),
            "transformed_point": transformed[i].tolist(),
            "error": float(errors[i]),
            "is_inlier": bool(inliers[i]),
            "error_vector": (transformed[i] - dst[i]).tolist(),
        }
        for i in range(len(src))
    ]
    worst = sorted(point_errors, key=lambda p: p["error"], reverse=True)[:10]
    num_inliers = int(inliers.sum())
    return {
        "homography_matrix": h.tolist(),
        "num_inliers": num_inliers,
        "num_outliers": int(len(src) - num_inliers),
        "inlier_ratio": num_inliers / len(src),
        "rmse": float(np.sqrt(np.mean(errors**2))),
        "mae": float(np.mean(errors)),
        "max_error": float(errors.max()),
        "min_error": float(errors.min()),
        "std_error": float(errors.std()),
        "percentile_90": float(np.percentile(errors, 90)),
        "percentile_95": float(np.percentile(errors, 95)),
        "point_errors": point_errors,
        "worst_points": worst,
    }


def visualize_distribution(
    src: np.ndarray,
    image_size: tuple[int, int],
    reference_image: Path | None,
    output_path: Path,
) -> None:
    """Camera-grid coverage heat overlay + point markers (reference :176-270)."""
    import cv2

    width, height = image_size
    img = None
    if reference_image and reference_image.exists():
        img = cv2.imread(str(reference_image))
        if img is not None:
            img = cv2.resize(img, (width, height))
    if img is None:
        img = np.full((height, width, 3), 255, np.uint8)

    cell_w, cell_h = width / GRID_COLS, height / GRID_ROWS
    grid = np.zeros((GRID_ROWS, GRID_COLS), int)
    cols = np.clip((src[:, 0] / cell_w).astype(int), 0, GRID_COLS - 1)
    rows = np.clip((src[:, 1] / cell_h).astype(int), 0, GRID_ROWS - 1)
    np.add.at(grid, (rows, cols), 1)

    overlay = img.copy()
    for r in range(GRID_ROWS):
        for c in range(GRID_COLS):
            count = grid[r, c]
            color = (0, 0, 255) if count == 0 else (0, 165, 255) if count < SPARSE_THRESHOLD else (0, 255, 0)
            cv2.rectangle(
                overlay,
                (int(c * cell_w), int(r * cell_h)),
                (int((c + 1) * cell_w), int((r + 1) * cell_h)),
                color,
                -1,
            )
    img = cv2.addWeighted(overlay, 0.3, img, 0.7, 0)
    for c in range(1, GRID_COLS):
        cv2.line(img, (int(c * cell_w), 0), (int(c * cell_w), height), (200, 200, 200), 1)
    for r in range(1, GRID_ROWS):
        cv2.line(img, (0, int(r * cell_h)), (width, int(r * cell_h)), (200, 200, 200), 1)
    for x, y in src:
        cv2.circle(img, (int(x), int(y)), 5, (255, 0, 0), -1)
        cv2.circle(img, (int(x), int(y)), 5, (0, 0, 0), 1)
    for r in range(GRID_ROWS):
        for c in range(GRID_COLS):
            color = (0, 0, 0) if grid[r, c] >= SPARSE_THRESHOLD else (0, 0, 255)
            cv2.putText(
                img,
                str(grid[r, c]),
                (int((c + 0.5) * cell_w) - 10, int((r + 0.5) * cell_h) + 10),
                cv2.FONT_HERSHEY_SIMPLEX,
                1.0,
                color,
                2,
            )
    cv2.putText(img, f"Total: {len(src)} points", (10, 30), cv2.FONT_HERSHEY_SIMPLEX, 0.7, (0, 0, 0), 2)
    cv2.putText(
        img,
        "Red: Empty | Orange: Sparse (<3) | Green: OK (>=3)",
        (10, 60),
        cv2.FONT_HERSHEY_SIMPLEX,
        0.5,
        (0, 0, 0),
        1,
    )
    cv2.imwrite(str(output_path), img)


def visualize_error_map(
    error_results: dict,
    floormap_size: tuple[int, int],
    floormap_path: Path | None,
    output_path: Path,
) -> None:
    """Error vectors on the floormap, green->yellow->red (reference :272-354)."""
    import cv2

    width, height = floormap_size
    img = None
    if floormap_path and floormap_path.exists():
        img = cv2.imread(str(floormap_path))
        if img is not None:
            img = cv2.resize(img, (width, height))
    if img is None:
        img = np.full((height, width, 3), 255, np.uint8)

    max_error = max(error_results["max_error"], 1.0)
    for pe in error_results["point_errors"]:
        ratio = min(pe["error"] / max_error, 1.0)
        if ratio < 0.5:
            color = (0, 255, int(255 * ratio * 2))
        else:
            color = (0, int(255 * (1 - (ratio - 0.5) * 2)), 255)
        dst_pt = (int(pe["dst_point"][0]), int(pe["dst_point"][1]))
        trans_pt = (int(pe["transformed_point"][0]), int(pe["transformed_point"][1]))
        cv2.arrowedLine(img, dst_pt, trans_pt, color, 2, tipLength=0.3)
        marker = cv2.MARKER_CROSS if pe["is_inlier"] else cv2.MARKER_TILTED_CROSS
        cv2.drawMarker(img, dst_pt, (0, 0, 0), marker, 10, 2)

    cv2.putText(img, f"RMSE: {error_results['rmse']:.1f}px", (10, 30), cv2.FONT_HERSHEY_SIMPLEX, 0.7, (0, 0, 0), 2)
    cv2.putText(img, f"Max: {error_results['max_error']:.1f}px", (10, 60), cv2.FONT_HERSHEY_SIMPLEX, 0.7, (0, 0, 0), 2)
    cv2.putText(
        img,
        f"Inliers: {error_results['num_inliers']}/{len(error_results['point_errors'])}",
        (10, 90),
        cv2.FONT_HERSHEY_SIMPLEX,
        0.7,
        (0, 0, 0),
        2,
    )
    cv2.imwrite(str(output_path), img)


def generate_report(distribution: dict, errors: dict) -> str:
    """Markdown quality report with recommendations (reference :355-448)."""
    lines = ["# Correspondence-point quality report", ""]
    lines += [
        "## 1. Basics",
        f"- points: {distribution['total_points']}",
        f"- image size: {distribution['image_size']}",
        "",
        "## 2. Distribution",
        f"- grid: {GRID_COLS}x{GRID_ROWS}",
        f"- coverage: {distribution['coverage_ratio']:.1%}",
        f"- empty cells: {distribution['empty_cells']}",
        f"- sparse cells (<{SPARSE_THRESHOLD} pts): {distribution['num_sparse_regions']}",
        "",
        "### Points per grid cell",
        "```",
    ]
    lines += ["  ".join(f"{c:2d}" for c in row) for row in distribution["grid_counts"]]
    lines += ["```", ""]
    if distribution["sparse_regions"]:
        lines.append("### Cells needing more points")
        for r in distribution["sparse_regions"]:
            status = "empty" if r["is_empty"] else f"{r['count']} pts"
            lines.append(
                f"- [{r['row']},{r['col']}] x={tuple(round(v) for v in r['x_range'])},"
                f" y={tuple(round(v) for v in r['y_range'])}: {status}"
            )
        lines.append("")

    lines.append("## 3. Homography error")
    if "error" in errors:
        lines.append(f"- {errors['error']}")
    else:
        lines += [
            f"- RMSE: {errors['rmse']:.2f} px",
            f"- MAE: {errors['mae']:.2f} px",
            f"- max: {errors['max_error']:.2f} px",
            f"- std: {errors['std_error']:.2f} px",
            f"- p90: {errors['percentile_90']:.2f} px",
            f"- p95: {errors['percentile_95']:.2f} px",
            f"- inliers: {errors['num_inliers']}/{distribution['total_points']}"
            f" ({errors['inlier_ratio']:.1%})",
            "",
            "### Worst points",
            "| # | src (x, y) | dst (x, y) | error (px) | inlier |",
            "|---|------------|------------|------------|--------|",
        ]
        for i, wp in enumerate(errors["worst_points"]):
            s, d = wp["src_point"], wp["dst_point"]
            lines.append(
                f"| {i + 1} | ({s[0]:.0f}, {s[1]:.0f}) | ({d[0]:.0f}, {d[1]:.0f}) |"
                f" {wp['error']:.1f} | {'Yes' if wp['is_inlier'] else 'No'} |"
            )

    lines += ["", "## 4. Recommendations"]
    recs = []
    if distribution["empty_cells"]:
        recs.append(f"- add correspondences to the {distribution['empty_cells']} empty grid cell(s)")
    if distribution["num_sparse_regions"] > 5:
        recs.append(f"- {distribution['num_sparse_regions']} sparse regions need more points")
    if "error" not in errors:
        if errors["rmse"] > 50:
            recs.append(
                f"- RMSE ({errors['rmse']:.1f}px) far exceeds the 20px goal;"
                " switch to the piecewise-affine transform"
            )
        if errors["num_outliers"] > 5:
            recs.append(f"- review the {errors['num_outliers']} outlier point(s)")
    lines += recs or ["- correspondence quality is good"]
    return "\n".join(lines) + "\n"


def _parse_size(text: str) -> tuple[int, int]:
    w, h = text.lower().split("x")
    return int(w), int(h)


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(description="Correspondence-point quality analysis")
    parser.add_argument("--correspondences", required=True, type=Path)
    parser.add_argument("--image-size", default="1280x720", type=_parse_size)
    parser.add_argument("--floormap-size", default="1878x1369", type=_parse_size)
    parser.add_argument("--reference-image", type=Path, default=None)
    parser.add_argument("--floormap", type=Path, default=None)
    parser.add_argument("--ransac-threshold", type=float, default=5.0)
    parser.add_argument("--output-dir", type=Path, default=Path("output/calibration/analysis"))
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO, format="%(message)s")

    src, dst = load_correspondences(args.correspondences)
    args.output_dir.mkdir(parents=True, exist_ok=True)

    distribution = analyze_distribution(src, args.image_size)
    errors = compute_homography_error(src, dst, args.ransac_threshold)

    (args.output_dir / "analysis.json").write_text(
        json.dumps({"distribution": distribution, "homography_error": errors}, indent=2)
    )
    report = generate_report(distribution, errors)
    (args.output_dir / "report.md").write_text(report)
    visualize_distribution(
        src, args.image_size, args.reference_image, args.output_dir / "distribution.png"
    )
    if "error" not in errors:
        visualize_error_map(
            errors, args.floormap_size, args.floormap, args.output_dir / "error_map.png"
        )
    logger.info("%s", report)
    logger.info("analysis written to %s", args.output_dir)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
