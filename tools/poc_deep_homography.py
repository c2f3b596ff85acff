"""PoC: compare the configured homography against a freshly-estimated one
(analog of reference tools/poc_deep_homography.py:1-110).

The reference estimates with Kornia's ``find_homography_dlt`` (torch); here
the estimator is the repo's own jitted normalized-DLT / vmapped-RANSAC
(ops/homography_fit.py), so the PoC runs on TPU with no optional
dependency. Reports RMSE / max error and fit+eval wall time for both the
config matrix and the estimated one.

Usage:
  python tools/poc_deep_homography.py --correspondence points.json \
      [--config config.yaml] [--ransac] [--json out.json]
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

from office_person_detection_vit_tpu.config import ConfigManager  # noqa: E402
from office_person_detection_vit_tpu.evaluation.transform_evaluator import (  # noqa: E402
    TransformEvaluator,
)
from office_person_detection_vit_tpu.ops.homography_fit import (  # noqa: E402
    fit_homography_dlt,
    fit_homography_ransac,
)
from office_person_detection_vit_tpu.transform.homography import (  # noqa: E402
    HomographyTransformer,
)
from office_person_detection_vit_tpu.transform.piecewise_affine import (  # noqa: E402
    load_correspondences,
)

logger = logging.getLogger("poc_deep_homography")


def _homography_from_config(config: ConfigManager) -> np.ndarray:
    """Config matrix, identity if absent (reference poc :35-41)."""
    matrix = config.get("homography.matrix")
    if matrix is None:
        return np.eye(3, dtype=np.float64)
    return np.asarray(matrix, np.float64)


def _evaluate(name: str, matrix: np.ndarray, src: np.ndarray, dst: np.ndarray) -> dict:
    evaluator = TransformEvaluator()
    start = time.perf_counter()
    stats = evaluator.evaluate(HomographyTransformer(matrix), src, dst)
    elapsed = time.perf_counter() - start
    return {
        "name": name,
        "rmse": stats["rmse"],
        "max_error": stats["max_error"],
        "mean_error": stats["mean_error"],
        "eval_seconds": elapsed,
    }


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(description="Config vs estimated homography PoC")
    parser.add_argument("--correspondence", required=True, type=Path)
    parser.add_argument("--config", type=Path, default=None)
    parser.add_argument("--ransac", action="store_true", help="RANSAC instead of plain DLT")
    parser.add_argument("--json", type=Path, default=None, help="write results JSON")
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO, format="%(message)s")

    src, dst = load_correspondences(args.correspondence)
    results = []

    if args.config is not None:
        h_config = _homography_from_config(ConfigManager(str(args.config)))
        results.append(_evaluate("config", h_config, src, dst))

    start = time.perf_counter()
    if args.ransac:
        h_est, inliers, _ = fit_homography_ransac(src, dst)
        extra = {"num_inliers": int(np.asarray(inliers).sum())}
    else:
        h_est = fit_homography_dlt(src, dst)
        extra = {}
    h_est = np.asarray(h_est, np.float64)
    fit_seconds = time.perf_counter() - start

    est = _evaluate("ransac" if args.ransac else "dlt", h_est, src, dst)
    est["fit_seconds"] = fit_seconds
    est["homography_matrix"] = h_est.tolist()
    est.update(extra)
    results.append(est)

    for r in results:
        logger.info(
            "%-8s rmse=%.3fpx max=%.3fpx mean=%.3fpx eval=%.4fs%s",
            r["name"],
            r["rmse"],
            r["max_error"],
            r["mean_error"],
            r["eval_seconds"],
            f" fit={r['fit_seconds']:.4f}s" if "fit_seconds" in r else "",
        )
    if args.json is not None:
        args.json.parent.mkdir(parents=True, exist_ok=True)
        args.json.write_text(json.dumps(results, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
