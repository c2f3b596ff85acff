"""Calibration optimizer (analog of reference tools/camera_param_optimizer.py
/ correspondence_analyzer.py), rebuilt as a jitted gradient descent.

The reference optimizes camera parameters with scipy on host; here the
reprojection error is a jax-differentiable function of the 8 homography
DoF, minimized with optax Adam under jit — the same machinery as model
training, usable on TPU or CPU.

Usage:
  python tools/camera_param_optimizer.py --correspondences points.json \
      [--output homography.json] [--steps 2000] [--lr 0.01]

Correspondence JSON: {"points": [{"camera": [x, y], "floor": [x, y]}, ...]}
(also accepts {"camera_points": [[x,y]...], "floor_points": [[x,y]...]}).
"""

from __future__ import annotations

import argparse
import json
import logging
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

logger = logging.getLogger("camera_param_optimizer")


def load_correspondences(path: Path) -> tuple[np.ndarray, np.ndarray]:
    doc = json.loads(path.read_text())
    if "points" in doc:
        cam = np.asarray([p["camera"] for p in doc["points"]], np.float32)
        floor = np.asarray([p["floor"] for p in doc["points"]], np.float32)
    else:
        cam = np.asarray(doc["camera_points"], np.float32)
        floor = np.asarray(doc["floor_points"], np.float32)
    return cam, floor


def fit_homography_dlt(cam: np.ndarray, floor: np.ndarray) -> np.ndarray:
    """Closed-form DLT initialization (normalized least squares) via the
    framework's jitted SVD solver (ops/homography_fit.py)."""
    from office_person_detection_vit_tpu.ops.homography_fit import (
        fit_homography_dlt as dlt,
    )

    H = np.asarray(dlt(cam, floor), np.float64)
    if not np.isfinite(H).all():
        raise ValueError(
            "degenerate correspondences (collinear or duplicate points) — "
            "cannot fit a homography"
        )
    return H


def _normalizer(points: np.ndarray) -> np.ndarray:
    """Hartley similarity transform: mean 0, average radius sqrt(2)."""
    mean = points.mean(axis=0)
    scale = np.sqrt(2.0) / max(np.mean(np.linalg.norm(points - mean, axis=1)), 1e-9)
    return np.asarray(
        [[scale, 0, -scale * mean[0]], [0, scale, -scale * mean[1]], [0, 0, 1.0]],
        np.float64,
    )


def refine_homography_jax(
    H0: np.ndarray,
    cam: np.ndarray,
    floor: np.ndarray,
    steps: int = 2000,
    lr: float = 1e-3,
) -> tuple[np.ndarray, dict]:
    """Adam refinement of the 8 homography DoF under jit.

    Both point sets are Hartley-normalized first so every entry of the
    optimized matrix is O(1) — without this the perspective terms (~1e-5)
    and translations (~1e2) differ by 7 orders of magnitude and any single
    learning rate diverges.
    """
    import jax
    import jax.numpy as jnp
    import optax

    n_cam = _normalizer(cam)
    n_floor = _normalizer(floor)
    cam_n = (np.concatenate([cam, np.ones((len(cam), 1))], axis=1) @ n_cam.T)[:, :2]
    floor_n = (np.concatenate([floor, np.ones((len(floor), 1))], axis=1) @ n_floor.T)[:, :2]
    H0_n = n_floor @ H0 @ np.linalg.inv(n_cam)

    cam_j = jnp.asarray(cam_n, jnp.float32)
    floor_j = jnp.asarray(floor_n, jnp.float32)
    params0 = jnp.asarray((H0_n / H0_n[2, 2]).flatten()[:8], jnp.float32)

    def project(params, pts):
        H = jnp.append(params, 1.0).reshape(3, 3)
        ones = jnp.ones((pts.shape[0], 1), jnp.float32)
        hom = jnp.concatenate([pts, ones], axis=1) @ H.T
        return hom[:, :2] / hom[:, 2:3]

    def loss_fn(params):
        err = project(params, cam_j) - floor_j
        return jnp.mean(jnp.sum(err**2, axis=-1))

    tx = optax.adam(lr)

    @jax.jit
    def run(params):
        def body(carry, _):
            params, opt_state = carry
            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state)
            return (optax.apply_updates(params, updates), opt_state), loss

        (params, _), losses = jax.lax.scan(
            body, (params, tx.init(params)), None, length=steps
        )
        return params, losses

    params, _losses = run(params0)
    H_n = np.asarray(jnp.append(params, 1.0).reshape(3, 3), np.float64)
    H = np.linalg.inv(n_floor) @ H_n @ n_cam
    H = H / H[2, 2]

    hom = np.concatenate([cam, np.ones((len(cam), 1))], axis=1) @ H.T
    errors = np.linalg.norm(hom[:, :2] / hom[:, 2:3] - floor, axis=-1)
    stats = {
        "rmse": float(np.sqrt(np.mean(errors**2))),
        "mean_error": float(np.mean(errors)),
        "max_error": float(np.max(errors)),
        "steps": steps,
    }
    return H, stats


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(description="homography optimizer (jax)")
    parser.add_argument("--correspondences", required=True, type=Path)
    parser.add_argument("--output", type=Path, default=Path("homography.json"))
    parser.add_argument("--steps", type=int, default=2000)
    parser.add_argument("--lr", type=float, default=1e-2)
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")

    cam, floor = load_correspondences(args.correspondences)
    if len(cam) < 4:
        logger.error("need >= 4 correspondences, got %d", len(cam))
        return 1
    H0 = fit_homography_dlt(cam, floor)
    H, stats = refine_homography_jax(H0, cam, floor, steps=args.steps, lr=args.lr)
    logger.info("refined homography: RMSE %.3f px (max %.3f)", stats["rmse"], stats["max_error"])
    args.output.write_text(
        json.dumps({"homography_matrix": H.tolist(), "fit": stats}, indent=2)
    )
    print(f"RMSE {stats['rmse']:.3f} px -> {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
