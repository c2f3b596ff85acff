"""Detection statistics (reference src/utils/stats_utils.py:24).

The whole run's statistics are computed as one set of masked jnp reductions
over the fixed-shape ``DetectionBatch`` (SURVEY.md §2.1 DetectionPhase →
"stats via jnp reductions") instead of the reference's per-frame Python loop.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from ..core.dto import DetectionBatch, FrameResult


@jax.jit
def _batch_stats(scores: jax.Array, valid: jax.Array) -> dict[str, jax.Array]:
    validf = valid.astype(jnp.float32)
    per_frame = jnp.sum(validf, axis=1)  # (F,)
    total = jnp.sum(per_frame)
    conf_sum = jnp.sum(scores * validf)
    safe_total = jnp.maximum(total, 1.0)
    mean_conf = conf_sum / safe_total
    var = jnp.sum(validf * (scores - mean_conf) ** 2) / safe_total
    return {
        "total": total,
        "per_frame_mean": jnp.mean(per_frame),
        "per_frame_max": jnp.max(per_frame),
        "per_frame_min": jnp.min(per_frame),
        "conf_mean": mean_conf,
        "conf_std": jnp.sqrt(var),
        "conf_min": jnp.min(jnp.where(valid, scores, jnp.inf)),
        "conf_max": jnp.max(jnp.where(valid, scores, -jnp.inf)),
    }


def calculate_detection_statistics(batch: DetectionBatch) -> dict[str, Any]:
    """One jitted reduction over (F, Q) -> host dict for detection_statistics.json."""
    if batch.num_frames == 0:
        return {
            "total_frames": 0,
            "total_detections": 0,
            "avg_detections_per_frame": 0.0,
            "max_detections_per_frame": 0,
            "min_detections_per_frame": 0,
            "confidence": {"mean": 0.0, "std": 0.0, "min": 0.0, "max": 0.0},
        }
    stats = jax.device_get(_batch_stats(jnp.asarray(batch.scores), jnp.asarray(batch.valid)))
    total = int(stats["total"])
    out = {
        "total_frames": int(batch.num_frames),
        "total_detections": total,
        "avg_detections_per_frame": float(stats["per_frame_mean"]),
        "max_detections_per_frame": int(stats["per_frame_max"]),
        "min_detections_per_frame": int(stats["per_frame_min"]),
        "confidence": {
            "mean": float(stats["conf_mean"]) if total else 0.0,
            "std": float(stats["conf_std"]) if total else 0.0,
            "min": float(stats["conf_min"]) if total else 0.0,
            "max": float(stats["conf_max"]) if total else 0.0,
        },
    }
    return out


def calculate_frame_statistics(frames: list[FrameResult]) -> dict[str, Any]:
    """Host-list convenience wrapper (same output contract)."""
    from ..core.dto import detections_to_batch

    if not frames:
        return {
            "total_frames": 0,
            "total_detections": 0,
            "avg_detections_per_frame": 0.0,
            "max_detections_per_frame": 0,
            "min_detections_per_frame": 0,
            "confidence": {"mean": 0.0, "std": 0.0, "min": 0.0, "max": 0.0},
        }
    cap = max(1, max(len(f.detections) for f in frames))
    batch = detections_to_batch([f.detections for f in frames], capacity=cap)
    return calculate_detection_statistics(batch)
