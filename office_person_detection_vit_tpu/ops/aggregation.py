"""Zone-count aggregation as array reductions.

TPU-native form of the reference Aggregator's per-frame dict counting
(src/aggregation/aggregator.py:52-75): the whole run's zone counts are one
(F, Z) matrix computed by a single jnp reduction over the (F, Q, Z)
membership tensor; statistics / trends / peaks are jnp reductions over it.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array


@jax.jit
def zone_count_matrix(membership: Array, valid: Array) -> Array:
    """(F, Q, Z) bool membership x (F, Q) bool valid -> (F, Z) int32 counts.

    A detection inside multiple zones counts once in each (reference
    aggregator.py:64-70, overlap counting).
    """
    m = membership & valid[..., None]
    return jnp.sum(m.astype(jnp.int32), axis=1)


@jax.jit
def unclassified_counts(membership: Array, valid: Array) -> Array:
    """(F, Q, Z), (F, Q) -> (F,) number of valid detections in no zone."""
    in_any = jnp.any(membership, axis=-1)
    return jnp.sum((~in_any & valid).astype(jnp.int32), axis=-1)


@jax.jit
def zone_statistics(counts: Array) -> dict[str, Array]:
    """Per-zone stats over frames: (F, Z) -> dict of (Z,) arrays.

    avg/max/min/std/median/q1/q3 (reference aggregator.py:135-181).
    """
    c = counts.astype(jnp.float32)
    return {
        "average": jnp.mean(c, axis=0),
        "max": jnp.max(c, axis=0),
        "min": jnp.min(c, axis=0),
        "std": jnp.std(c, axis=0),
        "median": jnp.median(c, axis=0),
        "q1": jnp.percentile(c, 25.0, axis=0),
        "q3": jnp.percentile(c, 75.0, axis=0),
    }


@jax.jit
def linear_trend(counts: Array) -> dict[str, Array]:
    """Least-squares slope/intercept/R^2 per zone: (F, Z) -> (Z,) each
    (reference aggregator.py:183-235)."""
    F = counts.shape[0]
    t = jnp.arange(F, dtype=jnp.float32)
    y = counts.astype(jnp.float32)
    t_mean = jnp.mean(t)
    y_mean = jnp.mean(y, axis=0)
    t_c = t - t_mean
    y_c = y - y_mean[None, :]
    denom = jnp.sum(t_c**2)
    slope = jnp.sum(t_c[:, None] * y_c, axis=0) / jnp.maximum(denom, 1e-12)
    intercept = y_mean - slope * t_mean
    y_pred = slope[None, :] * t[:, None] + intercept[None, :]
    ss_res = jnp.sum((y - y_pred) ** 2, axis=0)
    ss_tot = jnp.sum(y_c**2, axis=0)
    r2 = jnp.where(ss_tot > 1e-12, 1.0 - ss_res / ss_tot, 0.0)
    return {"slope": slope, "intercept": intercept, "r_squared": r2}


def top_k_peaks(counts: Array, k: int = 5) -> tuple[Array, Array]:
    """Total occupancy peaks: (F, Z) -> (frame indices, totals) of top-k frames
    (reference aggregator.py:237-267)."""
    totals = jnp.sum(counts, axis=-1)
    k = min(k, totals.shape[0])
    vals, idxs = jax.lax.top_k(totals, k)
    return idxs, vals
