"""Zone-count aggregation (reference src/aggregation/aggregator.py:31-289).

Host facade that accumulates per-frame zone memberships and computes
counts / statistics / trends / peaks through the jitted reductions in
ops/aggregation — the whole run's counts are one (F, Z) device matrix.
"""

from __future__ import annotations

import csv
from pathlib import Path
from typing import Any, Sequence

import jax.numpy as jnp
import numpy as np

from ..core.dto import AggregationResult
from ..ops import aggregation as agg_ops

UNCLASSIFIED = "unclassified"


class Aggregator:
    def __init__(self, zone_ids: Sequence[str]):
        self.zone_ids = list(zone_ids)
        self._timestamps: list[str] = []
        self._rows: list[np.ndarray] = []  # per-frame (Z,) counts
        self._unclassified: list[int] = []

    # ------------------------------------------------------------ ingestion
    def aggregate_frame(
        self, timestamp: str, zone_ids_per_detection: list[list[str]]
    ) -> AggregationResult:
        """Count detections per zone for one frame. A detection in k zones
        counts once in each; zone-less detections count as unclassified
        (reference aggregator.py:64-75)."""
        counts = np.zeros(len(self.zone_ids), np.int32)
        uncls = 0
        index = {z: i for i, z in enumerate(self.zone_ids)}
        for zones in zone_ids_per_detection:
            real = [z for z in zones if z in index]
            if not real:
                uncls += 1
            for z in real:
                counts[index[z]] += 1
        self._timestamps.append(timestamp)
        self._rows.append(counts)
        self._unclassified.append(uncls)
        zc = {z: int(c) for z, c in zip(self.zone_ids, counts)}
        if uncls:
            zc[UNCLASSIFIED] = uncls
        return AggregationResult(timestamp=timestamp, zone_counts=zc)

    def aggregate_membership(
        self, timestamps: list[str], membership: np.ndarray, valid: np.ndarray
    ) -> None:
        """Batched ingestion: (F, Q, Z) membership + (F, Q) valid in one
        jitted reduction (the TPU-native path)."""
        counts = np.asarray(
            agg_ops.zone_count_matrix(jnp.asarray(membership), jnp.asarray(valid))
        )
        uncls = np.asarray(
            agg_ops.unclassified_counts(jnp.asarray(membership), jnp.asarray(valid))
        )
        self._timestamps.extend(timestamps)
        self._rows.extend(list(counts))
        self._unclassified.extend(int(u) for u in uncls)

    # -------------------------------------------------------------- queries
    @property
    def counts_matrix(self) -> np.ndarray:
        if not self._rows:
            return np.zeros((0, len(self.zone_ids)), np.int32)
        return np.stack(self._rows)

    def get_zone_counts(self) -> dict[str, dict[str, int]]:
        """{timestamp: {zone_id: count, ..., unclassified: n}}."""
        out: dict[str, dict[str, int]] = {}
        for ts, row, uncls in zip(self._timestamps, self._rows, self._unclassified):
            d = {z: int(c) for z, c in zip(self.zone_ids, row)}
            if uncls:
                d[UNCLASSIFIED] = int(uncls)
            out[ts] = d
        return out

    def get_statistics(self) -> dict[str, dict[str, float]]:
        """Per-zone avg/max/min/std/median/q1/q3 (reference :135-181)."""
        if not self._rows:
            return {}
        stats = agg_ops.zone_statistics(jnp.asarray(self.counts_matrix))
        stats = {k: np.asarray(v) for k, v in stats.items()}
        return {
            z: {k: float(v[i]) for k, v in stats.items()}
            for i, z in enumerate(self.zone_ids)
        }

    def get_trend_analysis(self) -> dict[str, dict[str, float]]:
        """Per-zone linear-regression slope/intercept/R^2 (reference :183-235)."""
        if len(self._rows) < 2:
            return {}
        trend = agg_ops.linear_trend(jnp.asarray(self.counts_matrix))
        trend = {k: np.asarray(v) for k, v in trend.items()}
        out = {}
        for i, z in enumerate(self.zone_ids):
            slope = float(trend["slope"][i])
            out[z] = {
                "slope": slope,
                "intercept": float(trend["intercept"][i]),
                "r_squared": float(trend["r_squared"][i]),
                "direction": "increasing" if slope > 0.01 else ("decreasing" if slope < -0.01 else "stable"),
            }
        return out

    def get_peak_times(self, top_n: int = 5) -> list[dict[str, Any]]:
        """Top-N total-occupancy frames (reference :237-267)."""
        if not self._rows:
            return []
        idxs, vals = agg_ops.top_k_peaks(jnp.asarray(self.counts_matrix), k=top_n)
        return [
            {"timestamp": self._timestamps[int(i)], "total_count": int(v)}
            for i, v in zip(np.asarray(idxs), np.asarray(vals))
        ]

    # --------------------------------------------------------------- export
    def export_csv(self, path: str | Path) -> Path:
        """timestamp x zones matrix CSV (reference :77-133): header
        timestamp,zone_1,...,unclassified,total."""
        path = Path(path)
        path.parent.mkdir(parents=True, exist_ok=True)
        with open(path, "w", newline="", encoding="utf-8") as f:
            w = csv.writer(f)
            w.writerow(["timestamp", *self.zone_ids, UNCLASSIFIED, "total"])
            for ts, row, uncls in zip(self._timestamps, self._rows, self._unclassified):
                total = int(row.sum()) + int(uncls)
                w.writerow([ts, *[int(c) for c in row], int(uncls), total])
        return path

    def reset(self) -> None:
        self._timestamps = []
        self._rows = []
        self._unclassified = []
