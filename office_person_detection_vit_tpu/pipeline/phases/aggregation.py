"""Phase 4 — zone-count aggregation
(reference src/pipeline/phases/aggregation.py:26-91).

Feeds every frame's zone memberships into the Aggregator (jnp segment sums
under the hood), logs statistics/trends/peaks, writes zone_counts.csv.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

from ...aggregation.aggregator import Aggregator
from ...core.dto import AggregationResult, FrameResult
from .base import BasePhase


class AggregationPhase(BasePhase):
    name = "05_aggregation"

    def __init__(self, config: Any, logger=None):
        super().__init__(config, logger)
        zone_ids = [z["id"] for z in config.get("zones", [])]
        self.aggregator = Aggregator(zone_ids)
        self.results: list[AggregationResult] = []

    def execute(
        self,
        frame_results: list[FrameResult],
        output_dir: str | Path | None = None,
    ) -> list[AggregationResult]:
        self.log_banner()
        self.aggregator.reset()
        self.results = []
        for fr in frame_results:
            res = self.aggregator.aggregate_frame(
                fr.timestamp_str, [d.zone_ids for d in fr.detections]
            )
            fr.zone_counts = dict(res.zone_counts)
            self.results.append(res)

        stats = self.aggregator.get_statistics()
        for zone, s in stats.items():
            self.logger.info(
                "zone %s: avg %.2f max %d min %d", zone, s.get("avg", 0.0),
                int(s.get("max", 0)), int(s.get("min", 0)),
            )
        trends = self.aggregator.get_trend_analysis()
        for zone, t in trends.items():
            self.logger.info(
                "zone %s trend: slope %.4f r2 %.3f", zone,
                t.get("slope", 0.0), t.get("r_squared", 0.0),
            )
        for peak in self.aggregator.get_peak_times(top_n=3):
            self.logger.info("peak: %s", peak)

        if output_dir is not None:
            out = Path(output_dir)
            out.mkdir(parents=True, exist_ok=True)
            self.aggregator.export_csv(out / "zone_counts.csv")
        return self.results
