"""Phase 3 — coordinate transform + zone classification
(reference src/pipeline/phases/transform.py:64-531).

Method select (homography / piecewise_affine / thin_plate_spline), optional
lens undistortion, then ONE fused device pass over every detection in the
run: foot point -> (undistort) -> floor px -> mm scaling -> point-in-polygon
membership (SURVEY.md §2.1 "single fused jit"). Export honors the JSON
optimization knobs (compact keys / precision / px exclusion, reference
:398-531, schema schemas/coordinate_transformations.schema.json).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any

import numpy as np

from ...calibration.lens_distortion import LensDistortionCorrector
from ...core.dto import FrameResult
from ...transform.floormap_config import FloorMapConfig
from ...transform.piecewise_affine import build_transformer
from ...zone.zone_classifier import ZoneClassifier
from .base import BasePhase


class TransformPhase(BasePhase):
    name = "04_transform"

    def __init__(self, config: Any, logger=None):
        super().__init__(config, logger)
        self.transformer = None
        self.zone_classifier: ZoneClassifier | None = None
        self.floormap = FloorMapConfig.from_config(config)
        self.undistorter: LensDistortionCorrector | None = None
        self.statistics: dict[str, Any] = {}

    def initialize(self) -> None:
        """(reference :222-255; distortion init :64-125)"""
        if self.config.get("transform.lens_distortion.enabled", False) or self.config.get(
            "calibration.use_distortion_correction", False
        ):
            self.undistorter = LensDistortionCorrector.from_config(self.config)
            if self.undistorter.params.is_identity:
                self.logger.info("lens distortion params are identity; disabled")
                self.undistorter = None
        if self.transformer is None:
            self.transformer = build_transformer(self.config, undistorter=self.undistorter)
        zones = self.config.get("zones", [])
        if zones and self.zone_classifier is None:
            self.zone_classifier = ZoneClassifier(
                zones, overlap_mode=str(self.config.get("zones_overlap_mode", "all"))
            )

    # ------------------------------------------------------------------ run
    def execute(
        self,
        frame_results: list[FrameResult],
        output_dir: str | Path | None = None,
    ) -> list[FrameResult]:
        """Fill floor_coords_px/mm + zone_ids on every detection."""
        self.log_banner()
        self.initialize()

        # Flatten all foot points in the run into one (N, 2) device pass.
        index: list[tuple[int, int]] = []
        feet: list[tuple[float, float]] = []
        for fi, fr in enumerate(frame_results):
            for di, det in enumerate(fr.detections):
                index.append((fi, di))
                feet.append(det.foot_point)

        if feet:
            points = np.asarray(feet, np.float32)
            floor_px = self.transformer.transform_batch(points)  # (N, 2)
            floor_mm = self.floormap.px_to_mm(floor_px)
            if self.zone_classifier is not None:
                zone_lists = self.zone_classifier.classify_batch(floor_px)
            else:
                zone_lists = [[] for _ in feet]
            for (fi, di), px, mm, zones in zip(index, floor_px, floor_mm, zone_lists):
                det = frame_results[fi].detections[di]
                det.floor_coords_px = (float(px[0]), float(px[1]))
                det.floor_coords_mm = (float(mm[0]), float(mm[1]))
                det.zone_ids = list(zones)

        self.statistics = self._compute_statistics(frame_results, len(feet))
        self.log_statistics()
        if output_dir is not None:
            self.export_results(frame_results, Path(output_dir))
        return frame_results

    def _compute_statistics(
        self, frame_results: list[FrameResult], total: int
    ) -> dict[str, Any]:
        classified = sum(
            1 for fr in frame_results for d in fr.detections if d.zone_ids
        )
        return {
            "total_detections": total,
            "transformed": total,
            "zone_classified": classified,
            "unclassified": total - classified,
            "method": str(self.config.get("transform.method", "homography")),
        }

    def log_statistics(self) -> None:
        """(reference :355-384)"""
        s = self.statistics
        self.logger.info(
            "transformed %d detections (%s); %d zone-classified, %d unclassified",
            s["total_detections"], s["method"], s["zone_classified"], s["unclassified"],
        )

    # -------------------------------------------------------------- export
    def export_results(
        self, frame_results: list[FrameResult], output_dir: Path
    ) -> Path:
        """coordinate_transformations.json (reference :398-531)."""
        output_dir.mkdir(parents=True, exist_ok=True)
        # Reference key names + semantics (reference phases/transform.py:406-410):
        # `enabled` gates everything; `compact_keys` is its OWN flag (enabled
        # without compact_keys still rounds coordinates under full key names);
        # full precision when disabled.
        opt = self.config.get("output.json_optimization", {}) or {}
        enabled = bool(opt.get("enabled", False))
        precision = int(opt.get("coordinate_precision", 1)) if enabled else None
        compact = bool(opt.get("compact_keys", False)) and enabled
        exclude_px = bool(opt.get("exclude_px_coords", False)) and enabled

        frames_out = []
        for fr in frame_results:
            if compact:
                frames_out.append(
                    {
                        "idx": fr.frame_number,
                        "ts": fr.timestamp_str,
                        "det": [
                            d.to_compact_dict(precision=precision, exclude_px=exclude_px)
                            for d in fr.detections
                        ],
                    }
                )
            else:
                dets = []
                for d in fr.detections:
                    doc = d.to_dict(precision=precision)
                    if exclude_px:
                        doc.pop("floor_coords_px", None)
                    dets.append(doc)
                frames_out.append(
                    {
                        "frame_number": fr.frame_number,
                        "timestamp": fr.timestamp_str,
                        "detections": dets,
                    }
                )
        doc = {
            "transform_method": str(self.config.get("transform.method", "homography")),
            "transformer_info": self.transformer.get_info(),
            "frames": frames_out,
        }
        path = output_dir / "coordinate_transformations.json"
        path.write_text(
            json.dumps(doc, indent=None if compact else 2, separators=(",", ":") if compact else None),
            encoding="utf-8",
        )
        return path
