"""Phase 2.5 — multi-object tracking
(reference src/pipeline/phases/tracking.py:46-483).

Sequential stateful host loop over frames: cost matrices and Kalman math run
as jitted kernels (ops/kalman.py, tracking/similarity.py), while association
order stays on host (SURVEY.md §7.4 item 3). Supports detector sharing with
Phase 2 (``set_detector``), optional Re-ID features, MOT/JSON/CSV export,
and dense-interval → output-interval aggregation with track-id dedup
(reference :388-483).
"""

from __future__ import annotations

import json
from collections import defaultdict
from pathlib import Path
from typing import Any

import numpy as np

from ...core.dto import FrameResult
from ...tracking.reid_feature_extractor import ReIDFeatureExtractor
from ...tracking.tracker import Tracker
from ...utils.export_utils import TrajectoryExporter
from ...utils.image_utils import save_tracked_detection_image
from .base import BasePhase


class TrackingPhase(BasePhase):
    name = "03_tracking"

    def __init__(self, config: Any, logger=None):
        super().__init__(config, logger)
        self.tracker: Tracker | None = None
        self.light_tracker = None
        self.reid: ReIDFeatureExtractor | None = None
        self.detector = None
        self.hybrid = bool(config.get("tracking.hybrid_mode.enabled", False))
        # "cascade" (default) = the reference's 5-stage host tracker;
        # "scan" = the fully-jitted lax.scan tracker — the whole sequence
        # associates in ONE device program (tracking/scan_tracker.py).
        self.engine = str(config.get("tracking.engine", "cascade"))
        self.save_images = bool(config.get("output.save_tracking_images", False))
        self.statistics: dict[str, Any] = {}

    def set_detector(self, detector) -> None:
        """Share Phase 2's loaded detector for feature extraction
        (reference :46-54)."""
        self.detector = detector

    def initialize(self) -> None:
        """(reference :56-144)"""
        if self.hybrid and self.light_tracker is None:
            from ...tracking.lightweight_tracker import LightweightTracker

            self.light_tracker = LightweightTracker(
                iou_threshold=float(self.config.get("tracking.iou_threshold", 0.3)),
                max_age=int(self.config.get("tracking.max_age", 30)),
                use_optical_flow=bool(
                    self.config.get("tracking.hybrid_mode.use_optical_flow", True)
                ),
            )
        if self.tracker is None:
            self.tracker = Tracker.from_config(self.config)
        if self.config.get("tracking.reid.enabled", False) and self.reid is None:
            self.reid = ReIDFeatureExtractor.from_config(self.config)
            self.reid.detector = self.detector
            self.reid.load_model()

    def _attach_detector_features(
        self, frame_results, detection_batch, frames=None
    ) -> None:
        """ROI-pool Phase-2 encoder features per detection so the tracker's
        appearance cascade is active even without a Re-ID model (reference
        TrackingPhase shares the detector's features, phases/tracking.py:46).
        No-op when the batch or detector is unavailable (e.g. resume)."""
        if (
            detection_batch is None
            or self.detector is None
            or not hasattr(self.detector, "_pool_features")
            or getattr(self.detector, "_last_encoder_chunks", None) in (None, [])
        ):
            # Conv detectors (yolo/ssd) have no encoder feature map; fall
            # back to their crop-feature contract (reference
            # yolov8_detector.py:161-190 / feature_extractor.py:90-137 —
            # BGR-histogram crop features) so the appearance cascade stays
            # active instead of silently degrading to IoU-only matching.
            if (
                frames is not None
                and self.detector is not None
                and hasattr(self.detector, "extract_features")
            ):
                for fr, frame in zip(frame_results, frames):
                    dets = [d for d in fr.detections if d.feature is None]
                    if not dets or frame is None:
                        continue
                    try:
                        feats = self.detector.extract_features(
                            frame, [d.bbox for d in dets]
                        )
                    except Exception as e:  # enhancement, not a requirement
                        self.logger.warning(
                            "could not extract crop features for frame %s: %s",
                            fr.frame_number, e)
                        continue  # skip just this frame, not the whole tail
                    for det, f in zip(dets, feats):
                        det.feature = np.asarray(f, np.float32)
            return
        try:
            feats = np.asarray(self.detector._pool_features(detection_batch))
            valid = np.asarray(detection_batch.valid)
        except Exception as e:  # defensive: features are an enhancement
            self.logger.warning("could not pool detector features: %s", e)
            return
        for fi, fr in enumerate(frame_results):
            if fi >= len(feats):
                break
            frame_feats = feats[fi][valid[fi]]
            for det, f in zip(fr.detections, frame_feats):
                if det.feature is None:
                    det.feature = np.asarray(f, np.float32)

    # ---------------------------------------------------------------- run
    def execute(
        self,
        frame_results: list[FrameResult],
        frames: list[np.ndarray] | None = None,
        output_dir: str | Path | None = None,
        detection_batch=None,
    ) -> list[FrameResult]:
        """Track identities across the sampled frames (in timestamp order).

        Detections gain ``track_id``; returns the same FrameResult list.
        ``detection_batch`` (Phase 2's DetectionBatch) enables the default
        appearance features: ROI-mean-pooled DETR encoder features, the
        reference's detect_with_features contract (yolov8_detector.py:134)
        — used when no dedicated Re-ID extractor is configured.
        """
        self.log_banner()
        self.initialize()
        if self.reid is None:
            self._attach_detector_features(frame_results, detection_batch, frames)
        id_set: set[int] = set()
        if self.engine == "scan" and self.hybrid:
            self.logger.warning(
                "tracking.engine=scan is ignored because "
                "tracking.hybrid_mode.enabled is set; running the hybrid "
                "lightweight tracker"
            )
        if self.engine == "scan" and not self.hybrid:
            # Whole-sequence association in one jitted lax.scan program.
            from ...tracking.scan_tracker import assign_track_ids

            if self.reid is not None and frames is not None:
                # The cascade loop extracts Re-ID features per frame; the
                # scan engine needs them attached up front.
                for fr, frame in zip(frame_results, frames):
                    if fr.detections:
                        feats = self.reid.extract_features(
                            frame, [d.bbox for d in fr.detections]
                        )
                        for d, f in zip(fr.detections, feats):
                            d.feature = f
            ids = assign_track_ids(
                frame_results,
                # Same defaults as Tracker.from_config so switching engines
                # never silently changes retention/confirmation behavior.
                max_age=int(self.config.get("tracking.max_age", 100)),
                min_hits=int(self.config.get("tracking.min_hits", 1)),
                appearance_weight=float(
                    self.config.get("tracking.appearance_weight", 0.9)
                ),
                motion_weight=float(
                    self.config.get("tracking.motion_weight", 0.1)
                ),
                max_position_distance=float(
                    self.config.get("tracking.max_position_distance", 10000.0)
                ),
            )
            id_set.update(int(i) for i in np.unique(ids) if i >= 0)
            if self.save_images and frames is not None and output_dir is not None:
                for fr, frame in zip(frame_results, frames):
                    save_tracked_detection_image(
                        frame, fr.detections,
                        Path(output_dir) / f"tracked_{fr.timestamp_stem}.jpg",
                    )
            self.statistics = self._compute_statistics(frame_results, id_set)
            if output_dir is not None:
                self.export_results(frame_results, Path(output_dir))
            self.logger.info(
                "tracked %d frames (scan engine): %d unique ids",
                len(frame_results), len(id_set),
            )
            return frame_results
        for i, fr in enumerate(frame_results):
            frame = frames[i] if frames is not None else None
            dets = fr.detections
            if (
                self.reid is not None
                and frame is not None
                and dets
            ):
                feats = self.reid.extract_features(frame, [d.bbox for d in dets])
                for d, f in zip(dets, feats):
                    d.feature = f
            # Real wall-clock seconds drive the adaptive-dt Kalman (reference
            # kalman_filter.py:65-119 — Q/F recomputed per dt, essential for
            # multi-minute gaps between sampled frames); fall back to the
            # frame index when no timestamp was extracted.
            from datetime import datetime as _dt

            ts = fr.timestamp
            if isinstance(ts, str):
                try:
                    ts = _dt.fromisoformat(ts)
                except ValueError:
                    ts = None
            timestamp = ts.timestamp() if isinstance(ts, _dt) else float(i)
            if self.hybrid:
                # Hybrid lightweight mode (reference lightweight_tracker.py):
                # detection frames associate greedily; detection-less frames
                # interpolate via optical flow / Kalman.
                if dets:
                    # update_with_detections assigns det.track_id in place
                    # for matched and newly initiated tracks.
                    self.light_tracker.update_with_detections(
                        dets, frame, timestamp
                    )
                else:
                    from ...core.dto import Detection as _Det

                    for t in self.light_tracker.interpolate(frame, timestamp):
                        d = _Det(bbox=tuple(t.bbox), confidence=t.confidence,
                                 track_id=t.track_id)
                        dets.append(d)
            else:
                self.tracker.update(dets, timestamp)
            id_set.update(d.track_id for d in dets if d.track_id is not None)
            if self.save_images and frame is not None and output_dir is not None:
                stem = fr.timestamp_stem
                save_tracked_detection_image(
                    frame, dets, Path(output_dir) / f"tracked_{stem}.jpg"
                )

        self.statistics = self._compute_statistics(frame_results, id_set)
        if output_dir is not None:
            self.export_results(frame_results, Path(output_dir))
        self.logger.info(
            "tracked %d frames: %d unique ids", len(frame_results), len(id_set)
        )
        return frame_results

    def _compute_statistics(
        self, frame_results: list[FrameResult], id_set: set[int]
    ) -> dict[str, Any]:
        lengths = defaultdict(int)
        for fr in frame_results:
            for d in fr.detections:
                if d.track_id is not None:
                    lengths[d.track_id] += 1
        return {
            "total_frames": len(frame_results),
            "unique_tracks": len(id_set),
            "avg_track_length": float(np.mean(list(lengths.values()))) if lengths else 0.0,
            "max_track_length": int(max(lengths.values())) if lengths else 0,
        }

    # ------------------------------------------------------------- exports
    def export_results(
        self, frame_results: list[FrameResult], output_dir: Path
    ) -> dict[str, Path]:
        """tracks.json / tracks.csv / tracks_mot.csv + statistics
        (reference :237-378)."""
        output_dir.mkdir(parents=True, exist_ok=True)
        exporter = TrajectoryExporter(output_dir)
        paths = {
            "csv": exporter.export_csv(frame_results),
            "mot": exporter.export_mot_csv(frame_results),
            "json": exporter.export_json(frame_results),
            "frame_index": exporter.export_frame_index(frame_results),
        }
        stats_path = output_dir / "tracking_statistics.json"
        stats_path.write_text(json.dumps(self.statistics, indent=2), encoding="utf-8")
        paths["statistics"] = stats_path
        return paths

    # ------------------------------------------- dense-interval aggregation
    def aggregate_to_output_intervals(
        self,
        frame_results: list[FrameResult],
        output_interval_minutes: float | None = None,
    ) -> list[FrameResult]:
        """Dense tracking (e.g. 10 s) -> sparse output windows (e.g. 5 min)
        with per-window track-id dedup (reference :388-483): each window keeps
        one representative detection per track id (the highest-confidence
        one), so a person seen in 30 dense frames counts once per window.
        """
        from datetime import datetime

        if output_interval_minutes is None:
            output_interval_minutes = float(
                self.config.get("video.dense_tracking.output_interval_minutes", 5)
            )
        window_s = output_interval_minutes * 60.0
        windows: dict[int, dict[int, Any]] = defaultdict(dict)  # win -> id -> det
        window_meta: dict[int, FrameResult] = {}
        for fr in frame_results:
            ts = fr.timestamp
            if isinstance(ts, str):
                ts = datetime.fromisoformat(ts)
            if ts is None:
                continue
            win = int(ts.timestamp() // window_s)
            if win not in window_meta:
                window_meta[win] = fr
            for d in fr.detections:
                if d.track_id is None:
                    continue
                cur = windows[win].get(d.track_id)
                if cur is None or d.confidence > cur.confidence:
                    windows[win][d.track_id] = d
        out = []
        # Iterate every observed window (window_meta), not just windows that
        # got tracked detections: an interval with zero tracked people must
        # still appear downstream as a zero-count row, and a detection-free
        # run must not lose its frames entirely.
        for win in sorted(window_meta):
            rep = window_meta[win]
            out.append(
                FrameResult(
                    frame_number=rep.frame_number,
                    timestamp=rep.timestamp,
                    detections=list(windows[win].values()) if win in windows else [],
                    frame_path=rep.frame_path,
                )
            )
        return out

    def cleanup(self) -> None:
        if self.reid is not None:
            self.reid.cleanup()
        self.reid = None
