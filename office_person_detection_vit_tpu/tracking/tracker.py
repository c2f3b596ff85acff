"""Multi-object tracker: DeepSORT-style appearance + ByteTrack two-stage +
matching cascade.

Behavior parity with the reference Tracker (src/tracking/tracker.py:71-315),
association stages in the same order:
  1. appearance-only on high-confidence detections vs confirmed tracks
     (cosine distance < 0.3, reference :146-157);
  2. weighted appearance+IoU on the remainder (:159-168);
  3. IoU-only fallback (:170-180);
  4. ByteTrack low-confidence rescue, IoU-only (:182-197);
  5. tentative-track matching, IoU-only (:199-210).
All stages gate candidate pairs by Kalman-predicted position distance
(max_position_distance, reference :285-290). Cost matrices are single jnp
broadcast/einsum expressions (SimilarityCalculator); assignment is exact LAP
with greedy fallback (ops/assignment).
"""

from __future__ import annotations

import logging

import numpy as np

from ..core.dto import Detection
from ..ops.assignment import solve_lap
from .similarity import SimilarityCalculator
from .track import Track, TrackState

logger = logging.getLogger(__name__)

APPEARANCE_GATE = 0.3  # stage-1 cosine-distance acceptance
COMBINED_GATE = 0.7  # stage-2 fused-cost acceptance
HIGH_CONF_THRESHOLD = 0.3  # split for ByteTrack stages
LOW_CONF_FLOOR = 0.1  # detections below this are discarded entirely


class Tracker:
    def __init__(
        self,
        max_age: int = 100,
        min_hits: int = 1,
        iou_threshold: float = 0.5,
        appearance_weight: float = 0.9,
        motion_weight: float = 0.1,
        max_position_distance: float = 10000.0,
        high_conf_threshold: float = HIGH_CONF_THRESHOLD,
    ):
        self.max_age = int(max_age)
        self.min_hits = int(min_hits)
        self.iou_threshold = float(iou_threshold)
        self.max_position_distance = float(max_position_distance)
        self.high_conf_threshold = float(high_conf_threshold)
        self.similarity = SimilarityCalculator(appearance_weight, motion_weight)
        self.tracks: list[Track] = []
        self._next_id = 1
        self.frame_count = 0

    @classmethod
    def from_config(cls, cfg) -> "Tracker":
        return cls(
            max_age=cfg.get("tracking.max_age", 100),
            min_hits=cfg.get("tracking.min_hits", 1),
            iou_threshold=cfg.get("tracking.iou_threshold", 0.5),
            appearance_weight=cfg.get("tracking.appearance_weight", 0.9),
            motion_weight=cfg.get("tracking.motion_weight", 0.1),
            max_position_distance=cfg.get("tracking.max_position_distance", 10000.0),
        )

    # ------------------------------------------------------------------ API
    def update(
        self, detections: list[Detection], timestamp: float | None = None
    ) -> list[Track]:
        """Advance one frame. Returns currently-confirmed tracks."""
        self.frame_count += 1
        for t in self.tracks:
            t.predict(timestamp)

        detections = [d for d in detections if d.confidence >= LOW_CONF_FLOOR]
        high = [d for d in detections if d.confidence >= self.high_conf_threshold]
        low = [d for d in detections if d.confidence < self.high_conf_threshold]

        confirmed = [t for t in self.tracks if t.state == TrackState.CONFIRMED]
        tentative = [t for t in self.tracks if t.state == TrackState.TENTATIVE]

        matches, um_tracks, um_high = self._associate(confirmed, high)

        # Stage 4: ByteTrack rescue — leftover confirmed tracks vs low-conf.
        rescue, um_tracks, _ = self._match_iou(um_tracks, low, self.iou_threshold)
        matches += rescue

        # Stage 5: tentative tracks vs remaining high-conf detections.
        tent_matches, um_tent, um_high = self._match_iou(
            tentative, um_high, self.iou_threshold
        )
        matches += tent_matches

        for track, det in matches:
            track.update(det, timestamp)
            det.track_id = track.track_id
        for track in um_tracks + um_tent:
            track.mark_missed(self.max_age)
        for det in um_high:
            self._initiate(det, timestamp)

        self.tracks = [t for t in self.tracks if not t.is_deleted]
        return self.get_confirmed_tracks()

    def get_confirmed_tracks(self) -> list[Track]:
        return [t for t in self.tracks if t.is_confirmed]

    def reset(self) -> None:
        self.tracks = []
        self._next_id = 1
        self.frame_count = 0

    # ------------------------------------------------------------ internals
    def _initiate(self, det: Detection, timestamp: float | None) -> None:
        self.tracks.append(
            Track(self._next_id, det, timestamp or 0.0, min_hits=self.min_hits)
        )
        det.track_id = self._next_id
        self._next_id += 1

    def _position_gate(self, tracks: list[Track], dets: list[Detection]) -> np.ndarray:
        """(T, D) bool — True where the pair passes the distance gate."""
        if not tracks or not dets:
            return np.zeros((len(tracks), len(dets)), bool)
        tp = np.asarray([t.predicted_center for t in tracks], np.float32)
        dp = np.asarray([d.center for d in dets], np.float32)
        dist = self.similarity.position_distance_matrix(tp, dp)
        return dist <= self.max_position_distance

    @staticmethod
    def _take(
        pairs: list[tuple[int, int]],
        cost: np.ndarray,
        gate: np.ndarray,
        accept: float,
    ) -> list[tuple[int, int]]:
        return [
            (r, c)
            for r, c in pairs
            if gate[r, c] and cost[r, c] <= accept
        ]

    def _associate(
        self, tracks: list[Track], dets: list[Detection]
    ) -> tuple[list[tuple[Track, Detection]], list[Track], list[Detection]]:
        """Stages 1-3 over confirmed tracks and high-confidence detections."""
        matches: list[tuple[Track, Detection]] = []
        rem_t = list(tracks)
        rem_d = list(dets)

        # ---- Stage 1: appearance only (tracks and dets must have features).
        t_feat_idx = [i for i, t in enumerate(rem_t) if t.get_smoothed_feature() is not None]
        d_feat_idx = [j for j, d in enumerate(rem_d) if d.feature is not None]
        if t_feat_idx and d_feat_idx:
            tf = np.stack([rem_t[i].get_smoothed_feature() for i in t_feat_idx])
            df = np.stack([np.asarray(rem_d[j].feature, np.float32) for j in d_feat_idx])
            dfn = df / np.maximum(np.linalg.norm(df, axis=1, keepdims=True), 1e-12)
            cost = self.similarity.cosine_distance_matrix(tf, dfn)
            gate = self._position_gate(
                [rem_t[i] for i in t_feat_idx], [rem_d[j] for j in d_feat_idx]
            )
            cost_gated = np.where(gate, cost, 1e9)
            pairs = self._take(solve_lap(cost_gated), cost, gate, APPEARANCE_GATE)
            matched_t = {t_feat_idx[r] for r, _ in pairs}
            matched_d = {d_feat_idx[c] for _, c in pairs}
            matches += [(rem_t[t_feat_idx[r]], rem_d[d_feat_idx[c]]) for r, c in pairs]
            rem_t = [t for i, t in enumerate(rem_t) if i not in matched_t]
            rem_d = [d for j, d in enumerate(rem_d) if j not in matched_d]

        # ---- Stage 2: weighted appearance + IoU.
        t_feat_idx = [i for i, t in enumerate(rem_t) if t.get_smoothed_feature() is not None]
        d_feat_idx = [j for j, d in enumerate(rem_d) if d.feature is not None]
        if t_feat_idx and d_feat_idx:
            sub_t = [rem_t[i] for i in t_feat_idx]
            sub_d = [rem_d[j] for j in d_feat_idx]
            tf = np.stack([t.get_smoothed_feature() for t in sub_t])
            df = np.stack([np.asarray(d.feature, np.float32) for d in sub_d])
            dfn = df / np.maximum(np.linalg.norm(df, axis=1, keepdims=True), 1e-12)
            cost = self.similarity.combined_cost_matrix(
                tf, dfn,
                np.asarray([t.bbox for t in sub_t], np.float32),
                np.asarray([d.bbox for d in sub_d], np.float32),
            )
            gate = self._position_gate(sub_t, sub_d)
            pairs = self._take(solve_lap(np.where(gate, cost, 1e9)), cost, gate, COMBINED_GATE)
            matched_t = {t_feat_idx[r] for r, _ in pairs}
            matched_d = {d_feat_idx[c] for _, c in pairs}
            matches += [(rem_t[t_feat_idx[r]], rem_d[d_feat_idx[c]]) for r, c in pairs]
            rem_t = [t for i, t in enumerate(rem_t) if i not in matched_t]
            rem_d = [d for j, d in enumerate(rem_d) if j not in matched_d]

        # ---- Stage 3: IoU-only fallback.
        iou_matches, rem_t, rem_d = self._match_iou(rem_t, rem_d, self.iou_threshold)
        matches += iou_matches
        return matches, rem_t, rem_d

    def _match_iou(
        self, tracks: list[Track], dets: list[Detection], iou_threshold: float
    ) -> tuple[list[tuple[Track, Detection]], list[Track], list[Detection]]:
        if not tracks or not dets:
            return [], list(tracks), list(dets)
        cost = self.similarity.iou_distance_matrix(
            np.asarray([t.bbox for t in tracks], np.float32),
            np.asarray([d.bbox for d in dets], np.float32),
        )
        gate = self._position_gate(tracks, dets)
        pairs = self._take(
            solve_lap(np.where(gate, cost, 1e9)), cost, gate, 1.0 - iou_threshold
        )
        matched_t = {r for r, _ in pairs}
        matched_d = {c for _, c in pairs}
        return (
            [(tracks[r], dets[c]) for r, c in pairs],
            [t for i, t in enumerate(tracks) if i not in matched_t],
            [d for j, d in enumerate(dets) if j not in matched_d],
        )
