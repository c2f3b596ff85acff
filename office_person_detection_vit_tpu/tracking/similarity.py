"""Similarity / cost computation for online tracking, host-side numpy.

Capability parity with the reference SimilarityCalculator
(src/tracking/similarity.py:16-220): cosine similarity/distance on
L2-normalized features, IoU + IoU distance, weighted appearance+motion
fusion, pairwise matrices — computed as single matmul/broadcast expressions
(the vectorized replacement for the per-pair Python loops).

These matrices are small (tracks x detections, typically tens) and feed a
host-side association loop every frame, so they run in numpy: on a
remote-device backend an eager device op here would cost a network round
trip per matrix. The device-side jitted IoU lives in ops/boxes.py and is
used by the batched matcher/criterion/benchmark paths.
"""

from __future__ import annotations

import numpy as np


class SimilarityCalculator:
    def __init__(self, appearance_weight: float = 0.9, motion_weight: float = 0.1):
        if abs(appearance_weight + motion_weight - 1.0) > 1e-6:
            raise ValueError("appearance_weight + motion_weight must sum to 1.0")
        self.appearance_weight = float(appearance_weight)
        self.motion_weight = float(motion_weight)

    # ------------------------------------------------------------- features
    @staticmethod
    def cosine_similarity_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
        """(N, D) x (M, D) L2-normalized features -> (N, M) cosine sim."""
        if len(a) == 0 or len(b) == 0:
            return np.zeros((len(a), len(b)), np.float32)
        sim = np.asarray(a, np.float32) @ np.asarray(b, np.float32).T
        return np.clip(sim, -1.0, 1.0)

    @classmethod
    def cosine_distance_matrix(cls, a: np.ndarray, b: np.ndarray) -> np.ndarray:
        return 1.0 - cls.cosine_similarity_matrix(a, b)

    # ----------------------------------------------------------------- IoU
    @staticmethod
    def iou_matrix(boxes_a: np.ndarray, boxes_b: np.ndarray) -> np.ndarray:
        """(N, 4) x (M, 4) xywh -> (N, M) IoU (matches ops/boxes.py
        iou_matrix_xywh semantics)."""
        if len(boxes_a) == 0 or len(boxes_b) == 0:
            return np.zeros((len(boxes_a), len(boxes_b)), np.float32)
        a = np.asarray(boxes_a, np.float32)
        b = np.asarray(boxes_b, np.float32)
        ax1, ay1 = a[:, 0], a[:, 1]
        ax2, ay2 = a[:, 0] + a[:, 2], a[:, 1] + a[:, 3]
        bx1, by1 = b[:, 0], b[:, 1]
        bx2, by2 = b[:, 0] + b[:, 2], b[:, 1] + b[:, 3]
        ix1 = np.maximum(ax1[:, None], bx1[None, :])
        iy1 = np.maximum(ay1[:, None], by1[None, :])
        ix2 = np.minimum(ax2[:, None], bx2[None, :])
        iy2 = np.minimum(ay2[:, None], by2[None, :])
        inter = np.maximum(ix2 - ix1, 0.0) * np.maximum(iy2 - iy1, 0.0)
        area_a = np.maximum(ax2 - ax1, 0.0) * np.maximum(ay2 - ay1, 0.0)
        area_b = np.maximum(bx2 - bx1, 0.0) * np.maximum(by2 - by1, 0.0)
        union = area_a[:, None] + area_b[None, :] - inter
        return np.where(union > 0, inter / np.maximum(union, 1e-12), 0.0).astype(
            np.float32
        )

    @classmethod
    def iou_distance_matrix(cls, boxes_a: np.ndarray, boxes_b: np.ndarray) -> np.ndarray:
        return 1.0 - cls.iou_matrix(boxes_a, boxes_b)

    # --------------------------------------------------------------- fusion
    def combined_cost_matrix(
        self,
        track_features: np.ndarray,
        det_features: np.ndarray,
        track_boxes: np.ndarray,
        det_boxes: np.ndarray,
    ) -> np.ndarray:
        """appearance_weight * cos_dist + motion_weight * iou_dist."""
        app = self.cosine_distance_matrix(track_features, det_features)
        iou = self.iou_distance_matrix(track_boxes, det_boxes)
        return self.appearance_weight * app + self.motion_weight * iou

    @staticmethod
    def position_distance_matrix(pos_a: np.ndarray, pos_b: np.ndarray) -> np.ndarray:
        """(N, 2) x (M, 2) Euclidean distances."""
        if len(pos_a) == 0 or len(pos_b) == 0:
            return np.zeros((len(pos_a), len(pos_b)), np.float32)
        d = np.asarray(pos_a, np.float32)[:, None, :] - np.asarray(pos_b, np.float32)[None, :, :]
        return np.linalg.norm(d, axis=-1).astype(np.float32)
