"""Re-ID appearance-feature extraction facade.

Capability parity with the reference ReIDFeatureExtractor
(src/tracking/reid_feature_extractor.py:369-463): a facade selecting between
appearance models with a graceful fallback chain. In this framework the
primary path is the DETR encoder ROI features (detection/features.py,
config ``tracking.reid.enabled=false`` path in the reference config.yaml:81);
an optional CLIP image tower is used when the transformers Flax weights are
locally available, and the crop-histogram extractor is the terminal fallback
(reference fallback chain :210-258).
"""

from __future__ import annotations

import logging

import numpy as np

from ..detection.features import crop_histogram_features

logger = logging.getLogger(__name__)


class ReIDFeatureExtractor:
    def __init__(
        self,
        model_type: str = "detr",
        model_name: str | None = None,
        model_path: str | None = None,
        detector=None,
    ):
        self.model_type = model_type
        self.model_name = model_name
        self.model_path = model_path
        self.detector = detector
        self.backend = "histogram"
        self.feature_dim = 256

    @classmethod
    def from_config(cls, cfg, detector=None) -> "ReIDFeatureExtractor":
        return cls(
            model_type=str(cfg.get("tracking.reid.model_type", "detr")),
            model_name=cfg.get("tracking.reid.model_name", None),
            model_path=cfg.get("tracking.reid.model_path", None),
            detector=detector,
        )

    def cleanup(self) -> None:
        self.detector = None

    def load_model(self) -> None:
        """Resolve the best available backend (fallback chain)."""
        if self.model_type == "detr" and self.detector is not None:
            self.backend = "detr"
            self.feature_dim = self.detector.detr_config.d_model
            logger.info("ReID backend: DETR encoder ROI features (%d-d)", self.feature_dim)
            return
        if self.model_type == "clip":
            try:
                from transformers import FlaxCLIPModel

                source = self.model_path or self.model_name
                if not source:
                    raise ValueError("tracking.reid.model_path/model_name not set")
                # local_files_only: the deployment has no network egress —
                # only a locally downloaded checkpoint can satisfy this.
                self._clip = FlaxCLIPModel.from_pretrained(
                    source, local_files_only=True
                )
                self.backend = "clip"
                self.feature_dim = int(self._clip.config.projection_dim)
                logger.info("ReID backend: CLIP image tower (%d-d)", self.feature_dim)
                return
            except Exception as e:
                logger.warning("CLIP unavailable (%s); falling back to histogram", e)
        self.backend = "histogram"
        self.feature_dim = 256
        logger.info("ReID backend: crop histograms (256-d)")

    def extract_features(
        self, frame: np.ndarray, bboxes: list[tuple[float, float, float, float]]
    ) -> np.ndarray:
        """(N boxes) -> (N, feature_dim) L2-normalized features."""
        if not bboxes:
            return np.zeros((0, self.feature_dim), np.float32)
        if self.backend == "detr" and self.detector is not None:
            dets, _ = self.detector.detect_with_features(frame)
            # Detector features are per-detection; match requested boxes by
            # nearest IoU, else histogram fallback per box.
            if dets:
                from .similarity import SimilarityCalculator

                iou = SimilarityCalculator.iou_matrix(
                    np.asarray(bboxes, np.float32),
                    np.asarray([d.bbox for d in dets], np.float32),
                )
                out = np.zeros((len(bboxes), self.feature_dim), np.float32)
                best = iou.argmax(axis=1)
                for i, j in enumerate(best):
                    if iou[i, j] > 0.5 and dets[j].feature is not None:
                        out[i] = dets[j].feature
                    else:
                        out[i] = crop_histogram_features(
                            frame, np.asarray([bboxes[i]], np.float32), dim=self.feature_dim
                        )[0]
                return out
        if self.backend == "clip":
            return self._extract_clip(frame, bboxes)
        return crop_histogram_features(
            frame, np.asarray(bboxes, np.float32), dim=self.feature_dim
        )

    def _extract_clip(self, frame: np.ndarray, bboxes) -> np.ndarray:
        """Crop -> 224x224 -> CLIP-normalize -> image tower -> L2 norm
        (reference reid_feature_extractor.py:51-172 CLIP path)."""
        import cv2
        import jax.numpy as jnp

        mean = np.asarray([0.48145466, 0.4578275, 0.40821073], np.float32)
        std = np.asarray([0.26862954, 0.26130258, 0.27577711], np.float32)
        crops = []
        H, W = frame.shape[:2]
        for x, y, w, h in bboxes:
            x0, y0 = max(int(x), 0), max(int(y), 0)
            x1, y1 = min(int(x + w), W), min(int(y + h), H)
            crop = frame[y0:y1, x0:x1]
            if crop.size == 0:
                crop = np.zeros((8, 8, 3), np.uint8)
            crop = cv2.resize(crop, (224, 224))[..., ::-1]  # BGR -> RGB
            crops.append((crop.astype(np.float32) / 255.0 - mean) / std)
        pixels = jnp.asarray(np.stack(crops)).transpose(0, 3, 1, 2)
        feats = np.asarray(self._clip.get_image_features(pixel_values=pixels))
        norms = np.maximum(np.linalg.norm(feats, axis=1, keepdims=True), 1e-12)
        return (feats / norms).astype(np.float32)
