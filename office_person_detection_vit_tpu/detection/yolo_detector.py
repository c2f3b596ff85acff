"""YOLOv8 detector facade — the TPU-native counterpart of the reference's
shipping detector (reference src/detection/yolov8_detector.py: fine-tuned
ultralytics YOLOv8 behind the ViTDetector-shaped interface, :19-24).

Same pluggable contract as DETRDetector / SSDDetector; reuses the whole
SSDDetector execution path (DP mesh, single-jit detect program, chunked
dispatch) and swaps the model family + decode via the facade hooks.

Checkpoints (``detection.checkpoint_path``):
  * orbax directory — the framework's own fine-tune output,
  * torch ``.pt``/``.pth``/``.bin`` containing an ultralytics
    ``DetectionModel`` state_dict — converted on load
    (models/weights.py::convert_yolov8_state_dict), mirroring the
    reference's ``best.pt`` load (yolov8_detector.py:77-83).
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Any

import jax

from ..models.yolo import YOLOConfig, YOLOv8, decode_yolo, init_yolo
from .ssd_detector import SSDDetector

logger = logging.getLogger(__name__)


class YOLODetector(SSDDetector):
    """Anchor-free YOLOv8 person detector (same API as DETRDetector)."""

    def __init__(self, config: Any = None, *, yolo_config: YOLOConfig | None = None):
        super().__init__(config)
        get = (lambda k, d: config.get(k, d)) if config is not None else (lambda k, d: d)
        if yolo_config is None:
            common = dict(
                variant=str(get("detection.yolo_variant", "x")),
                dtype=str(get("detection.dtype", "bfloat16")),
                nms_iou_threshold=float(get("detection.nms_threshold", 0.45)),
            )
            if str(get("detection.model_size", "full")) == "tiny":
                yolo_config = YOLOConfig.tiny(
                    nms_iou_threshold=common["nms_iou_threshold"]
                )
            else:
                yolo_config = YOLOConfig(**common)
        # ss_config is the facade's generic model-config slot (the base
        # class only touches .jnp_dtype from it).
        self.ss_config = self.yolo_config = yolo_config

    # SSDDetector hooks --------------------------------------------------
    def _make_model(self):
        return YOLOv8(self.yolo_config)

    def _random_init(self, rng):
        return init_yolo(self.yolo_config, rng, input_hw=(64, 64))

    def _decode(self, out: dict, orig_wh, conf):
        return decode_yolo(out, orig_wh, self.input_hw, self.yolo_config, conf)

    def load_model(self) -> None:
        ckpt = self.checkpoint_path
        p = Path(str(ckpt)) if ckpt else None
        if p is not None and p.is_file() and p.suffix in (".pt", ".pth", ".bin"):
            import torch

            from ..models.weights import convert_yolov8_state_dict

            sd = torch.load(str(p), map_location="cpu", weights_only=True)
            if isinstance(sd, dict) and "model" in sd and isinstance(sd["model"], dict):
                sd = sd["model"]
            self.model = self._make_model()
            self.variables = convert_yolov8_state_dict(sd)
            logger.info("converted ultralytics state_dict from %s", p)
            self._setup_mesh()
            self.variables = jax.device_put(self.variables)
            self._build_jits()
            return
        super().load_model()
