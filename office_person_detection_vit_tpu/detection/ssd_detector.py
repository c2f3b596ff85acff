"""SingleShotDetector facade — the alternate detector behind the same
pluggable contract as DETRDetector (reference yolov8_detector.py:19-24:
"provides the same interface as ViTDetector", including the
``get_attention_map`` compatibility stub :243-254).
"""

from __future__ import annotations

import logging
import time
from functools import partial
from pathlib import Path
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..core.dto import Detection, DetectionBatch
from ..models.single_shot import (
    SingleShotConfig,
    SingleShotDetector,
    decode_single_shot,
    init_single_shot,
)
from ..ops.preprocessing import preprocess_frames
from .features import crop_histogram_features

logger = logging.getLogger(__name__)


class SSDDetector:
    """Anchor-free single-shot person detector (same API as DETRDetector)."""

    def __init__(self, config: Any = None, *, ss_config: SingleShotConfig | None = None):
        get = (lambda k, d: config.get(k, d)) if config is not None else (lambda k, d: d)
        self.confidence_threshold = float(get("detection.confidence_threshold", 0.5))
        self.batch_size = int(get("detection.batch_size", 8))
        self.input_hw = (
            int(get("detection.input_height", 736)),
            int(get("detection.input_width", 1280)),
        )
        self.checkpoint_path = get("detection.checkpoint_path", None)
        if ss_config is None:
            common = dict(
                dtype=str(get("detection.dtype", "bfloat16")),
                nms_iou_threshold=float(get("detection.nms_threshold", 0.45)),
            )
            if str(get("detection.model_size", "full")) == "tiny":
                ss_config = SingleShotConfig.tiny(
                    nms_iou_threshold=common["nms_iou_threshold"]
                )
            else:
                ss_config = SingleShotConfig(**common)
        self.ss_config = ss_config
        # Same DP mesh contract as DETRDetector (parallel.mesh.data = -1
        # shards the frame batch over all visible devices; 1 disables).
        self.data_parallel = int(get("parallel.mesh.data", -1))
        self.mesh = None
        self._data_size = 1
        self.model: SingleShotDetector | None = None
        self.variables = None
        self._jit_detect = None
        self.last_inference_time = 0.0

    # Hooks the YOLOv8 facade (yolo_detector.py) overrides ---------------
    def _make_model(self):
        """Returns the bare flax module (for checkpoint restore)."""
        return SingleShotDetector(self.ss_config)

    def _random_init(self, rng):
        """Returns (model, variables) with random weights."""
        return init_single_shot(self.ss_config, rng, input_hw=(64, 64))

    def _decode(self, out: dict, orig_wh, conf):
        """Raw forward outputs -> DetectionBatch (runs inside the jit)."""
        return decode_single_shot(out, orig_wh, self.input_hw, self.ss_config, conf)

    def load_model(self) -> None:
        rng = jax.random.PRNGKey(0)
        ckpt = self.checkpoint_path
        p = Path(str(ckpt)) if ckpt else None
        if p is not None and (p.is_dir() or (p.is_file() and p.suffix == ".npz")):
            # Orbax dir or the trainer's flat-leaf weights.npz
            # (tools/train_detr.py --model yolo/ssd output) — npz needs the
            # random-init variables as the tree template.
            from ..models.weights import load_any_checkpoint

            self.model, template = self._random_init(rng)
            self.variables = load_any_checkpoint(p, template=template)
            logger.info("loaded checkpoint from %s", ckpt)
        else:
            if ckpt:
                logger.warning("checkpoint %s not found; using random init", ckpt)
            self.model, self.variables = self._random_init(rng)
        self._setup_mesh()
        self.variables = jax.device_put(self.variables)
        self._build_jits()

    def _setup_mesh(self) -> None:
        from ..parallel.mesh import make_mesh

        # Local devices only: on a pod slice each process detects its own
        # shard (host fetches cannot touch non-addressable devices).
        devices = jax.local_devices()
        n = len(devices)
        dp = self.data_parallel if self.data_parallel != -1 else n
        if dp > n:
            logger.warning(
                "parallel config wants %d devices but only %d visible; "
                "falling back to single-device", dp, n,
            )
        if dp <= 1 or dp > n:
            self.mesh = None
            self._data_size = 1
            return
        self.mesh = make_mesh(dp, devices=devices)
        self._data_size = dp
        if self.batch_size % dp:
            self.batch_size = ((self.batch_size + dp - 1) // dp) * dp

    def _build_jits(self) -> None:
        model = self.model
        target_hw = self.input_hw
        decode = self._decode
        out_dtype = self.ss_config.jnp_dtype

        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..parallel.mesh import DATA_AXIS

            rep = NamedSharding(self.mesh, P())
            data_sh = NamedSharding(self.mesh, P(DATA_AXIS))
            var_sh = jax.tree_util.tree_map(lambda _: rep, self.variables)
            jit_kwargs = dict(
                in_shardings=(var_sh, data_sh, rep, rep),
                out_shardings=(data_sh, data_sh),
            )
        else:
            jit_kwargs = {}

        @partial(jax.jit, **jit_kwargs)
        def _detect(variables, frames_u8, orig_wh, conf):
            pixels, _mask = preprocess_frames(
                frames_u8, target_hw=target_hw, out_dtype=out_dtype
            )
            out = model.apply(variables, pixels, deterministic=True)
            batch = decode(out, orig_wh, conf)
            return batch, out["features"]

        conf_default = self.confidence_threshold

        def _detect_with_conf(variables, frames_u8, orig_wh, conf=None):
            c = jnp.asarray(conf_default if conf is None else conf, jnp.float32)
            return _detect(variables, frames_u8, orig_wh, c)

        # Raw jitted program for re-jitting callers (profiler, graft entry):
        # tracing through the wrapper would bake `variables` in as HLO
        # constants, which blows the remote-compile request past the
        # tunnel's size limit for the large YOLO variants (HTTP 413).
        _detect_with_conf.jitted = _detect
        self._jit_detect = _detect_with_conf

    # Same batched surface as DETRDetector ------------------------------
    def detect_batch(self, frames: np.ndarray) -> DetectionBatch:
        if self.model is None:
            self.load_model()
        F, H, W, _ = frames.shape
        pad = (-F) % self.batch_size
        if pad:
            frames = np.concatenate([frames, np.zeros((pad, H, W, 3), np.uint8)])
        orig_wh = jnp.asarray([W, H], jnp.float32)
        t0 = time.perf_counter()
        chunks = []
        for i in range(0, len(frames), self.batch_size):
            batch, _ = self._jit_detect(
                self.variables, jnp.asarray(frames[i : i + self.batch_size]), orig_wh
            )
            chunks.append(batch)
        jax.block_until_ready(chunks[-1].scores)
        self.last_inference_time = time.perf_counter() - t0
        return DetectionBatch(
            boxes_xywh=jnp.concatenate([c.boxes_xywh for c in chunks])[:F],
            scores=jnp.concatenate([c.scores for c in chunks])[:F],
            valid=jnp.concatenate([c.valid for c in chunks])[:F],
            foot=jnp.concatenate([c.foot for c in chunks])[:F],
        )

    def detect(self, frame: np.ndarray) -> list[Detection]:
        return self.detect_batch(frame[None]).to_frame_results()[0].detections

    def detect_with_features(self, frame: np.ndarray):
        dets = self.detect(frame)
        feats = crop_histogram_features(
            frame, np.asarray([d.bbox for d in dets], np.float32).reshape(-1, 4)
        )
        for d, f in zip(dets, feats):
            d.feature = f
        return dets, feats

    def extract_features(self, frame: np.ndarray, bboxes) -> np.ndarray:
        return crop_histogram_features(frame, np.asarray(bboxes, np.float32))

    def get_attention_map(self, frame: np.ndarray) -> np.ndarray | None:
        """Compatibility stub — conv detectors have no attention
        (reference yolov8_detector.py:243-254 behavior)."""
        return None

    def cleanup(self) -> None:
        self.variables = None
        self._jit_detect = None


def build_detector(config: Any):
    """Detector factory keyed on ``detection.model``
    ("detr" | "ssd" | "yolo")."""
    model = str(config.get("detection.model", "detr")).lower()
    if model in ("ssd", "single_shot", "fcos"):
        return SSDDetector(config)
    if model in ("yolo", "yolov8"):
        from .yolo_detector import YOLODetector

        return YOLODetector(config)
    from .detector import DETRDetector

    return DETRDetector(config)
