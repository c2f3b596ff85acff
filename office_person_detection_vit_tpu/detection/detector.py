"""DETRDetector — the framework's primary detector behind the pluggable
detector contract.

API parity with the reference detectors (ViTDetector spec
.kiro/specs/office-person-detection/design.md:235-268; YOLOv8Detector facade
src/detection/yolov8_detector.py:70-254): ``load_model`` / ``detect`` /
``detect_batch`` / ``detect_with_features`` / ``extract_features`` /
``get_attention_map`` — but the hot path is one jitted program over a whole
frame batch: fused preprocess -> DETR forward -> fixed-shape postprocess,
a single host->device transfer per batch instead of per frame
(SURVEY.md §3.1 "✂ host→device→host per frame").
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
from ..models.detr import DETR, DETRConfig, init_detr
from ..models.postprocess import postprocess_detr
from ..ops.preprocessing import (
    bgr_to_i420,
    i420_delta_encode,
    preprocess_frames,
    preprocess_frames_i420,
    reconstruct_i420_delta,
)
from .features import crop_histogram_features, roi_mean_pool

logger = logging.getLogger(__name__)


def _host_merge(chunks: list[DetectionBatch], n: int) -> DetectionBatch:
    """Materialize per-chunk results on host and strip padding in numpy.

    Deliberately NOT a jit: slicing to the caller's frame count would bake a
    static shape per distinct n, and over a remote-device backend every new
    program is a fresh compile (tens of seconds — docs/performance.md
    "dispatch hygiene"). Partial/multi-chunk callers consume results on host
    immediately anyway; the full-batch fast path in detect_batch returns
    device arrays untouched.
    """
    fields = {}
    for name in ("boxes_xywh", "scores", "valid", "foot"):
        parts = [np.asarray(getattr(c, name)) for c in chunks]
        fields[name] = (parts[0] if len(parts) == 1 else np.concatenate(parts))[:n]
    return DetectionBatch(**fields)


class DETRDetector:
    """Batched DETR person detector on TPU (or any JAX backend)."""

    def __init__(self, config: Any = None, *, detr_config: DETRConfig | None = None):
        get = (lambda k, d: config.get(k, d)) if config is not None else (lambda k, d: d)
        self.confidence_threshold = float(get("detection.confidence_threshold", 0.5))
        self.batch_size = int(get("detection.batch_size", 4))
        self.input_hw = (
            int(get("detection.input_height", 736)),
            int(get("detection.input_width", 1280)),
        )
        self.checkpoint_path = get("detection.checkpoint_path", None)
        # Optional greedy NMS over the query set (reference detector
        # contract nms_threshold, config.yaml.disabled:38). None = off (the
        # DETR-paper default); set for reduced-scale focal checkpoints
        # whose set loss has not fully learned duplicate suppression.
        _nms = get("detection.nms_threshold", None)
        self.nms_threshold = float(_nms) if _nms is not None else None
        self.device_pref = str(get("detection.device", "auto"))
        # "i420" ships 1.5 bytes/px instead of 3 over the host->device link
        # (the video source is 4:2:0 anyway, so no extra information loss);
        # the YUV->RGB matrix is fused on-device. "i420d" additionally XOR
        # delta-encodes consecutive frames (ops/preprocessing.py
        # i420_delta_encode): timelapse/dense-tracking frames are mostly
        # static, so the deltas are near-zero and the tunnel's wire
        # compression collapses them — reconstruction on device is an exact
        # XOR scan (byte-identical pixels). "bgr" skips the host cvtColor;
        # "auto" races the formats on the first real batch and locks in the
        # winner (effective bandwidth per layout is deployment-specific).
        self.transfer_format = str(get("detection.transfer_format", "bgr"))
        # Multi-chip (config schema parallel.mesh.{data,model}): data=-1
        # shards the frame batch over all visible devices whenever >1 is
        # present (SURVEY.md §2.9 — DP is the natural analog of the
        # reference's frame loop, reference
        # src/pipeline/phases/detection.py:56-133); an explicit int pins the
        # data-axis size; 1 disables. model > 1 additionally TP-shards the
        # transformer per parallel/sharding.py rules.
        self.data_parallel = int(get("parallel.mesh.data", -1))
        self.model_parallel = int(get("parallel.mesh.model", 1))
        self.mesh = None
        self._data_size = 1
        if detr_config is None:
            common = dict(
                num_queries=int(get("detection.num_queries", 100)),
                dtype=str(get("detection.dtype", "bfloat16")),
                use_pallas_attention=bool(get("detection.use_pallas_attention", False)),
                # DETR-DC5 small-object variant (stride-16 C5).
                dilate_c5=bool(get("detection.dilate_c5", False)),
                # "softmax" (DETR CE head) | "sigmoid" (focal-trained head —
                # must match the checkpoint's training criterion).
                score_mode=str(get("detection.score_mode", "softmax")),
            )
            # detection.backbone: "resnet50" (default) or "vit" — the
            # spec'd ViT-era backbone, with the spec's patch_size key
            # (reference config.yaml.disabled:32-44).
            if str(get("detection.backbone", "resnet50")) == "vit":
                common.update(
                    backbone="vit",
                    vit_patch_size=int(get("detection.patch_size", 16)),
                )
            # model_size=tiny gives a small random-init model for tests and
            # multi-chip dry runs; "small" is the mid-capacity tier
            # (DETRConfig.small — generalizes on multi-object scenes where
            # tiny only memorizes); "full" is the DETR-ResNet50 architecture.
            model_size = str(get("detection.model_size", "full"))
            if model_size in ("tiny", "small"):
                # The tier fixes its own query count, but an explicitly
                # configured detection.num_queries must not be silently
                # discarded — downstream postprocess/tracking shapes depend
                # on it (ADVICE r4). ConfigManager deep-merges the schema
                # default (100) into every config, so "differs from 100" is
                # the explicitness signal available here.
                requested_q = common.pop("num_queries")
                if requested_q != 100:
                    common["num_queries"] = requested_q
                    logging.getLogger(__name__).warning(
                        "detection.num_queries=%d overrides the %s tier's "
                        "default query count", requested_q, model_size,
                    )
                if common.get("backbone") == "vit":
                    from ..models.vit import ViTConfig

                    t = ViTConfig.tiny()
                    common.update(
                        vit_patch_size=int(get("detection.patch_size", t.patch_size)),
                        vit_hidden=t.hidden_size, vit_layers=t.num_layers,
                        vit_heads=t.num_heads, vit_mlp=t.mlp_dim,
                        vit_pos_grid=t.pos_grid,
                    )
                detr_config = getattr(DETRConfig, model_size)(**common)
            else:
                detr_config = DETRConfig(**common)
        self.detr_config = detr_config
        #: pixels per feature-grid cell (ROI pooling / attention maps)
        self.feature_stride = (
            self.detr_config.vit_patch_size
            if self.detr_config.backbone == "vit"
            else (16 if self.detr_config.dilate_c5 else 32)
        )
        self.model: DETR | None = None
        self.variables = None
        self._jit_detect = None
        self._jit_features = None
        self.last_inference_time = 0.0
        self._last_encoder_chunks: list = []
        self._last_encoder_output = None
        self._last_frame_count = 0
        self._delta_prev_host: np.ndarray | None = None  # i420d chunk chain
        self._delta_prev_dev = None

    # ------------------------------------------------------------------ load
    def load_model(self) -> None:
        """Build the model and load weights.

        Weight resolution chain (mirrors the reference's fallback chain,
        yolov8_detector.py:77-83): explicit checkpoint (orbax dir, torch
        .pt/.bin/.safetensors via models/weights.py) -> random init with a
        warning (still functional for pipeline/e2e testing).
        """
        if self.device_pref == "cpu" and jax.default_backend() != "cpu":
            # Honor the reference's detection.device=cpu test configs.
            jax.config.update("jax_platforms", "cpu")
        rng = jax.random.PRNGKey(0)
        ckpt = self.checkpoint_path
        if ckpt and Path(str(ckpt)).exists():
            ckpt = Path(str(ckpt))
            from ..models.weights import load_any_checkpoint

            self.model, template = init_detr(
                self.detr_config, rng, input_hw=(64, 64)
            )
            self.variables = load_any_checkpoint(
                ckpt,
                template=template,
                num_encoder_layers=self.detr_config.num_encoder_layers,
                num_decoder_layers=self.detr_config.num_decoder_layers,
            )
            logger.info("loaded checkpoint from %s", ckpt)
        else:
            if ckpt:
                logger.warning("checkpoint %s not found; using random init", ckpt)
            self.model, self.variables = init_detr(
                self.detr_config, rng, input_hw=(64, 64)
            )
        self._setup_mesh()
        if self.mesh is not None:
            from ..parallel.inference import detect_shardings

            var_sh, _, _ = detect_shardings(
                self.mesh, self.variables, self.model_parallel > 1
            )
            self.variables = jax.tree_util.tree_map(
                jax.device_put, self.variables, var_sh
            )
        else:
            self.variables = jax.device_put(self.variables)
        self._build_jits()

    def _setup_mesh(self) -> None:
        """Build the (data, model) mesh for the product detect path.

        Degrades to None (plain single-device jit) on one chip; on a
        multi-device backend the frame batch is DP-sharded so each chip
        detects its shard — GSPMD inserts any collectives.

        Multi-host: the detect mesh spans only the LOCAL process's devices
        — detect_batch feeds host frames and fetches host results, which
        cannot touch non-addressable shards; on a pod slice each process
        detects its own video shard (the global mesh is the training
        path's concern, docs/architecture.md "Multi-host").
        """
        from ..parallel.mesh import make_mesh

        devices = jax.local_devices()
        n = len(devices)
        mp = max(1, self.model_parallel)
        dp = self.data_parallel
        if dp == -1:  # auto: all visible devices
            dp = max(1, n // mp)
        total = dp * mp
        if total <= 1:
            self.mesh = None
            self._data_size = 1
            return
        if total > n:
            logger.warning(
                "parallel config wants %d devices but only %d visible; "
                "falling back to single-device", total, n,
            )
            self.mesh = None
            self._data_size = 1
            return
        self.mesh = make_mesh(total, model_parallel=mp, devices=devices)
        self._data_size = dp
        if self.batch_size % dp:
            aligned = ((self.batch_size + dp - 1) // dp) * dp
            logger.info(
                "batch_size %d -> %d (multiple of data axis %d)",
                self.batch_size, aligned, dp,
            )
            self.batch_size = aligned

    def _build_jits(self) -> None:
        model = self.model
        person = self.detr_config.person_class_id
        target_hw = self.input_hw
        conf_default = self.confidence_threshold
        if self.mesh is not None:
            # DP/TP-sharded program: frames split over the data axis, params
            # replicated or TP-partitioned. Same jit otherwise — GSPMD turns
            # the annotations into the collective schedule.
            from ..parallel.inference import detect_shardings

            var_sh, data_sh, rep_sh = detect_shardings(
                self.mesh, self.variables, self.model_parallel > 1
            )
            jit_kwargs = dict(
                in_shardings=(var_sh, data_sh, rep_sh, rep_sh),
                # tuple output (DetectionBatch, encoder_output): every leaf
                # has a leading frame axis -> shard it over data.
                out_shardings=(data_sh, data_sh),
            )
        else:
            jit_kwargs = {}

        def build(mode: str):
            i420 = mode.startswith("i420")
            delta = mode == "i420d"

            # The confidence threshold is a TRACED scalar, not a baked
            # constant: changing detection.confidence_threshold between runs
            # must not recompile (or miss the persistent compilation cache).
            @partial(jax.jit, **jit_kwargs)
            def _detect(variables, frames_u8, orig_wh, conf):
                if i420:
                    pixels, mask = preprocess_frames_i420(
                        frames_u8, target_hw=target_hw,
                        out_dtype=model.config.jnp_dtype,
                    )
                else:
                    pixels, mask = preprocess_frames(
                        frames_u8, target_hw=target_hw,
                        out_dtype=model.config.jnp_dtype,
                    )
                out = model.apply(variables, pixels, mask, deterministic=True)
                batch = postprocess_detr(
                    out["logits"], out["boxes"], orig_wh, conf, person_class_id=person,
                    score_mode=self.detr_config.score_mode,
                    nms_iou=self.nms_threshold,
                )
                return batch, out["encoder_output"]

            @jax.jit
            def _detect_delta(variables, deltas_u8, prev_u8, orig_wh, conf):
                frames_u8 = reconstruct_i420_delta(deltas_u8, prev_u8)
                pixels, mask = preprocess_frames_i420(
                    frames_u8, target_hw=target_hw,
                    out_dtype=model.config.jnp_dtype,
                )
                out = model.apply(variables, pixels, mask, deterministic=True)
                batch = postprocess_detr(
                    out["logits"], out["boxes"], orig_wh, conf, person_class_id=person,
                    score_mode=self.detr_config.score_mode,
                    nms_iou=self.nms_threshold,
                )
                # The reconstructed last frame stays DEVICE-resident and
                # seeds the next chunk's XOR scan — no wire cost.
                return batch, out["encoder_output"], frames_u8[-1]

            def _detect_with_conf(variables, frames_u8, orig_wh, conf=None):
                # np scalar, not jnp: its transfer rides the jit call instead
                # of being a separate eager dispatch.
                c = np.float32(conf_default if conf is None else conf)
                if not delta:
                    return _detect(variables, frames_u8, orig_wh, c)
                payload = np.asarray(frames_u8)
                if (
                    self._delta_prev_host is None
                    or self._delta_prev_host.shape != payload.shape[1:]
                ):
                    # First chunk (or input geometry changed): zero seed.
                    # The zeros upload rides the call and compresses away.
                    self._delta_prev_host = np.zeros(payload.shape[1:], np.uint8)
                    self._delta_prev_dev = self._delta_prev_host
                deltas = i420_delta_encode(payload, self._delta_prev_host)
                batch, enc, last = _detect_delta(
                    variables, deltas, self._delta_prev_dev, orig_wh, c
                )
                self._delta_prev_host = payload[-1].copy()
                self._delta_prev_dev = last
                return batch, enc

            # The raw jitted program (purely functional, re-jittable) for
            # callers that bypass the host wrapper — __graft_entry__.entry.
            _detect_with_conf.jitted = _detect_delta if delta else _detect
            return _detect_with_conf

        # One jitted program per transfer format actually in use; "auto"
        # races them on the first real batch. The delta format's XOR scan
        # runs along the frame axis, so it stays single-device (a DP mesh
        # would turn the scan into cross-chip traffic for no wire benefit —
        # multi-chip deployments are locally attached anyway).
        if self.transfer_format == "auto":
            formats = ("bgr", "i420") + (("i420d",) if self.mesh is None else ())
        else:
            formats = (self.transfer_format,)
        if self.mesh is not None and "i420d" in formats:
            logger.warning("i420d transfer is single-device; using i420")
            formats = ("i420",)
            self.transfer_format = "i420"
        self._delta_prev_host = None
        self._delta_prev_dev = None
        self._jits = {fmt: build(fmt) for fmt in formats}
        self._jit_detect = self._jits[formats[0]]

    def _autotune_transfer(self, frames: np.ndarray) -> str:
        """Race bgr vs i420 end-to-end on the first real batch and lock in
        the faster format. The host->device link's effective bandwidth per
        array layout is deployment-specific (and over a tunnel, bursty), so
        this is measured, not assumed. Interleaved best-of-3 rounds."""
        # Caller (detect_batch) has already padded frames to a bucket size,
        # so the sample is exactly one program-sized chunk.
        sample = frames[: self.batch_size]
        _, H, W, _ = sample.shape
        orig_wh = np.asarray([W, H], np.float32)
        payloads = {"bgr": sample, "i420": bgr_to_i420(sample)}
        if "i420d" in self._jits:
            # Same i420 payload; the wrapper delta-encodes against its own
            # chunk-chained state, so consecutive timed calls are realistic.
            payloads["i420d"] = payloads["i420"]
        best = {fmt: float("inf") for fmt in payloads}
        for fmt, payload in payloads.items():  # compile/warm both
            out, _ = self._jits[fmt](self.variables, payload, orig_wh)
            np.asarray(out.scores)  # host fetch = the only honest sync
        for _ in range(3):
            for fmt, payload in payloads.items():
                t0 = time.perf_counter()
                out, _ = self._jits[fmt](self.variables, payload, orig_wh)
                np.asarray(out.scores)
                best[fmt] = min(best[fmt], time.perf_counter() - t0)
        winner = min(best, key=best.get)
        logger.info(
            "transfer autotune: %s (%s per batch)",
            winner,
            ", ".join(f"{fmt} {1e3 * t:.1f} ms" for fmt, t in best.items()),
        )
        return winner

    def _bucket_sizes(self) -> list[int]:
        """Program sizes up to batch_size (ascending): powers of 2 scaled by
        the data-axis size, so every bucket divides evenly over the mesh."""
        sizes = []
        b = self._data_size
        while b < self.batch_size:
            sizes.append(b)
            b *= 2
        sizes.append(self.batch_size)
        return sizes

    def _tail_bucket(self, remainder: int) -> int:
        """Smallest program size that fits a partial tail chunk. Padding
        happens BEFORE the host->device transfer, so padding a single frame
        up to a big batch would ship batch_size x the bytes over the link;
        power-of-2 buckets cap the waste at 2x while keeping the number of
        compiled programs logarithmic (all persisted in the XLA cache)."""
        for b in self._bucket_sizes():
            if b >= remainder:
                return b
        return self.batch_size

    def _empty_chunk(self, n: int) -> tuple[DetectionBatch, np.ndarray]:
        """All-invalid results for a failed chunk of n frames: every query
        masked out, zero encoder features (feature pooling then returns
        zeros for those frames instead of crashing)."""
        q = self.detr_config.num_queries
        tokens = (self.input_hw[0] // self.feature_stride) * (
            self.input_hw[1] // self.feature_stride
        )
        batch = DetectionBatch(
            boxes_xywh=np.zeros((n, q, 4), np.float32),
            scores=np.zeros((n, q), np.float32),
            valid=np.zeros((n, q), bool),
            foot=np.zeros((n, q, 2), np.float32),
        )
        return batch, np.zeros((n, tokens, self.detr_config.d_model), np.float32)

    # ---------------------------------------------------------------- detect
    def detect_batch(self, frames: np.ndarray) -> DetectionBatch:
        """(F, H, W, 3) uint8 BGR -> DetectionBatch (F, Q). F is padded up to
        a bucket size internally; callers see the original F."""
        if self.model is None:
            self.load_model()
        F, H, W, _ = frames.shape
        tail = F % self.batch_size
        pad = (self._tail_bucket(tail) - tail) if tail else 0
        if pad:
            frames = np.concatenate([frames, np.zeros((pad, H, W, 3), np.uint8)])
        if self.transfer_format in ("i420", "i420d", "auto") and (H % 4 or W % 2):
            logger.warning(
                "i420 transfer unsupported for %dx%d (H%%4/W%%2); using bgr",
                H, W,
            )
            self.transfer_format = "bgr"
            self._build_jits()
        if self.transfer_format == "auto":
            self.transfer_format = self._autotune_transfer(frames)
            self._jit_detect = self._jits[self.transfer_format]
        if self.transfer_format in ("i420", "i420d"):
            frames = bgr_to_i420(frames)  # (F, H*3/2, W): half the bytes
        # Dispatch hygiene: over a remote-device link every EAGER op
        # (jnp.asarray of a scalar, concatenate, slice) is its own ~10-100 ms
        # round trip, which can dwarf the model itself. The hot path
        # therefore issues exactly ONE program dispatch per chunk (the jit;
        # its argument transfer rides the same call); padding is stripped /
        # chunks merged on HOST in numpy (_host_merge) because a jitted
        # strip would compile a fresh program per distinct frame count.
        orig_wh = np.asarray([W, H], np.float32)
        t0 = time.perf_counter()
        chunks = []
        encs = []
        failed_chunks = 0
        for i in range(0, len(frames), self.batch_size):
            chunk_frames = frames[i : i + self.batch_size]
            try:
                batch, enc = self._jit_detect(
                    self.variables, chunk_frames, orig_wh
                )
            except Exception:
                # Per-chunk failure isolation (reference per-frame analog,
                # src/pipeline/phases/detection.py:124-127): a poisoned
                # chunk logs and yields all-invalid results for its frames
                # instead of aborting the whole phase.
                failed_chunks += 1
                logger.exception(
                    "detect chunk failed for frames [%d, %d); continuing "
                    "with empty results for those frames",
                    i, i + len(chunk_frames),
                )
                batch, enc = self._empty_chunk(len(chunk_frames))
            chunks.append(batch)
            encs.append(enc)
        self.last_inference_time = time.perf_counter() - t0  # dispatch time
        # Fast path: one full batch -> device arrays untouched (lets
        # callers pipeline dispatch/fetch). Otherwise merge/strip on host.
        if len(chunks) == 1 and pad == 0 and not failed_chunks:
            merged = chunks[0]
        else:
            merged = _host_merge(chunks, F)
        self._last_encoder_chunks = encs
        self._last_frame_count = F
        self._last_encoder_output = None  # materialized lazily by features
        self._last_orig_wh = (W, H)
        return merged

    def detect(self, frame: np.ndarray) -> list[Detection]:
        batch = self.detect_batch(frame[None])
        return batch.to_frame_results()[0].detections

    def detect_with_features(
        self, frame: np.ndarray
    ) -> tuple[list[Detection], np.ndarray]:
        """Detections + per-detection 256-d appearance features."""
        batch = self.detect_batch(frame[None])
        feats = self._pool_features(batch)
        dets = batch.to_frame_results()[0].detections
        valid = np.asarray(batch.valid[0])
        feat_np = np.asarray(feats[0])[valid]
        for det, f in zip(dets, feat_np):
            det.feature = f
        return dets, feat_np

    def _pool_features(self, batch: DetectionBatch) -> jax.Array:
        fh = self.input_hw[0] // self.feature_stride
        fw = self.input_hw[1] // self.feature_stride
        W, H = self._last_orig_wh
        if self._last_encoder_output is None:
            encs = self._last_encoder_chunks
            if len(encs) == 1 and encs[0].shape[0] == self._last_frame_count:
                self._last_encoder_output = encs[0]
            else:  # host concat+strip: avoids per-shape program compiles
                self._last_encoder_output = np.concatenate(
                    [np.asarray(e) for e in encs]
                )[: self._last_frame_count]
        # The valid (non-letterbox) region of the feature grid corresponds to
        # the resized image; scale original pixels into that region.
        from ..ops.preprocessing import compute_resize_geometry

        rh, rw = compute_resize_geometry((H, W), self.input_hw)
        eff_w = W * (self.input_hw[1] / rw)
        eff_h = H * (self.input_hw[0] / rh)
        return roi_mean_pool(
            self._last_encoder_output,
            (fh, fw),
            batch.boxes_xywh,
            batch.valid,
            np.asarray([eff_w, eff_h], np.float32),
        )

    def extract_features(
        self, frame: np.ndarray, bboxes: list[tuple[float, float, float, float]]
    ) -> np.ndarray:
        """Features for externally-provided boxes (crop-histogram fallback,
        reference yolov8_detector.py:161-190)."""
        return crop_histogram_features(frame, np.asarray(bboxes, np.float32))

    # ------------------------------------------------------------- attention
    def get_attention_map(self, frame: np.ndarray) -> np.ndarray | None:
        """Mean decoder cross-attention of the last layer over the feature
        grid -> (fh, fw) float32 heat map (reference attention-map contract,
        yolov8_detector.py:243-254 / visualizer.py:148-265)."""
        if self.model is None:
            self.load_model()
        import dataclasses

        cfg = dataclasses.replace(self.detr_config, use_pallas_attention=False)
        model = DETR(cfg, sow_attn=True)
        pixels, mask = preprocess_frames(
            frame[None], target_hw=self.input_hw,
            out_dtype=cfg.jnp_dtype,
        )
        _, state = model.apply(
            self.variables, pixels, mask, deterministic=True,
            mutable=["intermediates"],
        )
        inter = state["intermediates"]
        last = f"layer_{cfg.num_decoder_layers - 1}"
        probs = inter["decoder"][last]["encoder_attn"]["attn_weights"][0]
        # (B, H, Q, L) -> mean over heads and queries -> (fh, fw)
        fh = self.input_hw[0] // self.feature_stride
        fw = self.input_hw[1] // self.feature_stride
        amap = np.asarray(jnp.mean(probs[0], axis=(0, 1)).reshape(fh, fw), np.float32)
        return amap

    def cleanup(self) -> None:
        self.variables = None
        self._jit_detect = None
