"""StableHLO deployment export of the fused detect program.

`jax.export` serializes the traced program (preprocess -> backbone ->
transformer -> postprocess, exactly the Phase-2 hot path the detectors
dispatch) as portable StableHLO plus calling-convention metadata. The
serialized artifact reloads WITHOUT the model's Python code — a deployment
story the reference delegates to ultralytics' `.pt` files (reference
src/detection/yolov8_detector.py:70-88, torch pickles that require the
full ultralytics stack to open); here the artifact is a compiler-level
module any JAX runtime on a compatible platform can execute.

Weights travel separately (the standard framework npz from
`tools/train_detr.py` / converted torch checkpoints): the exported module
takes the variables pytree as a runtime argument, so ONE artifact serves
every fine-tune of the same architecture.
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Any

import numpy as np

logger = logging.getLogger(__name__)


def export_detect(detector, batch_size: int | None = None,
                  source_hw: tuple[int, int] = (720, 1280),
                  platforms: tuple[str, ...] | None = ("cpu", "tpu")):
    """-> ``jax.export.Exported`` for the detector's fused BGR program.

    Calling convention of the exported module (flat-array outputs — no
    custom pytree registrations needed at load time):
    ``(variables, frames_u8 (B,H,W,3), orig_wh (2,) f32, conf () f32) ->
    {"boxes_xywh", "scores", "valid", "foot"}``.

    ``platforms``: lowering targets baked into the artifact (default: one
    module that runs on both CPU and TPU; None = the current platform).

    ``batch_size``: a fixed int, or None (default) for a SYMBOLIC batch
    dimension — one artifact serves any batch size (XLA specializes per
    shape at call time, like the detector's own bucket programs).
    """
    import jax
    import jax.numpy as jnp

    if detector.model is None:
        detector.load_model()

    def raw_bgr(det):
        """The raw jitted BGR program: every family exposes .jitted
        (DETRDetector keeps per-format _jits; SSD/YOLO keep one)."""
        jits = getattr(det, "_jits", None)
        if jits is not None:
            return jits["bgr"].jitted if "bgr" in jits else None
        return det._jit_detect.jitted

    if detector.mesh is not None or raw_bgr(detector) is None:
        # The portable artifact is a single-device program: strip any
        # DP/TP shardings and non-bgr transfer formats for the export
        # trace, then restore the detector's own programs (rebuilding —
        # never leave the jits inconsistent with the attributes).
        saved_mesh, saved_fmt = detector.mesh, getattr(
            detector, "transfer_format", None)
        detector.mesh = None
        if saved_fmt is not None:
            detector.transfer_format = "bgr"
        detector._build_jits()
        raw = raw_bgr(detector)
        detector.mesh = saved_mesh
        if saved_fmt is not None:
            detector.transfer_format = saved_fmt
        detector._build_jits()
    else:
        raw = raw_bgr(detector)

    @jax.jit
    def detect_flat(variables, frames_u8, orig_wh, conf):
        batch = raw(variables, frames_u8, orig_wh, conf)[0]
        return {
            "boxes_xywh": batch.boxes_xywh,
            "scores": batch.scores,
            "valid": batch.valid,
            "foot": batch.foot,
        }

    B = (jax.export.symbolic_shape("b")[0] if batch_size is None
         else int(batch_size))
    H, W = source_hw
    args = (
        jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(np.shape(x), x.dtype),
            detector.variables,
        ),
        jax.ShapeDtypeStruct((B, H, W, 3), jnp.uint8),
        jax.ShapeDtypeStruct((2,), jnp.float32),
        jax.ShapeDtypeStruct((), jnp.float32),
    )
    kwargs = {"platforms": platforms} if platforms else {}
    exported = jax.export.export(detect_flat, **kwargs)(*args)
    logger.info(
        "exported detect program: batch=%s source=%dx%d platforms=%s",
        B, H, W, exported.platforms,
    )
    return exported


def save_exported(exported, path: Path) -> int:
    """Serialize to ``path``; returns the byte size."""
    blob = exported.serialize()
    Path(path).write_bytes(blob)
    return len(blob)


def load_exported(path: Path):
    """Deserialize an exported detect program; ``.call(variables, frames,
    orig_wh, conf)`` executes it (no model code required)."""
    import jax

    return jax.export.deserialize(Path(path).read_bytes())


#: ``Exported.call`` re-traces the deserialized module on EVERY invocation
#: (seconds per call for the full model); wrap it in jax.jit once per
#: Exported so repeat calls hit the executable cache.
_jitted_calls: "weakref.WeakKeyDictionary" = None  # type: ignore[assignment]


def jitted_call(exported):
    import weakref

    import jax

    global _jitted_calls
    if _jitted_calls is None:
        _jitted_calls = weakref.WeakKeyDictionary()
    fn = _jitted_calls.get(exported)
    if fn is None:
        fn = jax.jit(exported.call)
        _jitted_calls[exported] = fn
    return fn


def run_exported(exported, variables: Any, frames_u8: np.ndarray,
                 orig_wh=(1280.0, 720.0), conf: float = 0.5) -> dict:
    """Convenience host wrapper around the (cached-jit) exported module."""
    import jax.numpy as jnp

    out = jitted_call(exported)(
        variables,
        jnp.asarray(frames_u8),
        jnp.asarray(orig_wh, jnp.float32),
        jnp.asarray(conf, jnp.float32),
    )
    return {k: np.asarray(v) for k, v in out.items()}


#: npz cannot round-trip extended dtypes (ml_dtypes.bfloat16 reloads as
#: void '|V2'); such leaves are stored as raw uint16/uint8 views under a
#: dtype-tagged key suffix and viewed back at load.
_DTYPE_TAG = "##dtype="


def save_weights_npz(variables: Any, path: Path) -> int:
    """Persist a (nested-dict) variables pytree as a path-keyed npz —
    reconstructable WITHOUT the model code or a tree template (unlike the
    trainer's flat leaf_i checkpoints). Returns the leaf count."""
    import jax

    flat = {}
    for keypath, leaf in jax.tree_util.tree_flatten_with_path(variables)[0]:
        name = "/".join(getattr(k, "key", str(k)) for k in keypath)
        arr = np.asarray(leaf)
        if arr.dtype.kind not in "biufc":  # extended dtype (e.g. bfloat16)
            name = f"{name}{_DTYPE_TAG}{arr.dtype.name}"
            arr = arr.view(np.dtype(f"u{arr.dtype.itemsize}"))
        flat[name] = arr
    np.savez(path, **flat)
    return len(flat)


def load_weights_npz(path: Path) -> dict:
    """Rebuild the nested variables dict from a path-keyed npz."""
    out: dict = {}
    with np.load(path) as data:
        for name in data.files:
            arr = data[name]
            if _DTYPE_TAG in name:
                name, dtype_name = name.split(_DTYPE_TAG)
                import ml_dtypes  # ships with jax

                arr = arr.view(np.dtype(getattr(ml_dtypes, dtype_name)))
            node = out
            parts = name.split("/")
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = arr
    return out


class ExportedDetector:
    """Serve-compatible adapter: the ``detect_batch`` contract backed by a
    deserialized StableHLO artifact + path-keyed weights npz — NO model
    construction, so `tools/serve.py --artifact ... --weights ...` brings
    up the server from two files.

    Incoming frames of any resolution are resized to the artifact's baked
    ``source_hw``; the program decodes boxes in its native pixel space and
    the host applies the per-axis stretch back to the caller's resolution
    (the exported YOLO/SSD decode inverts its letterbox with a single
    min-scale, which is not per-axis separable — only the host rescale is
    family-agnostic). Fixed-batch artifacts pad partial batches;
    dynamic-batch artifacts (the export default) run every size directly.
    """

    def __init__(self, artifact_path: Path, weights_path: Path,
                 confidence_threshold: float = 0.5, batch_size: int = 8):
        import jax

        self.exported = load_exported(artifact_path)
        # Resident on device ONCE: leaving the weights as host numpy would
        # re-upload the whole tree on every call (~160 MB/request for the
        # full model — seconds over the remote tunnel).
        self.variables = jax.device_put(load_weights_npz(weights_path))
        self.confidence_threshold = float(confidence_threshold)
        # in_avals is the FLAT list of input leaves; the frames input is
        # the unique rank-4 uint8 aval (weights are float/int32 params).
        frames_aval = next(
            a for a in self.exported.in_avals
            if a.dtype == np.uint8 and len(a.shape) == 4
        )
        _, h, w, _ = frames_aval.shape
        self.source_hw = (int(h), int(w))
        b = frames_aval.shape[0]
        self.exported_batch = int(b) if isinstance(b, int) else None
        self.batch_size = (self.exported_batch
                           if self.exported_batch is not None
                           else int(batch_size))
        self.model = self  # non-None sentinel for load_model() callers

    def load_model(self) -> None:  # contract no-op: artifact is the model
        pass

    def _bucket_sizes(self) -> list[int]:
        """Power-of-2 warm set, same contract as DETRDetector (serve.py
        warms every bucket at startup so no request size pays a compile)."""
        if self.exported_batch is not None:
            return [self.exported_batch]
        sizes, b = [], 1
        while b < self.batch_size:
            sizes.append(b)
            b <<= 1
        return sizes + [self.batch_size]

    def _bucket(self, n: int) -> int:
        if self.exported_batch is not None:
            return self.exported_batch
        b = 1
        while b < n:
            b <<= 1
        return min(b, self.batch_size)

    def detect_batch(self, frames: np.ndarray):
        import cv2
        import jax.numpy as jnp

        from ..core.dto import DetectionBatch

        F = int(frames.shape[0])
        if F == 0:  # tolerate empty input (ADVICE r2: no dispatch to run)
            q = next(
                (int(a.shape[1]) for a in self.exported.out_avals
                 if len(a.shape) == 3 and a.shape[-1] == 4), 0,
            )
            return DetectionBatch(
                boxes_xywh=jnp.zeros((0, q, 4), jnp.float32),
                scores=jnp.zeros((0, q), jnp.float32),
                valid=jnp.zeros((0, q), bool),
                foot=jnp.zeros((0, q, 2), jnp.float32),
            )
        _, H0, W0, _ = frames.shape
        h, w = self.source_hw
        resized = (int(H0), int(W0)) != (h, w)
        if resized:
            frames = np.stack([cv2.resize(f, (w, h)) for f in frames])
        # The exported decode inverts its letterbox with a single min-scale
        # (YOLO/SSD) which is NOT per-axis separable, so after the
        # non-aspect-preserving host resize the program must decode in the
        # artifact's native (w, h) pixel space; the per-axis stretch back to
        # the caller's (W0, H0) happens on host below (ADVICE r2).
        orig_wh = (float(w), float(h))
        outs = []
        i = 0
        # Dynamic artifacts XLA-specialize per concrete batch shape, so pad
        # every dispatch up to a power-of-2 bucket (bounded compile set,
        # like the live detector); fixed artifacts pad to their baked size.
        while i < F:
            n = min(self.batch_size, F - i)
            m = self._bucket(n)
            part = frames[i:i + n]
            if len(part) < m:
                part = np.concatenate(
                    [part, np.zeros((m - len(part), h, w, 3), np.uint8)]
                )
            out = run_exported(
                self.exported, self.variables, part,
                orig_wh=orig_wh,
                conf=self.confidence_threshold,
            )
            outs.append({k: np.asarray(v[:n]) for k, v in out.items()})
            i += n
        cat = {k: np.concatenate([o[k] for o in outs]) for k in outs[0]}
        if resized:
            sx, sy = float(W0) / w, float(H0) / h
            cat["boxes_xywh"] = cat["boxes_xywh"] * np.asarray(
                [sx, sy, sx, sy], np.float32
            )
            cat["foot"] = cat["foot"] * np.asarray([sx, sy], np.float32)

        return DetectionBatch(
            boxes_xywh=jnp.asarray(cat["boxes_xywh"]),
            scores=jnp.asarray(cat["scores"]),
            valid=jnp.asarray(cat["valid"]),
            foot=jnp.asarray(cat["foot"]),
        )
