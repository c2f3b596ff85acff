"""Training input pipeline: decoded-frame cache + background batch prefetch.

The reference trains through ultralytics, whose torch ``DataLoader`` keeps
N worker processes decoding and augmenting JPEGs on the host (reference
tools/train_yolov8.py:18-40 — ``model.train`` defaults ``workers=8``).
TPU-first needs far less machinery, because augmentation already runs
on-device (training/augment.py) and the jitted train step is the only
consumer:

- **Decode once.** Each image is decoded + resized to the working
  resolution exactly once and kept as a uint8 host array in an LRU-bounded
  cache (a 720p frame is ~2.6 MB; datasets at this pipeline's scale fit
  host RAM, and the byte bound covers those that don't).
- **One producer thread, bounded queue.** While the device executes step
  N, the producer assembles the host arrays for step N+1..N+depth
  (stacked frames + fixed-shape packed targets, all numpy). The consumer
  pops ready batches and pays only the jnp upload at dispatch.
- **Deterministic epochs.** The shuffle for epoch e is
  ``default_rng((seed, e))`` — resume at epoch e sees the same order the
  uninterrupted run would have, independent of loader state.

Ragged tails are dropped (static shapes; same rule as the trainer's
inline path).
"""

from __future__ import annotations

import logging
from collections import OrderedDict
from pathlib import Path
from typing import Iterator, Sequence

import numpy as np

from ..video.prefetch import prefetch_iter

logger = logging.getLogger(__name__)


def pack_targets_np(
    per_image_boxes: Sequence,
    per_image_labels: Sequence,
    capacity: int,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Numpy twin of training.criterion.pack_targets (thread-side: no
    device arrays created off the main thread)."""
    B = len(per_image_boxes)
    labels = np.zeros((B, capacity), np.int32)
    boxes = np.zeros((B, capacity, 4), np.float32)
    valid = np.zeros((B, capacity), bool)
    for i, (bx, lb) in enumerate(zip(per_image_boxes, per_image_labels)):
        n = min(len(bx), capacity)
        if n:
            boxes[i, :n] = np.asarray(bx, np.float32)[:n]
            labels[i, :n] = np.asarray(lb, np.int32)[:n]
            valid[i, :n] = True
    return labels, boxes, valid


class FrameCache:
    """LRU uint8 frame cache keyed by path, bounded by total bytes."""

    def __init__(self, resize_wh: tuple[int, int] = (1280, 720),
                 limit_bytes: int = 4 << 30):
        self.resize_wh = resize_wh
        self.limit_bytes = int(limit_bytes)
        self._store: OrderedDict[str, np.ndarray] = OrderedDict()
        self._bytes = 0
        self.hits = 0
        self.misses = 0

    def get(self, path: Path) -> np.ndarray:
        key = str(path)
        frame = self._store.get(key)
        if frame is not None:
            self.hits += 1
            self._store.move_to_end(key)
            return frame
        self.misses += 1
        import cv2

        img = cv2.imread(key)
        if img is None:
            # NOT cached: a transient decode failure is retried next epoch
            # (the blank substitute must never become permanent training
            # signal against real GT boxes).
            logger.warning("unreadable image %s; substituting blank", path)
            w, h = self.resize_wh
            return np.zeros((h, w, 3), np.uint8)
        if (img.shape[1], img.shape[0]) != self.resize_wh:
            img = cv2.resize(img, self.resize_wh)
        self._store[key] = img
        self._bytes += img.nbytes
        while self._bytes > self.limit_bytes and len(self._store) > 1:
            _, old = self._store.popitem(last=False)
            self._bytes -= old.nbytes
        return img


class COCOBatchLoader:
    """Epoch iterator of ready host batches for the train step.

    ``samples`` is the ``load_coco_dataset`` triple list
    ``(path, boxes_cxcywh_norm, labels)``. Each yielded batch is a dict of
    numpy arrays: ``frames_u8 (B,H,W,3)`` plus fixed-shape ``labels /
    boxes / valid`` — the consumer runs the jitted letterbox+normalize
    (``ops.preprocessing.preprocess_frames``) and upload at dispatch.
    """

    def __init__(
        self,
        samples: Sequence,
        batch_size: int,
        *,
        capacity: int = 25,
        resize_wh: tuple[int, int] = (1280, 720),
        seed: int = 0,
        depth: int = 2,
        cache_limit_bytes: int = 4 << 30,
    ):
        self.samples = list(samples)
        self.batch_size = int(batch_size)
        self.capacity = int(capacity)
        self.seed = int(seed)
        self.depth = int(depth)
        self.cache = FrameCache(resize_wh, cache_limit_bytes)

    @property
    def steps_per_epoch(self) -> int:
        return len(self.samples) // self.batch_size

    def _build(self, idx: np.ndarray) -> dict:
        chosen = [self.samples[j] for j in idx]
        frames = np.stack([self.cache.get(s[0]) for s in chosen])
        labels, boxes, valid = pack_targets_np(
            [s[1] for s in chosen], [s[2] for s in chosen], self.capacity
        )
        return {"frames_u8": frames, "labels": labels,
                "boxes": boxes, "valid": valid}

    def epoch(self, epoch_idx: int) -> Iterator[dict]:
        """Prefetching iterator over epoch ``epoch_idx``'s shuffled batches
        (producer exceptions re-raise here; early exit is deadlock-free —
        see video/prefetch.py::prefetch_iter, the shared harness)."""
        order = np.random.default_rng((self.seed, epoch_idx)).permutation(
            len(self.samples)
        )

        def batches() -> Iterator[dict]:
            for i in range(self.steps_per_epoch):
                idx = order[i * self.batch_size:(i + 1) * self.batch_size]
                yield self._build(idx)

        yield from prefetch_iter(batches(), depth=self.depth)
