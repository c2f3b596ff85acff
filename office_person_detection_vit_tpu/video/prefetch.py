"""Host->device prefetch pipeline.

The BASELINE.json requirement: an async producer queue that keeps the TPU
detector saturated while host threads do video seek/decode and OCR. The
reference has no such component (per-frame synchronous decode+transfer,
SURVEY.md §3.1); this is the TPU-native replacement.

``PrefetchLoader`` decodes frame batches on a background thread pool into a
bounded queue (double/triple buffering); the consumer pops ready uint8
batches and hands them to the jitted preprocess+detect program, overlapping
host I/O with device compute.
"""

from __future__ import annotations

import logging
import queue
import threading
from typing import Callable, Iterator, Sequence

import numpy as np

logger = logging.getLogger(__name__)

_SENTINEL = object()


class PrefetchLoader:
    def __init__(
        self,
        frame_numbers: Sequence[int],
        fetch_fn: Callable[[int], np.ndarray | None] | None = None,
        batch_size: int = 4,
        depth: int = 3,
        iter_fn: Callable[[Sequence[int]], "Iterator[tuple[int, np.ndarray]]"] | None = None,
    ):
        """Either ``fetch_fn(frame_number) -> frame`` (random access) or
        ``iter_fn(frame_numbers) -> iter of (frame_number, frame)``
        (sequential strided decode, e.g. VideoProcessor.iter_frames — much
        faster for ascending scans)."""
        if (fetch_fn is None) == (iter_fn is None):
            raise ValueError("provide exactly one of fetch_fn / iter_fn")
        self.frame_numbers = list(frame_numbers)
        self.fetch_fn = fetch_fn
        self.iter_fn = iter_fn
        self.batch_size = int(batch_size)
        self.queue: queue.Queue = queue.Queue(maxsize=depth)
        self._thread: threading.Thread | None = None
        self._stop = threading.Event()

    # ------------------------------------------------------------- producer
    def _pairs(self):
        if self.iter_fn is not None:
            yield from self.iter_fn(self.frame_numbers)
            return
        for fn in self.frame_numbers:
            frame = self.fetch_fn(fn)
            if frame is None:
                logger.warning("frame %d failed to decode; skipping", fn)
                continue
            yield fn, frame

    def _producer(self) -> None:
        batch_frames: list[np.ndarray] = []
        batch_numbers: list[int] = []
        try:
            for fn, frame in self._pairs():
                if self._stop.is_set():
                    break
                batch_frames.append(frame)
                batch_numbers.append(fn)
                if len(batch_frames) == self.batch_size:
                    self.queue.put((batch_numbers, np.stack(batch_frames)))
                    batch_frames, batch_numbers = [], []
            if batch_frames and not self._stop.is_set():
                self.queue.put((batch_numbers, np.stack(batch_frames)))
        finally:
            self.queue.put(_SENTINEL)

    # ------------------------------------------------------------- consumer
    def __iter__(self) -> Iterator[tuple[list[int], np.ndarray]]:
        self._stop.clear()
        self._thread = threading.Thread(target=self._producer, daemon=True)
        self._thread.start()
        try:
            while True:
                item = self.queue.get()
                if item is _SENTINEL:
                    break
                yield item
        finally:
            self._stop.set()
            # Drain so the producer can exit if blocked on put().
            try:
                while True:
                    self.queue.get_nowait()
            except queue.Empty:
                pass
            if self._thread is not None:
                self._thread.join(timeout=5)

    def close(self) -> None:
        self._stop.set()
