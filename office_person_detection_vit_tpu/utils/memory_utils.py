"""Resource cleanup (reference src/utils/memory_utils.py:12-42).

The torch analog empties the MPS/CUDA cache; the JAX analog drops live
device buffers by deleting references and clearing jit caches. XLA's
allocator reuses freed device memory automatically, so this is only needed
between pipeline phases that swap large models (e.g. detector → Re-ID).
"""

from __future__ import annotations

import gc
import logging

logger = logging.getLogger(__name__)


def cleanup_resources(*objects: object) -> None:
    """Drop references, run the GC, and nudge JAX to release caches."""
    for obj in objects:
        cleanup = getattr(obj, "cleanup", None)
        if callable(cleanup):
            try:
                cleanup()
            except Exception as e:  # pragma: no cover
                logger.debug("cleanup() raised: %s", e)
    del objects
    gc.collect()
    try:
        import jax

        jax.clear_caches()
    except Exception:  # pragma: no cover
        pass


def live_device_bytes() -> int:
    """Total bytes of live device buffers (0 if the backend lacks stats)."""
    try:
        import jax

        total = 0
        for dev in jax.devices():
            stats = getattr(dev, "memory_stats", None)
            if callable(stats):
                s = stats() or {}
                total += int(s.get("bytes_in_use", 0))
        return total
    except Exception:  # pragma: no cover
        return 0
