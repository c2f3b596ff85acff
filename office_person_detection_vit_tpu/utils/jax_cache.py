"""Persistent XLA compilation cache.

First compile of the full detector is ~1-2 minutes on TPU; without a
persistent cache every process pays it again. Entry points (main.py,
bench.py, tools) call :func:`enable_persistent_cache` so compiled
executables are reused across processes/runs.
"""

from __future__ import annotations

import logging
import os
from pathlib import Path

logger = logging.getLogger(__name__)

DEFAULT_CACHE_DIR = os.environ.get(
    "OPDV_JAX_CACHE_DIR", str(Path.home() / ".cache" / "opdv_jax_cache")
)


def enable_persistent_cache(cache_dir: str | None = None) -> None:
    """Idempotent; safe to call before or after backend init."""
    import jax

    cache_dir = cache_dir or DEFAULT_CACHE_DIR
    try:
        Path(cache_dir).mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # Cache everything, including fast-to-compile programs.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        logger.debug("persistent compilation cache at %s", cache_dir)
    except Exception as e:  # pragma: no cover - older jax
        logger.debug("could not enable compilation cache: %s", e)
