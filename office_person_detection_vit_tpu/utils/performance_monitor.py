"""Named-scope wall-time accumulation (reference
src/utils/performance_monitor.py:10-80) with optional ``jax.profiler``
integration.

``measure("02_detection")`` accumulates total/count/min/max per name; the
orchestrator wraps every phase with it and persists the summary into
``summary.json["performance"]``. Device work is made observable two ways:

* each measured scope is also a ``jax.profiler.TraceAnnotation`` so scopes
  show up in captured XLA traces;
* ``start_trace``/``stop_trace`` wrap ``jax.profiler`` for a full trace dump
  viewable in TensorBoard/Perfetto.

Callers timing device work should ``block_until_ready`` inside the scope —
JAX dispatch is async and wall-clock alone under-reports otherwise.
"""

from __future__ import annotations

import contextlib
import logging
import time
from typing import Any, Iterator

logger = logging.getLogger(__name__)


class PerformanceMonitor:
    def __init__(self) -> None:
        self._stats: dict[str, dict[str, float]] = {}
        self._tracing = False

    @contextlib.contextmanager
    def measure(self, name: str) -> Iterator[None]:
        try:
            import jax.profiler

            annotation = jax.profiler.TraceAnnotation(name)
        except Exception:  # pragma: no cover - jax always present in practice
            annotation = contextlib.nullcontext()
        start = time.perf_counter()
        with annotation:
            yield
        elapsed = time.perf_counter() - start
        entry = self._stats.setdefault(
            name, {"total": 0.0, "count": 0, "min": float("inf"), "max": 0.0}
        )
        entry["total"] += elapsed
        entry["count"] += 1
        entry["min"] = min(entry["min"], elapsed)
        entry["max"] = max(entry["max"], elapsed)

    # ------------------------------------------------------------- profiler
    def start_trace(self, log_dir: str) -> None:
        import jax.profiler

        jax.profiler.start_trace(log_dir)
        self._tracing = True
        logger.info("jax profiler trace started -> %s", log_dir)

    def stop_trace(self) -> None:
        if self._tracing:
            import jax.profiler

            jax.profiler.stop_trace()
            self._tracing = False

    # --------------------------------------------------------------- report
    def get_summary(self) -> dict[str, Any]:
        # Key names follow the summary.json performance contract
        # (schemas/summary.schema.json: total_time/count/avg_time/min_time/max_time).
        return {
            name: {
                "total_time": round(s["total"], 6),
                "count": int(s["count"]),
                "avg_time": round(s["total"] / max(s["count"], 1), 6),
                "min_time": round(s["min"], 6) if s["count"] else 0.0,
                "max_time": round(s["max"], 6),
            }
            for name, s in self._stats.items()
        }

    def log_summary(self) -> None:
        logger.info("=== performance summary ===")
        for name, s in self.get_summary().items():
            logger.info(
                "%s: total %.3fs over %d calls (avg %.3fs, min %.3fs, max %.3fs)",
                name,
                s["total_time"],
                s["count"],
                s["avg_time"],
                s["min_time"],
                s["max_time"],
            )

    def reset(self) -> None:
        self._stats.clear()
