"""Online detection server — production-serving entry point.

Stdlib-only HTTP server wrapping the batched jitted detector with
micro-batching: concurrent requests are coalesced into one device batch
(up to ``detection.batch_size``), so the TPU sees large matmuls even under
many small clients. The jitted program is compiled once at startup (and
persisted via the XLA compilation cache).

Endpoints:
  POST /detect        image bytes (JPEG/PNG) -> {"detections": [...]}
  GET  /healthz       liveness + model info
  GET  /stats         request/batch counters

Usage:
  python tools/serve.py [--port 8500] [--config config.yaml] [--tiny]
"""

from __future__ import annotations

import argparse
import json
import logging
import queue
import sys
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

logger = logging.getLogger("serve")


class MicroBatcher:
    """Coalesce concurrent detect requests into device-sized batches."""

    def __init__(self, detector, max_batch: int, max_wait_ms: float = 5.0):
        self.detector = detector
        self.max_batch = int(max_batch)
        self.max_wait = max_wait_ms / 1000.0
        self.queue: queue.Queue = queue.Queue()
        self.stats = {"requests": 0, "batches": 0, "frames": 0}
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def submit(self, frame: np.ndarray) -> list:
        """Blocking: returns the detections for one frame."""
        done = threading.Event()
        slot: dict = {}
        self.queue.put((frame, slot, done))
        done.wait()
        if "error" in slot:
            raise RuntimeError(slot["error"])
        return slot["detections"]

    def _loop(self) -> None:
        while True:
            frame, slot, done = self.queue.get()
            batch = [(frame, slot, done)]
            deadline = time.perf_counter() + self.max_wait
            while len(batch) < self.max_batch:
                timeout = deadline - time.perf_counter()
                if timeout <= 0:
                    break
                try:
                    batch.append(self.queue.get(timeout=timeout))
                except queue.Empty:
                    break
            # Group by resolution: clients may post different sizes, and one
            # compiled program exists per (H, W) — mixing shapes would both
            # break np.stack and trigger recompiles mid-batch.
            by_shape: dict[tuple, list] = {}
            for item in batch:
                by_shape.setdefault(item[0].shape, []).append(item)
            for group in by_shape.values():
                try:
                    frames = np.stack([g[0] for g in group])
                    results = self.detector.detect_batch(frames).to_frame_results()
                    for (f, slot_i, done_i), fr in zip(group, results):
                        slot_i["detections"] = [d.to_dict() for d in fr.detections]
                        done_i.set()
                    self.stats["requests"] += len(group)
                    self.stats["batches"] += 1
                    self.stats["frames"] += len(group)
                except Exception as e:  # pragma: no cover - defensive
                    logger.exception("batch failed")
                    for _, slot_i, done_i in group:
                        slot_i["error"] = str(e)
                        done_i.set()


def make_handler(batcher: MicroBatcher, model_info: dict):
    import cv2

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet
            logger.debug(fmt, *args)

        def _json(self, code: int, payload: dict) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._json(200, {"status": "ok", **model_info})
            elif self.path == "/stats":
                self._json(200, batcher.stats)
            else:
                self._json(404, {"error": "not found"})

        def do_POST(self):
            if self.path != "/detect":
                self._json(404, {"error": "not found"})
                return
            length = int(self.headers.get("Content-Length", 0))
            data = self.rfile.read(length)
            img = cv2.imdecode(np.frombuffer(data, np.uint8), cv2.IMREAD_COLOR)
            if img is None:
                self._json(400, {"error": "could not decode image"})
                return
            t0 = time.perf_counter()
            dets = batcher.submit(img)
            self._json(
                200,
                {
                    "detections": dets,
                    "latency_ms": round((time.perf_counter() - t0) * 1000, 2),
                },
            )

    return Handler


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(description="online detection server")
    parser.add_argument("--port", type=int, default=8500)
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--config", default=None)
    parser.add_argument("--tiny", action="store_true")
    parser.add_argument("--artifact", type=Path, default=None,
                        help="serve a StableHLO export "
                             "(tools/export_stablehlo.py) instead of "
                             "building the model; requires --weights")
    parser.add_argument("--weights", type=Path, default=None,
                        help="path-keyed weights npz for --artifact")
    parser.add_argument("--confidence", type=float, default=0.5,
                        help="confidence threshold for --artifact serving")
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")

    from office_person_detection_vit_tpu.utils.jax_cache import enable_persistent_cache

    enable_persistent_cache()
    if args.artifact:
        # Model-free bring-up: two files, no flax model construction.
        if not args.weights:
            parser.error("--artifact requires --weights")
        from office_person_detection_vit_tpu.detection.export import (
            ExportedDetector,
        )

        detector = ExportedDetector(
            args.artifact, args.weights,
            confidence_threshold=args.confidence,
        )
        h, w = detector.source_hw
        for b in detector._bucket_sizes():  # warm every bucket program
            detector.detect_batch(np.zeros((b, h, w, 3), np.uint8))
            logger.info("warmed bucket %d", b)
        model_name = f"exported:{args.artifact.name}"
    else:
        from office_person_detection_vit_tpu.config.config_manager import (
            ConfigManager,
        )
        from office_person_detection_vit_tpu.detection.ssd_detector import (
            build_detector,
        )

        if args.config:
            cfg = ConfigManager(args.config)
        else:
            det = {"confidence_threshold": 0.5, "batch_size": 8}
            if args.tiny:
                det.update(model_size="tiny", input_height=96, input_width=128,
                           dtype="float32", use_pallas_attention=False)
            cfg = ConfigManager.from_dict({"detection": det})

        detector = build_detector(cfg)
        detector.load_model()
        # Warm every bucket program (1, 2, 4, ..., batch_size) so no request
        # size is hit by compile latency; compiled programs persist in the XLA
        # cache, so this is fast on every start but the machine's first.
        buckets = (
            detector._bucket_sizes()
            if hasattr(detector, "_bucket_sizes")
            else [detector.batch_size]
        )
        for b in buckets:
            detector.detect_batch(np.zeros((b, 720, 1280, 3), np.uint8))
            logger.info("warmed bucket %d", b)
        model_name = str(cfg.get("detection.model", "detr"))
    logger.info("model warm; serving on %s:%d", args.host, args.port)

    batcher = MicroBatcher(detector, max_batch=detector.batch_size)
    info = {
        "model": model_name,
        "batch_size": detector.batch_size,
    }
    server = ThreadingHTTPServer((args.host, args.port), make_handler(batcher, info))
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.server_close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
