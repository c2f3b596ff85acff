"""Online serving: micro-batcher coalescing + HTTP endpoints."""

import json
import threading
import urllib.request

import cv2
import numpy as np
import pytest

from tools.serve import MicroBatcher, make_handler


class FakeDetector:
    """Counts batch calls; returns one fixed detection per frame."""

    batch_size = 4

    def __init__(self):
        self.calls = []

    def detect_batch(self, frames):
        from office_person_detection_vit_tpu.core.dto import detections_to_batch, Detection

        self.calls.append(frames.shape[0])
        dets = [[Detection(bbox=(1, 2, 3, 4), confidence=0.9)] for _ in frames]
        return detections_to_batch(dets, capacity=2)


class TestMicroBatcher:
    def test_single_request(self):
        det = FakeDetector()
        b = MicroBatcher(det, max_batch=4, max_wait_ms=1)
        out = b.submit(np.zeros((8, 8, 3), np.uint8))
        assert out[0]["confidence"] == pytest.approx(0.9)
        assert b.stats["requests"] == 1

    def test_concurrent_requests_coalesce(self):
        det = FakeDetector()
        b = MicroBatcher(det, max_batch=8, max_wait_ms=50)
        results = [None] * 6

        def call(i):
            results[i] = b.submit(np.zeros((8, 8, 3), np.uint8))

        threads = [threading.Thread(target=call, args=(i,)) for i in range(6)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert all(r is not None for r in results)
        # Fewer device calls than requests -> batching happened.
        assert b.stats["batches"] < 6
        assert b.stats["frames"] == 6


class TestHTTPServer:
    @pytest.fixture
    def server(self):
        from http.server import ThreadingHTTPServer

        det = FakeDetector()
        batcher = MicroBatcher(det, max_batch=4, max_wait_ms=1)
        srv = ThreadingHTTPServer(
            ("127.0.0.1", 0), make_handler(batcher, {"model": "fake"})
        )
        thread = threading.Thread(target=srv.serve_forever, daemon=True)
        thread.start()
        yield f"http://127.0.0.1:{srv.server_address[1]}"
        srv.shutdown()
        srv.server_close()

    def test_healthz(self, server):
        with urllib.request.urlopen(f"{server}/healthz") as r:
            doc = json.loads(r.read())
        assert doc["status"] == "ok"
        assert doc["model"] == "fake"

    def test_detect_roundtrip(self, server):
        img = np.zeros((60, 80, 3), np.uint8)
        ok, buf = cv2.imencode(".jpg", img)
        req = urllib.request.Request(
            f"{server}/detect", data=buf.tobytes(), method="POST"
        )
        with urllib.request.urlopen(req) as r:
            doc = json.loads(r.read())
        assert len(doc["detections"]) == 1
        assert doc["detections"][0]["bbox"]["width"] == 3
        assert "latency_ms" in doc

    def test_bad_image_400(self, server):
        req = urllib.request.Request(
            f"{server}/detect", data=b"not an image", method="POST"
        )
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(req)
        assert exc.value.code == 400
