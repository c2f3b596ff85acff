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


class TestExportedServing:
    """serve.py --artifact: the server's detect path runs from a StableHLO
    export + path-keyed weights npz, no model construction
    (detection/export.py::ExportedDetector)."""

    @pytest.fixture(scope="class")
    def artifact(self, tmp_path_factory):
        from office_person_detection_vit_tpu.config.config_manager import (
            ConfigManager,
        )
        from office_person_detection_vit_tpu.detection.detector import DETRDetector
        from office_person_detection_vit_tpu.detection.export import (
            export_detect,
            save_exported,
            save_weights_npz,
        )
        from office_person_detection_vit_tpu.models.detr import DETRConfig

        cfg = ConfigManager.from_dict(
            {"detection": {"confidence_threshold": 0.0, "batch_size": 2,
                           "input_height": 96, "input_width": 128,
                           "dtype": "float32",
                           "use_pallas_attention": False}}
        )
        det = DETRDetector(cfg, detr_config=DETRConfig.tiny(num_classes=5))
        det.load_model()
        d = tmp_path_factory.mktemp("artifact")
        save_exported(export_detect(det, source_hw=(96, 128),
                                    platforms=None), d / "m.stablehlo")
        save_weights_npz(det.variables, d / "w.npz")
        return det, d

    def test_exported_detector_matches_live(self, artifact):
        from office_person_detection_vit_tpu.detection.export import (
            ExportedDetector,
        )

        det, d = artifact
        ed = ExportedDetector(d / "m.stablehlo", d / "w.npz",
                              confidence_threshold=det.confidence_threshold)
        assert ed.source_hw == (96, 128)
        frames = np.random.default_rng(0).integers(0, 255, (3, 96, 128, 3),
                                                   np.uint8)
        got = ed.detect_batch(frames)
        ref = det.detect_batch(frames)
        np.testing.assert_allclose(np.asarray(got.boxes_xywh),
                                   np.asarray(ref.boxes_xywh),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(got.valid),
                                      np.asarray(ref.valid))

    def test_resizes_foreign_resolution_and_scales_boxes(self, artifact):
        """A frame at a different resolution is resized to the baked
        source_hw; boxes come back in ORIGINAL pixels (per-axis
        normalization makes the resize transparent)."""
        from office_person_detection_vit_tpu.detection.export import (
            ExportedDetector,
        )

        det, d = artifact
        ed = ExportedDetector(d / "m.stablehlo", d / "w.npz",
                              confidence_threshold=det.confidence_threshold)
        big = np.random.default_rng(1).integers(0, 255, (1, 192, 256, 3),
                                                np.uint8)
        got = ed.detect_batch(big)
        small = np.stack([cv2.resize(big[0], (128, 96))])
        ref = det.detect_batch(small)
        # Same normalized detections, scaled 2x to the original pixels.
        np.testing.assert_allclose(np.asarray(got.boxes_xywh),
                                   2.0 * np.asarray(ref.boxes_xywh),
                                   rtol=1e-4, atol=1e-3)

    def test_empty_batch_returns_empty(self, artifact):
        """F=0 must not crash (ADVICE r2): no dispatch, empty DetectionBatch."""
        from office_person_detection_vit_tpu.detection.export import (
            ExportedDetector,
        )

        det, d = artifact
        ed = ExportedDetector(d / "m.stablehlo", d / "w.npz")
        got = ed.detect_batch(np.zeros((0, 96, 128, 3), np.uint8))
        assert got.boxes_xywh.shape[0] == 0
        assert got.valid.shape[0] == 0 and got.foot.shape[0] == 0

    def test_anisotropic_resize_scales_boxes_per_axis(self, artifact):
        """A foreign resolution with a DIFFERENT aspect ratio: the host
        applies per-axis stretch (x by W0/w, y by H0/h) so boxes land in
        the caller's pixels (ADVICE r2: the exported decode's min-scale
        letterbox inversion is not per-axis separable)."""
        from office_person_detection_vit_tpu.detection.export import (
            ExportedDetector,
        )

        det, d = artifact
        ed = ExportedDetector(d / "m.stablehlo", d / "w.npz",
                              confidence_threshold=det.confidence_threshold)
        big = np.random.default_rng(2).integers(0, 255, (1, 192, 512, 3),
                                                np.uint8)  # sy=2, sx=4
        got = ed.detect_batch(big)
        small = np.stack([cv2.resize(big[0], (128, 96))])
        ref = det.detect_batch(small)
        scale = np.asarray([4.0, 2.0, 4.0, 2.0], np.float32)
        np.testing.assert_allclose(np.asarray(got.boxes_xywh),
                                   scale * np.asarray(ref.boxes_xywh),
                                   rtol=1e-4, atol=1e-3)
        np.testing.assert_allclose(np.asarray(got.foot),
                                   np.asarray([4.0, 2.0], np.float32)
                                   * np.asarray(ref.foot),
                                   rtol=1e-4, atol=1e-3)

    def test_microbatcher_serves_exported(self, artifact):
        from office_person_detection_vit_tpu.detection.export import (
            ExportedDetector,
        )

        det, d = artifact
        ed = ExportedDetector(d / "m.stablehlo", d / "w.npz",
                              confidence_threshold=det.confidence_threshold)
        b = MicroBatcher(ed, max_batch=2, max_wait_ms=1)
        out = b.submit(np.zeros((96, 128, 3), np.uint8))
        assert isinstance(out, list)
        assert b.stats["requests"] == 1

    def test_exported_call_is_cached_jit(self, artifact):
        """Exported.call re-traces the module per invocation (seconds per
        call at full scale); jitted_call must hand back ONE cached jit per
        Exported so repeat requests hit the executable cache."""
        from office_person_detection_vit_tpu.detection.export import (
            jitted_call,
            load_exported,
        )

        _, d = artifact
        exp = load_exported(d / "m.stablehlo")
        assert jitted_call(exp) is jitted_call(exp)

    def test_weights_resident_on_device(self, artifact):
        """ExportedDetector device_puts the weights once — host-numpy
        leaves would re-upload the whole tree (~160 MB for the full model)
        on every request."""
        import jax

        from office_person_detection_vit_tpu.detection.export import (
            ExportedDetector,
        )

        _, d = artifact
        ed = ExportedDetector(d / "m.stablehlo", d / "w.npz")
        leaves = jax.tree_util.tree_leaves(ed.variables)
        assert all(isinstance(l, jax.Array) for l in leaves)

    def test_fixed_batch_artifact_chunks_and_pads(self, artifact, tmp_path):
        """A fixed-batch artifact serving F > exported_batch frames chunks
        into padded dispatches and strips padding - results match the live
        detector exactly."""
        from office_person_detection_vit_tpu.detection.export import (
            ExportedDetector,
            export_detect,
            save_exported,
        )

        det, d = artifact
        save_exported(export_detect(det, batch_size=2, source_hw=(96, 128),
                                    platforms=None), tmp_path / "b2.stablehlo")
        ed = ExportedDetector(tmp_path / "b2.stablehlo", d / "w.npz",
                              confidence_threshold=det.confidence_threshold)
        assert ed.exported_batch == 2
        frames = np.random.default_rng(4).integers(0, 255, (5, 96, 128, 3),
                                                   np.uint8)
        got = ed.detect_batch(frames)  # 3 dispatches: 2+2+2(pad 1)
        assert np.asarray(got.scores).shape[0] == 5
        ref = det.detect_batch(frames)
        np.testing.assert_allclose(np.asarray(got.boxes_xywh),
                                   np.asarray(ref.boxes_xywh),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(got.valid),
                                      np.asarray(ref.valid))
