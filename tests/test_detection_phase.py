"""DetectionPhase unit tests with a stub detector (reference
tests/test_detection_phase.py analog — the reference patches YOLOv8Detector;
here a stub implementing the detector contract plays that role)."""

import json
from datetime import datetime

import numpy as np
import pytest

from office_person_detection_vit_tpu.config.config_manager import ConfigManager
from office_person_detection_vit_tpu.core.dto import (
    Detection,
    FrameResult,
    detections_to_batch,
)
from office_person_detection_vit_tpu.pipeline.phases.detection import DetectionPhase


class StubDetector:
    """Implements the DetectionPhase-facing detector contract."""

    def __init__(self, per_frame_boxes=None, attention=None):
        self.model = object()  # non-None => load_model not called
        self.per_frame_boxes = per_frame_boxes or {}
        self.attention = attention
        self.load_calls = 0
        self.cleaned = False

    def load_model(self):
        self.load_calls += 1
        self.model = object()

    def detect_batch(self, stack):
        frames = [
            [
                Detection(bbox=b, confidence=c)
                for b, c in self.per_frame_boxes.get(i, [((100, 100, 50, 120), 0.9)])
            ]
            for i in range(stack.shape[0])
        ]
        return detections_to_batch(frames, capacity=8)

    def get_attention_map(self, frame):
        return self.attention

    def cleanup(self):
        self.cleaned = True


def _cfg(tmp_path, **over):
    data = {"detection": {"confidence_threshold": 0.5}, "output": {}}
    cfg = ConfigManager.from_dict(data)
    for k, v in over.items():
        cfg.set(k, v)
    return cfg


def _inputs(n=3):
    frames = [np.zeros((64, 96, 3), np.uint8) for _ in range(n)]
    frame_results = [
        FrameResult(i, datetime(2025, 1, 20, 9, 5 * i, 0)) for i in range(n)
    ]
    return frames, frame_results


class TestDetectionPhase:
    def test_fills_frame_results_in_place(self, tmp_path):
        phase = DetectionPhase(_cfg(tmp_path), detector=StubDetector())
        frames, frs = _inputs()
        out = phase.execute(frames, frs)
        assert out is frs
        assert all(len(fr.detections) == 1 for fr in frs)
        assert frs[0].detections[0].bbox == (100.0, 100.0, 50.0, 120.0)

    def test_statistics_computed_and_exported(self, tmp_path):
        det = StubDetector(
            per_frame_boxes={
                0: [((0, 0, 10, 10), 0.8), ((20, 20, 10, 10), 0.6)],
                1: [((5, 5, 10, 10), 1.0)],
                2: [],
            }
        )
        phase = DetectionPhase(_cfg(tmp_path), detector=det)
        frames, frs = _inputs()
        phase.execute(frames, frs, output_dir=tmp_path / "02")
        s = json.loads((tmp_path / "02" / "detection_statistics.json").read_text())
        assert s["total_detections"] == 3
        assert s["total_frames"] == 3
        assert s["avg_detections_per_frame"] == pytest.approx(1.0)
        assert s["confidence"]["mean"] == pytest.approx(0.8)

    def test_detections_artifact_written(self, tmp_path):
        phase = DetectionPhase(_cfg(tmp_path), detector=StubDetector())
        frames, frs = _inputs(2)
        phase.execute(frames, frs, output_dir=tmp_path / "02")
        doc = json.loads((tmp_path / "02" / "detections.json").read_text())
        assert len(doc["frames"]) == 2
        # float32 storage in DetectionBatch
        assert doc["frames"][0]["detections"][0]["confidence"] == pytest.approx(0.9)
        assert doc["frames"][1]["timestamp"] == "2025-01-20 09:05:00"

    def test_transfer_format_persisted_in_statistics(self, tmp_path):
        """The (possibly raced) transfer format lands in the exported
        statistics so operators see the locked-in choice (VERDICT r4 #7)."""
        det = StubDetector()
        det.transfer_format = "i420"  # as locked in by the auto race
        phase = DetectionPhase(_cfg(tmp_path), detector=det)
        frames, frs = _inputs()
        phase.execute(frames, frs, output_dir=tmp_path / "02")
        s = json.loads((tmp_path / "02" / "detection_statistics.json").read_text())
        assert s["transfer_format"] == "i420"

    def test_empty_frames_yields_zero_stats(self, tmp_path):
        phase = DetectionPhase(_cfg(tmp_path), detector=StubDetector())
        out = phase.execute([], [])
        assert out == []
        assert phase.statistics["total_detections"] == 0

    def test_save_images_flag(self, tmp_path):
        cfg = _cfg(tmp_path, **{"output.save_detection_images": True})
        phase = DetectionPhase(cfg, detector=StubDetector())
        frames, frs = _inputs(2)
        phase.execute(frames, frs, output_dir=tmp_path / "02")
        imgs = list((tmp_path / "02").glob("detection_*.jpg"))
        assert len(imgs) == 2

    def test_attention_maps_saved_when_available(self, tmp_path):
        cfg = _cfg(tmp_path, **{"output.save_attention_maps": True})
        amap = np.random.default_rng(0).random((8, 12)).astype(np.float32)
        phase = DetectionPhase(cfg, detector=StubDetector(attention=amap))
        frames, frs = _inputs(2)
        phase.execute(frames, frs, output_dir=tmp_path / "02")
        assert len(list((tmp_path / "02").glob("attention_*.jpg"))) == 2

    def test_attention_none_stops_quietly(self, tmp_path):
        cfg = _cfg(tmp_path, **{"output.save_attention_maps": True})
        phase = DetectionPhase(cfg, detector=StubDetector(attention=None))
        frames, frs = _inputs(1)
        phase.execute(frames, frs, output_dir=tmp_path / "02")
        assert not list((tmp_path / "02").glob("attention_*.jpg"))

    def test_initialize_skips_loaded_model(self, tmp_path):
        det = StubDetector()
        phase = DetectionPhase(_cfg(tmp_path), detector=det)
        phase.initialize()
        assert det.load_calls == 0

    def test_cleanup_delegates(self, tmp_path):
        det = StubDetector()
        phase = DetectionPhase(_cfg(tmp_path), detector=det)
        phase.cleanup()
        assert det.cleaned
