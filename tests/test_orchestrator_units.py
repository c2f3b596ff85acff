"""Orchestrator unit tests (reference tests/test_orchestrator.py analog):
datetime-range parsing, frame fallback chain, summary schema, detection
round-trip through artifact dicts."""

import json
from datetime import datetime
from pathlib import Path

import cv2
import numpy as np
import pytest

from office_person_detection_vit_tpu.config.config_manager import ConfigManager
from office_person_detection_vit_tpu.core.dto import Detection, FrameResult
from office_person_detection_vit_tpu.pipeline.orchestrator import (
    PipelineOrchestrator,
    _detection_from_dict,
)


def _orchestrator(tmp_path, **over):
    data = {
        "video": {
            "input_path": str(tmp_path / "missing.mp4"), "fps": 30,
            "frame_interval_minutes": 5, "tolerance_seconds": 60,
            "time_compression_ratio": 313.0,
        },
        "detection": {"confidence_threshold": 0.5, "batch_size": 2, "device": "cpu"},
        "output": {"directory": str(tmp_path / "out")},
    }
    cfg = ConfigManager.from_dict(data)
    for k, v in over.items():
        cfg.set(k, v)
    return PipelineOrchestrator(cfg)


class TestParseDatetimeRange:
    def test_full_format(self, tmp_path):
        orch = _orchestrator(tmp_path)
        s, e = orch.parse_datetime_range("2025-01-20 09:00:00", "2025-01-20 10:00:00")
        assert s == datetime(2025, 1, 20, 9) and e == datetime(2025, 1, 20, 10)

    def test_minute_format_and_isoformat(self, tmp_path):
        orch = _orchestrator(tmp_path)
        s, _ = orch.parse_datetime_range("2025-01-20 09:30", None)
        assert s == datetime(2025, 1, 20, 9, 30)
        s2, _ = orch.parse_datetime_range("2025-01-20T09:30:15", None)
        assert s2 == datetime(2025, 1, 20, 9, 30, 15)

    def test_none_passthrough(self, tmp_path):
        assert _orchestrator(tmp_path).parse_datetime_range(None, None) == (None, None)

    def test_garbage_raises(self, tmp_path):
        with pytest.raises(ValueError, match="unparseable"):
            _orchestrator(tmp_path).parse_datetime_range("next tuesday", None)


class TestFrameFallbackChain:
    def test_loads_from_frame_path(self, tmp_path):
        orch = _orchestrator(tmp_path)
        img = np.full((24, 32, 3), 55, np.uint8)
        p = tmp_path / "frame_7.png"
        cv2.imwrite(str(p), img)
        orch.frame_results = [FrameResult(7, None, frame_path=str(p))]
        frames = orch.prepare_frames_for_detection()
        assert len(frames) == 1
        np.testing.assert_array_equal(frames[0], img)

    def test_unavailable_frame_dropped(self, tmp_path):
        orch = _orchestrator(tmp_path)
        orch.frame_results = [
            FrameResult(1, None, frame_path=str(tmp_path / "gone.png")),
        ]
        frames = orch.prepare_frames_for_detection()
        assert frames == []
        assert orch.frame_results == []  # kept list mirrors loadable frames

    def test_redecodes_from_video_when_path_missing(self, tmp_path):
        from tests.helpers.synthetic_video import write_video

        video_path = tmp_path / "v.mp4"
        write_video(video_path, num_frames=10, fps=5)
        orch = _orchestrator(tmp_path, **{"video.input_path": str(video_path)})
        orch.frame_results = [FrameResult(3, None, frame_path=None)]
        frames = orch.prepare_frames_for_detection()
        assert len(frames) == 1
        assert frames[0].shape == (720, 1280, 3)


class TestSummary:
    def test_summary_schema_and_stats(self, tmp_path):
        orch = _orchestrator(tmp_path)
        orch.setup_output_directories()
        orch.frame_results = [
            FrameResult(0, None, [Detection(bbox=(0, 0, 5, 5), confidence=0.9)]),
            FrameResult(1, None, []),
        ]
        path = orch.save_session_summary()
        doc = json.loads(path.read_text())
        assert doc["status"] == "completed"
        assert doc["statistics"]["total_detections"] == 1
        assert doc["statistics"]["avg_detections_per_frame"] == 0.5
        import jsonschema

        repo_root = Path(__file__).resolve().parents[1]
        schema = json.loads((repo_root / "schemas" / "summary.schema.json").read_text())
        jsonschema.validate(doc, schema)

    def test_failed_status(self, tmp_path):
        orch = _orchestrator(tmp_path)
        orch.setup_output_directories()
        doc = json.loads(orch.save_session_summary(status="failed").read_text())
        assert doc["status"] == "failed"


class TestDetectionRoundTrip:
    def test_full_form(self):
        det = Detection(
            bbox=(10.0, 20.0, 30.0, 40.0), confidence=0.75,
            floor_coords_px=(1.5, 2.5), floor_coords_mm=(42.0, 70.0),
            zone_ids=["z1"], track_id=3,
        )
        back = _detection_from_dict(det.to_dict())
        assert back.bbox == det.bbox
        assert back.confidence == det.confidence
        assert back.floor_coords_mm == det.floor_coords_mm
        assert back.zone_ids == det.zone_ids
        assert back.track_id == det.track_id

    def test_compact_form(self):
        det = Detection(
            bbox=(10.0, 20.0, 30.0, 40.0), confidence=0.75,
            floor_coords_mm=(42.0, 70.0), zone_ids=["z1"], track_id=3,
        )
        back = _detection_from_dict(det.to_compact_dict(precision=1))
        assert back.bbox == det.bbox
        assert back.track_id == 3 and back.zone_ids == ["z1"]
        assert back.floor_coords_mm == pytest.approx(det.floor_coords_mm)
