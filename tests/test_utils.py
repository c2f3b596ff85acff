"""Utils layer: sessions, checkpoints, perf monitor, stats, image/export."""

import json
import logging

import numpy as np
import pytest

from office_person_detection_vit_tpu.core.dto import Detection, FrameResult, detections_to_batch
from office_person_detection_vit_tpu.utils.checkpoint_manager import (
    PHASE_ORDER,
    CheckpointManager,
)
from office_person_detection_vit_tpu.utils.image_utils import (
    draw_detections,
    save_detection_image,
    track_id_color,
)
from office_person_detection_vit_tpu.utils.logging_utils import setup_logging
from office_person_detection_vit_tpu.utils.output_manager import (
    OutputManager,
    reproducibility_info,
)
from office_person_detection_vit_tpu.utils.performance_monitor import PerformanceMonitor
from office_person_detection_vit_tpu.utils.stats_utils import (
    calculate_detection_statistics,
    calculate_frame_statistics,
)


def _det(x=10, y=20, w=30, h=60, conf=0.9, tid=None):
    return Detection(bbox=(x, y, w, h), confidence=conf, track_id=tid)


class TestOutputManager:
    def test_create_session_layout(self, tmp_path):
        om = OutputManager(tmp_path)
        session = om.create_session("20260101_120000")
        for sub in (
            "01_extraction",
            "02_detection",
            "03_tracking",
            "04_transform",
            "05_aggregation",
            "06_visualization",
        ):
            assert (session / sub).is_dir()
        assert (tmp_path / "latest").resolve() == session.resolve()

    def test_get_phase_dir_by_suffix(self, tmp_path):
        om = OutputManager(tmp_path)
        om.create_session("20260101_120000")
        assert om.get_phase_dir("detection").name == "02_detection"
        assert om.get_phase_dir("02_detection").name == "02_detection"
        with pytest.raises(KeyError):
            om.get_phase_dir("nope")

    def test_metadata_schema_fields(self, tmp_path):
        om = OutputManager(tmp_path)
        om.create_session("20260101_120000")
        path = om.save_metadata({"video": {"input_path": "x.mp4"}})
        meta = json.loads(path.read_text())
        assert meta["session_id"] == "20260101_120000"
        assert "timestamp" in meta and "config" in meta
        repro = meta["reproducibility"]
        assert repro["python_version_info"]["major"] == 3
        assert "jax_backend" in repro

    def test_list_sessions(self, tmp_path):
        om = OutputManager(tmp_path)
        om.create_session("20260101_120000")
        om.save_metadata({})
        om2 = OutputManager(tmp_path)
        om2.create_session("20260101_130000")
        om2.save_metadata({})
        assert OutputManager(tmp_path).list_sessions() == [
            "20260101_120000",
            "20260101_130000",
        ]

    def test_repro_info_standalone(self):
        info = reproducibility_info()
        assert "platform" in info


class TestCheckpointManager:
    def test_save_and_query(self, tmp_path):
        cm = CheckpointManager(tmp_path)
        cm.save_phase("01_extraction", data={"frames": 5})
        cm.save_phase("02_detection")
        assert cm.is_completed("01_extraction")
        assert cm.get_phase_data("01_extraction") == {"frames": 5}
        assert cm.get_last_completed_phase() == "02_detection"
        assert cm.get_resumable_phase() == "03_tracking"

    def test_reload_from_disk(self, tmp_path):
        cm = CheckpointManager(tmp_path)
        cm.save_phase("01_extraction")
        cm2 = CheckpointManager(tmp_path)
        assert cm2.is_completed("01_extraction")
        assert cm2.get_resumable_phase() == "02_detection"

    def test_all_completed(self, tmp_path):
        cm = CheckpointManager(tmp_path)
        for phase in PHASE_ORDER:
            cm.save_phase(phase)
        assert cm.get_resumable_phase() is None

    def test_checkpoint_file_contract(self, tmp_path):
        cm = CheckpointManager(tmp_path)
        cm.save_phase("01_extraction", status="failed")
        data = json.loads((tmp_path / "pipeline_checkpoint.json").read_text())
        assert data["session_dir"] == str(tmp_path)
        assert data["phases"]["01_extraction"]["status"] == "failed"
        assert data["last_phase"] is None  # failed phases don't advance


class TestPerformanceMonitor:
    def test_measure_accumulates(self):
        pm = PerformanceMonitor()
        with pm.measure("op"):
            pass
        with pm.measure("op"):
            pass
        s = pm.get_summary()["op"]
        assert s["count"] == 2
        assert s["total_time"] >= s["max_time"] >= s["min_time"] >= 0
        assert s["avg_time"] == pytest.approx(s["total_time"] / 2, abs=1e-6)

    def test_reset(self):
        pm = PerformanceMonitor()
        with pm.measure("x"):
            pass
        pm.reset()
        assert pm.get_summary() == {}


class TestStats:
    def test_batch_statistics(self):
        frames = [
            [_det(conf=0.8), _det(conf=0.6)],
            [_det(conf=1.0)],
            [],
        ]
        batch = detections_to_batch(frames, capacity=4)
        stats = calculate_detection_statistics(batch)
        assert stats["total_frames"] == 3
        assert stats["total_detections"] == 3
        assert stats["avg_detections_per_frame"] == pytest.approx(1.0)
        assert stats["max_detections_per_frame"] == 2
        assert stats["min_detections_per_frame"] == 0
        assert stats["confidence"]["mean"] == pytest.approx(0.8, abs=1e-6)
        assert stats["confidence"]["min"] == pytest.approx(0.6, abs=1e-6)
        assert stats["confidence"]["max"] == pytest.approx(1.0, abs=1e-6)

    def test_empty_frames(self):
        stats = calculate_frame_statistics([])
        assert stats["total_detections"] == 0

    def test_frame_results_wrapper(self):
        frames = [FrameResult(0, None, [_det()]), FrameResult(1, None, [])]
        stats = calculate_frame_statistics(frames)
        assert stats["total_detections"] == 1


class TestImageUtils:
    def test_track_color_deterministic_distinct(self):
        assert track_id_color(1) == track_id_color(1)
        assert track_id_color(1) != track_id_color(2)

    def test_draw_and_save(self, tmp_path, sample_frame):
        dets = [_det(tid=3), _det(x=200, y=100, conf=0.5)]
        img = draw_detections(sample_frame, dets, draw_track_ids=True)
        assert img.shape == sample_frame.shape
        assert img.sum() > 0  # something was drawn
        out = save_detection_image(sample_frame, dets, tmp_path / "d.jpg")
        assert out.exists()


class TestLogging:
    def test_setup_creates_logfile(self, tmp_path):
        logger = setup_logging(debug=True, output_dir=tmp_path)
        logging.getLogger("t").info("hello")
        assert (tmp_path / "system.log").exists()
        # Reconfigure must not duplicate handlers.
        setup_logging(debug=False)
        assert (
            len([h for h in logger.handlers]) == 1
        )


def test_empty_batch_statistics():
    """Regression: zero-frame DetectionBatch must not raise."""
    from office_person_detection_vit_tpu.core.dto import DetectionBatch
    import numpy as np

    batch = DetectionBatch(
        boxes_xywh=np.zeros((0, 1, 4), np.float32),
        scores=np.zeros((0, 1), np.float32),
        valid=np.zeros((0, 1), bool),
        foot=np.zeros((0, 1, 2), np.float32),
    )
    stats = calculate_detection_statistics(batch)
    assert stats["total_detections"] == 0
    assert stats["total_frames"] == 0
