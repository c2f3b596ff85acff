"""End-to-end pipeline: synthetic video -> 5 phases -> artifacts.

Mirrors the reference's integration strategy (SURVEY.md §4) but with a real
backend (tiny random-init DETR on CPU) instead of mocks, plus checkpoint
resume — which the reference designed but never wired.
"""

import json
from datetime import datetime

import numpy as np
import pytest

from office_person_detection_vit_tpu.config.config_manager import ConfigManager
from office_person_detection_vit_tpu.core.dto import Detection, FrameResult
from office_person_detection_vit_tpu.pipeline.orchestrator import PipelineOrchestrator
from office_person_detection_vit_tpu.pipeline.phases.aggregation import AggregationPhase
from office_person_detection_vit_tpu.pipeline.phases.tracking import TrackingPhase
from office_person_detection_vit_tpu.pipeline.phases.transform import TransformPhase
from tests.helpers.synthetic_video import write_video

H_IDENТITY_ISH = [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]

ZONES = [
    {"id": "zone_a", "name": "A", "polygon": [[0, 0], [640, 0], [640, 720], [0, 720]]},
    {"id": "zone_b", "name": "B", "polygon": [[640, 0], [1280, 0], [1280, 720], [640, 720]]},
]


def _config(tmp_path, video_path, **overrides):
    cfg = {
        "video": {
            "input_path": str(video_path),
            "fps": 30,
            "frame_interval_minutes": 5,
            "tolerance_seconds": 60,
            "time_compression_ratio": 313.0,
        },
        "detection": {
            "confidence_threshold": 0.0,
            "batch_size": 2,
            "device": "cpu",
            "model_size": "tiny",
            "input_height": 96,
            "input_width": 128,
            "dtype": "float32",
            "use_pallas_attention": False,
        },
        "transform": {"method": "homography"},
        "homography": {"matrix": H_IDENТITY_ISH},
        "zones": ZONES,
        "output": {
            "directory": str(tmp_path / "output"),
            "save_floormap_images": True,
        },
        "timestamp": {
            "extraction_mode": "auto_targets",
            "auto_targets": {"max_frames": 60, "disable_validation": True},
            "sampling": {"coarse_interval_seconds": 0.5},
            "extraction": {"confidence_threshold": 0.3},
        },
    }
    for dot, v in overrides.items():
        node = cfg
        parts = dot.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return ConfigManager.from_dict(cfg)


@pytest.fixture(scope="module")
def video(tmp_path_factory):
    path = tmp_path_factory.mktemp("video") / "synthetic.mp4"
    # 60 frames @30fps, ratio 313 -> ~10.4 wall-clock minutes -> 2 targets.
    write_video(path, num_frames=60)
    return path


class TestFullPipeline:
    @pytest.fixture(scope="class")
    def run_result(self, video, tmp_path_factory):
        tmp = tmp_path_factory.mktemp("e2e")
        cfg = _config(tmp, video)
        orch = PipelineOrchestrator(cfg)
        result = orch.run()
        return tmp, cfg, orch, result

    def test_artifacts_exist(self, run_result):
        tmp, cfg, orch, result = run_result
        session = orch.output.session_dir
        assert (session / "metadata.json").exists()
        assert (session / "summary.json").exists()
        assert (session / "pipeline_checkpoint.json").exists()
        assert (session / "01_extraction" / "extraction_results.csv").exists()
        assert (session / "02_detection" / "detection_statistics.json").exists()
        assert (session / "04_transform" / "coordinate_transformations.json").exists()
        assert (session / "05_aggregation" / "zone_counts.csv").exists()
        assert (session / "06_visualization" / "zone_time_series.png").exists()

    def test_frames_extracted(self, run_result):
        _, _, orch, _ = run_result
        assert len(orch.frame_results) >= 1
        for fr in orch.frame_results:
            assert isinstance(fr.timestamp, datetime)

    def test_summary_schema(self, run_result):
        _, _, orch, _ = run_result
        summary = json.loads((orch.output.session_dir / "summary.json").read_text())
        assert summary["status"] == "completed"
        assert summary["statistics"]["frames_extracted"] == len(orch.frame_results)
        assert "01_extraction" in summary["performance"]

    def test_transform_json_contract(self, run_result):
        _, _, orch, _ = run_result
        doc = json.loads(
            (orch.output.session_dir / "04_transform" / "coordinate_transformations.json").read_text()
        )
        assert doc["transform_method"] == "homography"
        assert len(doc["frames"]) == len(orch.frame_results)
        for fdoc in doc["frames"]:
            for d in fdoc["detections"]:
                assert {"bbox", "confidence", "camera_coords"} <= set(d)

    def test_zone_counts_csv(self, run_result):
        _, _, orch, _ = run_result
        text = (orch.output.session_dir / "05_aggregation" / "zone_counts.csv").read_text()
        header = text.splitlines()[0]
        assert "zone_a" in header and "zone_b" in header

    def test_resume_skips_completed(self, run_result, video):
        tmp, cfg, orch, _ = run_result
        session = orch.output.session_dir
        orch2 = PipelineOrchestrator(cfg)
        result2 = orch2.run(resume_session=session)
        # Resume must reload phase-1 artifacts rather than re-OCR.
        assert len(orch2.frame_results) == len(orch.frame_results)
        assert result2["session_dir"] == str(session)
        # Performance log should NOT contain extraction (it was skipped).
        assert "01_extraction" not in orch2.perf.summary()


class TestTimestampsOnly:
    def test_phase1_only(self, video, tmp_path):
        cfg = _config(tmp_path, video)
        orch = PipelineOrchestrator(cfg)
        result = orch.run(timestamps_only=True)
        assert result["frames"] >= 1
        session = orch.output.session_dir
        assert (session / "01_extraction" / "extraction_results.csv").exists()
        assert not any((session / "02_detection").iterdir())


class TestPhaseUnits:
    """Phase-level tests with hand-made detections (no detector)."""

    def _frame_results(self):
        return [
            FrameResult(
                0, datetime(2025, 1, 20, 9, 0, 0),
                [Detection(bbox=(100, 200, 50, 130), confidence=0.9),
                 Detection(bbox=(900, 300, 60, 140), confidence=0.8)],
            ),
            FrameResult(
                1, datetime(2025, 1, 20, 9, 5, 0),
                [Detection(bbox=(110, 205, 50, 130), confidence=0.85)],
            ),
        ]

    def test_transform_phase_fills_coords(self, tmp_path, video):
        cfg = _config(tmp_path, video)
        frs = self._frame_results()
        TransformPhase(cfg).execute(frs, tmp_path / "t")
        det = frs[0].detections[0]
        assert det.floor_coords_px is not None
        # Identity homography: floor px == foot point.
        assert det.floor_coords_px[0] == pytest.approx(125.0, abs=1e-3)
        assert det.floor_coords_px[1] == pytest.approx(330.0, abs=1e-3)
        assert det.zone_ids == ["zone_a"]
        assert frs[0].detections[1].zone_ids == ["zone_b"]

    def test_aggregation_phase(self, tmp_path, video):
        cfg = _config(tmp_path, video)
        frs = self._frame_results()
        TransformPhase(cfg).execute(frs)
        results = AggregationPhase(cfg).execute(frs, tmp_path / "a")
        assert results[0].zone_counts["zone_a"] == 1
        assert results[0].zone_counts["zone_b"] == 1
        assert results[1].zone_counts["zone_a"] == 1
        assert (tmp_path / "a" / "zone_counts.csv").exists()

    def test_tracking_phase_assigns_ids(self, tmp_path, video):
        cfg = _config(tmp_path, video, **{"tracking.enabled": True})
        frs = self._frame_results()
        TrackingPhase(cfg).execute(frs, output_dir=tmp_path / "trk")
        ids0 = {d.track_id for d in frs[0].detections}
        assert None not in ids0
        # The nearby detection in frame 1 keeps its identity.
        assert frs[1].detections[0].track_id in ids0
        assert (tmp_path / "trk" / "tracks_mot.csv").exists()
        assert (tmp_path / "trk" / "tracking_statistics.json").exists()

    def test_dense_aggregation_dedup(self, tmp_path, video):
        cfg = _config(tmp_path, video, **{"tracking.enabled": True})
        phase = TrackingPhase(cfg)
        # Same track id seen densely within one 5-min window.
        frs = [
            FrameResult(
                i, datetime(2025, 1, 20, 9, 0, 10 * i),
                [Detection(bbox=(100 + i, 200, 50, 130), confidence=0.5 + 0.01 * i,
                           track_id=7)],
            )
            for i in range(5)
        ]
        out = phase.aggregate_to_output_intervals(frs, output_interval_minutes=5)
        assert len(out) == 1
        assert len(out[0].detections) == 1
        assert out[0].detections[0].confidence == pytest.approx(0.54)


class TestHybridTracking:
    def test_hybrid_mode_interpolates_gap_frames(self, tmp_path, video):
        from tests.test_pipeline_e2e import TestPhaseUnits

        cfg = _config(
            tmp_path, video,
            **{"tracking.enabled": True, "tracking.hybrid_mode.enabled": True,
               "tracking.hybrid_mode.use_optical_flow": False},
        )
        frs = [
            FrameResult(0, datetime(2025, 1, 20, 9, 0, 0),
                        [Detection(bbox=(100, 200, 50, 130), confidence=0.9)]),
            FrameResult(1, datetime(2025, 1, 20, 9, 0, 10), []),  # gap frame
            FrameResult(2, datetime(2025, 1, 20, 9, 0, 20),
                        [Detection(bbox=(104, 202, 50, 130), confidence=0.9)]),
        ]
        TrackingPhase(cfg).execute(frs)
        # Gap frame gained an interpolated detection with the same id.
        assert len(frs[1].detections) == 1
        tid = frs[0].detections[0].track_id
        assert tid is not None
        assert frs[1].detections[0].track_id == tid
        assert frs[2].detections[0].track_id == tid


class TestAttentionMaps:
    def test_detection_phase_saves_attention_overlays(self, tmp_path, video):
        from office_person_detection_vit_tpu.pipeline.phases.detection import (
            DetectionPhase,
        )

        cfg = _config(tmp_path, video, **{"output.save_attention_maps": True})
        phase = DetectionPhase(cfg)
        frames = [np.zeros((72, 96, 3), np.uint8)]
        frs = [FrameResult(0, datetime(2025, 1, 20, 9, 0, 0))]
        phase.execute(frames, frs, tmp_path / "det")
        overlays = list((tmp_path / "det").glob("attention_*.jpg"))
        assert len(overlays) == 1


class TestPartialResume:
    def test_resume_after_detection_only(self, video, tmp_path):
        """Phase 2 done, later phases not: resumed run must keep detections."""
        cfg = _config(tmp_path, video)
        orch = PipelineOrchestrator(cfg)
        orch.setup_output_directories()
        orch.extract_frames()
        orch.prepare_frames_for_detection()
        orch.run_detection()
        session = orch.output.session_dir
        total_dets = sum(len(fr.detections) for fr in orch.frame_results)
        assert (session / "02_detection" / "detections.json").exists()

        orch2 = PipelineOrchestrator(cfg)
        result = orch2.run(resume_session=session)
        assert result["statistics"]["total_detections"] == total_dets
        # Transform ran on the reloaded detections.
        assert (session / "04_transform" / "coordinate_transformations.json").exists()
        assert "02_detection" not in orch2.perf.summary()


class TestAlternateConfigurations:
    def test_pipeline_with_pwa_transform(self, tmp_path, video):
        """Full run with piecewise-affine from a correspondence file."""
        import json as _json

        rng = np.random.default_rng(0)
        cam = rng.uniform(0, 1280, (8, 2))
        cam[:, 1] = rng.uniform(0, 720, 8)
        floor = cam * 1.5 + 10.0
        corr = {"points": [{"camera": c.tolist(), "floormap": f.tolist()}
                           for c, f in zip(cam, floor)]}
        corr_path = tmp_path / "corr.json"
        corr_path.write_text(_json.dumps(corr))
        cfg = _config(
            tmp_path, video,
            **{"transform.method": "piecewise_affine",
               "calibration.correspondence_file": str(corr_path)},
        )
        frs = [FrameResult(0, datetime(2025, 1, 20, 9, 0, 0),
                           [Detection(bbox=(300, 200, 50, 130), confidence=0.9)])]
        TransformPhase(cfg).execute(frs, tmp_path / "t")
        det = frs[0].detections[0]
        # Affine map inside the hull: floor = cam * 1.5 + 10.
        assert det.floor_coords_px[0] == pytest.approx(325 * 1.5 + 10, abs=1.0)
        assert det.floor_coords_px[1] == pytest.approx(330 * 1.5 + 10, abs=1.0)

    def test_pipeline_with_ssd_detector(self, tmp_path, video):
        """Orchestrated run with the alternate detector family."""
        cfg = _config(tmp_path, video, **{"detection.model": "ssd"})
        orch = PipelineOrchestrator(cfg)
        result = orch.run()
        from office_person_detection_vit_tpu.detection.ssd_detector import SSDDetector

        assert isinstance(orch.detection_phase.detector, SSDDetector)
        session = orch.output.session_dir
        assert (session / "05_aggregation" / "zone_counts.csv").exists()

    def test_pipeline_with_yolo_detector(self, tmp_path, video):
        """Orchestrated run with the YOLOv8 family — the reference's
        shipping detector architecture (yolov8_detector.py)."""
        cfg = _config(tmp_path, video, **{"detection.model": "yolo"})
        orch = PipelineOrchestrator(cfg)
        result = orch.run()
        from office_person_detection_vit_tpu.detection.yolo_detector import (
            YOLODetector,
        )

        assert isinstance(orch.detection_phase.detector, YOLODetector)
        session = orch.output.session_dir
        assert (session / "05_aggregation" / "zone_counts.csv").exists()


class TestFailurePaths:
    def test_failed_run_writes_failed_summary(self, tmp_path, video):
        """An exception mid-pipeline must still produce summary.json with
        status=failed (reference main.py:120-136 exit taxonomy)."""
        import sys
        from pathlib import Path as _P

        sys.path.insert(0, str(_P(__file__).resolve().parents[1]))
        from main import main as cli_main
        import yaml as _yaml

        cfg = {
            "video": {"input_path": str(video), "fps": 30,
                      "frame_interval_minutes": 5, "tolerance_seconds": 60,
                      "time_compression_ratio": 313.0},
            "detection": {"confidence_threshold": 0.0, "batch_size": 2,
                          "device": "cpu", "model_size": "tiny",
                          "input_height": 96, "input_width": 128,
                          "dtype": "float32", "use_pallas_attention": False},
            # Invalid homography (singular) -> TransformPhase raises.
            "transform": {"method": "homography"},
            "homography": {"matrix": [[0, 0, 0], [0, 0, 0], [0, 0, 0]]},
            "zones": ZONES,
            "output": {"directory": str(tmp_path / "output"),
                       "save_floormap_images": False},
            "timestamp": {
                "extraction_mode": "auto_targets",
                "auto_targets": {"max_frames": 40, "disable_validation": True},
                "sampling": {"coarse_interval_seconds": 0.5},
                "extraction": {"confidence_threshold": 0.3},
            },
        }
        cfg_path = tmp_path / "c.yaml"
        cfg_path.write_text(_yaml.safe_dump(cfg))
        rc = cli_main(["--config", str(cfg_path)])
        assert rc == 2
        sessions = [p for p in (tmp_path / "output").iterdir()
                    if p.is_dir() and not p.is_symlink()]
        summary = json.loads((sessions[0] / "summary.json").read_text())
        assert summary["status"] == "failed"


class TestDenseTracking:
    def test_dense_grid_and_window_aggregation(self, tmp_path, video):
        """dense_tracking.enabled: Phase 1 samples at the dense interval and
        Phase 2.5 re-aggregates to the output windows."""
        cfg = _config(
            tmp_path, video,
            **{
                "tracking.enabled": True,
                "video.dense_tracking.enabled": True,
                "video.dense_tracking.tracking_interval_seconds": 60,
                "video.dense_tracking.output_interval_minutes": 5,
            },
        )
        orch = PipelineOrchestrator(cfg)
        orch.setup_output_directories()
        extracted = orch.extract_frames()
        # 60 s dense grid over ~10 wall-clock minutes -> more frames than the
        # 5-minute output grid would give (2).
        assert len(extracted) > 2
        n_dense = len(orch.frame_results)
        # Synthetic detections (the tiny random-init model finds nothing):
        # one slowly-moving person visible in every dense frame.
        for i, fr in enumerate(orch.frame_results):
            fr.detections = [
                Detection(bbox=(100 + 2 * i, 200, 50, 130), confidence=0.9)
            ]
        orch.run_tracking()
        # Aggregated back down to the 5-minute output windows with per-window
        # track dedup: fewer result rows than dense frames.
        assert len(orch.frame_results) < n_dense
        assert len(orch.frame_results) >= 2
        for fr in orch.frame_results:
            assert len(fr.detections) >= 1
            assert fr.detections[0].track_id is not None


def test_session_persists_resolved_config(video, tmp_path):
    """Each session saves its resolved config.yaml (reproducibility; the
    dashboard/GT editor re-instantiate the transformer from it)."""
    import yaml

    cfg = _config(tmp_path, video)
    orch = PipelineOrchestrator(cfg)
    session_dir = orch.setup_output_directories()
    saved = yaml.safe_load((session_dir / "config.yaml").read_text())
    assert saved["homography"]["matrix"] == cfg.get("homography.matrix")
    assert saved["video"]["input_path"] == str(video)


def test_tracking_gets_detector_appearance_features(tmp_path):
    """Without a Re-ID model, Phase 2.5 pools DETR encoder features per
    detection (the reference's detect_with_features sharing) so the
    appearance cascade is live."""
    from office_person_detection_vit_tpu.detection.detector import DETRDetector
    from office_person_detection_vit_tpu.models.detr import DETRConfig
    from office_person_detection_vit_tpu.pipeline.phases.tracking import TrackingPhase

    cfg = _config(tmp_path, "unused.mp4", **{"tracking.enabled": True})
    # few classes so the random-weight model emits person detections
    det = DETRDetector(cfg, detr_config=DETRConfig.tiny(num_classes=2))
    det.load_model()
    rng = np.random.default_rng(0)
    frames = [rng.integers(0, 255, (72, 96, 3), np.uint8) for _ in range(2)]
    batch = det.detect_batch(np.stack(frames))
    frame_results = batch.to_frame_results(frame_numbers=[0, 1])
    dets = [d for fr in frame_results for d in fr.detections]
    assert dets, "expected detections from the 3-class random model at conf 0"
    assert all(d.feature is None for d in dets)

    phase = TrackingPhase(cfg)
    phase.set_detector(det)
    phase.execute(frame_results, frames, detection_batch=batch)
    with_features = [d for d in dets if d.feature is not None]
    assert len(with_features) == len(dets)
    f = with_features[0].feature
    assert f.ndim == 1 and f.shape[0] > 0


def test_dense_aggregation_keeps_trackless_windows(tmp_path):
    """Output windows with no tracked detections still appear as zero-count
    rows; a detection-free dense run must not drop all its frames."""
    from datetime import datetime, timedelta

    from office_person_detection_vit_tpu.core.dto import Detection
    from office_person_detection_vit_tpu.pipeline.phases.tracking import TrackingPhase

    cfg = _config(tmp_path, "unused.mp4", **{
        "tracking.enabled": True,
        "video.dense_tracking.enabled": True,
        "video.dense_tracking.output_interval_minutes": 5,
    })
    base = datetime(2025, 1, 20, 9, 0, 0)
    frame_results = []
    for i in range(10):  # one frame per minute -> 2 windows of 5
        fr = FrameResult(frame_number=i, timestamp=base + timedelta(minutes=i))
        if i == 7:  # only the second window has a tracked detection
            d = Detection(bbox=(10, 10, 20, 40), confidence=0.9)
            d.track_id = 3
            fr.detections = [d]
        frame_results.append(fr)
    phase = TrackingPhase(cfg)
    out = phase.aggregate_to_output_intervals(frame_results)
    assert len(out) == 2
    assert out[0].detections == []           # empty window preserved
    assert [d.track_id for d in out[1].detections] == [3]


class TestViTBackbonePipeline:
    def test_pipeline_with_vit_backbone(self, tmp_path, video):
        """Full orchestrated run with detection.backbone=vit (the namesake
        path, reference config.yaml.disabled:32-44 patch_size key)."""
        cfg = _config(
            tmp_path, video,
            **{"detection.backbone": "vit", "detection.patch_size": 8},
        )
        orch = PipelineOrchestrator(cfg)
        orch.run()
        det = orch.detection_phase.detector
        assert det.detr_config.backbone == "vit"
        assert det.feature_stride == 8
        session = orch.output.session_dir
        assert (session / "05_aggregation" / "zone_counts.csv").exists()
        assert (session / "04_transform" / "coordinate_transformations.json").exists()


def test_tracking_crop_feature_fallback_for_conv_detectors(tmp_path):
    """Conv detectors (yolo/ssd) have no encoder feature map; Phase 2.5
    must fall back to their crop-histogram feature contract (reference
    yolov8_detector.py:161-190) instead of silently running the cascade
    IoU-only — the round-4 closed-loop bug (IDF1 0.563 -> 0.983)."""
    from office_person_detection_vit_tpu.core.dto import Detection, FrameResult
    from office_person_detection_vit_tpu.detection.features import (
        crop_histogram_features,
    )
    from office_person_detection_vit_tpu.pipeline.phases.tracking import (
        TrackingPhase,
    )

    class ConvDetectorStub:
        """YOLODetector-shaped: extract_features but no _pool_features."""

        def extract_features(self, frame, bboxes):
            return crop_histogram_features(
                frame, np.asarray(bboxes, np.float32))

    rng = np.random.default_rng(1)
    frames = [rng.integers(0, 255, (72, 96, 3), np.uint8) for _ in range(2)]
    frame_results = []
    for i in range(2):
        fr = FrameResult(frame_number=i, timestamp=None)
        fr.detections = [Detection(bbox=(8.0 + 20 * i, 10.0, 24.0, 40.0),
                                   confidence=0.9)]
        frame_results.append(fr)

    cfg = _config(tmp_path, "unused.mp4", **{"tracking.enabled": True})
    phase = TrackingPhase(cfg)
    phase.set_detector(ConvDetectorStub())
    # detection_batch present but useless for pooling -> crop fallback
    phase._attach_detector_features(frame_results, object(), frames)
    for fr in frame_results:
        for d in fr.detections:
            assert d.feature is not None
            assert d.feature.ndim == 1 and float(np.linalg.norm(d.feature)) > 0


def test_detector_small_model_size(tmp_path):
    """detection.model_size=small builds the DETRConfig.small mid-tier
    (generalization tier measured in docs/training.md round 4)."""
    from office_person_detection_vit_tpu.detection.detector import DETRDetector

    cfg = _config(tmp_path, "unused.mp4",
                  **{"detection.model_size": "small"})
    det = DETRDetector(cfg)
    assert det.detr_config.d_model == 128
    assert det.detr_config.num_queries == 25
    assert det.detr_config.num_encoder_layers == 3


def test_detector_tier_honors_explicit_num_queries(tmp_path, caplog):
    """An explicitly configured detection.num_queries (!= the schema default
    100) must survive a tiny/small tier selection with a warning, not be
    silently replaced by the tier's query count (ADVICE r4)."""
    import logging

    from office_person_detection_vit_tpu.detection.detector import DETRDetector

    cfg = _config(tmp_path, "unused.mp4",
                  **{"detection.model_size": "small",
                     "detection.num_queries": 40})
    with caplog.at_level(logging.WARNING):
        det = DETRDetector(cfg)
    assert det.detr_config.num_queries == 40
    assert any("num_queries=40 overrides" in r.message for r in caplog.records)
