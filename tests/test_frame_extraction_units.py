"""FrameExtractionPipeline unit tests (reference
tests/test_frame_extraction_pipeline.py analog, beyond the e2e coverage):
time-compression mapping, target-grid generation, nearest-frame selection,
CSV contract; plus direct ResNet backbone shape/stride properties."""

from datetime import datetime, timedelta

import numpy as np
import pytest

from office_person_detection_vit_tpu.config.config_manager import ConfigManager
from office_person_detection_vit_tpu.pipeline.frame_extraction_pipeline import (
    FrameExtractionPipeline,
)
from tests.helpers.synthetic_video import write_video


@pytest.fixture(scope="module")
def pipeline(tmp_path_factory):
    base = tmp_path_factory.mktemp("fx")
    video = base / "v.mp4"
    write_video(video, num_frames=10, fps=30)
    cfg = ConfigManager.from_dict(
        {
            "video": {
                "input_path": str(video), "fps": 30,
                "frame_interval_minutes": 5, "tolerance_seconds": 60,
                "time_compression_ratio": 313.0,
            },
            "detection": {"confidence_threshold": 0.5, "batch_size": 2, "device": "cpu"},
            "output": {"directory": str(base / "out")},
        }
    )
    return FrameExtractionPipeline(cfg, output_dir=base / "out" / "01_extraction")


T0 = datetime(2025, 1, 20, 9, 0, 0)


class TestTimeCompression:
    def test_wall_clock_to_video_seconds(self, pipeline):
        # 313 wall seconds = 1 video second at ratio 313
        assert pipeline._to_video_seconds(313.0) == pytest.approx(1.0)
        assert pipeline._to_video_seconds(626.0) == pytest.approx(2.0)

    def test_floor_at_one_frame(self, pipeline):
        # tiny interval still advances at least one frame (1/30 s)
        assert pipeline._to_video_seconds(0.001) == pytest.approx(1 / 30)


class TestTargetGeneration:
    def _ts_map(self, minutes):
        return {
            i * 30: (T0 + timedelta(minutes=m), 0.9) for i, m in enumerate(minutes)
        }

    def test_five_minute_grid(self, pipeline):
        targets = pipeline._generate_targets(self._ts_map([2, 7, 12, 17]))
        assert targets == [
            T0 + timedelta(minutes=5),
            T0 + timedelta(minutes=10),
            T0 + timedelta(minutes=15),
        ]

    def test_start_on_boundary_included(self, pipeline):
        targets = pipeline._generate_targets(self._ts_map([5, 10, 15]))
        assert targets[0] == T0 + timedelta(minutes=5)
        assert targets[-1] == T0 + timedelta(minutes=15)

    def test_single_timestamp_window(self, pipeline):
        targets = pipeline._generate_targets(self._ts_map([5]))
        assert targets == [T0 + timedelta(minutes=5)]


class TestNearestSelection:
    def test_nearest_within_tolerance(self, pipeline):
        timestamps = {
            100: (T0 + timedelta(minutes=5, seconds=20), 0.9),
            200: (T0 + timedelta(minutes=9, seconds=50), 0.8),
        }
        targets = [T0 + timedelta(minutes=5), T0 + timedelta(minutes=10)]
        rows = pipeline._select_nearest(timestamps, targets)
        assert [r.frame_number for r in rows] == [100, 200]
        assert rows[0].time_error_seconds == pytest.approx(20.0)
        assert rows[1].time_error_seconds == pytest.approx(10.0)

    def test_out_of_tolerance_skipped(self, pipeline):
        timestamps = {100: (T0 + timedelta(minutes=8), 0.9)}
        rows = pipeline._select_nearest(timestamps, [T0 + timedelta(minutes=5)])
        assert rows == []  # 180 s > 60 s tolerance

    def test_frame_used_at_most_once(self, pipeline):
        timestamps = {100: (T0 + timedelta(minutes=5), 0.9)}
        targets = [T0 + timedelta(minutes=5), T0 + timedelta(minutes=5, seconds=30)]
        rows = pipeline._select_nearest(timestamps, targets)
        assert len(rows) == 1

    def test_csv_contract(self, pipeline, tmp_path):
        timestamps = {100: (T0 + timedelta(minutes=5, seconds=3), 0.87)}
        rows = pipeline._select_nearest(timestamps, [T0 + timedelta(minutes=5)])
        path = pipeline._write_csv(rows)
        lines = path.read_text().strip().splitlines()
        assert lines[0] == (
            "frame_number,timestamp,target_timestamp,confidence,"
            "time_error_seconds,frame_path"
        )
        assert lines[1].startswith("100,2025-01-20 09:05:03,2025-01-20 09:05:00,0.870,3.0")


class TestResNetBackbone:
    def test_stride32_feature_map(self):
        import jax

        from office_person_detection_vit_tpu.models.resnet import ResNet

        model = ResNet(depths=(1, 1, 1, 1), hidden_sizes=(8, 16, 32, 64),
                       embedding_size=8)
        x = np.zeros((1, 64, 96, 3), np.float32)
        vars_ = model.init(jax.random.PRNGKey(0), x)
        out = model.apply(vars_, x)
        feat = out[-1] if isinstance(out, (tuple, list)) else out
        assert feat.shape[1] == 64 // 32 and feat.shape[2] == 96 // 32

    def test_frozen_bn_is_pure_affine(self):
        import jax
        import jax.numpy as jnp

        from office_person_detection_vit_tpu.models.resnet import FrozenBatchNorm

        bn = FrozenBatchNorm(4)
        x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 3, 3, 4)), jnp.float32)
        vars_ = bn.init(jax.random.PRNGKey(0), x)
        params = vars_["params"]
        scale = np.asarray(params["scale"])
        bias = np.asarray(params["bias"])
        out = np.asarray(bn.apply(vars_, x))
        np.testing.assert_allclose(out, np.asarray(x) * scale + bias, atol=1e-6)
        # no batch statistics: identical for any other batch content scale
        out2 = np.asarray(bn.apply(vars_, x * 100))
        np.testing.assert_allclose(out2, np.asarray(x) * 100 * scale + bias, atol=1e-4)


class TestProductionScanDensity:
    """Regression: auto-targets selects scanned frames directly (no fine
    pass), so the coarse stride must be capped in WALL-CLOCK terms. At the
    production config (coarse 5 s video, ratio 313, tolerance 60 s) the
    uncapped stride put scanned frames ~26 wall-minutes apart and 15/16
    five-minute targets failed tolerance; the cap lands every target."""

    def test_full_grid_extracts_at_production_config(self, tmp_path):
        video = tmp_path / "v.mp4"
        write_video(video, num_frames=300, fps=30)  # ~52 wall-minutes
        cfg = ConfigManager.from_dict(
            {
                "video": {
                    "input_path": str(video), "fps": 30,
                    "frame_interval_minutes": 5, "tolerance_seconds": 60,
                    "time_compression_ratio": 313.0,
                },
                "timestamp": {
                    "extraction_mode": "auto_targets",
                    "sampling": {"coarse_interval_seconds": 5.0},
                    "auto_targets": {"disable_validation": True},
                    "extraction": {"confidence_threshold": 0.3},
                },
                "output": {"directory": str(tmp_path / "out"),
                           "save_extracted_frames": False},
            }
        )
        fx = FrameExtractionPipeline(cfg, output_dir=tmp_path / "out" / "01")
        rows = fx.run_with_auto_targets()
        # 300 frames * 313/30 s/frame ~ 52 min -> 9-10 five-minute targets.
        assert len(rows) >= 9, [r.target_timestamp for r in rows]
        assert all(r.time_error_seconds <= 60 for r in rows)
        # Wall gap between consecutive SELECTED frames tracks the grid.
        gaps = np.diff([r.timestamp.timestamp() for r in rows])
        assert np.all(gaps > 200) and np.all(gaps < 400)

    def test_manual_targets_fine_search_is_wall_aware(self, tmp_path):
        """Manual-target mode at the production config: the fine step used
        to be 1 VIDEO second (~5 wall-minutes at ratio 313), jumping over
        the 60 s tolerance window (2/6 targets lost on this sequence); the
        wall-aware step + compression-predicted centering finds every
        target."""
        from datetime import datetime

        video = tmp_path / "v.mp4"
        write_video(video, num_frames=300, fps=30)
        cfg = ConfigManager.from_dict(
            {
                "video": {
                    "input_path": str(video), "fps": 30,
                    "frame_interval_minutes": 5, "tolerance_seconds": 60,
                    "time_compression_ratio": 313.0,
                },
                "timestamp": {
                    "sampling": {"coarse_interval_seconds": 5.0,
                                 "fine_interval_seconds": 1.0,
                                 "search_window_seconds": 30.0},
                    "auto_targets": {"disable_validation": True},
                    "extraction": {"confidence_threshold": 0.3},
                },
                "output": {"directory": str(tmp_path / "out"),
                           "save_extracted_frames": False},
            }
        )
        fx = FrameExtractionPipeline(cfg, output_dir=tmp_path / "out" / "01")
        t0 = datetime(2025, 1, 20, 9, 5, 0)
        targets = [t0 + timedelta(minutes=5 * i) for i in range(6)]
        rows = fx.run(targets)
        assert len(rows) == 6, [str(r.target_timestamp) for r in rows]
        assert all(r.time_error_seconds <= 60 for r in rows)

    def test_scan_budget_widens_stride_instead_of_truncating(self, tmp_path,
                                                             caplog):
        """When the tolerance-dense grid exceeds max_scan_frames, the
        stride widens to cover the WHOLE video within the budget (with a
        warning) — never silently truncating coverage to the video's
        start."""
        import logging

        video = tmp_path / "v.mp4"
        write_video(video, num_frames=300, fps=30)
        cfg = ConfigManager.from_dict(
            {
                "video": {
                    "input_path": str(video), "fps": 30,
                    "frame_interval_minutes": 5, "tolerance_seconds": 60,
                    "time_compression_ratio": 313.0,
                },
                "timestamp": {
                    "extraction_mode": "auto_targets",
                    "sampling": {"coarse_interval_seconds": 5.0},
                    "auto_targets": {"disable_validation": True,
                                     "max_frames": 20},
                    "extraction": {"confidence_threshold": 0.3},
                },
                "output": {"directory": str(tmp_path / "out"),
                           "save_extracted_frames": False},
            }
        )
        fx = FrameExtractionPipeline(cfg, output_dir=tmp_path / "out" / "01")
        with caplog.at_level(logging.WARNING):
            rows = fx.run_with_auto_targets()
        assert any("stride widened" in r.message for r in caplog.records)
        # Coverage reaches the video's tail: the last selected frame sits
        # in the final quarter (old behavior: scan stopped at frame
        # 20*6=120 of 300, dropping everything after).
        assert rows and max(r.frame_number for r in rows) > 200
