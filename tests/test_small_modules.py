"""Unit tests for small host modules (reference tests/test_cli_arguments.py
analog + core policy/ports, persistent cache, sine position embeddings,
shared floor-transform writer)."""

import numpy as np
import pytest

from office_person_detection_vit_tpu.cli.arguments import parse_arguments
from office_person_detection_vit_tpu.config.config_manager import ConfigManager
from office_person_detection_vit_tpu.core.dto import Detection
from office_person_detection_vit_tpu.core.policy import OutputPolicy


class TestCLIArguments:
    def test_defaults(self):
        args = parse_arguments([])
        assert args.config == "config.yaml"
        assert not args.debug and not args.evaluate and not args.fine_tune
        assert args.start_time is None and args.end_time is None
        assert not args.timestamps_only and args.resume is None

    def test_all_reference_flags(self):
        args = parse_arguments(
            ["--config", "c.yaml", "--debug", "--evaluate", "--fine-tune",
             "--start-time", "2025-01-01 10:00:00",
             "--end-time", "2025-01-01 18:00:00", "--timestamps-only"]
        )
        assert args.config == "c.yaml"
        assert args.debug and args.evaluate and args.fine_tune
        assert args.start_time == "2025-01-01 10:00:00"
        assert args.timestamps_only

    def test_resume_flag(self):
        args = parse_arguments(["--resume", "output/20250101_000000"])
        assert args.resume == "output/20250101_000000"

    def test_unknown_flag_rejected(self):
        with pytest.raises(SystemExit):
            parse_arguments(["--warp-speed"])


class TestOutputPolicy:
    def test_defaults(self):
        p = OutputPolicy()
        assert not p.save_detection_images
        assert p.cleanup_temp_files

    def test_from_config(self):
        cfg = ConfigManager.from_dict(
            {"output": {"save_detection_images": True, "debug_mode": True,
                        "cleanup_temp_files": False}}
        )
        p = OutputPolicy.from_config(cfg)
        assert p.save_detection_images and p.debug_mode
        assert not p.cleanup_temp_files
        assert not p.save_side_by_side_video  # default retained

    def test_frozen(self):
        with pytest.raises(Exception):
            OutputPolicy().debug_mode = True  # type: ignore[misc]


class TestPorts:
    def test_detector_port_runtime_check(self):
        from office_person_detection_vit_tpu.core.interfaces import DetectorPort
        from office_person_detection_vit_tpu.detection.ssd_detector import (
            build_detector,
        )

        det = build_detector(ConfigManager.from_dict({"detection": {"model": "ssd"}}))
        assert isinstance(det, DetectorPort)

    def test_transformer_port_runtime_check(self):
        from office_person_detection_vit_tpu.core.interfaces import TransformerPort
        from office_person_detection_vit_tpu.transform.homography import (
            HomographyTransformer,
        )

        t = HomographyTransformer(np.eye(3))
        assert isinstance(t, TransformerPort)

    def test_tracker_port_runtime_check(self):
        from office_person_detection_vit_tpu.core.interfaces import TrackerPort
        from office_person_detection_vit_tpu.tracking import Tracker

        assert isinstance(Tracker(), TrackerPort)


class TestPersistentCache:
    def test_enable_idempotent(self, tmp_path):
        import jax

        from office_person_detection_vit_tpu.utils.jax_cache import (
            enable_persistent_cache,
        )

        enable_persistent_cache(str(tmp_path / "cache"))
        enable_persistent_cache(str(tmp_path / "cache"))
        assert (tmp_path / "cache").is_dir()
        assert jax.config.jax_compilation_cache_dir == str(tmp_path / "cache")


class TestSinePositionEmbedding:
    def test_matches_hf_torch(self):
        torch = pytest.importorskip("torch")
        pytest.importorskip("transformers")
        from transformers.models.detr.modeling_detr import (
            DetrSinePositionEmbedding,
        )

        from office_person_detection_vit_tpu.models.position_encoding import (
            sine_position_embedding,
        )

        B, H, W, D = 2, 6, 9, 64
        mask = np.ones((B, H, W), bool)
        mask[1, 4:, :] = False  # padded rows in one batch entry
        mask[1, :, 7:] = False

        ours = np.asarray(sine_position_embedding(mask, embedding_dim=D))

        hf = DetrSinePositionEmbedding(embedding_dim=D, normalize=True)
        ref = hf(
            torch.zeros(B, 3, H, W), torch.tensor(mask)
        ).permute(0, 2, 3, 1).numpy()  # NCHW -> NHWC
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_shape_and_range(self):
        from office_person_detection_vit_tpu.models.position_encoding import (
            sine_position_embedding,
        )

        out = np.asarray(sine_position_embedding(np.ones((1, 4, 5), bool), 32))
        assert out.shape == (1, 4, 5, 64)
        assert np.abs(out).max() <= 1.0 + 1e-6


class TestApplyFloorTransform:
    def test_writes_coords_on_detections(self):
        from office_person_detection_vit_tpu.transform.common import (
            apply_floor_transform,
        )
        from office_person_detection_vit_tpu.transform.floormap_config import (
            FloorMapConfig,
        )

        fm = FloorMapConfig(
            image_origin_x=0, image_origin_y=0,
            image_x_mm_per_pixel=10.0, image_y_mm_per_pixel=10.0,
        )
        dets = [Detection(bbox=(100, 100, 50, 100), confidence=0.9)]
        out = apply_floor_transform(lambda pts: pts * 2.0, fm, dets)
        assert out[0].floor_coords_px == (250.0, 400.0)  # foot (125, 200) * 2
        assert out[0].floor_coords_mm == (2500.0, 4000.0)

    def test_empty_list(self):
        from office_person_detection_vit_tpu.transform.common import (
            apply_floor_transform,
        )
        from office_person_detection_vit_tpu.transform.floormap_config import (
            FloorMapConfig,
        )

        assert apply_floor_transform(lambda p: p, FloorMapConfig(), []) == []
