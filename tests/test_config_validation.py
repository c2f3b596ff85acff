"""ConfigManager validation/IO edge cases (deepens tests/test_config_manager.py
toward the reference's 30-test coverage of config_manager.py:193-512)."""

import json

import pytest

from office_person_detection_vit_tpu.config.config_manager import (
    ConfigManager,
    ConfigValidationError,
    StaticHParams,
)


def _valid():
    return {
        "video": {
            "input_path": "in.mp4", "fps": 30, "frame_interval_minutes": 5,
            "tolerance_seconds": 60, "time_compression_ratio": 313.0,
        },
        "detection": {"confidence_threshold": 0.5, "batch_size": 4, "device": "auto"},
        "output": {"directory": "output"},
    }


class TestValidation:
    def test_missing_section(self):
        data = _valid()
        del data["video"]
        with pytest.raises(ConfigValidationError, match="missing required section: video"):
            ConfigManager.from_dict(data, apply_defaults=False).validate()

    def test_missing_key(self):
        data = _valid()
        del data["video"]["fps"]
        with pytest.raises(ConfigValidationError, match="missing required key: video.fps"):
            ConfigManager.from_dict(data, apply_defaults=False).validate()

    def test_bad_type(self):
        data = _valid()
        data["detection"]["batch_size"] = "four"
        with pytest.raises(ConfigValidationError, match="bad type for detection.batch_size"):
            ConfigManager.from_dict(data, apply_defaults=False).validate()

    def test_float_accepted_where_number_required(self):
        data = _valid()
        data["video"]["fps"] = 29.97
        assert ConfigManager.from_dict(data).validate()

    def test_confidence_out_of_range(self):
        data = _valid()
        data["detection"]["confidence_threshold"] = 1.5
        with pytest.raises(ConfigValidationError, match="confidence_threshold"):
            ConfigManager.from_dict(data).validate()

    def test_batch_size_must_be_positive(self):
        data = _valid()
        data["detection"]["batch_size"] = 0
        with pytest.raises(ConfigValidationError, match="batch_size"):
            ConfigManager.from_dict(data).validate()

    def test_unknown_transform_method(self):
        data = _valid()
        data["transform"] = {"method": "teleport"}
        with pytest.raises(ConfigValidationError, match="unknown transform.method"):
            ConfigManager.from_dict(data).validate()

    def test_zone_without_id(self):
        data = _valid()
        data["zones"] = [{"polygon": [[0, 0], [1, 0], [1, 1]]}]
        with pytest.raises(ConfigValidationError, match="zone missing id"):
            ConfigManager.from_dict(data).validate()

    def test_zone_short_polygon(self):
        data = _valid()
        data["zones"] = [{"id": "z", "polygon": [[0, 0], [1, 0]]}]
        with pytest.raises(ConfigValidationError, match="polygon needs"):
            ConfigManager.from_dict(data).validate()

    def test_multiple_errors_joined(self):
        data = _valid()
        data["detection"]["confidence_threshold"] = 2.0
        data["detection"]["batch_size"] = 0
        with pytest.raises(ConfigValidationError) as exc:
            ConfigManager.from_dict(data).validate()
        msg = str(exc.value)
        assert "confidence_threshold" in msg and "batch_size" in msg


class TestIO:
    def test_json_file_load(self, tmp_path):
        p = tmp_path / "cfg.json"
        p.write_text(json.dumps(_valid()))
        cfg = ConfigManager(p)
        assert cfg.get("detection.batch_size") == 4

    def test_missing_file(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            ConfigManager(tmp_path / "nope.yaml")

    def test_unsupported_suffix(self, tmp_path):
        p = tmp_path / "cfg.toml"
        p.write_text("x = 1")
        with pytest.raises(ConfigValidationError, match="unsupported config format"):
            ConfigManager(p)

    def test_non_mapping_top_level(self, tmp_path):
        p = tmp_path / "cfg.yaml"
        p.write_text("- just\n- a\n- list\n")
        with pytest.raises(ConfigValidationError, match="top-level config must be a mapping"):
            ConfigManager(p)

    def test_save_roundtrip(self, tmp_path):
        cfg = ConfigManager.from_dict(_valid())
        cfg.set("detection.batch_size", 16)
        out = tmp_path / "saved.yaml"
        cfg.save(out)
        again = ConfigManager(out)
        assert again.get("detection.batch_size") == 16

    def test_save_without_path_raises(self):
        with pytest.raises(ValueError):
            ConfigManager.from_dict(_valid()).save()


class TestGetSet:
    def test_get_default_for_missing(self):
        cfg = ConfigManager.from_dict(_valid())
        assert cfg.get("no.such.path", "fallback") == "fallback"

    def test_get_partial_path_returns_subtree(self):
        cfg = ConfigManager.from_dict(_valid())
        sub = cfg.get("detection")
        assert isinstance(sub, dict) and sub["batch_size"] == 4

    def test_set_overwrites_leaf(self):
        cfg = ConfigManager.from_dict(_valid())
        cfg.set("video.fps", 25)
        assert cfg.get("video.fps") == 25

    def test_defaults_backfill_unset_sections(self):
        cfg = ConfigManager.from_dict(_valid())
        # tracking section not given -> defaults exist
        assert cfg.get("tracking") is not None

    def test_no_defaults_mode(self):
        cfg = ConfigManager.from_dict(_valid(), apply_defaults=False)
        assert cfg.get("tracking") is None


class TestStaticHParams:
    def test_reflects_config(self):
        data = _valid()
        data["detection"].update(input_height=96, input_width=128, num_queries=10)
        hp = ConfigManager.from_dict(data).static_hparams()
        assert (hp.input_height, hp.input_width, hp.num_queries) == (96, 128, 10)

    def test_default_geometry_is_720p_fit(self):
        hp = ConfigManager.from_dict(_valid()).static_hparams()
        assert (hp.input_height, hp.input_width) == (736, 1280)
        assert hp.input_height % 32 == 0 and hp.input_width % 32 == 0

    def test_usable_as_jit_static_arg(self):
        import jax

        hp = ConfigManager.from_dict(_valid()).static_hparams()

        @jax.jit
        def f(x, hp2):
            return x * hp2.batch_size

        import jax.numpy as jnp

        out = jax.jit(lambda x: x * hp.batch_size)(jnp.ones(2))
        assert float(out[0]) == hp.batch_size
        assert hash(hp) == hash(StaticHParams.from_config(ConfigManager.from_dict(_valid())))


class TestCalibrationValidation:
    """Calibration-section checks (reference config_manager.py:460-472)."""

    def test_non_boolean_flag_rejected(self):
        data = _valid()
        data["calibration"] = {"use_distortion_correction": "yes"}
        with pytest.raises(ConfigValidationError, match="must be a boolean"):
            ConfigManager.from_dict(data).validate()

    def test_non_positive_threshold_rejected(self):
        data = _valid()
        data["calibration"] = {"reprojection_error_threshold": 0}
        with pytest.raises(ConfigValidationError, match="must be > 0"):
            ConfigManager.from_dict(data).validate()

    def test_valid_calibration_passes(self):
        data = _valid()
        data["calibration"] = {
            "use_distortion_correction": False,
            "reprojection_error_threshold": 2.0,
        }
        assert ConfigManager.from_dict(data).validate()

    def test_evaluator_from_config(self):
        from office_person_detection_vit_tpu.evaluation.transform_evaluator import (
            TransformEvaluator,
        )

        cfg = ConfigManager.from_dict(
            {"calibration": {"reprojection_error_threshold": 2.0}}
        )
        assert TransformEvaluator.from_config(cfg).rmse_target == 2.0
