import pytest

from office_person_detection_vit_tpu.config.config_manager import (
    ConfigManager,
    ConfigValidationError,
)


def test_defaults_and_dot_get():
    cfg = ConfigManager.from_dict({})
    assert cfg.get("detection.batch_size") == 4
    assert cfg.get("video.fps") == 30
    assert cfg.get("nope.nope", "dflt") == "dflt"


def test_user_overrides_defaults():
    cfg = ConfigManager.from_dict({"detection": {"batch_size": 8}})
    assert cfg.get("detection.batch_size") == 8
    # sibling defaults survive the merge
    assert cfg.get("detection.confidence_threshold") == 0.5


def test_set_creates_path():
    cfg = ConfigManager.from_dict({})
    cfg.set("a.b.c", 42)
    assert cfg.get("a.b.c") == 42


def test_validate_ok():
    cfg = ConfigManager.from_dict({})
    assert cfg.validate()


def test_validate_bad_confidence():
    cfg = ConfigManager.from_dict({"detection": {"confidence_threshold": 1.5}})
    with pytest.raises(ConfigValidationError):
        cfg.validate()


def test_validate_weights_must_sum():
    cfg = ConfigManager.from_dict(
        {"tracking": {"appearance_weight": 0.9, "motion_weight": 0.3}}
    )
    with pytest.raises(ConfigValidationError):
        cfg.validate()


def test_validate_duplicate_zone():
    cfg = ConfigManager.from_dict(
        {"zones": [
            {"id": "z", "polygon": [[0, 0], [1, 0], [0, 1]]},
            {"id": "z", "polygon": [[0, 0], [1, 0], [0, 1]]},
        ]}
    )
    with pytest.raises(ConfigValidationError):
        cfg.validate()


def test_yaml_roundtrip(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text("detection:\n  batch_size: 16\n")
    cfg = ConfigManager(p)
    assert cfg.get("detection.batch_size") == 16
    cfg.set("detection.batch_size", 32)
    cfg.save()
    assert ConfigManager(p).get("detection.batch_size") == 32


def test_static_hparams_hashable():
    cfg = ConfigManager.from_dict({})
    hp = cfg.static_hparams()
    assert hash(hp) == hash(cfg.static_hparams())
    assert hp.num_queries == 100
