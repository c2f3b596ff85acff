"""TemporalValidatorV2 depth tests (reference tests/test_timestamp_validator_v2.py
analog): adaptive tolerance, z-score interpolation recovery, negative dt,
history bounds, from_config, NoOpValidator."""

from datetime import datetime, timedelta

import pytest

from office_person_detection_vit_tpu.config.config_manager import ConfigManager
from office_person_detection_vit_tpu.timestamp.timestamp_validator import (
    NoOpValidator,
    TemporalValidatorV2,
)

T0 = datetime(2025, 1, 20, 9, 0, 0)


def _feed_consistent(v, n=5, fps=30.0, ratio=313.0, start_frame=0):
    """n frames at exactly the expected timelapse rate."""
    for i in range(n):
        frame = start_frame + i * 30
        ts = T0 + timedelta(seconds=i * 30 / fps * ratio)
        r = v.validate(ts, frame)
        assert r.is_valid
    return frame, ts


class TestBasicAcceptance:
    def test_first_observation_always_accepted(self):
        v = TemporalValidatorV2()
        r = v.validate(T0, 100, confidence=0.7)
        assert r.is_valid and r.timestamp == T0 and r.confidence == 0.7

    def test_consistent_sequence(self):
        v = TemporalValidatorV2(fps=30, time_compression_ratio=313.0)
        _feed_consistent(v)

    def test_within_tolerance_accepted(self):
        v = TemporalValidatorV2(fps=30, time_compression_ratio=313.0,
                                base_tolerance_seconds=30.0)
        v.validate(T0, 0)
        # expected dt for 30 frames = 313 s; off by 20 s -> inside tolerance
        r = v.validate(T0 + timedelta(seconds=313 + 20), 30)
        assert r.is_valid and not r.corrected

    def test_non_monotonic_frame_rejected(self):
        v = TemporalValidatorV2()
        v.validate(T0, 50)
        r = v.validate(T0 + timedelta(seconds=10), 50)
        assert not r.is_valid and "non-monotonic" in r.reason


class TestOutlierRecovery:
    def test_wild_outlier_interpolated(self):
        v = TemporalValidatorV2(fps=30, time_compression_ratio=313.0,
                                base_tolerance_seconds=30.0)
        last_frame, last_ts = _feed_consistent(v)
        # OCR misread a digit: jumps an hour
        bogus = last_ts + timedelta(seconds=3600 + 313)
        r = v.validate(bogus, last_frame + 30)
        assert r.is_valid and r.corrected
        assert r.timestamp == last_ts + timedelta(seconds=313)
        assert r.confidence == pytest.approx(0.5)
        assert "interpolated" in r.reason

    def test_negative_dt_interpolated(self):
        v = TemporalValidatorV2(fps=30, time_compression_ratio=313.0)
        last_frame, last_ts = _feed_consistent(v)
        r = v.validate(last_ts - timedelta(seconds=500), last_frame + 30)
        assert r.is_valid and r.corrected

    def test_moderate_error_rejected_not_interpolated(self):
        # Too far for tolerance, not extreme enough for the z threshold with
        # uniform history: rejected outright.
        v = TemporalValidatorV2(fps=30, time_compression_ratio=313.0,
                                base_tolerance_seconds=30.0, z_score_threshold=3.0)
        v.validate(T0, 0)
        r = v.validate(T0 + timedelta(seconds=313 + 60), 30)
        assert not r.is_valid and "dt" in r.reason


class TestAdaptiveTolerance:
    def test_tolerance_clamped_to_base_range(self):
        v = TemporalValidatorV2(base_tolerance_seconds=30.0)
        _feed_consistent(v)  # near-zero variance history
        tol = v._adaptive_tolerance()
        assert 15.0 <= tol <= 90.0

    def test_short_history_uses_base(self):
        v = TemporalValidatorV2(base_tolerance_seconds=30.0)
        assert v._adaptive_tolerance() == 30.0

    def test_reset_clears_state(self):
        v = TemporalValidatorV2()
        _feed_consistent(v)
        v.reset()
        assert len(v.history) == 0
        r = v.validate(T0 + timedelta(days=30), 0)
        assert r.is_valid  # first observation again


class TestConfigAndNoOp:
    def test_from_config(self):
        cfg = ConfigManager.from_dict(
            {
                "video": {"fps": 25.0, "time_compression_ratio": 100.0},
                "timestamp": {"extraction": {"validator": {
                    "base_tolerance_seconds": 12.0, "history_size": 4,
                    "z_score_threshold": 2.0}}},
            }
        )
        v = TemporalValidatorV2.from_config(cfg)
        assert v.fps == 25.0 and v.ratio == 100.0
        assert v.base_tolerance == 12.0 and v.z_threshold == 2.0
        assert v.history.maxlen == 4

    def test_noop_accepts_everything(self):
        v = NoOpValidator()
        r = v.validate(T0, 999, confidence=0.1)
        assert r.is_valid and r.timestamp == T0

    def test_history_bounded(self):
        v = TemporalValidatorV2(history_size=3)
        _feed_consistent(v, n=10)
        assert len(v.history) == 3
        assert len(v.interval_history) <= 3
