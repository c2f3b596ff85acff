"""Tracker tests mirroring the reference's integration strategy
(tests/test_tracking_integration.py:11-56): real Tracker + Kalman + LAP over
synthetic detections with random-but-L2-normed features, asserting ID
persistence."""

import numpy as np
import pytest

from office_person_detection_vit_tpu.core.dto import Detection
from office_person_detection_vit_tpu.tracking import (
    LightweightTracker,
    Track,
    Tracker,
    TrackState,
)


def _det(x, y, w=50.0, h=120.0, conf=0.9, feature=None):
    return Detection(bbox=(x, y, w, h), confidence=conf, feature=feature)


def _feat(rng, base=None, noise=0.05):
    if base is None:
        f = rng.normal(size=256)
    else:
        f = base + rng.normal(size=256) * noise
    return (f / np.linalg.norm(f)).astype(np.float32)


def test_single_target_id_persistence():
    rng = np.random.default_rng(0)
    base = rng.normal(size=256)
    tracker = Tracker(min_hits=1)
    ids = set()
    for t in range(10):
        dets = [_det(100 + 5 * t, 200 + 3 * t, feature=_feat(rng, base))]
        tracks = tracker.update(dets, timestamp=float(t))
        assert len(tracks) == 1
        ids.add(tracks[0].track_id)
    assert len(ids) == 1  # one stable identity


def test_two_targets_no_id_swap_via_appearance():
    rng = np.random.default_rng(1)
    base_a = rng.normal(size=256)
    base_b = -base_a  # maximally dissimilar
    tracker = Tracker(min_hits=1, max_position_distance=10000.0)
    # Two people crossing paths: appearance should keep IDs stable.
    id_a = id_b = None
    for t in range(11):
        xa = 100.0 + 20 * t  # moves right
        xb = 300.0 - 20 * t  # moves left, crosses at t=5
        dets = [
            _det(xa, 200, feature=_feat(rng, base_a)),
            _det(xb, 200, feature=_feat(rng, base_b)),
        ]
        tracks = tracker.update(dets, timestamp=float(t))
        by_pos = sorted(tracks, key=lambda tr: tr.bbox[0])
        if t == 0:
            id_a, id_b = by_pos[0].track_id, by_pos[1].track_id
        if t == 10:
            # after crossing, A is now on the right
            assert by_pos[1].track_id == id_a
            assert by_pos[0].track_id == id_b


def test_track_confirmation_min_hits():
    tracker = Tracker(min_hits=3)
    for t in range(3):
        tracks = tracker.update([_det(100 + t, 100)], timestamp=float(t))
    assert len(tracks) == 1
    assert tracks[0].hits == 3


def test_track_deleted_after_max_age():
    tracker = Tracker(min_hits=1, max_age=2)
    tracker.update([_det(100, 100)], timestamp=0.0)
    for t in range(1, 5):
        tracker.update([], timestamp=float(t))
    assert tracker.tracks == []


def test_bytetrack_low_conf_rescue():
    tracker = Tracker(min_hits=1, iou_threshold=0.3)
    tracker.update([_det(100, 100, conf=0.9)], timestamp=0.0)
    # Low-confidence detection at ~same place: must NOT create a new track,
    # must keep the existing one alive.
    tracks = tracker.update([_det(102, 101, conf=0.15)], timestamp=1.0)
    assert len(tracker.tracks) == 1
    assert tracks[0].time_since_update == 0


def test_low_conf_does_not_initiate():
    tracker = Tracker(min_hits=1)
    tracker.update([_det(100, 100, conf=0.2)], timestamp=0.0)
    assert tracker.tracks == []


def test_position_gate_blocks_far_matches():
    tracker = Tracker(min_hits=1, max_position_distance=50.0)
    tracker.update([_det(100, 100)], timestamp=0.0)
    # Far detection: gate blocks association -> new track, old one missed.
    tracker.update([_det(2000, 2000)], timestamp=1.0)
    assert len(tracker.tracks) == 2


def test_oru_replay_after_gap():
    tracker = Tracker(min_hits=1, max_age=100)
    rng = np.random.default_rng(2)
    base = rng.normal(size=256)
    tracker.update([_det(100, 100, feature=_feat(rng, base))], timestamp=0.0)
    for t in range(1, 5):
        tracker.update([], timestamp=float(t))
    tr = tracker.tracks[0]
    assert tr.time_since_update == 4
    tracks = tracker.update([_det(200, 150, feature=_feat(rng, base))], timestamp=5.0)
    assert len(tracks) == 1
    assert tracks[0].track_id == tr.track_id
    # After ORU the velocity should roughly match the gap displacement.
    import jax.numpy as jnp

    from office_person_detection_vit_tpu.ops import kalman

    vel = np.asarray(kalman.kf_velocity(tracks[0].kf))
    assert vel[0] > 5  # moved +100px over 5 virtual frames


def test_feature_ema_smoothing():
    rng = np.random.default_rng(3)
    base = _feat(rng)
    d = _det(0, 0, feature=base)
    tr = Track(1, d, 0.0)
    f2 = _feat(rng)
    d2 = _det(1, 1, feature=f2)
    tr.update(d2, 1.0)
    sm = tr.get_smoothed_feature()
    np.testing.assert_allclose(np.linalg.norm(sm), 1.0, atol=1e-5)
    # Smoothed is dominated by history (alpha=0.9)
    assert np.dot(sm, base) > np.dot(sm, f2) or np.dot(base, f2) > 0.8


def test_reset():
    tracker = Tracker(min_hits=1)
    tracker.update([_det(1, 1)], timestamp=0.0)
    tracker.reset()
    assert tracker.tracks == [] and tracker.frame_count == 0


# ---------------------------------------------------------------- lightweight


def test_lightweight_greedy_iou():
    lt = LightweightTracker(iou_threshold=0.3, use_optical_flow=False)
    lt.update_with_detections([_det(100, 100), _det(300, 300)], timestamp=0.0)
    tracks = lt.update_with_detections([_det(105, 102), _det(295, 305)], timestamp=1.0)
    assert len(tracks) == 2
    assert all(t.hits == 2 for t in tracks)


def test_lightweight_kalman_interpolation():
    lt = LightweightTracker(use_optical_flow=False)
    lt.update_with_detections([_det(100, 100)], timestamp=0.0)
    lt.update_with_detections([_det(110, 100)], timestamp=1.0)
    tracks = lt.interpolate(timestamp=2.0)
    assert len(tracks) == 1
    assert tracks[0].interpolated
    cx = tracks[0].bbox[0] + tracks[0].bbox[2] / 2
    assert cx > 130  # kept moving right via Kalman velocity


def test_lightweight_optical_flow_on_synthetic_motion():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(4)
    # Unique random texture moving right on a static background (LK needs
    # 2D-structured, frame-consistent texture).
    patch = rng.integers(100, 255, (40, 40), np.uint8)
    bg = rng.integers(0, 30, (240, 320, 3), np.uint8)

    def make_frame(offset):
        f = bg.copy()
        f[100:140, 100 + offset : 140 + offset] = patch[..., None]
        return f

    lt = LightweightTracker(use_optical_flow=True)
    f0 = make_frame(0)
    lt.update_with_detections(
        [_det(100, 100, w=40, h=40)], frame=f0, timestamp=0.0
    )
    f1 = make_frame(10)
    tracks = lt.interpolate(frame=f1, timestamp=1.0)
    cx = tracks[0].bbox[0] + tracks[0].bbox[2] / 2
    assert 125 < cx < 136  # flowed ~10px right from center 120


def test_similarity_iou_matches_device_ops():
    """Host numpy IoU must match the jitted ops/boxes IoU bit-for-bit-ish."""
    import jax.numpy as jnp
    import numpy as np

    from office_person_detection_vit_tpu.ops import boxes as box_ops
    from office_person_detection_vit_tpu.tracking.similarity import SimilarityCalculator

    rng = np.random.default_rng(0)
    a = np.concatenate([rng.uniform(0, 500, (12, 2)), rng.uniform(5, 100, (12, 2))], 1).astype(np.float32)
    b = np.concatenate([rng.uniform(0, 500, (9, 2)), rng.uniform(5, 100, (9, 2))], 1).astype(np.float32)
    host = SimilarityCalculator.iou_matrix(a, b)
    dev = np.asarray(box_ops.iou_matrix_xywh(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(host, dev, atol=1e-5)
