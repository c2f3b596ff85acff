"""Multi-target tracking integration scenarios (reference
tests/test_tracking_integration.py analog, extended): crossing targets,
occlusion + reacquisition, crowd entry/exit waves, adaptive-dt gaps, and
confirmed-track bookkeeping over longer synthetic sequences."""

import numpy as np
import pytest

from office_person_detection_vit_tpu.core.dto import Detection
from office_person_detection_vit_tpu.tracking import Tracker


def _feat(rng, base=None, noise=0.03):
    f = rng.normal(size=256) if base is None else base + rng.normal(size=256) * noise
    return (f / np.linalg.norm(f)).astype(np.float32)


def _det(x, y, conf=0.9, feature=None, w=50.0, h=120.0):
    return Detection(bbox=(float(x), float(y), w, h), confidence=conf, feature=feature)


class TestCrossingTargets:
    def test_ids_survive_a_crossing_via_appearance(self):
        """Two people walk through each other; distinct appearance features
        must keep ids from swapping (the cascade's appearance-first stage)."""
        rng = np.random.default_rng(0)
        fa, fb = _feat(rng), _feat(rng)
        tracker = Tracker(appearance_weight=0.9, motion_weight=0.1)
        id_a = id_b = None
        for step in range(11):
            xa = 100 + 40 * step      # left -> right
            xb = 500 - 40 * step      # right -> left
            da = _det(xa, 200, feature=_feat(rng, fa))
            db = _det(xb, 200, feature=_feat(rng, fb))
            tracker.update([da, db], timestamp=float(step))
            if step == 0:
                id_a, id_b = da.track_id, db.track_id
        assert da.track_id == id_a
        assert db.track_id == id_b
        assert id_a != id_b

    def test_exactly_two_tracks_created(self):
        rng = np.random.default_rng(1)
        fa, fb = _feat(rng), _feat(rng)
        tracker = Tracker()
        for step in range(8):
            tracker.update(
                [
                    _det(100 + 10 * step, 200, feature=_feat(rng, fa)),
                    _det(600, 400 + 10 * step, feature=_feat(rng, fb)),
                ],
                timestamp=float(step),
            )
        assert len(tracker.tracks) == 2


class TestOcclusion:
    def test_reacquired_after_short_occlusion(self):
        rng = np.random.default_rng(2)
        base = _feat(rng)
        tracker = Tracker(max_age=10)
        d = _det(100, 200, feature=_feat(rng, base))
        tracker.update([d], timestamp=0.0)
        original_id = d.track_id
        # occluded for 3 frames
        for step in range(1, 4):
            tracker.update([], timestamp=float(step))
        # reappears near the predicted position with the same appearance
        d2 = _det(108, 202, feature=_feat(rng, base))
        tracker.update([d2], timestamp=4.0)
        assert d2.track_id == original_id

    def test_lost_beyond_max_age_gets_new_id(self):
        rng = np.random.default_rng(3)
        base = _feat(rng)
        tracker = Tracker(max_age=2)
        d = _det(100, 200, feature=_feat(rng, base))
        tracker.update([d], timestamp=0.0)
        old_id = d.track_id
        for step in range(1, 5):
            tracker.update([], timestamp=float(step))
        assert tracker.tracks == []  # pruned
        d2 = _det(100, 200, feature=_feat(rng, base))
        tracker.update([d2], timestamp=5.0)
        assert d2.track_id != old_id


class TestCrowdDynamics:
    def test_entry_and_exit_wave(self):
        """People enter one per frame, linger, then leave one per frame;
        track count must follow without id churn."""
        rng = np.random.default_rng(4)
        bases = [_feat(rng) for _ in range(5)]
        positions = [(80 + 180 * i, 150 + 60 * (i % 3)) for i in range(5)]
        tracker = Tracker(max_age=3)
        seen_ids: set[int] = set()
        # entries
        active = []
        for step in range(5):
            active.append(step)
            dets = [
                _det(*positions[i], feature=_feat(rng, bases[i])) for i in active
            ]
            tracker.update(dets, timestamp=float(step))
            seen_ids.update(d.track_id for d in dets)
        assert len(seen_ids) == 5
        # linger: no new ids appear
        for step in range(5, 10):
            dets = [_det(*positions[i], feature=_feat(rng, bases[i])) for i in range(5)]
            tracker.update(dets, timestamp=float(step))
            assert {d.track_id for d in dets} == seen_ids
        # exits
        for k, step in enumerate(range(10, 15)):
            remaining = list(range(k + 1, 5))
            dets = [_det(*positions[i], feature=_feat(rng, bases[i])) for i in remaining]
            tracker.update(dets, timestamp=float(step))
        for step in range(15, 20):
            tracker.update([], timestamp=float(step))
        assert tracker.tracks == []


class TestAdaptiveDt:
    def test_five_minute_gaps_use_wall_clock(self):
        """Detections arrive at 300 s intervals (the 5-min sampling grid);
        the adaptive-dt Kalman must still gate-match a target moving at a
        constant floor velocity."""
        rng = np.random.default_rng(5)
        base = _feat(rng)
        tracker = Tracker(max_position_distance=200.0)
        ids = []
        for k in range(5):
            t = 300.0 * k
            d = _det(100 + 30 * k, 200 + 10 * k, feature=_feat(rng, base))
            tracker.update([d], timestamp=t)
            ids.append(d.track_id)
        assert len(set(ids)) == 1

    def test_position_gate_vs_teleport(self):
        """Same appearance but an impossible jump must NOT match when the
        position gate is tight."""
        rng = np.random.default_rng(6)
        base = _feat(rng)
        tracker = Tracker(max_position_distance=50.0)
        d = _det(100, 100, feature=_feat(rng, base))
        tracker.update([d], timestamp=0.0)
        far = _det(1100, 600, feature=_feat(rng, base))
        tracker.update([far], timestamp=1.0)
        assert far.track_id != d.track_id


class TestStatistics:
    def test_confirmed_tracks_require_min_hits(self):
        rng = np.random.default_rng(7)
        base = _feat(rng)
        tracker = Tracker(min_hits=3)
        for step in range(2):
            d = _det(100 + step, 100, feature=_feat(rng, base))
            confirmed = tracker.update([d], timestamp=float(step))
        assert confirmed == []
        d = _det(103, 100, feature=_feat(rng, base))
        confirmed = tracker.update([d], timestamp=3.0)
        assert len(confirmed) == 1

    def test_track_history_grows_with_updates(self):
        rng = np.random.default_rng(8)
        base = _feat(rng)
        tracker = Tracker()
        for step in range(6):
            tracker.update(
                [_det(100 + 5 * step, 100, feature=_feat(rng, base))],
                timestamp=float(step),
            )
        track = tracker.tracks[0]
        assert track.hits == 6
        assert len(track.trajectory) >= 6
