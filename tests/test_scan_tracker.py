"""Fully-jitted lax.scan tracker (tracking/scan_tracker.py).

The TPU-native formulation of SURVEY.md §7.4 hard part 3 — the whole
sequence tracks in ONE device program. Association quality is held to the
same end-metric bar as the host cascade tracker (tests/test_track_quality).
"""

from datetime import datetime, timedelta

import numpy as np

from tools.track_quality_benchmark import synthetic_gt

from office_person_detection_vit_tpu.benchmark.mot_metrics import evaluate_mot
from office_person_detection_vit_tpu.core.dto import Detection, FrameResult
from office_person_detection_vit_tpu.tracking.scan_tracker import (
    assign_track_ids,
    init_state,
    scan_track,
)


def _frame_results_from_gt(gt, noise=0.0, drop=0.0, seed=0, features=True):
    rng = np.random.default_rng(seed)
    base = datetime(2025, 1, 20, 9, 0, 0)
    frame_results = []
    for f in sorted(gt):
        dets = []
        for tid, (x, y, w, h) in gt[f]:
            if drop and rng.uniform() < drop:
                continue
            j = rng.normal(0, noise, 4) if noise else np.zeros(4)
            d = Detection(bbox=(x + j[0], y + j[1], max(4, w + j[2]),
                                max(4, h + j[3])),
                          confidence=float(rng.uniform(0.6, 0.95)))
            if features:
                r = np.random.default_rng(1000 + tid)
                ft = r.normal(size=64).astype(np.float32)
                ft += rng.normal(0, 0.05, 64).astype(np.float32)
                d.feature = ft / np.linalg.norm(ft)
            dets.append(d)
        frame_results.append(
            FrameResult(f, base + timedelta(seconds=f), dets)
        )
    return frame_results


class TestScanTracker:
    def test_clean_sequence_tracks_perfectly(self):
        gt = synthetic_gt(people=3, frames=20)
        frs = _frame_results_from_gt(gt)
        ids = assign_track_ids(frs)
        hyp = {
            fr.frame_number: [(d.track_id, d.bbox) for d in fr.detections
                              if d.track_id is not None]
            for fr in frs
        }
        res = evaluate_mot(gt, hyp)
        assert res.mota == 1.0, res.to_dict()
        assert res.idf1 == 1.0, res.to_dict()
        assert res.idsw == 0

    def test_noisy_sequence_meets_quality_bar(self):
        gt = synthetic_gt(people=6, frames=40)
        frs = _frame_results_from_gt(gt, noise=2.0, drop=0.1, seed=0)
        assign_track_ids(frs)
        hyp = {
            fr.frame_number: [(d.track_id, d.bbox) for d in fr.detections
                              if d.track_id is not None]
            for fr in frs
        }
        res = evaluate_mot(gt, hyp)
        # Same reference system targets as the cascade tracker.
        assert res.mota >= 0.7, res.to_dict()
        assert res.idf1 >= 0.8, res.to_dict()

    def test_single_program_scan(self):
        """scan_track is one jitted call over the whole (F, D) sequence."""
        import jax.numpy as jnp

        F, D = 12, 5
        rng = np.random.default_rng(0)
        boxes = np.zeros((F, D, 4), np.float32)
        valid = np.zeros((F, D), bool)
        for f in range(F):
            for p in range(3):
                boxes[f, p] = (100 + 5 * f + 200 * p, 200, 60, 140)
                valid[f, p] = True
        conf = np.full((F, D), 0.9, np.float32)
        feats = np.zeros((F, D, 1), np.float32)
        state = init_state(16, 1)
        final, ids = scan_track(
            state, jnp.asarray(boxes), jnp.asarray(conf),
            jnp.asarray(valid), jnp.asarray(feats), jnp.ones((F,), jnp.float32),
        )
        ids = np.asarray(ids)
        assert ids.shape == (F, D)
        # 3 stable identities, padding slots -1.
        assert (ids[:, 3:] == -1).all()
        for p in range(3):
            col = ids[:, p]
            assert (col == col[0]).all() and col[0] > 0
        assert len({int(ids[0, p]) for p in range(3)}) == 3
        assert int(np.asarray(final.next_id)) == 4

    def test_capacity_overflow_leaves_dets_unmatched(self):
        import jax.numpy as jnp

        F, D, cap = 2, 6, 4
        boxes = np.zeros((F, D, 4), np.float32)
        for f in range(F):
            for p in range(D):
                boxes[f, p] = (50 + 150 * p, 300, 60, 140)
        conf = np.full((F, D), 0.9, np.float32)
        valid = np.ones((F, D), bool)
        feats = np.zeros((F, D, 1), np.float32)
        _, ids = scan_track(
            init_state(cap, 1), jnp.asarray(boxes), jnp.asarray(conf),
            jnp.asarray(valid), jnp.asarray(feats),
            jnp.ones((F,), jnp.float32),
        )
        ids = np.asarray(ids)
        assert (ids[0] >= 0).sum() == cap          # only cap slots allocatable
        assert (ids[0] == -1).sum() == D - cap

    def test_track_dies_after_max_age(self):
        import jax.numpy as jnp

        F, D = 10, 1
        boxes = np.zeros((F, D, 4), np.float32)
        valid = np.zeros((F, D), bool)
        boxes[0, 0] = (100, 100, 60, 140)
        valid[0, 0] = True
        # reappears far later at the same place -> must be a NEW id
        boxes[9, 0] = (100, 100, 60, 140)
        valid[9, 0] = True
        conf = np.full((F, D), 0.9, np.float32)
        feats = np.zeros((F, D, 1), np.float32)
        _, ids = scan_track(
            init_state(8, 1), jnp.asarray(boxes), jnp.asarray(conf),
            jnp.asarray(valid), jnp.asarray(feats),
            jnp.ones((F,), jnp.float32), max_age=3,
        )
        ids = np.asarray(ids)
        assert ids[0, 0] > 0 and ids[9, 0] > 0
        assert ids[9, 0] != ids[0, 0]


def test_tracking_phase_scan_engine(tmp_path):
    """tracking.engine=scan routes Phase 2.5 through the jitted scan and
    still produces the reference export artifacts."""
    from tests.test_pipeline_e2e import _config

    from office_person_detection_vit_tpu.pipeline.phases.tracking import (
        TrackingPhase,
    )

    cfg = _config(tmp_path, "unused.mp4",
                  **{"tracking.enabled": True, "tracking.engine": "scan"})
    base = datetime(2025, 1, 20, 9, 0, 0)
    frs = [
        FrameResult(i, base + timedelta(seconds=10 * i),
                    [Detection(bbox=(100 + 3 * i, 200, 50, 130), confidence=0.9),
                     Detection(bbox=(900 - 2 * i, 300, 60, 140), confidence=0.8)])
        for i in range(6)
    ]
    TrackingPhase(cfg).execute(frs, output_dir=tmp_path / "trk")
    ids0 = [d.track_id for d in frs[0].detections]
    assert all(i is not None for i in ids0)
    for fr in frs[1:]:
        assert [d.track_id for d in fr.detections] == ids0
    assert (tmp_path / "trk" / "tracks_mot.csv").exists()
    assert (tmp_path / "trk" / "tracking_statistics.json").exists()


import pytest
from pathlib import Path

REFERENCE_GOLD_GT = Path("/root/reference/output/ground_truth/gt_tracking.json")


@pytest.mark.skipif(
    not REFERENCE_GOLD_GT.exists(), reason="reference checkout absent"
)
def test_scan_engine_reference_gold_gt():
    """The jitted tracker holds the cascade's bar on the reference's own
    gold GT under detector noise (appearance bridges the sparse 5-min
    frame gaps, where motion-only overlap gating cannot)."""
    from tools.track_quality_benchmark import run_tracker

    from office_person_detection_vit_tpu.benchmark.mot_metrics import (
        load_gold_gt,
    )

    gt = load_gold_gt(REFERENCE_GOLD_GT)
    hyp = run_tracker(gt, noise=2.0, drop=0.1, fp_per_frame=1.0, seed=0,
                      engine="scan")
    res = evaluate_mot(gt, hyp)
    assert res.mota >= 0.8, res.to_dict()
    assert res.idf1 >= 0.9, res.to_dict()
    assert res.idsw == 0
