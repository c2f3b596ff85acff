"""End-metric tracking quality (not mechanics): MOTA/IDF1 on the board.

The reference's committed tracking benchmark scored MOTA -111.76% /
IDF1 12.20% (reference output/benchmark/tracking_metrics.json). Our tracker
must post positive MOTA under detector-like noise on both the reference's
own gold GT and a synthetic crossing sequence
(tools/track_quality_benchmark.py; results recorded in BASELINE.md).
"""

from pathlib import Path

import pytest

from tools.track_quality_benchmark import run_tracker, synthetic_gt

from office_person_detection_vit_tpu.benchmark.mot_metrics import (
    evaluate_mot,
    load_gold_gt,
)

REFERENCE_GOLD_GT = Path("/root/reference/output/ground_truth/gt_tracking.json")


def test_synthetic_crossing_sequence_beats_reference_targets():
    gt = synthetic_gt(people=6, frames=40)
    hyp = run_tracker(gt, noise=2.0, drop=0.1, fp_per_frame=1.0, seed=0)
    res = evaluate_mot(gt, hyp)
    # Reference system targets (docs/baseline_verification_guide.md:80-97,
    # unmet by the reference): MOTA >= 0.7, IDF1 >= 0.8.
    assert res.mota >= 0.7, res.to_dict()
    assert res.idf1 >= 0.8, res.to_dict()
    assert res.idsw == 0, res.to_dict()


def test_clean_detections_track_perfectly():
    gt = synthetic_gt(people=4, frames=25)
    hyp = run_tracker(gt, noise=0.0, drop=0.0, fp_per_frame=0.0)
    res = evaluate_mot(gt, hyp)
    assert res.mota == pytest.approx(1.0)
    assert res.idf1 == pytest.approx(1.0)


@pytest.mark.skipif(
    not REFERENCE_GOLD_GT.exists(), reason="reference checkout absent"
)
def test_reference_gold_gt_positive_mota():
    gt = load_gold_gt(REFERENCE_GOLD_GT)
    hyp = run_tracker(gt, noise=2.0, drop=0.1, fp_per_frame=1.0, seed=0)
    res = evaluate_mot(gt, hyp)
    assert res.mota >= 0.8, res.to_dict()   # reference committed: -1.1176
    assert res.idf1 >= 0.85, res.to_dict()  # reference committed: 0.1220
