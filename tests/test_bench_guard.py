"""On-chip ceiling regression guard (VERDICT r4 #3): the end-to-end bench
number rides a shared tunnel, so bench.py compares its scan-chained
``compute_ceiling_fps`` against the per-round committed artifact
(docs/artifacts/bench_ceiling.json) — a congested run can no longer mask a
real on-chip regression."""

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from bench import CEILING_TOLERANCE, ceiling_guard  # noqa: E402
from tools.update_bench_ceiling import update  # noqa: E402


class TestCeilingGuard:
    def test_committed_artifact_is_valid(self):
        doc = json.loads((REPO / "docs/artifacts/bench_ceiling.json").read_text())
        assert doc["ceiling_fps"] > 300  # the ~367 f/s plateau, any round
        assert doc["round"] >= 4
        # history carries every recorded round (r01.. at minimum)
        assert "r04" in doc["history"]

    def test_within_tolerance_passes(self, tmp_path):
        p = tmp_path / "ceiling.json"
        p.write_text(json.dumps({"ceiling_fps": 366.9}))
        g = ceiling_guard(366.9 * (1.0 - CEILING_TOLERANCE + 0.001), p)
        assert not g["regressed"]
        assert g["committed_fps"] == 366.9

    def test_regression_flagged(self, tmp_path):
        p = tmp_path / "ceiling.json"
        p.write_text(json.dumps({"ceiling_fps": 366.9}))
        g = ceiling_guard(366.9 * 0.9, p)
        assert g["regressed"]
        assert g["ratio"] < 0.95

    def test_improvement_passes(self, tmp_path):
        p = tmp_path / "ceiling.json"
        p.write_text(json.dumps({"ceiling_fps": 366.9}))
        assert not ceiling_guard(450.0, p)["regressed"]

    def test_missing_artifact_is_not_a_failure(self, tmp_path):
        g = ceiling_guard(100.0, tmp_path / "nope.json")
        assert g == {"committed_fps": None, "ratio": None, "regressed": False}

    def test_updater_appends_history(self, tmp_path):
        p = tmp_path / "ceiling.json"
        update(366.9, 4, p)
        doc = update(401.2, 5, p)
        assert doc["ceiling_fps"] == 401.2
        assert doc["round"] == 5
        assert doc["history"] == {"r04": 366.9, "r05": 401.2}
        # guard now measures against the new commit
        assert ceiling_guard(380.0, p)["regressed"]
