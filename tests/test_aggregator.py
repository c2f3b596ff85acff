import numpy as np
import pytest

from office_person_detection_vit_tpu.aggregation.aggregator import Aggregator


def _fill(agg):
    agg.aggregate_frame("2025-01-20 09:00:00", [["zone_1"], ["zone_1"], ["zone_2"]])
    agg.aggregate_frame("2025-01-20 09:05:00", [["zone_1", "zone_2"], []])
    agg.aggregate_frame("2025-01-20 09:10:00", [])


def test_aggregate_and_counts():
    agg = Aggregator(["zone_1", "zone_2", "zone_3"])
    _fill(agg)
    counts = agg.get_zone_counts()
    assert counts["2025-01-20 09:00:00"] == {"zone_1": 2, "zone_2": 1, "zone_3": 0}
    # overlap counts in both zones; no-zone detection -> unclassified
    assert counts["2025-01-20 09:05:00"] == {"zone_1": 1, "zone_2": 1, "zone_3": 0, "unclassified": 1}
    assert counts["2025-01-20 09:10:00"] == {"zone_1": 0, "zone_2": 0, "zone_3": 0}


def test_statistics():
    agg = Aggregator(["zone_1", "zone_2", "zone_3"])
    _fill(agg)
    stats = agg.get_statistics()
    np.testing.assert_allclose(stats["zone_1"]["average"], 1.0, atol=1e-6)
    assert stats["zone_1"]["max"] == 2.0 and stats["zone_1"]["min"] == 0.0


def test_trend_and_peaks():
    agg = Aggregator(["a"])
    for i in range(5):
        agg.aggregate_frame(f"t{i}", [["a"]] * i)
    trend = agg.get_trend_analysis()
    assert trend["a"]["direction"] == "increasing"
    peaks = agg.get_peak_times(top_n=2)
    assert peaks[0]["timestamp"] == "t4" and peaks[0]["total_count"] == 4


def test_export_csv(tmp_path):
    agg = Aggregator(["zone_1", "zone_2", "zone_3"])
    _fill(agg)
    p = agg.export_csv(tmp_path / "zone_counts.csv")
    lines = p.read_text().strip().splitlines()
    assert lines[0] == "timestamp,zone_1,zone_2,zone_3,unclassified,total"
    assert lines[1] == "2025-01-20 09:00:00,2,1,0,0,3"
    assert lines[2] == "2025-01-20 09:05:00,1,1,0,1,3"
    assert lines[3] == "2025-01-20 09:10:00,0,0,0,0,0"


def test_batched_membership_ingestion():
    agg = Aggregator(["a", "b"])
    membership = np.zeros((2, 3, 2), bool)
    valid = np.zeros((2, 3), bool)
    membership[0, 0, 0] = True
    valid[0, 0] = True
    valid[0, 1] = True  # valid det in no zone -> unclassified
    agg.aggregate_membership(["t0", "t1"], membership, valid)
    counts = agg.get_zone_counts()
    assert counts["t0"] == {"a": 1, "b": 0, "unclassified": 1}


class TestTrendsAndPeaks:
    def _agg_with_counts(self, series):
        from office_person_detection_vit_tpu.aggregation.aggregator import Aggregator

        agg = Aggregator(["z1"])
        for i, n in enumerate(series):
            agg.aggregate_frame(f"t{i}", [["z1"]] * n)
        return agg

    def test_increasing_trend(self):
        agg = self._agg_with_counts([0, 1, 2, 3, 4])
        t = agg.get_trend_analysis()["z1"]
        assert t["direction"] == "increasing"
        assert t["slope"] == pytest.approx(1.0)
        assert t["r_squared"] == pytest.approx(1.0)

    def test_decreasing_trend(self):
        agg = self._agg_with_counts([4, 3, 2, 1, 0])
        assert agg.get_trend_analysis()["z1"]["direction"] == "decreasing"

    def test_stable_trend(self):
        agg = self._agg_with_counts([2, 2, 2, 2])
        t = agg.get_trend_analysis()["z1"]
        assert t["direction"] == "stable"
        assert t["slope"] == pytest.approx(0.0, abs=1e-6)

    def test_trend_needs_two_frames(self):
        agg = self._agg_with_counts([3])
        assert agg.get_trend_analysis() == {}

    def test_peaks_ranked_by_total(self):
        agg = self._agg_with_counts([1, 5, 2, 4, 0])
        peaks = agg.get_peak_times(top_n=2)
        assert [p["timestamp"] for p in peaks] == ["t1", "t3"]
        assert [p["total_count"] for p in peaks] == [5, 4]

    def test_peaks_clamped_to_available(self):
        agg = self._agg_with_counts([1, 2])
        assert len(agg.get_peak_times(top_n=10)) == 2

    def test_statistics_quartiles(self):
        agg = self._agg_with_counts([0, 1, 2, 3, 4])
        s = agg.get_statistics()["z1"]
        assert s["average"] == pytest.approx(2.0)
        assert s["median"] == pytest.approx(2.0)
        assert s["q1"] == pytest.approx(1.0)
        assert s["q3"] == pytest.approx(3.0)
        assert s["max"] == 4 and s["min"] == 0

    def test_reset(self):
        agg = self._agg_with_counts([1, 2, 3])
        agg.reset()
        assert agg.counts_matrix.shape == (0, 1)
        assert agg.get_peak_times() == []

    def test_multi_zone_membership_counts_each(self):
        from office_person_detection_vit_tpu.aggregation.aggregator import Aggregator

        agg = Aggregator(["a", "b"])
        r = agg.aggregate_frame("t0", [["a", "b"], ["a"], []])
        assert r.zone_counts["a"] == 2 and r.zone_counts["b"] == 1
        assert r.zone_counts["unclassified"] == 1
        # total counts each zone membership plus unclassified
        assert r.total_count == 4

    def test_csv_header_and_totals(self, tmp_path):
        from office_person_detection_vit_tpu.aggregation.aggregator import Aggregator

        agg = Aggregator(["a", "b"])
        agg.aggregate_frame("09:00", [["a"], []])
        p = agg.export_csv(tmp_path / "zone_counts.csv")
        import csv as _csv

        rows = list(_csv.reader(p.open()))
        assert rows[0] == ["timestamp", "a", "b", "unclassified", "total"]
        assert rows[1] == ["09:00", "1", "0", "1", "2"]
