import numpy as np

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
