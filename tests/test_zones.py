import numpy as np
import pytest

from office_person_detection_vit_tpu.ops.zones import ZoneClassifier


@pytest.fixture
def classifier(zones_config):
    return ZoneClassifier(zones_config)


def test_point_in_zone(classifier):
    assert classifier.classify((900.0, 1000.0)) == ["zone_1"]
    assert classifier.classify((1200.0, 1000.0)) == ["zone_2"]
    assert classifier.classify((1400.0, 1000.0)) == ["zone_3"]


def test_point_outside_all(classifier):
    assert classifier.classify((10.0, 10.0)) == []


def test_classify_batch(classifier):
    pts = np.asarray([[900.0, 1000.0], [1400.0, 1000.0], [0.0, 0.0]])
    out = classifier.classify_batch(pts)
    assert out == [["zone_1"], ["zone_3"], []]


def test_classify_with_unclassified(classifier):
    out = classifier.classify_with_unclassified(np.asarray([[0.0, 0.0]]))
    assert out == [["unclassified"]]


def test_overlapping_zones_all_mode():
    zones = [
        {"id": "a", "polygon": [[0, 0], [10, 0], [10, 10], [0, 10]], "priority": 1},
        {"id": "b", "polygon": [[5, 5], [15, 5], [15, 15], [5, 15]], "priority": 2},
    ]
    clf = ZoneClassifier(zones, overlap_mode="all")
    assert clf.classify((7.0, 7.0)) == ["a", "b"]


def test_overlapping_zones_priority_mode():
    zones = [
        {"id": "a", "polygon": [[0, 0], [10, 0], [10, 10], [0, 10]], "priority": 2},
        {"id": "b", "polygon": [[5, 5], [15, 5], [15, 15], [5, 15]], "priority": 1},
    ]
    clf = ZoneClassifier(zones, overlap_mode="priority")
    assert clf.classify((7.0, 7.0)) == ["b"]


def test_concave_polygon():
    # L-shape: point in the notch is outside.
    zones = [{"id": "L", "polygon": [[0, 0], [10, 0], [10, 4], [4, 4], [4, 10], [0, 10]], "priority": 1}]
    clf = ZoneClassifier(zones)
    assert clf.classify((2.0, 8.0)) == ["L"]
    assert clf.classify((8.0, 8.0)) == []  # notch
    assert clf.classify((8.0, 2.0)) == ["L"]


def test_mixed_vertex_counts_padding():
    zones = [
        {"id": "tri", "polygon": [[0, 0], [10, 0], [5, 10]], "priority": 1},
        {"id": "pent", "polygon": [[20, 0], [30, 0], [32, 8], [25, 14], [18, 8]], "priority": 2},
    ]
    clf = ZoneClassifier(zones)
    assert clf.classify((5.0, 3.0)) == ["tri"]
    assert clf.classify((25.0, 6.0)) == ["pent"]
    assert clf.classify((15.0, 5.0)) == []


def test_validation_errors():
    with pytest.raises(ValueError):
        ZoneClassifier([{"id": "x", "polygon": [[0, 0], [1, 1]]}])
    with pytest.raises(ValueError):
        ZoneClassifier(
            [
                {"id": "x", "polygon": [[0, 0], [1, 0], [0, 1]]},
                {"id": "x", "polygon": [[0, 0], [1, 0], [0, 1]]},
            ]
        )


def test_agrees_with_matplotlib_path(zones_config):
    from matplotlib.path import Path

    clf = ZoneClassifier(zones_config)
    rng = np.random.default_rng(0)
    pts = rng.uniform([800, 850], [1700, 1400], size=(200, 2))
    ours = clf.membership(pts)
    for z, zone in enumerate(zones_config):
        path = Path(np.asarray(zone["polygon"], float))
        ref = path.contains_points(pts)
        # Boundary pixels may differ; require agreement away from edges.
        poly = np.asarray(zone["polygon"], float)
        xmin, ymin = poly.min(0)
        xmax, ymax = poly.max(0)
        margin = 1e-6
        interior = (
            (np.abs(pts[:, 0] - xmin) > margin)
            & (np.abs(pts[:, 0] - xmax) > margin)
            & (np.abs(pts[:, 1] - ymin) > margin)
            & (np.abs(pts[:, 1] - ymax) > margin)
        )
        assert (ours[:, z] == ref)[interior].all()


def test_priority_mode_no_zones():
    """Regression: priority mode with zero zones must not crash."""
    from office_person_detection_vit_tpu.zone.zone_classifier import ZoneClassifier

    zc = ZoneClassifier([], overlap_mode="priority")
    assert zc.classify_batch(np.asarray([[1.0, 2.0]])) == [[]]
