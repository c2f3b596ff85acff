import jax.numpy as jnp
import numpy as np

from office_person_detection_vit_tpu.ops import aggregation


def _toy():
    # 3 frames, 4 slots, 2 zones
    membership = np.zeros((3, 4, 2), bool)
    valid = np.zeros((3, 4), bool)
    # frame 0: two dets in zone 0, one in zone 1
    membership[0, 0, 0] = True
    membership[0, 1, 0] = True
    membership[0, 2, 1] = True
    valid[0, :3] = True
    # frame 1: one det in both zones (overlap counts in each)
    membership[1, 0, :] = True
    valid[1, 0] = True
    # frame 2: one valid det in no zone
    valid[2, 0] = True
    return jnp.asarray(membership), jnp.asarray(valid)


def test_zone_count_matrix():
    m, v = _toy()
    counts = np.asarray(aggregation.zone_count_matrix(m, v))
    np.testing.assert_array_equal(counts, [[2, 1], [1, 1], [0, 0]])


def test_invalid_slots_ignored():
    m, v = _toy()
    m = m.at[0, 3, 0].set(True)  # invalid slot marked in zone
    counts = np.asarray(aggregation.zone_count_matrix(m, v))
    assert counts[0, 0] == 2


def test_unclassified_counts():
    m, v = _toy()
    u = np.asarray(aggregation.unclassified_counts(m, v))
    np.testing.assert_array_equal(u, [0, 0, 1])


def test_zone_statistics():
    counts = jnp.asarray([[2, 1], [1, 1], [0, 0]], jnp.int32)
    stats = {k: np.asarray(val) for k, val in aggregation.zone_statistics(counts).items()}
    np.testing.assert_allclose(stats["average"], [1.0, 2.0 / 3.0], atol=1e-6)
    np.testing.assert_allclose(stats["max"], [2.0, 1.0])
    np.testing.assert_allclose(stats["min"], [0.0, 0.0])
    np.testing.assert_allclose(stats["median"], [1.0, 1.0])


def test_linear_trend_exact_line():
    # counts = 2*t + 1 in zone 0; constant 3 in zone 1
    t = np.arange(5)
    counts = jnp.asarray(np.stack([2 * t + 1, np.full(5, 3)], axis=1))
    trend = {k: np.asarray(v) for k, v in aggregation.linear_trend(counts).items()}
    np.testing.assert_allclose(trend["slope"], [2.0, 0.0], atol=1e-5)
    np.testing.assert_allclose(trend["intercept"], [1.0, 3.0], atol=1e-5)
    np.testing.assert_allclose(trend["r_squared"][0], 1.0, atol=1e-5)


def test_top_k_peaks():
    counts = jnp.asarray([[1, 0], [5, 5], [2, 2], [0, 0]])
    idxs, vals = aggregation.top_k_peaks(counts, k=2)
    np.testing.assert_array_equal(np.asarray(idxs), [1, 2])
    np.testing.assert_array_equal(np.asarray(vals), [10, 4])
