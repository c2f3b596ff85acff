import jax.numpy as jnp
import numpy as np

from office_person_detection_vit_tpu.ops import assignment


def test_solve_lap_exact():
    cost = np.asarray([[4.0, 1.0, 3.0], [2.0, 0.0, 5.0], [3.0, 2.0, 2.0]])
    pairs = assignment.solve_lap(cost)
    total = sum(cost[r, c] for r, c in pairs)
    assert total == 5.0  # optimal assignment


def test_solve_lap_handles_inf():
    cost = np.asarray([[np.inf, 1.0], [1.0, np.inf]])
    pairs = dict(assignment.solve_lap(cost))
    assert pairs == {0: 1, 1: 0}


def test_greedy_assignment():
    cost = np.asarray([[1.0, 10.0], [10.0, 2.0]])
    assert set(assignment.greedy_assignment(cost)) == {(0, 0), (1, 1)}


def test_greedy_respects_max_cost():
    cost = np.asarray([[1.0, 10.0], [10.0, 50.0]])
    pairs = assignment.greedy_assignment(cost, max_cost=5.0)
    assert pairs == [(0, 0)]


def test_jit_greedy_matches_host_greedy():
    rng = np.random.default_rng(0)
    for _ in range(5):
        cost = rng.uniform(0, 10, size=(6, 4))
        row, col = assignment.greedy_assignment_jit(jnp.asarray(cost))
        host = assignment.greedy_assignment(cost)
        jit_pairs = {(int(r), int(row[r])) for r in range(6) if int(np.asarray(row)[r]) >= 0}
        assert jit_pairs == set(host)


def test_jit_greedy_max_cost():
    cost = jnp.asarray([[0.5, 20.0], [20.0, 30.0]])
    row, col = assignment.greedy_assignment_jit(cost, max_cost=5.0)
    assert int(row[0]) == 0 and int(row[1]) == -1
    assert int(col[0]) == 0 and int(col[1]) == -1


def test_empty_cost():
    assert assignment.solve_lap(np.zeros((0, 3))) == []
