"""Linear assignment for detection-track association and the DETR matcher.

Three solvers with the same contract as the reference HungarianAlgorithm
(src/tracking/hungarian.py:26-93):

- :func:`solve_lap` — exact, host-side scipy ``linear_sum_assignment`` with
  the reference's inf->1e9 sanitization and greedy fallback on failure.
- :func:`greedy_assignment` — host numpy greedy (the reference's fallback,
  hungarian.py:64-93).
- :func:`greedy_assignment_jit` — fixed-shape jitted greedy for use inside
  traced code (lax.fori_loop over min(N, M) picks, masked argmin each step).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

BIG_COST = 1e9


def _sanitize(cost: np.ndarray) -> np.ndarray:
    cost = np.asarray(cost, np.float64).copy()
    cost[~np.isfinite(cost)] = BIG_COST
    return cost


def greedy_assignment(cost: np.ndarray, max_cost: float | None = None) -> list[tuple[int, int]]:
    """Repeatedly pick the globally cheapest remaining pair."""
    cost = _sanitize(cost)
    N, M = cost.shape
    pairs: list[tuple[int, int]] = []
    used_r = np.zeros(N, bool)
    used_c = np.zeros(M, bool)
    for _ in range(min(N, M)):
        masked = cost.copy()
        masked[used_r, :] = np.inf
        masked[:, used_c] = np.inf
        idx = np.unravel_index(np.argmin(masked), masked.shape)
        if not np.isfinite(masked[idx]):
            break
        if max_cost is not None and masked[idx] > max_cost:
            break
        pairs.append((int(idx[0]), int(idx[1])))
        used_r[idx[0]] = True
        used_c[idx[1]] = True
    return pairs


def solve_lap(cost: np.ndarray) -> list[tuple[int, int]]:
    """Exact LAP via scipy with greedy fallback (reference hungarian.py:44-62)."""
    if cost.size == 0:
        return []
    cost = _sanitize(cost)
    try:
        from scipy.optimize import linear_sum_assignment

        rows, cols = linear_sum_assignment(cost)
        return [(int(r), int(c)) for r, c in zip(rows, cols)]
    except Exception:  # pragma: no cover - scipy failure path
        return greedy_assignment(cost)


@jax.jit
def greedy_assignment_jit(cost: Array, max_cost: float = BIG_COST) -> tuple[Array, Array]:
    """Fixed-shape greedy LAP: (N, M) cost -> (row_assign (N,), col_assign (M,)).

    row_assign[i] = matched column or -1; col_assign[j] = matched row or -1.
    Pairs with cost > max_cost are not matched. Runs entirely on device —
    the jit-friendly escape hatch for association inside lax.scan
    (SURVEY.md §7.4 item 3).
    """
    N, M = cost.shape
    cost = jnp.where(jnp.isfinite(cost), cost, BIG_COST)

    def body(_, carry):
        row_assign, col_assign, c = carry
        flat = jnp.argmin(c)
        i, j = flat // M, flat % M
        ok = c[i, j] <= max_cost
        row_assign = jnp.where(ok, row_assign.at[i].set(j), row_assign)
        col_assign = jnp.where(ok, col_assign.at[j].set(i), col_assign)
        c = jnp.where(ok, c.at[i, :].set(jnp.inf).at[:, j].set(jnp.inf), c.at[i, j].set(jnp.inf))
        return row_assign, col_assign, c

    init = (
        jnp.full((N,), -1, jnp.int32),
        jnp.full((M,), -1, jnp.int32),
        cost.astype(jnp.float32),
    )
    row_assign, col_assign, _ = jax.lax.fori_loop(0, min(N, M), body, init)
    return row_assign, col_assign


class HungarianAlgorithm:
    """Reference-compatible facade (hungarian.py:26)."""

    def solve(self, cost_matrix: np.ndarray) -> list[tuple[int, int]]:
        return solve_lap(np.asarray(cost_matrix))

    def _greedy_assignment(self, cost_matrix: np.ndarray) -> list[tuple[int, int]]:
        return greedy_assignment(np.asarray(cost_matrix))
