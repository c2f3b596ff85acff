"""Constant-velocity Kalman filter with adaptive dt, vmappable and jittable.

Functional rebuild of the reference KalmanFilter
(src/tracking/kalman_filter.py:65-196): state [x, y, vx, vy], transition F and
white-noise-acceleration process noise Q recomputed per dt, standard
predict/update. State lives in struct-of-arrays form so a whole track table
updates in one vmapped call (SURVEY.md §2.3 TPU-native column).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import Array


class KFState(NamedTuple):
    x: Array  # (4,) [px, py, vx, vy]
    P: Array  # (4, 4) covariance


DEFAULT_PROCESS_NOISE = 1.0
DEFAULT_MEASUREMENT_NOISE = 10.0
DEFAULT_INIT_VELOCITY_VAR = 1000.0


def kf_init(pos: Array, init_velocity_var: float = DEFAULT_INIT_VELOCITY_VAR) -> KFState:
    """Initialize from an observed position (reference kalman_filter.py:121-136)."""
    x = jnp.concatenate([pos, jnp.zeros(2, pos.dtype)])
    P = jnp.diag(jnp.asarray([10.0, 10.0, init_velocity_var, init_velocity_var], pos.dtype))
    return KFState(x=x, P=P)


def _transition(dt: Array, dtype) -> tuple[Array, Array]:
    """F and Q for a given dt (white-noise acceleration model,
    reference kalman_filter.py:65-119)."""
    one = jnp.ones((), dtype)
    zero = jnp.zeros((), dtype)
    F = jnp.array(
        [[1.0, 0.0, 1.0, 0.0], [0.0, 1.0, 0.0, 1.0], [0.0, 0.0, 1.0, 0.0], [0.0, 0.0, 0.0, 1.0]],
        dtype,
    )
    F = F.at[0, 2].set(dt * one)
    F = F.at[1, 3].set(dt * one)
    dt2 = dt * dt
    dt3 = dt2 * dt / 2.0
    dt4 = dt2 * dt2 / 4.0
    q = DEFAULT_PROCESS_NOISE
    Q = jnp.array(
        [
            [0.0, 0.0, 0.0, 0.0],
            [0.0, 0.0, 0.0, 0.0],
            [0.0, 0.0, 0.0, 0.0],
            [0.0, 0.0, 0.0, 0.0],
        ],
        dtype,
    )
    Q = Q.at[0, 0].set(dt4 * q)
    Q = Q.at[1, 1].set(dt4 * q)
    Q = Q.at[0, 2].set(dt3 * q)
    Q = Q.at[2, 0].set(dt3 * q)
    Q = Q.at[1, 3].set(dt3 * q)
    Q = Q.at[3, 1].set(dt3 * q)
    Q = Q.at[2, 2].set(dt2 * q)
    Q = Q.at[3, 3].set(dt2 * q)
    del zero
    return F, Q


@jax.jit
def kf_predict(state: KFState, dt: Array) -> KFState:
    F, Q = _transition(dt, state.x.dtype)
    x = F @ state.x
    P = F @ state.P @ F.T + Q
    return KFState(x=x, P=P)


@jax.jit
def kf_update(state: KFState, z: Array, meas_noise: float = DEFAULT_MEASUREMENT_NOISE) -> KFState:
    H = jnp.zeros((2, 4), state.x.dtype).at[0, 0].set(1.0).at[1, 1].set(1.0)
    R = jnp.eye(2, dtype=state.x.dtype) * meas_noise
    y = z - H @ state.x
    S = H @ state.P @ H.T + R
    K = state.P @ H.T @ jnp.linalg.inv(S)
    x = state.x + K @ y
    P = (jnp.eye(4, dtype=state.x.dtype) - K @ H) @ state.P
    return KFState(x=x, P=P)


# Vectorized forms over a track table: states stacked on leading axis.
kf_predict_batch = jax.jit(jax.vmap(kf_predict, in_axes=(KFState(0, 0), 0)))
_kf_update_batch_vmapped = jax.jit(
    jax.vmap(kf_update, in_axes=(KFState(0, 0), 0, None)), static_argnums=2
)


def kf_update_batch(states, zs, meas_noise: float = DEFAULT_MEASUREMENT_NOISE):
    """Batched update; wrapper makes the documented default reachable (a bare
    vmap with 3 in_axes rejects 2-arg calls)."""
    return _kf_update_batch_vmapped(states, zs, meas_noise)


def kf_position(state: KFState) -> Array:
    return state.x[..., :2]


def kf_velocity(state: KFState) -> Array:
    return state.x[..., 2:]


# ---------------------------------------------------------------- numpy twin
# Online trackers update one 4-dim filter per track inside a host Python
# loop; on a remote-device backend every eager jnp op there is a network
# round trip that dwarfs the arithmetic. These numpy mirrors keep the
# per-track path on host ("host code only at I/O edges"); the jitted/vmapped
# forms above remain the device path for batched track tables.

import numpy as _np  # noqa: E402  (kept local to the twin section)


def kf_init_np(pos, init_velocity_var: float = DEFAULT_INIT_VELOCITY_VAR) -> KFState:
    pos = _np.asarray(pos, _np.float32)
    x = _np.concatenate([pos, _np.zeros(2, _np.float32)])
    P = _np.diag(_np.asarray([10.0, 10.0, init_velocity_var, init_velocity_var], _np.float32))
    return KFState(x=x, P=P)


def _transition_np(dt: float) -> tuple[_np.ndarray, _np.ndarray]:
    dt = float(dt)
    F = _np.eye(4, dtype=_np.float32)
    F[0, 2] = dt
    F[1, 3] = dt
    dt2 = dt * dt
    dt3 = dt2 * dt / 2.0
    dt4 = dt2 * dt2 / 4.0
    q = DEFAULT_PROCESS_NOISE
    Q = _np.zeros((4, 4), _np.float32)
    Q[0, 0] = Q[1, 1] = dt4 * q
    Q[0, 2] = Q[2, 0] = Q[1, 3] = Q[3, 1] = dt3 * q
    Q[2, 2] = Q[3, 3] = dt2 * q
    return F, Q


def kf_predict_np(state: KFState, dt: float = 1.0) -> KFState:
    F, Q = _transition_np(dt)
    return KFState(x=F @ state.x, P=F @ state.P @ F.T + Q)


def kf_update_np(state: KFState, z, meas_noise: float = DEFAULT_MEASUREMENT_NOISE) -> KFState:
    z = _np.asarray(z, _np.float32)
    H = _np.zeros((2, 4), _np.float32)
    H[0, 0] = H[1, 1] = 1.0
    R = _np.eye(2, dtype=_np.float32) * meas_noise
    y = z - H @ state.x
    S = H @ state.P @ H.T + R
    K = state.P @ H.T @ _np.linalg.inv(S)
    x = state.x + K @ y
    P = (_np.eye(4, dtype=_np.float32) - K @ H) @ state.P
    return KFState(x=x, P=P)
