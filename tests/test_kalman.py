import jax.numpy as jnp
import numpy as np

from office_person_detection_vit_tpu.ops import kalman


def test_init_state():
    s = kalman.kf_init(jnp.asarray([10.0, 20.0]))
    np.testing.assert_allclose(np.asarray(s.x), [10, 20, 0, 0])
    assert s.P.shape == (4, 4)


def test_predict_moves_with_velocity():
    s = kalman.kf_init(jnp.asarray([0.0, 0.0]))
    s = kalman.KFState(x=s.x.at[2].set(5.0).at[3].set(-2.0), P=s.P)
    s2 = kalman.kf_predict(s, jnp.asarray(2.0))
    np.testing.assert_allclose(np.asarray(s2.x[:2]), [10.0, -4.0], atol=1e-5)


def test_update_pulls_towards_measurement():
    s = kalman.kf_init(jnp.asarray([0.0, 0.0]))
    s2 = kalman.kf_update(s, jnp.asarray([10.0, 10.0]))
    pos = np.asarray(s2.x[:2])
    assert 0 < pos[0] < 10 and 0 < pos[1] < 10
    # Covariance shrinks after update
    assert np.trace(np.asarray(s2.P)) < np.trace(np.asarray(s.P))


def test_tracks_constant_velocity_motion():
    """Filter converges onto a constant-velocity trajectory."""
    s = kalman.kf_init(jnp.asarray([0.0, 0.0]))
    dt = 1.0
    for t in range(1, 20):
        s = kalman.kf_predict(s, jnp.asarray(dt))
        s = kalman.kf_update(s, jnp.asarray([3.0 * t, -1.0 * t]))
    vel = np.asarray(kalman.kf_velocity(s))
    np.testing.assert_allclose(vel, [3.0, -1.0], atol=0.2)


def test_adaptive_dt_scales_uncertainty():
    s = kalman.kf_init(jnp.asarray([0.0, 0.0]))
    p_small = np.trace(np.asarray(kalman.kf_predict(s, jnp.asarray(1.0)).P))
    p_large = np.trace(np.asarray(kalman.kf_predict(s, jnp.asarray(300.0)).P))
    assert p_large > p_small  # multi-minute gaps inflate uncertainty


def test_batched_predict_matches_single():
    pos = jnp.asarray([[0.0, 0.0], [5.0, 5.0], [9.0, 1.0]])
    states = kalman.KFState(
        x=jnp.stack([kalman.kf_init(p).x for p in pos]),
        P=jnp.stack([kalman.kf_init(p).P for p in pos]),
    )
    dts = jnp.asarray([1.0, 2.0, 3.0])
    batch = kalman.kf_predict_batch(states, dts)
    for i in range(3):
        single = kalman.kf_predict(kalman.KFState(states.x[i], states.P[i]), dts[i])
        np.testing.assert_allclose(np.asarray(batch.x[i]), np.asarray(single.x), atol=1e-5)


def test_kf_update_batch_default_noise():
    """Regression: the documented default meas_noise must be reachable."""
    import jax.numpy as jnp
    from office_person_detection_vit_tpu.ops import kalman

    import jax

    states = jax.vmap(kalman.kf_init)(jnp.asarray([[0.0, 0.0], [5.0, 5.0]]))
    out = kalman.kf_update_batch(states, jnp.asarray([[1.0, 1.0], [6.0, 6.0]]))
    assert out.x.shape == (2, 4)


class TestNumpyTwins:
    """The host-side numpy mirrors must match the jitted forms exactly
    (online trackers use them to avoid per-track device round trips)."""

    def test_predict_update_parity(self):
        import numpy as np

        from office_person_detection_vit_tpu.ops import kalman

        s_np = kalman.kf_init_np(np.asarray([10.0, 20.0], np.float32))
        s_j = kalman.kf_init(jnp.asarray([10.0, 20.0], jnp.float32))
        np.testing.assert_allclose(s_np.x, np.asarray(s_j.x), rtol=1e-6)
        np.testing.assert_allclose(s_np.P, np.asarray(s_j.P), rtol=1e-6)
        for dt, z in [(1.0, [12.0, 21.0]), (2.5, [15.5, 23.0]), (0.5, [16.0, 23.5])]:
            s_np = kalman.kf_predict_np(s_np, dt)
            s_j = kalman.kf_predict(s_j, jnp.asarray(dt, jnp.float32))
            np.testing.assert_allclose(s_np.x, np.asarray(s_j.x), rtol=1e-4, atol=1e-4)
            np.testing.assert_allclose(s_np.P, np.asarray(s_j.P), rtol=1e-4, atol=1e-4)
            s_np = kalman.kf_update_np(s_np, np.asarray(z, np.float32))
            s_j = kalman.kf_update(s_j, jnp.asarray(z, jnp.float32))
            np.testing.assert_allclose(s_np.x, np.asarray(s_j.x), rtol=1e-4, atol=1e-4)
            np.testing.assert_allclose(s_np.P, np.asarray(s_j.P), rtol=1e-4, atol=1e-4)
