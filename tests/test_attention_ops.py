import jax.numpy as jnp
import numpy as np
import pytest

from office_person_detection_vit_tpu.ops import attention


@pytest.mark.parametrize("mask_frac", [None, 0.3])
def test_pallas_matches_reference(mask_frac):
    rng = np.random.default_rng(0)
    B, H, Lq, Lk, D = 2, 4, 37, 53, 32
    q = jnp.asarray(rng.normal(size=(B, H, Lq, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, H, Lk, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, H, Lk, D)), jnp.float32)
    mask = None if mask_frac is None else jnp.asarray(rng.random((B, Lk)) > mask_frac)
    ref = attention.attention_reference(q, k, v, mask)
    out = attention.attention_pallas(q, k, v, mask, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_fully_masked_batch_entry_is_finite():
    """A row with zero valid keys must not produce NaNs."""
    B, H, Lq, Lk, D = 1, 1, 4, 8, 8
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(B, H, Lq, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, H, Lk, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, H, Lk, D)), jnp.float32)
    mask = jnp.zeros((B, Lk), bool)
    out = attention.attention_pallas(q, k, v, mask, interpret=True)
    assert np.isfinite(np.asarray(out)).all()


def test_return_probs_sums_to_one():
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.normal(size=(1, 2, 5, 8)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(1, 2, 7, 8)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(1, 2, 7, 8)), jnp.float32)
    out, probs = attention.attention_reference(q, k, v, None, return_probs=True)
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, atol=1e-5)
