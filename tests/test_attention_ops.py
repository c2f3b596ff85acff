import jax
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


class TestFlashAttention:
    """Streaming (online-softmax) kernel vs the einsum reference."""

    @pytest.mark.parametrize("lq,lk", [(64, 64), (100, 1008), (300, 2500)])
    def test_matches_reference(self, lq, lk):
        from office_person_detection_vit_tpu.ops.attention import (
            attention_pallas_flash,
            attention_reference,
        )

        rng = np.random.default_rng(0)
        B, H, D = 2, 4, 32
        q = jnp.asarray(rng.normal(size=(B, H, lq, D)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(B, H, lk, D)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(B, H, lk, D)), jnp.float32)
        mask = jnp.asarray(rng.random((B, lk)) > 0.2)
        want = attention_reference(q, k, v, mask)
        got = attention_pallas_flash(q, k, v, mask, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)

    def test_no_mask(self):
        from office_person_detection_vit_tpu.ops.attention import (
            attention_pallas_flash,
            attention_reference,
        )

        rng = np.random.default_rng(1)
        q = jnp.asarray(rng.normal(size=(1, 2, 130, 16)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(1, 2, 260, 16)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(1, 2, 260, 16)), jnp.float32)
        want = attention_reference(q, k, v)
        got = attention_pallas_flash(q, k, v, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)

    def test_fully_masked_rows_are_finite(self):
        from office_person_detection_vit_tpu.ops.attention import (
            attention_pallas_flash,
        )

        rng = np.random.default_rng(2)
        q = jnp.asarray(rng.normal(size=(1, 1, 8, 8)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(1, 1, 16, 8)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(1, 1, 16, 8)), jnp.float32)
        mask = jnp.zeros((1, 16), bool)  # every key invalid
        out = attention_pallas_flash(q, k, v, mask, interpret=True)
        assert np.isfinite(np.asarray(out)).all()

    def test_dispatch_selects_flash_for_long_seq(self):
        from office_person_detection_vit_tpu.ops import attention as A

        # 2048 x 2048 f32 scores = 16 MB > threshold -> flash path.
        assert 2048 * 2048 * 4 > A._FLASH_BYTES_THRESHOLD
        # DETR-sized stays on the whole-KV kernel.
        assert 1024 * 1024 * 4 < A._FLASH_BYTES_THRESHOLD


class TestDifferentiablePallas:
    def test_grad_through_pallas_matches_reference(self):
        from office_person_detection_vit_tpu.ops.attention import (
            attention_reference,
            multi_head_attention,
        )

        rng = np.random.default_rng(3)
        q = jnp.asarray(rng.normal(size=(1, 2, 16, 8)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(1, 2, 24, 8)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(1, 2, 24, 8)), jnp.float32)
        mask = jnp.asarray(rng.random((1, 24)) > 0.2)

        def loss_pallas(q, k, v):
            return jnp.sum(
                multi_head_attention(q, k, v, mask, use_pallas=True, interpret=True) ** 2
            )

        def loss_ref(q, k, v):
            return jnp.sum(attention_reference(q, k, v, mask) ** 2)

        gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(gp, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)

    def test_train_step_with_pallas_attention(self):
        """Full DETR train step with the Pallas kernel enabled (interpret
        on CPU) must produce finite grads."""
        from office_person_detection_vit_tpu.models.detr import DETRConfig, init_detr
        from office_person_detection_vit_tpu.training import (
            TrainState,
            make_optimizer,
            make_train_step,
            pack_targets,
        )

        cfg = DETRConfig.tiny(num_classes=4, use_pallas_attention=True)
        # interpret mode is selected inside the kernel only via arg; on CPU
        # pallas_call interprets automatically? No — force interpret through
        # the env-independent flag: skip if TPU-only lowering fails.
        import jax

        try:
            model, variables = init_detr(cfg, jax.random.PRNGKey(0), input_hw=(64, 64))
            tx = make_optimizer(learning_rate=1e-3)
            state = TrainState.create(variables["params"], tx)
            step = make_train_step(model, tx, aux_loss=False)
            labels, boxes, valid = pack_targets(
                [np.asarray([[0.4, 0.4, 0.2, 0.3]], np.float32)], [[1]], capacity=2
            )
            batch = {
                "pixels": jnp.zeros((1, 64, 64, 3), jnp.float32),
                "pixel_mask": jnp.ones((1, 64, 64), bool),
                "labels": labels,
                "boxes": boxes,
                "valid": valid,
            }
            state, metrics = step(state, batch, jax.random.PRNGKey(1))
        except ValueError as e:
            if "interpret mode" in str(e):
                pytest.skip("pallas compiled mode unavailable on CPU")
            raise
        assert np.isfinite(float(metrics["loss"]))
