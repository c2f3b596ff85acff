"""Pallas-fused ResNet bottleneck: interpret-mode parity vs the XLA block.

The real-hardware head-to-head lives in tools/bottleneck_kernel_bench.py
(docs/performance.md); these tests pin the kernel's numerics, incl. the
halo/border handling that replaces physical padding.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from office_person_detection_vit_tpu.ops.fused_bottleneck import (
    bottleneck_reference,
    fused_bottleneck,
)


def _weights(rng, C, M, dtype):
    return (
        jnp.asarray(rng.normal(0, 0.1, (C, M)), dtype),
        jnp.asarray(rng.normal(0, 0.1, (M,)), jnp.float32),
        jnp.asarray(rng.normal(0, 0.1, (3, 3, M, M)), dtype),
        jnp.asarray(rng.normal(0, 0.1, (M,)), jnp.float32),
        jnp.asarray(rng.normal(0, 0.1, (M, C)), dtype),
        jnp.asarray(rng.normal(0, 0.1, (C,)), jnp.float32),
    )


@pytest.mark.parametrize("tile_h", [4, 8])
def test_parity_vs_xla_block(tile_h):
    rng = np.random.default_rng(0)
    B, H, W, C, M = 2, 16, 12, 32, 8
    x = jnp.asarray(rng.normal(0, 1, (B, H, W, C)), jnp.float32)
    ws = _weights(rng, C, M, jnp.float32)
    ref = bottleneck_reference(x, *ws)
    got = fused_bottleneck(x, *ws, tile_h=tile_h, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_border_rows_match_same_padding():
    """The clamped-DMA + staging-buffer border handling must reproduce
    SAME zero padding exactly: check rows 0 and H-1 specifically with a
    bias that would leak through relu(b1) if the pad were mishandled."""
    rng = np.random.default_rng(1)
    B, H, W, C, M = 1, 8, 6, 16, 8
    x = jnp.asarray(rng.normal(0, 1, (B, H, W, C)), jnp.float32)
    w1, _, w2, b2, w3, b3 = _weights(rng, C, M, jnp.float32)
    b1 = jnp.full((M,), 3.0, jnp.float32)  # relu(b1) != 0 at any pad pixel
    ref = bottleneck_reference(x, w1, b1, w2, b2, w3, b3)
    got = fused_bottleneck(x, w1, b1, w2, b2, w3, b3, tile_h=4,
                           interpret=True)
    np.testing.assert_allclose(np.asarray(got[:, 0]), np.asarray(ref[:, 0]),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got[:, -1]), np.asarray(ref[:, -1]),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_bf16_matches_f32_reference_within_accumulation_noise():
    rng = np.random.default_rng(2)
    B, H, W, C, M = 1, 8, 8, 32, 8
    xf = rng.normal(0, 1, (B, H, W, C)).astype(np.float32)
    ws_f = _weights(rng, C, M, jnp.float32)
    ref = bottleneck_reference(jnp.asarray(xf), *ws_f)
    ws_b = [w.astype(jnp.bfloat16) if w.ndim > 1 else w for w in ws_f]
    got = fused_bottleneck(jnp.asarray(xf, jnp.bfloat16), *ws_b,
                           tile_h=4, interpret=True)
    err = np.abs(np.asarray(got, np.float32) - np.asarray(ref))
    assert err.max() < 0.15, err.max()  # bf16 operand noise only


def test_rejects_unaligned_tile():
    x = jnp.zeros((1, 10, 8, 16), jnp.float32)
    ws = _weights(np.random.default_rng(0), 16, 8, jnp.float32)
    with pytest.raises(ValueError, match="divisible"):
        fused_bottleneck(x, *ws, tile_h=4, interpret=True)
