"""parallel/ unit tests on the virtual 8-device CPU mesh: mesh construction,
TP partition rules, sharded placement, DP batch sharding, collective math."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from office_person_detection_vit_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    make_mesh,
    replicated,
)
from office_person_detection_vit_tpu.parallel.sharding import (
    param_specs,
    shard_params,
)


class TestMakeMesh:
    def test_pure_dp_default(self):
        mesh = make_mesh(8)
        assert mesh.shape == {DATA_AXIS: 8, MODEL_AXIS: 1}

    def test_dp_tp_grid(self):
        mesh = make_mesh(8, model_parallel=2)
        assert mesh.shape == {DATA_AXIS: 4, MODEL_AXIS: 2}

    def test_tp_only(self):
        mesh = make_mesh(8, model_parallel=8)
        assert mesh.shape == {DATA_AXIS: 1, MODEL_AXIS: 8}

    def test_indivisible_raises(self):
        with pytest.raises(ValueError, match="must divide"):
            make_mesh(8, model_parallel=3)

    def test_single_device_degrade(self):
        mesh = make_mesh(1)
        assert mesh.shape == {DATA_AXIS: 1, MODEL_AXIS: 1}

    def test_subset_of_devices(self):
        mesh = make_mesh(4)
        assert len(mesh.devices.flatten()) == 4


class TestPartitionRules:
    def _tree(self):
        return {
            "encoder": {
                "layers_0": {
                    "self_attn": {
                        "q_proj": {"kernel": jnp.zeros((8, 8)), "bias": jnp.zeros(8)},
                        "out_proj": {"kernel": jnp.zeros((8, 8)), "bias": jnp.zeros(8)},
                    },
                    "fc1": {"kernel": jnp.zeros((8, 32)), "bias": jnp.zeros(32)},
                    "fc2": {"kernel": jnp.zeros((32, 8)), "bias": jnp.zeros(8)},
                }
            },
            "backbone": {"conv0": {"kernel": jnp.zeros((3, 3, 4, 8))}},
        }

    def test_qkv_column_parallel(self):
        specs = param_specs(self._tree())
        attn = specs["encoder"]["layers_0"]["self_attn"]
        assert attn["q_proj"]["kernel"] == P(None, MODEL_AXIS)
        assert attn["q_proj"]["bias"] == P(MODEL_AXIS)

    def test_out_proj_row_parallel(self):
        specs = param_specs(self._tree())
        attn = specs["encoder"]["layers_0"]["self_attn"]
        assert attn["out_proj"]["kernel"] == P(MODEL_AXIS, None)
        assert attn["out_proj"]["bias"] == P()  # row-parallel bias replicated

    def test_ffn_megatron_pattern(self):
        specs = param_specs(self._tree())
        layer = specs["encoder"]["layers_0"]
        assert layer["fc1"]["kernel"] == P(None, MODEL_AXIS)
        assert layer["fc2"]["kernel"] == P(MODEL_AXIS, None)
        assert layer["fc2"]["bias"] == P()

    def test_backbone_replicated(self):
        specs = param_specs(self._tree())
        assert specs["backbone"]["conv0"]["kernel"] == P()

    def test_shard_params_places_on_mesh(self):
        mesh = make_mesh(8, model_parallel=2)
        placed = shard_params(self._tree(), mesh)
        qk = placed["encoder"]["layers_0"]["self_attn"]["q_proj"]["kernel"]
        assert isinstance(qk.sharding, NamedSharding)
        assert qk.sharding.spec == P(None, MODEL_AXIS)
        # each model shard holds half the columns
        shard_shapes = {s.data.shape for s in qk.addressable_shards}
        assert shard_shapes == {(8, 4)}


class TestDataParallelMath:
    def test_batch_sharding_spreads_leading_axis(self):
        mesh = make_mesh(8)
        x = jax.device_put(np.arange(16.0).reshape(16, 1), batch_sharding(mesh))
        assert {s.data.shape for s in x.addressable_shards} == {(2, 1)}

    def test_replicated_sharding(self):
        mesh = make_mesh(8)
        x = jax.device_put(np.ones((4, 4)), replicated(mesh))
        assert all(s.data.shape == (4, 4) for s in x.addressable_shards)

    def test_sharded_reduction_matches_single_device(self):
        mesh = make_mesh(8)
        data = np.random.default_rng(0).normal(size=(16, 32)).astype(np.float32)
        x = jax.device_put(data, batch_sharding(mesh))

        @jax.jit
        def f(v):
            return jnp.mean(v**2)

        np.testing.assert_allclose(float(f(x)), float(f(data)), rtol=1e-6)

    def test_matmul_with_tp_sharded_weight(self):
        mesh = make_mesh(8, model_parallel=2)
        w = jax.device_put(
            np.random.default_rng(0).normal(size=(8, 8)).astype(np.float32),
            NamedSharding(mesh, P(None, MODEL_AXIS)),
        )
        x = np.random.default_rng(1).normal(size=(4, 8)).astype(np.float32)

        @jax.jit
        def f(x, w):
            return x @ w

        out = f(x, w)
        np.testing.assert_allclose(
            np.asarray(out), x @ np.asarray(w), rtol=1e-5
        )
