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


class TestShardedPipelineIdentity:
    """The product pipeline routes through the DP-sharded detect program when
    >1 device is visible (parallel.mesh.data=-1) and must emit byte-identical
    zone_counts.csv and identical coordinate_transformations.json frames to
    the single-device run."""

    def test_dp_pipeline_artifacts_match_single_device(self, tmp_path_factory):
        import json

        from office_person_detection_vit_tpu.pipeline.orchestrator import (
            PipelineOrchestrator,
        )
        from tests.helpers.synthetic_video import write_video
        from tests.test_pipeline_e2e import _config

        video = tmp_path_factory.mktemp("vid") / "synthetic.mp4"
        write_video(video, num_frames=60)

        def run(parallel_data):
            tmp = tmp_path_factory.mktemp(f"dp{parallel_data}")
            cfg = _config(tmp, video, **{"parallel.mesh.data": parallel_data})
            orch = PipelineOrchestrator(cfg)
            orch.run()
            return orch

        o1 = run(1)
        o8 = run(-1)  # all 8 virtual CPU devices
        assert o1.detection_phase.detector.mesh is None
        mesh = o8.detection_phase.detector.mesh
        assert mesh is not None and mesh.devices.size == 8

        s1, s8 = o1.output.session_dir, o8.output.session_dir
        z1 = (s1 / "05_aggregation" / "zone_counts.csv").read_bytes()
        z8 = (s8 / "05_aggregation" / "zone_counts.csv").read_bytes()
        assert z1 == z8
        t1 = json.loads(
            (s1 / "04_transform" / "coordinate_transformations.json").read_text()
        )
        t8 = json.loads(
            (s8 / "04_transform" / "coordinate_transformations.json").read_text()
        )
        assert t1["frames"] == t8["frames"]


class TestDistributedBringup:
    """Multi-host (DCN) bring-up plumbing: main.py passes the config's
    parallel.distributed.* through to jax.distributed.initialize."""

    def test_initialize_distributed_passthrough(self, monkeypatch):
        import jax.distributed

        from office_person_detection_vit_tpu.parallel.mesh import (
            initialize_distributed,
        )

        calls = []
        monkeypatch.setattr(
            jax.distributed, "initialize",
            lambda **kw: calls.append(kw),
        )
        initialize_distributed(
            coordinator_address="10.0.0.1:8476", num_processes=4, process_id=2
        )
        assert calls == [dict(
            coordinator_address="10.0.0.1:8476", num_processes=4, process_id=2
        )]

    def test_initialize_distributed_swallows_single_process_error(
        self, monkeypatch
    ):
        import jax.distributed

        def boom(**kw):
            raise RuntimeError("jax.distributed.initialize called twice")

        monkeypatch.setattr(jax.distributed, "initialize", boom)
        initialize = __import__(
            "office_person_detection_vit_tpu.parallel.mesh",
            fromlist=["initialize_distributed"],
        ).initialize_distributed
        initialize()  # must not raise

    def test_main_wires_distributed_flag(self, monkeypatch, tmp_path):
        """main.py calls initialize_distributed with the config values when
        parallel.distributed.enabled is set."""
        import sys
        from pathlib import Path

        import yaml

        sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
        import main as cli

        from office_person_detection_vit_tpu.parallel import mesh as mesh_mod

        calls = []
        monkeypatch.setattr(
            mesh_mod, "initialize_distributed",
            lambda **kw: calls.append(kw) or (_ for _ in ()).throw(
                KeyboardInterrupt()
            ),
        )
        cfg = {
            "video": {"input_path": str(tmp_path / "none.mp4"), "fps": 30,
                      "frame_interval_minutes": 5, "tolerance_seconds": 60,
                      "time_compression_ratio": 313.0},
            "parallel": {"distributed": {
                "enabled": True,
                "coordinator_address": "cohost:1234",
                "num_processes": 2,
                "process_id": 0,
            }},
            "output": {"directory": str(tmp_path / "out")},
        }
        p = tmp_path / "c.yaml"
        p.write_text(yaml.safe_dump(cfg))
        rc = cli.main(["--config", str(p)])
        assert rc == 130  # our KeyboardInterrupt sentinel stopped the run
        assert calls == [dict(
            coordinator_address="cohost:1234", num_processes=2, process_id=0
        )]


def test_ssd_detector_dp_matches_single_device():
    """The alternate detector family shards the frame batch the same way."""
    import numpy as np

    from office_person_detection_vit_tpu.config.config_manager import ConfigManager
    from office_person_detection_vit_tpu.detection.ssd_detector import SSDDetector

    def make(data):
        cfg = ConfigManager.from_dict(
            {"detection": {"confidence_threshold": 0.0, "batch_size": 2,
                           "model_size": "tiny", "input_height": 96,
                           "input_width": 128, "dtype": "float32"},
             "parallel": {"mesh": {"data": data}}}
        )
        det = SSDDetector(cfg)
        det.load_model()
        return det

    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (3, 72, 96, 3), np.uint8)
    d1, d8 = make(1), make(-1)
    assert d1.mesh is None and d8.mesh is not None
    b1, b8 = d1.detect_batch(frames), d8.detect_batch(frames)
    np.testing.assert_array_equal(np.asarray(b1.valid), np.asarray(b8.valid))
    np.testing.assert_allclose(
        np.asarray(b1.boxes_xywh), np.asarray(b8.boxes_xywh), atol=1e-3
    )


def test_yolo_detector_dp_matches_single_device():
    """The YOLOv8 family inherits the SSD facade's DP mesh path verbatim."""
    import numpy as np

    from office_person_detection_vit_tpu.config.config_manager import ConfigManager
    from office_person_detection_vit_tpu.detection.yolo_detector import YOLODetector

    def make(data):
        cfg = ConfigManager.from_dict(
            {"detection": {"confidence_threshold": 0.0, "batch_size": 2,
                           "model_size": "tiny", "input_height": 96,
                           "input_width": 128, "dtype": "float32"},
             "parallel": {"mesh": {"data": data}}}
        )
        det = YOLODetector(cfg)
        det.load_model()
        return det

    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (3, 72, 96, 3), np.uint8)
    d1, d8 = make(1), make(-1)
    assert d1.mesh is None and d8.mesh is not None
    b1, b8 = d1.detect_batch(frames), d8.detect_batch(frames)
    np.testing.assert_array_equal(np.asarray(b1.valid), np.asarray(b8.valid))
    np.testing.assert_allclose(
        np.asarray(b1.boxes_xywh), np.asarray(b8.boxes_xywh), atol=1e-3
    )
