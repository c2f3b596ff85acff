"""ViT backbone (models/vit.py): HF torch parity + DETR integration.

The reference was spec'd around a ViT-era detector (config.yaml.disabled
patch_size key); this is the namesake backbone behind
``detection.backbone: vit``.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from office_person_detection_vit_tpu.models.vit import ViTBackbone, ViTConfig
from office_person_detection_vit_tpu.models.weights import convert_vit_state_dict


def _tiny_pair():
    from transformers import ViTConfig as HFViTConfig
    from transformers import ViTModel

    hf_cfg = HFViTConfig(
        image_size=32, patch_size=8, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=128,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(0)
    hf = ViTModel(hf_cfg, add_pooling_layer=False).eval()
    cfg = ViTConfig(patch_size=8, hidden_size=64, num_layers=2, num_heads=4,
                    mlp_dim=128, pos_grid=4)
    variables = convert_vit_state_dict(hf.state_dict(), num_layers=2)
    return hf, ViTBackbone(cfg), variables


class TestHFParity:
    def test_features_match_torch_at_native_grid(self):
        import jax.numpy as jnp

        hf, model, variables = _tiny_pair()
        rng = np.random.default_rng(0)
        img = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
        with torch.no_grad():
            t_out = hf(
                pixel_values=torch.from_numpy(img).permute(0, 3, 1, 2)
            ).last_hidden_state[:, 1:]  # drop CLS
        j_out = model.apply(variables, jnp.asarray(img))
        np.testing.assert_allclose(
            np.asarray(j_out).reshape(2, 16, 64), t_out.numpy(),
            atol=1e-4, rtol=1e-4,
        )

    def test_pos_embedding_interpolates_to_detection_grid(self):
        import jax.numpy as jnp

        _, model, variables = _tiny_pair()
        img = np.zeros((1, 48, 80, 3), np.float32)  # 6x10 grid vs native 4x4
        out = model.apply(variables, jnp.asarray(img))
        assert out.shape == (1, 6, 10, 64)
        assert np.isfinite(np.asarray(out)).all()

    def test_non_multiple_input_rejected(self):
        import jax.numpy as jnp

        _, model, variables = _tiny_pair()
        with pytest.raises(ValueError, match="not a multiple"):
            model.apply(variables, jnp.zeros((1, 30, 32, 3)))


class TestViTDETRIntegration:
    def test_detector_with_vit_backbone(self):
        from office_person_detection_vit_tpu.config.config_manager import (
            ConfigManager,
        )
        from office_person_detection_vit_tpu.detection.detector import DETRDetector

        cfg = ConfigManager.from_dict(
            {"detection": {"confidence_threshold": 0.0, "batch_size": 2,
                           "model_size": "tiny", "backbone": "vit",
                           "patch_size": 8, "input_height": 96,
                           "input_width": 128, "dtype": "float32",
                           "use_pallas_attention": False},
             "parallel": {"mesh": {"data": 1}}}
        )
        det = DETRDetector(cfg)
        assert det.detr_config.backbone == "vit"
        assert det.feature_stride == 8
        det.load_model()
        rng = np.random.default_rng(0)
        frames = rng.integers(0, 255, (2, 72, 96, 3), np.uint8)
        batch = det.detect_batch(frames)
        assert np.asarray(batch.scores).shape[0] == 2
        assert np.isfinite(np.asarray(batch.boxes_xywh)).all()
        # Attention map follows the ViT feature grid (96/8 x 128/8).
        amap = det.get_attention_map(frames[0])
        assert amap.shape == (96 // 8, 128 // 8)

    def test_vit_detector_dp_sharded_matches_single(self):
        from office_person_detection_vit_tpu.config.config_manager import (
            ConfigManager,
        )
        from office_person_detection_vit_tpu.detection.detector import DETRDetector

        def make(data):
            cfg = ConfigManager.from_dict(
                {"detection": {"confidence_threshold": 0.0, "batch_size": 2,
                               "model_size": "tiny", "backbone": "vit",
                               "patch_size": 8, "input_height": 96,
                               "input_width": 128, "dtype": "float32",
                               "use_pallas_attention": False},
                 "parallel": {"mesh": {"data": data}}}
            )
            det = DETRDetector(cfg)
            det.load_model()
            return det

        rng = np.random.default_rng(0)
        frames = rng.integers(0, 255, (2, 72, 96, 3), np.uint8)
        b1 = make(1).detect_batch(frames)
        b8 = make(-1).detect_batch(frames)
        np.testing.assert_array_equal(np.asarray(b1.valid), np.asarray(b8.valid))
        np.testing.assert_allclose(
            np.asarray(b1.boxes_xywh), np.asarray(b8.boxes_xywh), atol=1e-3
        )


class TestViTTensorParallel:
    def test_param_specs_shard_vit_attention_and_mlp(self):
        import jax
        from jax.sharding import PartitionSpec as P

        from office_person_detection_vit_tpu.detection.detector import DETRDetector
        from office_person_detection_vit_tpu.config.config_manager import (
            ConfigManager,
        )
        from office_person_detection_vit_tpu.parallel.mesh import MODEL_AXIS
        from office_person_detection_vit_tpu.parallel.sharding import param_specs

        cfg = ConfigManager.from_dict(
            {"detection": {"model_size": "tiny", "backbone": "vit",
                           "patch_size": 8, "dtype": "float32",
                           "use_pallas_attention": False},
             "parallel": {"mesh": {"data": 1}}}
        )
        det = DETRDetector(cfg)
        det.load_model()
        specs = param_specs(det.variables)
        layer = specs["params"]["backbone"]["layer_0"]
        assert layer["attention"]["q_proj"]["kernel"] == P(None, MODEL_AXIS)
        assert layer["attention"]["out_proj"]["kernel"] == P(MODEL_AXIS, None)
        assert layer["intermediate"]["kernel"] == P(None, MODEL_AXIS)
        assert layer["output"]["kernel"] == P(MODEL_AXIS, None)
        assert layer["output"]["bias"] == P()
        assert specs["params"]["backbone"]["patch_embed"]["kernel"] == P()

    def test_vit_tp_detect_matches_single_device(self):
        import numpy as np

        from office_person_detection_vit_tpu.config.config_manager import (
            ConfigManager,
        )
        from office_person_detection_vit_tpu.detection.detector import DETRDetector

        def make(data, model):
            cfg = ConfigManager.from_dict(
                {"detection": {"confidence_threshold": 0.0, "batch_size": 2,
                               "model_size": "tiny", "backbone": "vit",
                               "patch_size": 8, "input_height": 96,
                               "input_width": 128, "dtype": "float32",
                               "use_pallas_attention": False},
                 "parallel": {"mesh": {"data": data, "model": model}}}
            )
            det = DETRDetector(cfg)
            det.load_model()
            return det

        rng = np.random.default_rng(0)
        frames = rng.integers(0, 255, (2, 72, 96, 3), np.uint8)
        b1 = make(1, 1).detect_batch(frames)
        btp = make(4, 2).detect_batch(frames)
        np.testing.assert_array_equal(
            np.asarray(b1.valid), np.asarray(btp.valid)
        )
        np.testing.assert_allclose(
            np.asarray(b1.boxes_xywh), np.asarray(btp.boxes_xywh), atol=1e-3
        )
