"""Numerical parity: Flax DETR vs HF torch DetrForObjectDetection.

Builds a small random-weight HF model (offline, use_timm_backbone=False),
converts its state_dict with models/weights.py and checks logits/boxes agree.
This validates every conversion convention (conv transpose, BN folding,
attention q/k/v wiring, sine embedding, post-norm order) without network
access to the pretrained checkpoint (SURVEY.md §7.4 item 1).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from office_person_detection_vit_tpu.models.detr import DETR, DETRConfig
from office_person_detection_vit_tpu.models.weights import convert_torch_state_dict


def _build_pair(num_labels=11):
    from transformers import DetrConfig as HFDetrConfig
    from transformers import DetrForObjectDetection, ResNetConfig

    depths = (1, 1, 1, 1)
    hidden = (32, 64, 128, 256)
    rc = ResNetConfig(
        depths=list(depths),
        hidden_sizes=list(hidden),
        embedding_size=16,
        layer_type="bottleneck",
        out_features=["stage4"],
    )
    hf_cfg = HFDetrConfig(
        use_timm_backbone=False,
        backbone_config=rc,
        use_pretrained_backbone=False,
        num_labels=num_labels,
        d_model=64,
        encoder_layers=2,
        decoder_layers=2,
        encoder_attention_heads=4,
        decoder_attention_heads=4,
        encoder_ffn_dim=128,
        decoder_ffn_dim=128,
        num_queries=10,
        dropout=0.0,
        activation_dropout=0.0,
        attention_dropout=0.0,
    )
    torch.manual_seed(0)
    hf_model = DetrForObjectDetection(hf_cfg).eval()
    # Randomize BN running stats so folding is actually exercised.
    with torch.no_grad():
        for mod in hf_model.modules():
            if isinstance(mod, torch.nn.BatchNorm2d):
                mod.running_mean.uniform_(-0.5, 0.5)
                mod.running_var.uniform_(0.5, 1.5)

    cfg = DETRConfig(
        num_queries=10,
        d_model=64,
        num_heads=4,
        num_encoder_layers=2,
        num_decoder_layers=2,
        ffn_dim=128,
        num_classes=num_labels,
        dropout=0.0,
        backbone_depths=depths,
        backbone_hidden=hidden,
        backbone_embedding=16,
    )
    flax_model = DETR(cfg)
    variables = convert_torch_state_dict(
        hf_model.state_dict(), num_encoder_layers=2, num_decoder_layers=2
    )
    return hf_model, flax_model, variables


@pytest.mark.slow
def test_full_model_parity():
    import jax.numpy as jnp

    hf_model, flax_model, variables = _build_pair()
    rng = np.random.default_rng(0)
    H, W = 96, 128
    img = rng.normal(size=(2, H, W, 3)).astype(np.float32)
    mask = np.ones((2, H, W), bool)
    mask[1, :, 100:] = False  # ragged batch: second image narrower

    with torch.no_grad():
        t_out = hf_model(
            pixel_values=torch.from_numpy(img).permute(0, 3, 1, 2),
            pixel_mask=torch.from_numpy(mask.astype(np.int64)),
        )
    j_out = flax_model.apply(
        variables, jnp.asarray(img), jnp.asarray(mask), deterministic=True
    )

    t_logits = t_out.logits.numpy()
    t_boxes = t_out.pred_boxes.numpy()
    j_logits = np.asarray(j_out["logits"])
    j_boxes = np.asarray(j_out["boxes"])

    np.testing.assert_allclose(j_logits, t_logits, atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(j_boxes, t_boxes, atol=1e-3)


@pytest.mark.slow
def test_full_size_detr_parity():
    """Layer-for-layer parity at the spec'd FULL size: ResNet-50 (3,4,6,3),
    6+6 transformer, d_model 256, 100 queries, num_labels 91
    (reference .kiro/specs/office-person-detection/design.md:235-268).

    Random weights (zero-egress env) — this still exercises every conversion
    convention at the production tensor shapes, which the tiny-config test
    cannot (e.g. all four backbone stage widths, 8-head d=256 attention)."""
    import jax.numpy as jnp
    from transformers import DetrConfig as HFDetrConfig
    from transformers import DetrForObjectDetection, ResNetConfig

    depths = (3, 4, 6, 3)
    hidden = (256, 512, 1024, 2048)
    rc = ResNetConfig(
        depths=list(depths),
        hidden_sizes=list(hidden),
        embedding_size=64,
        layer_type="bottleneck",
        out_features=["stage4"],
    )
    hf_cfg = HFDetrConfig(
        use_timm_backbone=False,
        backbone_config=rc,
        use_pretrained_backbone=False,
        num_labels=91,
        dropout=0.0,
        activation_dropout=0.0,
        attention_dropout=0.0,
    )
    torch.manual_seed(0)
    hf_model = DetrForObjectDetection(hf_cfg).eval()
    with torch.no_grad():
        for mod in hf_model.modules():
            if isinstance(mod, torch.nn.BatchNorm2d):
                mod.running_mean.uniform_(-0.5, 0.5)
                mod.running_var.uniform_(0.5, 1.5)

    cfg = DETRConfig(num_classes=91, dropout=0.0)  # full-size defaults
    flax_model = DETR(cfg)
    variables = convert_torch_state_dict(
        hf_model.state_dict(), num_encoder_layers=6, num_decoder_layers=6
    )

    rng = np.random.default_rng(0)
    H, W = 224, 320
    img = rng.normal(size=(1, H, W, 3)).astype(np.float32)
    mask = np.ones((1, H, W), bool)

    with torch.no_grad():
        t_out = hf_model(
            pixel_values=torch.from_numpy(img).permute(0, 3, 1, 2),
            pixel_mask=torch.from_numpy(mask.astype(np.int64)),
        )
    j_out = flax_model.apply(
        variables, jnp.asarray(img), jnp.asarray(mask), deterministic=True
    )

    np.testing.assert_allclose(
        np.asarray(j_out["logits"]), t_out.logits.numpy(), atol=1e-3, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(j_out["boxes"]), t_out.pred_boxes.numpy(), atol=1e-3
    )

    # Cross-check our fixed-shape postprocess against HF's
    # post_process_object_detection at full scale: same surviving person
    # detections (xyxy within 0.1 px), same scores.
    from transformers.models.detr.image_processing_detr import (
        DetrImageProcessor,
    )

    from office_person_detection_vit_tpu.models.postprocess import (
        postprocess_detr,
    )

    orig_w, orig_h = 1280.0, 720.0
    thresh = 0.05
    batch = postprocess_detr(
        j_out["logits"], j_out["boxes"],
        jnp.asarray([orig_w, orig_h], jnp.float32),
        thresh, person_class_id=1,
    )
    proc = DetrImageProcessor()
    hf_res = proc.post_process_object_detection(
        t_out, threshold=thresh,
        target_sizes=torch.tensor([[orig_h, orig_w]]),
    )[0]
    keep = hf_res["labels"].numpy() == 1
    hf_boxes = hf_res["boxes"].numpy()[keep]
    hf_scores = hf_res["scores"].numpy()[keep]

    valid = np.asarray(batch.valid[0])
    ours_xywh = np.asarray(batch.boxes_xywh[0])[valid]
    ours_xyxy = np.concatenate(
        [ours_xywh[:, :2], ours_xywh[:, :2] + ours_xywh[:, 2:]], axis=1
    )
    ours_scores = np.asarray(batch.scores[0])[valid]

    assert len(ours_scores) == len(hf_scores)
    order_o = np.argsort(-ours_scores)
    order_h = np.argsort(-hf_scores)
    np.testing.assert_allclose(
        ours_scores[order_o], hf_scores[order_h], atol=1e-4
    )
    np.testing.assert_allclose(
        ours_xyxy[order_o], hf_boxes[order_h], atol=0.1
    )


@pytest.mark.slow
def test_parity_with_pallas_interpret():
    """Same outputs when attention runs through the Pallas kernel (interpret on CPU)."""
    import dataclasses

    import jax.numpy as jnp

    from office_person_detection_vit_tpu.ops import attention as attn_mod

    hf_model, flax_model, variables = _build_pair()
    cfg = dataclasses.replace(flax_model.config, use_pallas_attention=True)
    pallas_model = DETR(cfg)

    rng = np.random.default_rng(1)
    img = rng.normal(size=(1, 96, 128, 3)).astype(np.float32)
    mask = np.ones((1, 96, 128), bool)

    ref = flax_model.apply(variables, jnp.asarray(img), jnp.asarray(mask))
    # Force interpret mode so the kernel runs on CPU.
    orig = attn_mod.attention_pallas
    try:
        attn_mod_attention_pallas = orig

        def interp(q, k, v, m=None, **kw):
            return orig(q, k, v, m, interpret=True)

        attn_mod.attention_pallas = interp
        out = pallas_model.apply(variables, jnp.asarray(img), jnp.asarray(mask))
    finally:
        attn_mod.attention_pallas = orig

    np.testing.assert_allclose(
        np.asarray(out["logits"]), np.asarray(ref["logits"]), atol=2e-3, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(out["boxes"]), np.asarray(ref["boxes"]), atol=1e-3
    )


class TestDC5:
    """DETR-DC5 (dilate_c5): stride-16 dilated last stage — the paper's
    small-object variant (round 4: sub-cell persons at stride 32 starve the
    cross-attention content path; see docs/training.md)."""

    def test_dilated_conv_semantics_match_torch(self):
        """flax kernel_dilation + explicit padding == torch dilation=2/pad=2
        (the exact configuration Bottleneck uses in DC5 mode)."""
        import flax.linen as nn
        import jax.numpy as jnp
        import torch.nn.functional as F

        rng = np.random.default_rng(3)
        x = rng.normal(size=(1, 9, 11, 5)).astype(np.float32)
        w = rng.normal(size=(3, 3, 5, 7)).astype(np.float32)  # HWIO

        conv = nn.Conv(7, (3, 3), strides=(1, 1), padding=[(2, 2), (2, 2)],
                       kernel_dilation=(2, 2), use_bias=False)
        y = conv.apply({"params": {"kernel": jnp.asarray(w)}}, jnp.asarray(x))

        t = F.conv2d(torch.from_numpy(x).permute(0, 3, 1, 2),
                     torch.from_numpy(w).permute(3, 2, 0, 1),
                     padding=2, dilation=2)
        np.testing.assert_allclose(
            np.asarray(y), t.numpy().transpose(0, 2, 3, 1), atol=1e-5)

    def test_dc5_doubles_grid_and_keeps_param_tree(self):
        import jax
        import jax.numpy as jnp

        from office_person_detection_vit_tpu.models.detr import init_detr
        from office_person_detection_vit_tpu.models.resnet import ResNet

        c32 = DETRConfig.tiny()
        c16 = DETRConfig.tiny(dilate_c5=True)
        _, v32 = init_detr(c32, jax.random.PRNGKey(0), input_hw=(64, 96))
        _, v16 = init_detr(c16, jax.random.PRNGKey(0), input_hw=(64, 96))
        assert (jax.tree_util.tree_structure(v32)
                == jax.tree_util.tree_structure(v16))
        assert ([np.shape(l) for l in jax.tree_util.tree_leaves(v32)]
                == [np.shape(l) for l in jax.tree_util.tree_leaves(v16)])

        x = jnp.zeros((1, 64, 96, 3))
        bb = dict(depths=c32.backbone_depths, hidden_sizes=c32.backbone_hidden,
                  embedding_size=c32.backbone_embedding)
        f32 = ResNet(**bb).apply({"params": v32["params"]["backbone"]}, x)
        f16 = ResNet(**bb, dilate_last_stage=True).apply(
            {"params": v16["params"]["backbone"]}, x)
        assert f32.shape[1:3] == (2, 3)    # 64/32, 96/32
        assert f16.shape[1:3] == (4, 6)    # stride 16
        assert f16.shape[-1] == f32.shape[-1]
