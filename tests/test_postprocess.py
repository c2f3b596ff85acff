"""DETR postprocess unit tests: HF post_process semantics, person filter,
threshold as traced scalar, box scaling, foot points, torch cross-check."""

import numpy as np
import pytest

from office_person_detection_vit_tpu.models.postprocess import (
    person_scores,
    postprocess_detr,
)

F, Q, C = 2, 6, 3  # classes: 0=bg-ish, 1=person, 2=other; +1 no-object col


def _logits(person_logit=6.0):
    """Logits where query q of frame 0 is person-ish for q < 3."""
    logits = np.full((F, Q, C + 1), -4.0, np.float32)
    logits[..., -1] = 2.0  # no-object wins by default
    logits[0, 0, 1] = person_logit   # strong person
    logits[0, 1, 1] = 3.0            # medium person
    logits[0, 2, 2] = 6.0            # strong OTHER class
    logits[1, 0, 1] = 6.0
    return logits


def _boxes():
    boxes = np.full((F, Q, 4), 0.5, np.float32)
    boxes[0, 0] = [0.5, 0.5, 0.1, 0.2]   # center of frame
    boxes[1, 0] = [0.25, 0.75, 0.2, 0.3]
    return boxes


ORIG = np.asarray([1280.0, 720.0], np.float32)


class TestPostprocess:
    def test_person_filter_and_threshold(self):
        out = postprocess_detr(_logits(), _boxes(), ORIG, 0.5)
        valid = np.asarray(out.valid)
        assert valid[0, 0] and valid[1, 0]
        assert not valid[0, 2]  # other class rejected even though confident
        # medium person: softmax([−4…,3,…,2]) -> below 0.5? compute
        assert out.scores.shape == (F, Q)

    def test_threshold_is_runtime_value(self):
        low = postprocess_detr(_logits(), _boxes(), ORIG, 0.0)
        high = postprocess_detr(_logits(), _boxes(), ORIG, 0.99)
        assert np.asarray(low.valid).sum() >= np.asarray(high.valid).sum()

    def test_box_scaling_to_pixels(self):
        out = postprocess_detr(_logits(), _boxes(), ORIG, 0.5)
        x, y, w, h = np.asarray(out.boxes_xywh)[0, 0]
        # cxcywh (0.5, 0.5, 0.1, 0.2) @1280x720 -> xywh (576, 288, 128, 144)
        assert (x, y, w, h) == pytest.approx((576.0, 288.0, 128.0, 144.0), abs=0.1)

    def test_foot_point_bottom_center(self):
        out = postprocess_detr(_logits(), _boxes(), ORIG, 0.5)
        fx, fy = np.asarray(out.foot)[0, 0]
        assert fx == pytest.approx(640.0, abs=0.1)
        assert fy == pytest.approx(432.0, abs=0.1)

    def test_fixed_shapes_regardless_of_threshold(self):
        out = postprocess_detr(_logits(), _boxes(), ORIG, 0.99)
        assert out.boxes_xywh.shape == (F, Q, 4)
        assert out.valid.shape == (F, Q)

    def test_matches_hf_torch_postprocess(self):
        torch = pytest.importorskip("torch")
        from transformers.models.detr.modeling_detr import DetrObjectDetectionOutput
        from transformers.models.detr.image_processing_detr import (
            DetrImageProcessor,
        )

        rng = np.random.default_rng(0)
        logits = rng.normal(size=(1, Q, C + 1)).astype(np.float32) * 3
        boxes = rng.uniform(0.2, 0.6, size=(1, Q, 4)).astype(np.float32)

        proc = DetrImageProcessor()
        hf_out = proc.post_process_object_detection(
            DetrObjectDetectionOutput(
                logits=torch.tensor(logits), pred_boxes=torch.tensor(boxes)
            ),
            threshold=0.0,
            target_sizes=[(720, 1280)],
        )[0]

        ours = postprocess_detr(logits, boxes, ORIG, 0.0)
        ours_scores = np.asarray(ours.scores)[0]
        ours_xywh = np.asarray(ours.boxes_xywh)[0]

        hf_scores = hf_out["scores"].numpy()
        hf_boxes = hf_out["boxes"].numpy()  # xyxy
        hf_labels = hf_out["labels"].numpy()
        # HF returns all queries at threshold 0, same order
        np.testing.assert_allclose(ours_scores, hf_scores, atol=1e-5)
        ours_xyxy = np.concatenate(
            [ours_xywh[:, :2], ours_xywh[:, :2] + ours_xywh[:, 2:]], axis=1
        )
        np.testing.assert_allclose(ours_xyxy, hf_boxes, atol=0.1)
        # our person mask matches HF labels
        ours_valid = np.asarray(ours.valid)[0]
        np.testing.assert_array_equal(ours_valid, hf_labels == 1)


class TestPersonScores:
    def test_softmax_prob_of_person_column(self):
        logits = _logits()
        probs = np.asarray(person_scores(logits))
        assert probs.shape == (F, Q)
        full = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
        np.testing.assert_allclose(probs, full[..., 1], atol=1e-6)


class TestPostprocessNMS:
    """Opt-in greedy NMS over the query set (reference detector contract
    nms_threshold, config.yaml.disabled:38) — duplicate-query suppression
    for reduced-scale focal checkpoints (docs/training.md)."""

    def test_duplicates_suppressed_keeping_best_score(self):
        import jax.numpy as jnp
        import numpy as np

        from office_person_detection_vit_tpu.models.postprocess import (
            postprocess_detr,
        )

        C = 3
        logits = np.full((1, 4, C + 1), -8.0, np.float32)
        logits[0, :, 1] = [3.0, 2.0, 2.5, -8.0]  # q3 below threshold
        boxes = np.asarray([[[0.30, 0.30, 0.10, 0.20],
                             [0.31, 0.30, 0.10, 0.20],   # duplicate of q0
                             [0.70, 0.60, 0.10, 0.20],   # distinct person
                             [0.50, 0.50, 0.10, 0.20]]], np.float32)
        out = postprocess_detr(jnp.asarray(logits), jnp.asarray(boxes),
                               jnp.asarray([1280.0, 720.0]), 0.5,
                               person_class_id=1, nms_iou=0.5)
        valid = np.asarray(out.valid[0])
        assert valid.tolist() == [True, False, True, False]

    def test_none_disables_nms(self):
        import jax.numpy as jnp
        import numpy as np

        from office_person_detection_vit_tpu.models.postprocess import (
            postprocess_detr,
        )

        logits = np.full((1, 2, 4), -8.0, np.float32)
        logits[0, :, 1] = 3.0
        boxes = np.tile(np.asarray([[[0.3, 0.3, 0.1, 0.2]]], np.float32),
                        (1, 2, 1))
        out = postprocess_detr(jnp.asarray(logits), jnp.asarray(boxes),
                               jnp.asarray([1280.0, 720.0]), 0.5,
                               person_class_id=1, nms_iou=None)
        assert np.asarray(out.valid[0]).all()  # both kept without NMS
