import jax.numpy as jnp
import numpy as np

from office_person_detection_vit_tpu.ops import boxes


def test_conversion_roundtrip():
    b = jnp.asarray([[10.0, 20.0, 30.0, 40.0]])  # xywh
    xyxy = boxes.xywh_to_xyxy(b)
    np.testing.assert_allclose(np.asarray(xyxy), [[10, 20, 40, 60]])
    np.testing.assert_allclose(np.asarray(boxes.xyxy_to_xywh(xyxy)), np.asarray(b))
    cxcywh = boxes.xyxy_to_cxcywh(xyxy)
    np.testing.assert_allclose(np.asarray(cxcywh), [[25, 40, 30, 40]])
    np.testing.assert_allclose(np.asarray(boxes.cxcywh_to_xyxy(cxcywh)), np.asarray(xyxy))


def test_foot_point():
    b = jnp.asarray([[100.0, 200.0, 50.0, 120.0]])
    fp = boxes.foot_point_xywh(b)
    np.testing.assert_allclose(np.asarray(fp), [[125.0, 320.0]])


def test_iou_identity_and_disjoint():
    a = jnp.asarray([[0.0, 0.0, 10.0, 10.0], [20.0, 20.0, 30.0, 30.0]])
    m = boxes.iou_matrix_xyxy(a, a)
    np.testing.assert_allclose(np.asarray(m), [[1.0, 0.0], [0.0, 1.0]], atol=1e-6)


def test_iou_half_overlap():
    a = jnp.asarray([[0.0, 0.0, 10.0, 10.0]])
    b = jnp.asarray([[0.0, 5.0, 10.0, 15.0]])
    m = boxes.iou_matrix_xyxy(a, b)
    # intersection 50, union 150
    np.testing.assert_allclose(np.asarray(m), [[50.0 / 150.0]], atol=1e-6)


def test_giou_bounds():
    a = jnp.asarray([[0.0, 0.0, 10.0, 10.0]])
    b = jnp.asarray([[100.0, 100.0, 110.0, 110.0]])
    g = boxes.generalized_iou_xyxy(a, b)
    assert np.asarray(g)[0, 0] < 0  # disjoint boxes have negative GIoU
    g_same = boxes.generalized_iou_xyxy(a, a)
    np.testing.assert_allclose(np.asarray(g_same), [[1.0]], atol=1e-6)


def test_nms_suppresses_duplicates():
    b = jnp.asarray(
        [
            [0.0, 0.0, 10.0, 10.0],
            [1.0, 1.0, 11.0, 11.0],  # heavy overlap with 0, lower score
            [50.0, 50.0, 60.0, 60.0],
        ]
    )
    s = jnp.asarray([0.9, 0.8, 0.7])
    keep = boxes.nms_mask(b, s, iou_threshold=0.5)
    np.testing.assert_array_equal(np.asarray(keep), [True, False, True])


def test_nms_respects_valid_mask():
    b = jnp.zeros((4, 4))
    s = jnp.asarray([0.9, 0.8, 0.7, 0.6])
    valid = jnp.asarray([True, False, False, False])
    keep = boxes.nms_mask(b, s, 0.5, valid)
    assert np.asarray(keep).sum() == 1
