"""I420 transfer-path parity: on-device YUV->RGB matches cv2's conversion."""

import cv2
import jax.numpy as jnp
import numpy as np
import pytest

from office_person_detection_vit_tpu.ops.preprocessing import (
    bgr_to_i420,
    preprocess_frames,
    preprocess_frames_i420,
)


def test_i420_halves_transfer_bytes():
    frames = np.zeros((2, 720, 1280, 3), np.uint8)
    planes = bgr_to_i420(frames)
    assert planes.shape == (2, 1080, 1280)
    assert planes.nbytes * 2 == frames.nbytes


def test_i420_preprocess_matches_bgr_path():
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (2, 72, 96, 3), np.uint8)
    planes = bgr_to_i420(frames)

    # Reference: cv2 roundtrip I420 -> BGR, then the BGR preprocess path.
    # (Chroma subsampling is lossy, so compare against the roundtripped
    # frames, not the originals.)
    back = np.stack([cv2.cvtColor(p, cv2.COLOR_YUV2BGR_I420) for p in planes])
    want, want_mask = preprocess_frames(
        jnp.asarray(back), target_hw=(96, 128), out_dtype=jnp.float32
    )
    got, got_mask = preprocess_frames_i420(
        jnp.asarray(planes), target_hw=(96, 128), out_dtype=jnp.float32
    )
    assert got.shape == want.shape
    np.testing.assert_array_equal(np.asarray(got_mask), np.asarray(want_mask))
    # BT.601 coefficients differ from cv2's fixed-point table by <2/255;
    # after ImageNet normalization (std ~0.22) that is ~0.04.
    diff = np.abs(np.asarray(got) - np.asarray(want))
    assert np.percentile(diff, 99) < 0.12
    assert diff.mean() < 0.03


def test_detector_i420_vs_bgr_same_detections():
    from office_person_detection_vit_tpu.config.config_manager import ConfigManager
    from office_person_detection_vit_tpu.detection.detector import DETRDetector
    from office_person_detection_vit_tpu.models.detr import DETRConfig

    rng = np.random.default_rng(1)
    frames = rng.integers(0, 255, (2, 72, 96, 3), np.uint8)

    def build(fmt):
        cfg = ConfigManager.from_dict(
            {
                "detection": {
                    "confidence_threshold": 0.0,
                    "batch_size": 2,
                    "input_height": 96,
                    "input_width": 128,
                    "dtype": "float32",
                    "use_pallas_attention": False,
                    "transfer_format": fmt,
                }
            }
        )
        det = DETRDetector(cfg, detr_config=DETRConfig.tiny(num_classes=5))
        det.load_model()
        return det

    b_bgr = build("bgr").detect_batch(frames)
    b_i420 = build("i420").detect_batch(frames)
    # Same shapes; scores close (input differs only by chroma subsampling).
    assert b_i420.scores.shape == b_bgr.scores.shape
    np.testing.assert_allclose(
        np.asarray(b_i420.scores), np.asarray(b_bgr.scores), atol=0.2
    )


def test_detector_auto_transfer_resolves_and_detects(caplog):
    """transfer_format=auto races both formats on the first batch, locks in
    a concrete winner, and keeps detecting through the chosen jit."""
    import logging

    from office_person_detection_vit_tpu.config.config_manager import ConfigManager
    from office_person_detection_vit_tpu.detection.detector import DETRDetector
    from office_person_detection_vit_tpu.models.detr import DETRConfig

    rng = np.random.default_rng(2)
    frames = rng.integers(0, 255, (2, 72, 96, 3), np.uint8)
    cfg = ConfigManager.from_dict(
        {
            "detection": {
                "confidence_threshold": 0.0,
                "batch_size": 2,
                "input_height": 96,
                "input_width": 128,
                "dtype": "float32",
                "use_pallas_attention": False,
                "transfer_format": "auto",
            }
        }
    )
    det = DETRDetector(cfg, detr_config=DETRConfig.tiny(num_classes=5))
    det.load_model()
    assert set(det._jits) == {"bgr", "i420"}
    with caplog.at_level(logging.INFO):
        first = det.detect_batch(frames)
    assert det.transfer_format in ("bgr", "i420")
    assert any("transfer autotune" in r.message for r in caplog.records)
    # second call goes straight through the locked-in jit
    second = det.detect_batch(frames)
    np.testing.assert_allclose(
        np.asarray(first.scores), np.asarray(second.scores), atol=1e-6
    )


def test_detector_auto_falls_back_to_bgr_for_odd_shapes():
    from office_person_detection_vit_tpu.config.config_manager import ConfigManager
    from office_person_detection_vit_tpu.detection.detector import DETRDetector
    from office_person_detection_vit_tpu.models.detr import DETRConfig

    rng = np.random.default_rng(3)
    frames = rng.integers(0, 255, (2, 71, 95, 3), np.uint8)  # H%4, W%2 != 0
    cfg = ConfigManager.from_dict(
        {
            "detection": {
                "confidence_threshold": 0.0,
                "batch_size": 2,
                "input_height": 96,
                "input_width": 128,
                "dtype": "float32",
                "use_pallas_attention": False,
                "transfer_format": "auto",
            }
        }
    )
    det = DETRDetector(cfg, detr_config=DETRConfig.tiny(num_classes=5))
    det.load_model()
    out = det.detect_batch(frames)
    assert det.transfer_format == "bgr"
    assert out.scores.shape[0] == 2


class TestI420DeltaTransfer:
    """i420d = XOR delta over the frame axis for the compressing tunnel;
    reconstruction is exact, so detection results are byte-identical to
    the plain i420 path, including across chained chunks."""

    def test_delta_codec_round_trip(self):
        from office_person_detection_vit_tpu.ops.preprocessing import (
            i420_delta_encode,
            reconstruct_i420_delta,
        )

        rng = np.random.default_rng(0)
        frames = rng.integers(0, 255, (5, 108, 128), np.uint8)
        prev = rng.integers(0, 255, (108, 128), np.uint8)
        deltas = i420_delta_encode(frames, prev)
        out = np.asarray(reconstruct_i420_delta(deltas, jnp.asarray(prev)))
        np.testing.assert_array_equal(out, frames)
        # Static content -> all-zero deltas (what the wire compresses away).
        static = np.repeat(frames[:1], 4, axis=0)
        d2 = i420_delta_encode(static, static[0])
        assert (d2 == 0).all()

    def test_i420d_detection_matches_i420_across_chunks(self):
        from office_person_detection_vit_tpu.config.config_manager import (
            ConfigManager,
        )
        from office_person_detection_vit_tpu.detection.detector import DETRDetector
        from office_person_detection_vit_tpu.models.detr import DETRConfig

        def make(fmt):
            cfg = ConfigManager.from_dict(
                {"detection": {"confidence_threshold": 0.0, "batch_size": 2,
                               "input_height": 96, "input_width": 128,
                               "dtype": "float32", "use_pallas_attention": False,
                               "transfer_format": fmt},
                 "parallel": {"mesh": {"data": 1}}}
            )
            det = DETRDetector(cfg, detr_config=DETRConfig.tiny(num_classes=3))
            det.load_model()
            return det

        rng = np.random.default_rng(0)
        # 5 frames -> chunks of 2 + tail: exercises the chunk-chained state.
        frames = rng.integers(0, 255, (5, 72, 96, 3), np.uint8)
        b_i420 = make("i420").detect_batch(frames)
        b_delta = make("i420d").detect_batch(frames)
        # The decoded PIXELS are bit-exact (test_delta_codec_round_trip);
        # outputs differ only by cross-program float-fusion noise (~1e-5),
        # because XLA fuses the XOR-scan program differently.
        np.testing.assert_array_equal(
            np.asarray(b_i420.valid), np.asarray(b_delta.valid)
        )
        for name, atol in (("boxes_xywh", 1e-3), ("scores", 1e-5), ("foot", 1e-3)):
            np.testing.assert_allclose(
                np.asarray(getattr(b_i420, name)),
                np.asarray(getattr(b_delta, name)),
                atol=atol, err_msg=name,
            )

    def test_i420d_falls_back_on_mesh(self):
        from office_person_detection_vit_tpu.config.config_manager import (
            ConfigManager,
        )
        from office_person_detection_vit_tpu.detection.detector import DETRDetector
        from office_person_detection_vit_tpu.models.detr import DETRConfig

        cfg = ConfigManager.from_dict(
            {"detection": {"confidence_threshold": 0.0, "batch_size": 8,
                           "input_height": 96, "input_width": 128,
                           "dtype": "float32", "use_pallas_attention": False,
                           "transfer_format": "i420d"}}
        )
        det = DETRDetector(cfg, detr_config=DETRConfig.tiny(num_classes=3))
        det.load_model()  # 8-device test mesh -> delta disabled
        assert det.mesh is not None
        assert det.transfer_format == "i420"
