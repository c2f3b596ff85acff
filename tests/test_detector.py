import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from office_person_detection_vit_tpu.config.config_manager import ConfigManager
from office_person_detection_vit_tpu.detection.detector import DETRDetector
from office_person_detection_vit_tpu.models.detr import DETRConfig
from office_person_detection_vit_tpu.models.postprocess import postprocess_detr
from office_person_detection_vit_tpu.ops.preprocessing import (
    compute_resize_geometry,
    preprocess_frames,
)


def test_postprocess_selects_person_above_threshold():
    F, Q, C = 1, 4, 5  # classes 0..4 + implicit no-object col
    logits = np.full((F, Q, C + 1), -10.0, np.float32)
    logits[0, 0, 1] = 10.0  # person, high conf
    logits[0, 1, 2] = 10.0  # not person
    logits[0, 2, C] = 10.0  # no-object
    logits[0, 3, 1] = 0.0  # person but low softmax score vs no-object col
    logits[0, 3, C] = 0.5
    boxes = np.tile(np.asarray([0.5, 0.5, 0.2, 0.4], np.float32), (F, Q, 1))
    out = postprocess_detr(
        jnp.asarray(logits), jnp.asarray(boxes), jnp.asarray([1280.0, 720.0]),
        confidence_threshold=0.5, person_class_id=1,
    )
    valid = np.asarray(out.valid[0])
    assert valid.tolist() == [True, False, False, False]
    # cxcywh (0.5, 0.5, 0.2, 0.4) @ 1280x720 -> xywh (512, 216, 256, 288)
    np.testing.assert_allclose(np.asarray(out.boxes_xywh[0, 0]), [512, 216, 256, 288], atol=1e-3)
    np.testing.assert_allclose(np.asarray(out.foot[0, 0]), [640, 504], atol=1e-3)


def test_preprocess_shapes_and_mask():
    frames = np.random.default_rng(0).integers(0, 255, (2, 720, 1280, 3), np.uint8)
    pixels, mask = preprocess_frames(jnp.asarray(frames), target_hw=(768, 1344))
    assert pixels.shape == (2, 768, 1344, 3)
    assert mask.shape == (2, 768, 1344)
    rh, rw = compute_resize_geometry((720, 1280), (768, 1344))
    m = np.asarray(mask[0])
    assert m[:rh, :rw].all() and not m[rh:, :].any()


def test_preprocess_normalization():
    # A uniform gray frame maps to (0.5 - mean) / std in RGB.
    frames = np.full((1, 64, 64, 3), 128, np.uint8)
    pixels, _ = preprocess_frames(jnp.asarray(frames), target_hw=(64, 64))
    from office_person_detection_vit_tpu.ops.preprocessing import (
        IMAGENET_MEAN,
        IMAGENET_STD,
    )

    expected = (128 / 255.0 - np.asarray(IMAGENET_MEAN)) / np.asarray(IMAGENET_STD)
    np.testing.assert_allclose(np.asarray(pixels[0, 0, 0]), expected, atol=1e-3)


@pytest.fixture(scope="module")
def tiny_detector():
    cfg = ConfigManager.from_dict(
        {
            "detection": {
                "confidence_threshold": 0.0,
                "batch_size": 2,
                "input_height": 96,
                "input_width": 128,
                "dtype": "float32",
                "use_pallas_attention": False,
            }
        }
    )
    det = DETRDetector(cfg, detr_config=DETRConfig.tiny(num_classes=5))
    det.load_model()
    return det


def test_detector_batch_shapes(tiny_detector):
    frames = np.random.default_rng(1).integers(0, 255, (3, 72, 96, 3), np.uint8)
    batch = tiny_detector.detect_batch(frames)
    assert batch.boxes_xywh.shape == (3, 10, 4)
    assert batch.scores.shape == (3, 10)
    # foot point consistency
    b = np.asarray(batch.boxes_xywh)
    f = np.asarray(batch.foot)
    np.testing.assert_allclose(f[..., 0], b[..., 0] + b[..., 2] / 2, atol=1e-3)
    np.testing.assert_allclose(f[..., 1], b[..., 1] + b[..., 3], atol=1e-3)


def test_detector_single_frame_api(tiny_detector):
    frame = np.random.default_rng(2).integers(0, 255, (72, 96, 3), np.uint8)
    dets = tiny_detector.detect(frame)
    assert isinstance(dets, list)
    for d in dets:
        assert 0.0 <= d.confidence <= 1.0


def test_detect_with_features(tiny_detector):
    frame = np.random.default_rng(3).integers(0, 255, (72, 96, 3), np.uint8)
    dets, feats = tiny_detector.detect_with_features(frame)
    assert feats.shape[1] == 64  # tiny d_model
    if len(dets):
        # L2 normalized
        np.testing.assert_allclose(np.linalg.norm(feats, axis=1), 1.0, atol=1e-3)
        assert dets[0].feature is not None


def test_attention_map(tiny_detector):
    frame = np.random.default_rng(4).integers(0, 255, (72, 96, 3), np.uint8)
    amap = tiny_detector.get_attention_map(frame)
    assert amap.shape == (96 // 32, 128 // 32)
    assert np.isfinite(amap).all() and amap.min() >= 0


def test_extract_features_crop_fallback(tiny_detector):
    frame = np.random.default_rng(5).integers(0, 255, (72, 96, 3), np.uint8)
    feats = tiny_detector.extract_features(frame, [(10.0, 10.0, 30.0, 40.0)])
    assert feats.shape == (1, 256)
    np.testing.assert_allclose(np.linalg.norm(feats[0]), 1.0, atol=1e-4)


class TestSSDDetector:
    @pytest.fixture(scope="class")
    def tiny_ssd(self):
        from office_person_detection_vit_tpu.detection.ssd_detector import SSDDetector
        from office_person_detection_vit_tpu.models.single_shot import SingleShotConfig

        cfg = ConfigManager.from_dict(
            {
                "detection": {
                    "confidence_threshold": 0.0,
                    "batch_size": 2,
                    "input_height": 96,
                    "input_width": 128,
                }
            }
        )
        det = SSDDetector(cfg, ss_config=SingleShotConfig.tiny())
        det.load_model()
        return det

    def test_batch_shapes_match_detr_contract(self, tiny_ssd):
        frames = np.random.default_rng(5).integers(0, 255, (3, 72, 96, 3), np.uint8)
        batch = tiny_ssd.detect_batch(frames)
        assert batch.boxes_xywh.shape == (3, 10, 4)
        assert batch.scores.shape == (3, 10)
        b = np.asarray(batch.boxes_xywh)
        f = np.asarray(batch.foot)
        np.testing.assert_allclose(f[:, :, 0], b[:, :, 0] + b[:, :, 2] / 2, atol=1e-3)
        np.testing.assert_allclose(f[:, :, 1], b[:, :, 1] + b[:, :, 3], atol=1e-3)
        # Boxes inside the original image.
        valid = np.asarray(batch.valid)
        assert (b[valid][:, 0] >= -1e-3).all()
        assert (b[valid][:, 0] + b[valid][:, 2] <= 96 + 1e-3).all()

    def test_same_api_surface(self, tiny_ssd):
        frame = np.random.default_rng(6).integers(0, 255, (72, 96, 3), np.uint8)
        dets = tiny_ssd.detect(frame)
        assert isinstance(dets, list)
        dets2, feats = tiny_ssd.detect_with_features(frame)
        assert len(dets2) == len(feats)
        assert tiny_ssd.get_attention_map(frame) is None  # conv stub

    def test_factory(self):
        from office_person_detection_vit_tpu.detection.ssd_detector import (
            SSDDetector,
            build_detector,
        )
        from office_person_detection_vit_tpu.detection.detector import DETRDetector

        assert isinstance(
            build_detector(ConfigManager.from_dict({"detection": {"model": "ssd"}})),
            SSDDetector,
        )
        assert isinstance(
            build_detector(ConfigManager.from_dict({"detection": {"model": "detr"}})),
            DETRDetector,
        )


class TestBucketedChunking:
    """Partial batches ship in power-of-2 bucket programs so a single-frame
    request doesn't transfer batch_size frames of padding."""

    def _detector(self, batch_size):
        from office_person_detection_vit_tpu.config.config_manager import ConfigManager
        from office_person_detection_vit_tpu.detection.detector import DETRDetector
        from office_person_detection_vit_tpu.models.detr import DETRConfig

        cfg = ConfigManager.from_dict(
            # mesh.data=1: bucket semantics under test are the single-device
            # ones (the sharded variant is covered below).
            {"detection": {"confidence_threshold": 0.0, "batch_size": batch_size,
                           "input_height": 96, "input_width": 128,
                           "dtype": "float32", "use_pallas_attention": False},
             "parallel": {"mesh": {"data": 1}}}
        )
        det = DETRDetector(cfg, detr_config=DETRConfig.tiny(num_classes=5))
        det.load_model()
        return det

    def test_bucket_selection(self):
        det = self._detector(8)
        assert det._bucket_sizes() == [1, 2, 4, 8]
        assert det._tail_bucket(1) == 1
        assert det._tail_bucket(2) == 2
        assert det._tail_bucket(3) == 4
        assert det._tail_bucket(5) == 8
        det6 = self._detector(6)  # non-power-of-2 batch size
        assert det6._bucket_sizes() == [1, 2, 4, 6]
        assert det6._tail_bucket(5) == 6

    def test_bucket_selection_sharded(self):
        """On a mesh every bucket is a multiple of the data-axis size so
        each program divides evenly over the devices."""
        from office_person_detection_vit_tpu.config.config_manager import ConfigManager
        from office_person_detection_vit_tpu.detection.detector import DETRDetector
        from office_person_detection_vit_tpu.models.detr import DETRConfig

        cfg = ConfigManager.from_dict(
            {"detection": {"confidence_threshold": 0.0, "batch_size": 6,
                           "input_height": 96, "input_width": 128,
                           "dtype": "float32", "use_pallas_attention": False},
             "parallel": {"mesh": {"data": 4}}}
        )
        det = DETRDetector(cfg, detr_config=DETRConfig.tiny(num_classes=5))
        det.load_model()
        assert det.mesh is not None
        assert det.batch_size == 8  # 6 aligned up to a multiple of 4
        assert det._bucket_sizes() == [4, 8]
        assert det._tail_bucket(1) == 4
        assert det._tail_bucket(5) == 8

    def test_results_identical_across_bucket_shapes(self):
        import numpy as np

        det = self._detector(4)
        rng = np.random.default_rng(0)
        frames = rng.integers(0, 255, (5, 72, 96, 3), np.uint8)
        full = det.detect_batch(frames)            # chunks: 4 + bucket 1
        assert full.scores.shape[0] == 5
        one = det.detect_batch(frames[4:5])        # bucket-1 program
        assert one.scores.shape[0] == 1
        np.testing.assert_allclose(
            np.asarray(full.scores[4]), np.asarray(one.scores[0]), atol=1e-5
        )
        three = det.detect_batch(frames[:3])       # bucket-4 program (pad 1)
        assert three.scores.shape[0] == 3
        np.testing.assert_allclose(
            np.asarray(three.scores), np.asarray(full.scores[:3]), atol=1e-5
        )


class TestChunkFailureIsolation:
    """A poisoned chunk must not abort Phase 2: the failing chunk logs,
    yields all-invalid results for its frames, and the run continues
    (reference per-frame error isolation,
    reference src/pipeline/phases/detection.py:124-127)."""

    def _detector(self, batch_size=4):
        from office_person_detection_vit_tpu.config.config_manager import ConfigManager
        from office_person_detection_vit_tpu.detection.detector import DETRDetector
        from office_person_detection_vit_tpu.models.detr import DETRConfig

        cfg = ConfigManager.from_dict(
            {"detection": {"confidence_threshold": 0.0, "batch_size": batch_size,
                           "input_height": 96, "input_width": 128,
                           "dtype": "float32", "use_pallas_attention": False},
             "parallel": {"mesh": {"data": 1}}}
        )
        det = DETRDetector(cfg, detr_config=DETRConfig.tiny(num_classes=5))
        det.load_model()
        return det

    def test_middle_chunk_failure_yields_empty_frames(self, caplog):
        import logging

        import numpy as np

        det = self._detector(4)
        rng = np.random.default_rng(1)
        frames = rng.integers(0, 255, (12, 72, 96, 3), np.uint8)
        clean = det.detect_batch(frames)

        real = det._jit_detect
        calls = {"n": 0}

        def poisoned(variables, chunk, orig_wh, conf=None):
            calls["n"] += 1
            if calls["n"] == 2:  # second of three chunks
                raise RuntimeError("injected preprocess fault")
            return real(variables, chunk, orig_wh, conf)

        det._jit_detect = poisoned
        with caplog.at_level(logging.ERROR):
            out = det.detect_batch(frames)
        det._jit_detect = real

        assert calls["n"] == 3  # all three chunks were attempted
        assert out.scores.shape[0] == 12
        valid = np.asarray(out.valid)
        assert not valid[4:8].any()  # poisoned chunk: all-invalid masks
        # surviving chunks match the clean run
        np.testing.assert_allclose(
            np.asarray(out.scores[:4]), np.asarray(clean.scores[:4]), atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(out.scores[8:]), np.asarray(clean.scores[8:]), atol=1e-5)
        assert any("injected preprocess fault" in r.getMessage()
                   or "detect chunk failed" in r.getMessage()
                   for r in caplog.records)
        # feature pooling over the merged batch still works (zero features
        # for the failed frames, finite everywhere)
        feats = np.asarray(det._pool_features(out))
        assert feats.shape[0] == 12 and np.isfinite(feats).all()

    def test_phase_completes_with_poisoned_chunk(self, tmp_path):
        """DetectionPhase.execute finishes and exports artifacts even when a
        chunk dies: failed frames simply carry zero detections."""
        import numpy as np

        from office_person_detection_vit_tpu.core.dto import FrameResult
        from office_person_detection_vit_tpu.pipeline.phases.detection import (
            DetectionPhase,
        )

        det = self._detector(4)
        real = det._jit_detect
        calls = {"n": 0}

        def poisoned(variables, chunk, orig_wh, conf=None):
            calls["n"] += 1
            if calls["n"] == 2:
                raise RuntimeError("injected fault")
            return real(variables, chunk, orig_wh, conf)

        det._jit_detect = poisoned
        from office_person_detection_vit_tpu.config.config_manager import (
            ConfigManager,
        )

        cfg = ConfigManager.from_dict(
            {"detection": {"batch_size": 4}, "output": {}})
        phase = DetectionPhase(cfg, detector=det)
        rng = np.random.default_rng(2)
        frames = list(rng.integers(0, 255, (12, 72, 96, 3), np.uint8))
        frs = [FrameResult(frame_number=i, timestamp=None) for i in range(12)]
        out = phase.execute(frames, frs, output_dir=tmp_path)
        assert len(out) == 12
        assert all(len(fr.detections) == 0 for fr in out[4:8])
        assert (tmp_path / "detections.json").exists()
        assert (tmp_path / "detection_statistics.json").exists()


class TestStableHLOExport:
    """detection/export.py: jax.export round-trip of the fused detect
    program — the artifact reloads and executes without model code and
    matches the live detector exactly (tools/export_stablehlo.py is the
    CLI; the reference's deployment handoff is an ultralytics .pt pickle
    that needs the full stack to open)."""

    def test_export_roundtrip_matches_live_detector(self, tiny_detector,
                                                    tmp_path):
        from office_person_detection_vit_tpu.detection.export import (
            export_detect,
            load_exported,
            run_exported,
            save_exported,
        )

        det = tiny_detector
        exp = export_detect(det, batch_size=2, source_hw=(96, 128),
                            platforms=None)  # current (CPU) platform
        path = tmp_path / "detect.stablehlo"
        n = save_exported(exp, path)
        assert n > 1000 and path.stat().st_size == n

        frames = np.random.default_rng(3).integers(0, 255, (2, 96, 128, 3),
                                                   np.uint8)
        out = run_exported(load_exported(path), det.variables, frames,
                           orig_wh=(128.0, 96.0),
                           conf=det.confidence_threshold)
        ref = det.detect_batch(frames)
        assert set(out) == {"boxes_xywh", "scores", "valid", "foot"}
        np.testing.assert_allclose(out["boxes_xywh"],
                                   np.asarray(ref.boxes_xywh),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(out["scores"], np.asarray(ref.scores),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_array_equal(out["valid"], np.asarray(ref.valid))

    def test_multiplatform_lowering(self, tiny_detector):
        """One artifact lowers for cpu AND tpu (the default) — deploy the
        same file to either runtime."""
        from office_person_detection_vit_tpu.detection.export import (
            export_detect,
        )

        exp = export_detect(tiny_detector, batch_size=1,
                            source_hw=(96, 128))
        assert exp.platforms == ("cpu", "tpu")

    def test_cli_tool(self, tmp_path):
        from tools.export_stablehlo import main as export_main

        rc = export_main([
            "--output", str(tmp_path / "m.stablehlo"), "--tiny",
            "--batch", "1", "--source-hw", "96x128",
            "--platforms", "cpu", "--validate",
            "--weights-out", str(tmp_path / "w.npz"),
        ])
        assert rc == 0
        assert (tmp_path / "m.stablehlo").exists()
        assert (tmp_path / "w.npz").exists()


def test_stablehlo_export_ssd_family(tmp_path):
    """export_detect generalizes across families: the SSD/FCOS detector's
    single _jit_detect program exports/reloads with the same contract."""
    from office_person_detection_vit_tpu.detection.export import (
        export_detect,
        load_exported,
        run_exported,
        save_exported,
    )
    from office_person_detection_vit_tpu.detection.ssd_detector import SSDDetector
    from office_person_detection_vit_tpu.models.single_shot import SingleShotConfig

    cfg = ConfigManager.from_dict(
        {"detection": {"confidence_threshold": 0.0, "batch_size": 2,
                       "input_height": 96, "input_width": 128}}
    )
    det = SSDDetector(cfg, ss_config=SingleShotConfig.tiny())
    det.load_model()
    exp = export_detect(det, batch_size=2, source_hw=(96, 128),
                        platforms=None)
    path = tmp_path / "ssd.stablehlo"
    save_exported(exp, path)
    frames = np.random.default_rng(7).integers(0, 255, (2, 96, 128, 3),
                                               np.uint8)
    out = run_exported(load_exported(path), det.variables, frames,
                       orig_wh=(128.0, 96.0), conf=0.0)
    ref = det.detect_batch(frames)
    np.testing.assert_allclose(out["boxes_xywh"], np.asarray(ref.boxes_xywh),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(out["valid"], np.asarray(ref.valid))


def test_stablehlo_export_dynamic_batch(tiny_detector, tmp_path):
    """Default export uses a SYMBOLIC batch dim: one artifact executes at
    any batch size with exact parity (XLA specializes per shape at call
    time, like the detector's bucket programs)."""
    from office_person_detection_vit_tpu.detection.export import (
        export_detect,
        load_exported,
        run_exported,
        save_exported,
    )

    det = tiny_detector
    exp = export_detect(det, source_hw=(96, 128), platforms=None)
    path = tmp_path / "dyn.stablehlo"
    save_exported(exp, path)
    reloaded = load_exported(path)
    for n in (1, 3):
        frames = np.random.default_rng(n).integers(0, 255, (n, 96, 128, 3),
                                                   np.uint8)
        out = run_exported(reloaded, det.variables, frames,
                           orig_wh=(128.0, 96.0),
                           conf=det.confidence_threshold)
        ref = det.detect_batch(frames)
        np.testing.assert_allclose(out["boxes_xywh"],
                                   np.asarray(ref.boxes_xywh),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_array_equal(out["valid"], np.asarray(ref.valid))


def test_weights_npz_roundtrips_extended_dtypes(tmp_path):
    """save/load_weights_npz must round-trip bfloat16 leaves (npz alone
    degrades them to void '|V2'); stored as uint16 views + dtype tag."""
    import ml_dtypes

    from office_person_detection_vit_tpu.detection.export import (
        load_weights_npz,
        save_weights_npz,
    )

    v = {"params": {"w": np.arange(6, dtype=ml_dtypes.bfloat16).reshape(2, 3),
                    "b": np.ones(3, np.float32)}}
    save_weights_npz(v, tmp_path / "w.npz")
    got = load_weights_npz(tmp_path / "w.npz")
    assert got["params"]["w"].dtype == ml_dtypes.bfloat16
    np.testing.assert_array_equal(
        got["params"]["w"].astype(np.float32),
        v["params"]["w"].astype(np.float32),
    )
    np.testing.assert_array_equal(got["params"]["b"], v["params"]["b"])
