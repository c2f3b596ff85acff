"""Feature-extraction tests (reference tests/test_feature_extractor.py
analog): jitted ROI mean-pool over encoder features and the crop-histogram
fallback."""

import numpy as np
import pytest

from office_person_detection_vit_tpu.detection.features import (
    crop_histogram_features,
    roi_mean_pool,
)


class TestRoiMeanPool:
    def _grid_features(self, fh=6, fw=8, C=4):
        """Feature map where cell (y, x) has a one-hot-ish signature."""
        feats = np.zeros((1, fh * fw, C), np.float32)
        for i in range(fh * fw):
            feats[0, i, i % C] = 1.0 + i
        return feats

    def test_output_shape_and_l2_norm(self):
        feats = self._grid_features()
        boxes = np.asarray([[[0, 0, 640, 360], [640, 360, 640, 360]]], np.float32)
        valid = np.asarray([[True, True]])
        out = np.asarray(
            roi_mean_pool(feats, (6, 8), boxes, valid, np.asarray([1280.0, 720.0], np.float32))
        )
        assert out.shape == (1, 2, 4)
        norms = np.linalg.norm(out, axis=-1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-5)

    def test_invalid_slots_zeroed(self):
        feats = self._grid_features()
        boxes = np.asarray([[[0, 0, 100, 100], [0, 0, 100, 100]]], np.float32)
        valid = np.asarray([[True, False]])
        out = np.asarray(
            roi_mean_pool(feats, (6, 8), boxes, valid, np.asarray([1280.0, 720.0], np.float32))
        )
        assert np.all(out[0, 1] == 0)
        assert np.linalg.norm(out[0, 0]) > 0

    def test_disjoint_boxes_get_different_features(self):
        rng = np.random.default_rng(0)
        feats = rng.normal(size=(1, 48, 16)).astype(np.float32)
        boxes = np.asarray([[[0, 0, 200, 200], [1000, 500, 200, 200]]], np.float32)
        valid = np.asarray([[True, True]])
        out = np.asarray(
            roi_mean_pool(feats, (6, 8), boxes, valid, np.asarray([1280.0, 720.0], np.float32))
        )
        cos = float(out[0, 0] @ out[0, 1])
        assert cos < 0.99  # pooled from different cells

    def test_same_box_same_feature_across_batch(self):
        rng = np.random.default_rng(1)
        one = rng.normal(size=(1, 48, 8)).astype(np.float32)
        feats = np.concatenate([one, one])
        boxes = np.tile(np.asarray([[[100, 100, 300, 300]]], np.float32), (2, 1, 1))
        valid = np.ones((2, 1), bool)
        out = np.asarray(
            roi_mean_pool(feats, (6, 8), boxes, valid, np.asarray([1280.0, 720.0], np.float32))
        )
        np.testing.assert_allclose(out[0, 0], out[1, 0], atol=1e-6)


class TestCropHistogramFallback:
    def test_dim_and_norm(self):
        frame = np.random.default_rng(0).integers(0, 255, (240, 320, 3), np.uint8)
        boxes = np.asarray([[10, 10, 50, 80], [100, 50, 60, 100]], np.float32)
        out = crop_histogram_features(frame, boxes)
        assert out.shape == (2, 256)
        np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, atol=1e-5)

    def test_distinct_colors_distinct_features(self):
        frame = np.zeros((200, 320, 3), np.uint8)
        frame[:, :160] = (255, 0, 0)
        frame[:, 160:] = (0, 0, 255)
        boxes = np.asarray([[0, 0, 100, 100], [200, 0, 100, 100]], np.float32)
        out = crop_histogram_features(frame, boxes)
        assert float(out[0] @ out[1]) < 0.9

    def test_similar_crops_similar_features(self):
        rng = np.random.default_rng(2)
        frame = rng.integers(100, 140, (200, 320, 3), np.uint8)
        boxes = np.asarray([[0, 0, 80, 80], [10, 5, 80, 80]], np.float32)
        out = crop_histogram_features(frame, boxes)
        assert float(out[0] @ out[1]) > 0.95

    def test_degenerate_box_zero_vector(self):
        frame = np.zeros((100, 100, 3), np.uint8)
        out = crop_histogram_features(frame, np.asarray([[95, 95, 0, 10]], np.float32))
        assert np.all(out[0] == 0)

    def test_out_of_bounds_box_clamped(self):
        frame = np.full((100, 100, 3), 50, np.uint8)
        out = crop_histogram_features(frame, np.asarray([[-20, -20, 60, 60]], np.float32))
        assert np.linalg.norm(out[0]) == pytest.approx(1.0, abs=1e-5)


class TestCLIPReIDBackend:
    """The CLIP link of the fallback chain actually executes: a tiny
    random-weight FlaxCLIP checkpoint saved locally exercises the
    local_files_only load and _extract_clip end-to-end
    (reference reid_feature_extractor.py:51-172)."""

    @pytest.fixture(scope="class")
    def clip_dir(self, tmp_path_factory):
        transformers = pytest.importorskip("transformers")
        from transformers import CLIPConfig, FlaxCLIPModel

        cfg = CLIPConfig(
            text_config={
                "hidden_size": 32, "intermediate_size": 64,
                "num_hidden_layers": 2, "num_attention_heads": 2,
                "max_position_embeddings": 16, "vocab_size": 99,
            },
            vision_config={
                "hidden_size": 32, "intermediate_size": 64,
                "num_hidden_layers": 2, "num_attention_heads": 2,
                "image_size": 224, "patch_size": 56,
            },
            projection_dim=24,
        )
        model = FlaxCLIPModel(cfg)
        path = tmp_path_factory.mktemp("clip") / "tiny-clip"
        model.save_pretrained(path)
        return str(path)

    def test_clip_backend_loads_and_extracts(self, clip_dir):
        from office_person_detection_vit_tpu.tracking.reid_feature_extractor import (
            ReIDFeatureExtractor,
        )

        ext = ReIDFeatureExtractor(model_type="clip", model_path=clip_dir)
        ext.load_model()
        assert ext.backend == "clip"
        assert ext.feature_dim == 24

        rng = np.random.default_rng(0)
        frame = rng.integers(0, 255, (240, 320, 3), np.uint8)
        feats = ext.extract_features(
            frame, [(10.0, 10.0, 60.0, 120.0), (150.0, 30.0, 50.0, 100.0)]
        )
        assert feats.shape == (2, 24)
        np.testing.assert_allclose(
            np.linalg.norm(feats, axis=1), 1.0, rtol=1e-5
        )
        # Degenerate box still yields a finite unit vector.
        f2 = ext.extract_features(frame, [(-50.0, -50.0, 10.0, 10.0)])
        assert np.isfinite(f2).all()

    def test_missing_local_checkpoint_falls_back_to_histogram(self, tmp_path):
        from office_person_detection_vit_tpu.tracking.reid_feature_extractor import (
            ReIDFeatureExtractor,
        )

        ext = ReIDFeatureExtractor(
            model_type="clip", model_path=str(tmp_path / "nope")
        )
        ext.load_model()
        assert ext.backend == "histogram"
        assert ext.feature_dim == 256
