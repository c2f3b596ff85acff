"""Preprocessing-op depth tests (reference tests/test_preprocessing.py
analog, 35 tests there): per-op parameter behavior beyond the smoke tests
in test_aux_components."""

import numpy as np
import pytest

from office_person_detection_vit_tpu.detection import preprocessing as pp


@pytest.fixture
def gray():
    rng = np.random.default_rng(0)
    img = rng.integers(60, 200, (60, 90), np.uint8)
    img[20:40, 30:60] = 240
    return img


@pytest.fixture
def color(gray):
    import cv2

    return cv2.cvtColor(gray, cv2.COLOR_GRAY2BGR)


class TestGrayscaleInvert:
    def test_grayscale_from_color(self, color):
        out = pp.to_grayscale(color)
        assert out.ndim == 2 and out.shape == color.shape[:2]

    def test_grayscale_passthrough(self, gray):
        assert pp.to_grayscale(gray) is gray

    def test_invert_involution_color(self, color):
        np.testing.assert_array_equal(pp.invert(pp.invert(color)), color)


class TestResize:
    def test_scale(self, gray):
        assert pp.resize(gray, scale=2.0).shape == (120, 180)

    def test_exact_size(self, gray):
        assert pp.resize(gray, width=45, height=30).shape == (30, 45)

    def test_width_keeps_aspect(self, gray):
        out = pp.resize(gray, width=180)
        assert out.shape == (120, 180)

    def test_height_keeps_aspect(self, gray):
        out = pp.resize(gray, height=30)
        assert out.shape == (30, 45)

    def test_noop_without_params(self, gray):
        assert pp.resize(gray) is gray


class TestThreshold:
    def test_otsu_binary_output(self, gray):
        out = pp.threshold(gray, value=0)
        assert set(np.unique(out)) <= {0, 255}

    def test_fixed_value(self, gray):
        out = pp.threshold(gray, value=220)
        # only the bright block survives
        assert out[30, 45] == 255 and out[5, 5] == 0

    def test_adaptive(self, gray):
        out = pp.threshold(gray, adaptive=True, block_size=15, c=3)
        assert out.shape == gray.shape
        assert set(np.unique(out)) <= {0, 255}

    def test_color_input_grayscaled_first(self, color):
        assert pp.threshold(color).ndim == 2


class TestBlurSharpen:
    def test_gaussian_blur_reduces_variance(self, gray):
        assert pp.blur(gray, 5).std() < gray.std()

    def test_median_blur(self, gray):
        out = pp.blur(gray, 3, gaussian=False)
        assert out.shape == gray.shape

    def test_even_kernel_rounded_to_odd(self, gray):
        out = pp.blur(gray, 4)  # would crash if 4 passed through
        assert out.shape == gray.shape

    def test_unsharp_increases_edge_contrast(self, gray):
        out = pp.unsharp_mask(gray.astype(np.uint8), amount=1.5)
        # sharpening amplifies local contrast around the bright block edge
        assert out.astype(int).std() >= gray.astype(int).std()


class TestMorphology:
    def test_erode_shrinks_bright(self, gray):
        eroded = pp.morphology(gray, "erode", kernel_size=3)
        assert int(eroded.astype(int).sum()) < int(gray.astype(int).sum())

    def test_dilate_grows_bright(self, gray):
        dilated = pp.morphology(gray, "dilate", kernel_size=3)
        assert int(dilated.astype(int).sum()) > int(gray.astype(int).sum())

    def test_open_close_shapes(self, gray):
        for op in ("open", "close", "gradient", "tophat"):
            assert pp.morphology(gray, op).shape == gray.shape

    def test_unknown_op_raises(self, gray):
        with pytest.raises(ValueError, match="unknown morphology"):
            pp.morphology(gray, "implode")

    def test_iterations(self, gray):
        once = pp.morphology(gray, "erode", iterations=1)
        thrice = pp.morphology(gray, "erode", iterations=3)
        assert int(thrice.astype(int).sum()) <= int(once.astype(int).sum())


class TestDeskew:
    def _text_like(self, angle):
        import cv2

        img = np.full((120, 300), 255, np.uint8)
        for y in (40, 60, 80):
            cv2.line(img, (40, y), (260, y), 0, 6)
        if angle:
            M = cv2.getRotationMatrix2D((150, 60), angle, 1.0)
            img = cv2.warpAffine(img, M, (300, 120), borderValue=255)
        return img

    def test_blank_image_unchanged(self):
        img = np.zeros((50, 50), np.uint8)
        np.testing.assert_array_equal(pp.deskew(img), img)

    def test_straight_text_unchanged(self):
        img = self._text_like(0)
        np.testing.assert_array_equal(pp.deskew(img), img)

    def test_excessive_angle_estimate_noop(self):
        img = self._text_like(3)
        out = pp.deskew(img, max_angle=0.5)  # estimate > max -> no-op
        np.testing.assert_array_equal(out, img)


class TestPipeline:
    def test_steps_in_order(self, color):
        out = pp.apply_pipeline(
            color,
            [{"name": "grayscale"}, {"name": "resize", "scale": 2.0},
             {"name": "threshold", "value": 128}],
        )
        assert out.ndim == 2 and out.shape == (120, 180)

    def test_unknown_step_raises(self, gray):
        with pytest.raises(ValueError, match="unknown preprocessing step"):
            pp.apply_pipeline(gray, [{"name": "quantum_denoise"}])

    def test_bad_params_skip_step_keep_going(self, gray):
        out = pp.apply_pipeline(
            gray,
            [{"name": "blur", "kernel_size": "huge"},  # TypeError -> skipped
             {"name": "invert"}],
        )
        np.testing.assert_array_equal(out, pp.invert(gray))

    def test_empty_pipeline_identity(self, gray):
        assert pp.apply_pipeline(gray, []) is gray
