"""FloorMapConfig tests (reference tests/test_floormap_config.py analog):
unit conversions, origin handling, config construction with the reference's
real constants (1878x1369 px, 28.19/28.24 mm/px, origin (7,9))."""

import numpy as np
import pytest

from office_person_detection_vit_tpu.config.config_manager import ConfigManager
from office_person_detection_vit_tpu.transform.floormap_config import FloorMapConfig


class TestDefaults:
    def test_reference_constants(self):
        fm = FloorMapConfig()
        assert (fm.image_width, fm.image_height) == (1878, 1369)
        assert fm.image_origin_x == 7.0 and fm.image_origin_y == 9.0
        assert fm.image_x_mm_per_pixel == pytest.approx(28.1926, abs=1e-3)
        assert fm.image_y_mm_per_pixel == pytest.approx(28.2414, abs=1e-3)

    def test_physical_dimensions(self):
        fm = FloorMapConfig()
        # ~53 m x ~39 m office floor
        assert fm.width_mm == pytest.approx(1878 * fm.image_x_mm_per_pixel)
        assert fm.height_mm == pytest.approx(1369 * fm.image_y_mm_per_pixel)
        assert 52_000 < fm.width_mm < 53_500
        assert 38_000 < fm.height_mm < 39_000


class TestConversions:
    def test_origin_maps_to_zero_mm(self):
        fm = FloorMapConfig()
        mm = fm.px_to_mm(np.asarray([[7.0, 9.0]]))
        np.testing.assert_allclose(mm, [[0.0, 0.0]], atol=1e-5)

    def test_px_mm_roundtrip(self):
        fm = FloorMapConfig()
        pts = np.asarray([[100.0, 200.0], [1800.0, 1300.0], [7.0, 9.0]], np.float32)
        np.testing.assert_allclose(fm.mm_to_px(fm.px_to_mm(pts)), pts, atol=1e-3)

    def test_anisotropic_scaling(self):
        fm = FloorMapConfig(
            image_origin_x=0, image_origin_y=0,
            image_x_mm_per_pixel=10.0, image_y_mm_per_pixel=20.0,
        )
        mm = fm.px_to_mm(np.asarray([[3.0, 3.0]]))
        np.testing.assert_allclose(mm, [[30.0, 60.0]])

    def test_batch_shapes(self):
        fm = FloorMapConfig()
        out = fm.px_to_mm(np.zeros((5, 2), np.float32))
        assert out.shape == (5, 2)


class TestFromConfig:
    def test_overrides(self):
        cfg = ConfigManager.from_dict(
            {"floormap": {"image_width": 500, "image_x_mm_per_pixel": 12.5}}
        )
        fm = FloorMapConfig.from_config(cfg)
        assert fm.image_width == 500
        assert fm.image_x_mm_per_pixel == 12.5
        assert fm.image_height == 1369  # default retained

    def test_frozen(self):
        fm = FloorMapConfig()
        with pytest.raises(Exception):
            fm.image_width = 1  # type: ignore[misc]
