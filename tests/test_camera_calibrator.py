"""CameraCalibrator tests (reference tests/test_camera_calibrator.py analog):
synthetic chessboard views -> cv2 calibration -> DistortionParams."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from office_person_detection_vit_tpu.calibration.camera_calibrator import (  # noqa: E402
    CameraCalibrator,
)


def _chessboard_image(board=(9, 6), square_px=40, offset=(60, 60), angle_deg=0.0):
    """Render a synthetic chessboard with the requested inner-corner count."""
    cols, rows = board[0] + 1, board[1] + 1
    h = rows * square_px + 2 * offset[1]
    w = cols * square_px + 2 * offset[0]
    img = np.full((h, w), 255, np.uint8)
    for r in range(rows):
        for c in range(cols):
            if (r + c) % 2 == 0:
                y0 = offset[1] + r * square_px
                x0 = offset[0] + c * square_px
                img[y0 : y0 + square_px, x0 : x0 + square_px] = 0
    if angle_deg:
        M = cv2.getRotationMatrix2D((w / 2, h / 2), angle_deg, 1.0)
        img = cv2.warpAffine(img, M, (w, h), borderValue=255)
    return cv2.cvtColor(img, cv2.COLOR_GRAY2BGR)


class TestCameraCalibrator:
    def test_add_image_finds_corners(self):
        cal = CameraCalibrator(board_size=(9, 6))
        assert cal.add_image(_chessboard_image())
        assert len(cal.image_points) == 1
        assert cal.image_points[0].shape[0] == 9 * 6

    def test_add_image_rejects_blank(self):
        cal = CameraCalibrator(board_size=(9, 6))
        assert not cal.add_image(np.full((480, 640, 3), 255, np.uint8))
        assert cal.image_points == []

    def test_calibrate_requires_three_views(self):
        cal = CameraCalibrator(board_size=(9, 6))
        cal.add_image(_chessboard_image())
        with pytest.raises(ValueError, match=">= 3"):
            cal.calibrate()

    def test_calibrate_from_synthetic_views(self):
        cal = CameraCalibrator(board_size=(9, 6), square_size=25.0)
        for angle in (0.0, 4.0, -4.0, 8.0):
            cal.add_image(_chessboard_image(angle_deg=angle))
        params, rms = cal.calibrate()
        # Flat synthetic views of an undistorted board: low RMS, plausible
        # principal point near the image center.
        assert rms < 2.0
        assert 0 < params.focal_length_x
        assert abs(params.center_x - cal.image_size[0] / 2) < cal.image_size[0] / 2
        assert params.image_width == cal.image_size[0]
