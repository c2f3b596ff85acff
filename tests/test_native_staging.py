"""Native host-staging library (native/staging.cpp via ctypes).

Byte-exactness vs the cv2/numpy reference paths, fallback behavior, and
the device-side roundtrip. The library is built on demand with the
system g++; in environments without a compiler every test here skips
except the fallback one (the Python paths stay authoritative).
"""

import numpy as np
import pytest

from office_person_detection_vit_tpu import native
from office_person_detection_vit_tpu.ops.preprocessing import (
    bgr_to_i420,
    i420_delta_encode,
)

cv2 = pytest.importorskip("cv2")

needs_native = pytest.mark.skipif(
    not native.available(), reason="native staging library unavailable"
)


@pytest.fixture()
def frames():
    rng = np.random.default_rng(7)
    return rng.integers(0, 256, (5, 48, 64, 3), np.uint8)


@needs_native
class TestNativeExactness:
    def test_bgr_to_i420_matches_cv2(self, frames):
        ref = np.stack([cv2.cvtColor(f, cv2.COLOR_BGR2YUV_I420) for f in frames])
        out = native.bgr_to_i420(frames)
        np.testing.assert_array_equal(out, ref)

    def test_gradient_and_saturation_pixels(self):
        """Edge intensities (0, 255, gray ramps) hit the clamp paths."""
        g = np.linspace(0, 255, 64 * 48, dtype=np.float64).reshape(48, 64)
        f = np.stack([np.zeros_like(g), g, np.full_like(g, 255)], -1)
        f = f.astype(np.uint8)[None]
        ref = cv2.cvtColor(f[0], cv2.COLOR_BGR2YUV_I420)[None]
        np.testing.assert_array_equal(native.bgr_to_i420(f), ref)

    def test_fused_delta_equals_composition(self, frames):
        prev = np.random.default_rng(8).integers(
            0, 256, (frames.shape[1] * 3 // 2, frames.shape[2]), np.uint8
        )
        i420 = native.bgr_to_i420(frames)
        expect = i420.copy()
        expect[1:] ^= i420[:-1]
        expect[0] ^= prev
        np.testing.assert_array_equal(
            native.bgr_to_i420_delta(frames, prev), expect
        )

    def test_delta_encode_matches_numpy(self, frames):
        i420 = native.bgr_to_i420(frames)
        prev = np.zeros(i420.shape[1:], np.uint8)
        expect = i420.copy()
        expect[1:] ^= i420[:-1]
        out = native.i420_delta_encode(i420, prev)
        np.testing.assert_array_equal(out, expect)
        # input not mutated (the detector keeps the payload for chunk state)
        assert i420[1:].max() >= 0 and not np.array_equal(out, i420)

    def test_device_roundtrip(self, frames):
        """Native deltas reconstruct exactly through the jitted XOR scan."""
        import jax.numpy as jnp

        from office_person_detection_vit_tpu.ops.preprocessing import (
            reconstruct_i420_delta,
        )

        i420 = native.bgr_to_i420(frames)
        prev = np.random.default_rng(9).integers(
            0, 256, i420.shape[1:], np.uint8
        )
        deltas = native.bgr_to_i420_delta(frames, prev)
        back = reconstruct_i420_delta(jnp.asarray(deltas), jnp.asarray(prev))
        np.testing.assert_array_equal(np.asarray(back), i420)


class TestDispatch:
    def test_ops_path_identical_with_and_without_native(self, frames, monkeypatch):
        with_native = bgr_to_i420(frames)
        prev = np.zeros(with_native.shape[1:], np.uint8)
        delta_native = i420_delta_encode(with_native, prev)
        monkeypatch.setattr(native, "_lib", None)
        monkeypatch.setattr(native, "_tried", True)
        assert not native.available()
        np.testing.assert_array_equal(bgr_to_i420(frames), with_native)
        np.testing.assert_array_equal(
            i420_delta_encode(with_native, prev), delta_native
        )

    def test_env_gate_disables(self, monkeypatch):
        monkeypatch.setenv("OPDV_NO_NATIVE", "1")
        monkeypatch.setattr(native, "_lib", None)
        monkeypatch.setattr(native, "_tried", False)
        assert not native.available()
        assert native.bgr_to_i420(np.zeros((1, 4, 4, 3), np.uint8)) is None
