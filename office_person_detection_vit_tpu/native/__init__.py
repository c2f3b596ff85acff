"""Native (C++) host-staging runtime — ctypes bindings.

The TPU compute path is JAX/XLA; the host runtime around it stages frame
batches onto the wire. This package holds the native implementation of
that staging (``staging.cpp``: fused BGR->I420 + XOR delta, multithreaded)
and a ctypes loader that builds it on demand with the system ``g++``
(zero-egress container: no pip/pybind11 — plain shared library, cached
next to the source). Every entry point degrades gracefully: if no
compiler or the build fails, callers fall back to the cv2/numpy path
(ops/preprocessing.py) with identical byte-level results.

Counterpart of the reference's per-frame host preprocessing loop
(reference src/detection/yolov8_detector.py:122).
"""

from __future__ import annotations

import ctypes
import logging
import os
import shutil
import subprocess
import tempfile
from pathlib import Path

import numpy as np

logger = logging.getLogger(__name__)

_DIR = Path(__file__).resolve().parent
_SRC = _DIR / "staging.cpp"
_SO = _DIR / "_staging.so"

_lib: ctypes.CDLL | None = None
_tried = False


def _build() -> bool:
    gxx = shutil.which("g++") or shutil.which("c++")
    if gxx is None:
        return False
    # Build to a temp file then atomically rename so concurrent importers
    # never load a half-written .so.
    fd, tmp = tempfile.mkstemp(suffix=".so", dir=str(_DIR))
    os.close(fd)
    cmd = [gxx, "-O3", "-shared", "-fPIC", "-pthread", "-std=c++17",
           str(_SRC), "-o", tmp]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, _SO)
        return True
    except (subprocess.SubprocessError, OSError) as exc:
        logger.info("native staging build failed (%s); using cv2/numpy path", exc)
        Path(tmp).unlink(missing_ok=True)
        return False


def _load() -> ctypes.CDLL | None:
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if os.environ.get("OPDV_NO_NATIVE"):
        return None
    if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(str(_SO))
    except OSError as exc:  # stale/foreign-arch artifact: rebuild once
        logger.info("native staging load failed (%s); rebuilding", exc)
        if not _build():
            return None
        try:
            lib = ctypes.CDLL(str(_SO))
        except OSError:
            return None
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.opdv_bgr_to_i420.argtypes = [u8p, ctypes.c_int64, ctypes.c_int64,
                                     ctypes.c_int64, u8p, ctypes.c_int]
    lib.opdv_bgr_to_i420.restype = ctypes.c_int
    lib.opdv_bgr_to_i420_delta.argtypes = [u8p, u8p, ctypes.c_int64,
                                           ctypes.c_int64, ctypes.c_int64,
                                           u8p, ctypes.c_int]
    lib.opdv_bgr_to_i420_delta.restype = ctypes.c_int
    lib.opdv_i420_delta.argtypes = [u8p, u8p, ctypes.c_int64, ctypes.c_int64]
    lib.opdv_i420_delta.restype = ctypes.c_int
    _lib = lib
    return _lib


def available() -> bool:
    """True iff the native library is loaded (building it if needed)."""
    return _load() is not None


def _threads(F: int) -> int:
    return max(1, min(int(F), os.cpu_count() or 1))


def _u8p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def bgr_to_i420(frames: np.ndarray) -> np.ndarray | None:
    """(F, H, W, 3) uint8 BGR -> (F, H*3//2, W) uint8 I420, byte-identical
    to cv2.COLOR_BGR2YUV_I420. None if the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    frames = np.ascontiguousarray(frames, np.uint8)
    F, H, W, _ = frames.shape
    out = np.empty((F, H * 3 // 2, W), np.uint8)
    if lib.opdv_bgr_to_i420(_u8p(frames), F, H, W, _u8p(out), _threads(F)):
        return None
    return out


def bgr_to_i420_delta(frames: np.ndarray, prev_last: np.ndarray) -> np.ndarray | None:
    """Fused BGR->I420 + XOR delta against ``prev_last`` (the previous
    chunk's last I420 frame). Equals
    ``i420_delta_encode(bgr_to_i420(frames), prev_last)`` with no
    intermediate batch array. None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    frames = np.ascontiguousarray(frames, np.uint8)
    F, H, W, _ = frames.shape
    prev = np.ascontiguousarray(prev_last, np.uint8)
    if prev.shape != (H * 3 // 2, W):
        return None
    out = np.empty((F, H * 3 // 2, W), np.uint8)
    if lib.opdv_bgr_to_i420_delta(_u8p(frames), _u8p(prev), F, H, W,
                                  _u8p(out), _threads(F)):
        return None
    return out


def i420_delta_encode(planes: np.ndarray, prev_last: np.ndarray) -> np.ndarray | None:
    """XOR delta over I420 planes (copying; the caller's array is kept).
    None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    out = np.ascontiguousarray(planes, np.uint8).copy()
    prev = np.ascontiguousarray(prev_last, np.uint8)
    F = out.shape[0]
    plane = int(out[0].size)
    if prev.size != plane:
        return None
    if lib.opdv_i420_delta(_u8p(out), _u8p(prev), F, plane):
        return None
    return out
