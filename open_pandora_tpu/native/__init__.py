"""ctypes bindings for the C++ host preprocessing library (native/preproc.cpp).

Builds the shared library on first use (g++ is in the image; pybind11 is
not, so the binding is plain ctypes). Falls back to a numpy implementation
if the toolchain is unavailable — same results, slower.

Public API:
  resize_center_crop_normalize(frames_u8, (H, W), scale, offset) -> float32
  u8_to_pm1(frames_u8) -> float32 in [-1, 1]
  have_native() -> bool
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence, Tuple

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO, "native", "preproc.cpp")
_LIB_PATH = os.path.join(_REPO, "native", "libpandora_preproc.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> Optional[str]:
    if os.path.exists(_LIB_PATH) and (
            os.path.getmtime(_LIB_PATH) >= os.path.getmtime(_SRC)):
        return _LIB_PATH
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
           "-o", _LIB_PATH, _SRC, "-lpthread"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return _LIB_PATH
    except Exception:
        return None


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        path = _build()
        if path is None:
            return None
        lib = ctypes.CDLL(path)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        f32p = ctypes.POINTER(ctypes.c_float)
        lib.preprocess_frames.argtypes = [
            u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            f32p, f32p, ctypes.c_int]
        lib.u8_to_pm1.argtypes = [u8p, f32p, ctypes.c_int64, ctypes.c_int]
        _lib = lib
        return _lib


def have_native() -> bool:
    return _load() is not None


def _resize_dims(sh: int, sw: int, dh: int, dw: int) -> Tuple[int, int]:
    """Shortest-side-cover resize dims >= crop box (resize_center_crop
    semantics, data/webvid.py:66-70)."""
    scale = max(dh / sh, dw / sw)
    return max(dh, round(sh * scale)), max(dw, round(sw * scale))


def resize_center_crop_normalize(
    frames: np.ndarray,
    out_hw: Tuple[int, int],
    scale: Sequence[float] = (1.0, 1.0, 1.0),
    offset: Sequence[float] = (0.0, 0.0, 0.0),
    num_threads: int = 0,
) -> np.ndarray:
    """(t, h, w, 3) uint8 -> (t, H, W, 3) float32: fused bilinear
    shortest-side resize + center crop + per-channel affine on [0,1]."""
    frames = np.ascontiguousarray(frames, dtype=np.uint8)
    t, sh, sw, _ = frames.shape
    dh, dw = out_hw
    rh, rw = _resize_dims(sh, sw, dh, dw)
    sc = np.ascontiguousarray(scale, np.float32)
    of = np.ascontiguousarray(offset, np.float32)
    lib = _load()
    if lib is not None:
        out = np.empty((t, dh, dw, 3), np.float32)
        nt = num_threads or min(8, os.cpu_count() or 1)
        lib.preprocess_frames(
            frames.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            t, sh, sw,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            dh, dw, rh, rw,
            sc.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            of.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), nt)
        return out
    return _numpy_fallback(frames, (dh, dw), (rh, rw), sc, of)


def _numpy_fallback(frames, out_hw, rhw, sc, of):
    import cv2

    dh, dw = out_hw
    rh, rw = rhw
    top, left = (rh - dh) // 2, (rw - dw) // 2
    out = np.empty((frames.shape[0], dh, dw, 3), np.float32)
    for i, f in enumerate(frames):
        r = cv2.resize(f, (rw, rh), interpolation=cv2.INTER_LINEAR)
        crop = r[top: top + dh, left: left + dw].astype(np.float32) / 255.0
        out[i] = crop * sc + of
    return out


def u8_to_pm1(frames: np.ndarray, num_threads: int = 0) -> np.ndarray:
    """uint8 -> float32 in [-1, 1] (webvid.py:175)."""
    frames = np.ascontiguousarray(frames, dtype=np.uint8)
    lib = _load()
    if lib is None:
        return frames.astype(np.float32) / 127.5 - 1.0
    out = np.empty(frames.shape, np.float32)
    nt = num_threads or min(8, os.cpu_count() or 1)
    lib.u8_to_pm1(frames.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                  out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                  frames.size, nt)
    return out
