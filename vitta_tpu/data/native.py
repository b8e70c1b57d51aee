"""ctypes bindings for the native host preprocessing library
(csrc/vitta_host.cpp) — the C++ replacement for the reference's
PIL/DataLoader-worker data plane (SURVEY.md §2.8).

The library is built on demand with g++ (no pybind11); all entry points
have numpy fallbacks, so the framework runs without a toolchain."""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "csrc", "vitta_host.cpp")
_BUILD_DIR = os.path.join(_REPO_ROOT, "build")
_LIB_PATH = os.path.join(_BUILD_DIR, "libvitta_host.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def build_library(force: bool = False) -> Optional[str]:
    if os.path.exists(_LIB_PATH) and not force:
        if not os.path.exists(_SRC) or \
                os.path.getmtime(_LIB_PATH) >= os.path.getmtime(_SRC):
            return _LIB_PATH
    if not os.path.exists(_SRC):
        return None
    os.makedirs(_BUILD_DIR, exist_ok=True)
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
           "-std=c++17", _SRC, "-o", _LIB_PATH]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
    except (subprocess.CalledProcessError, FileNotFoundError):
        return None
    return _LIB_PATH


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    path = build_library()
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.resize_bilinear_u8_batch.argtypes = [
        u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.crop_u8.argtypes = [u8p] + [ctypes.c_int] * 8 + [u8p]
    lib.resize_bilinear_u8_window.argtypes = [
        u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.normalize_f32.argtypes = [u8p, f32p, ctypes.c_int64, ctypes.c_int,
                                  f32p, f32p, ctypes.c_int]
    _lib = lib
    return _lib


def _u8ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _f32ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def available() -> bool:
    return get_lib() is not None


def resize_bilinear(frames: np.ndarray, out_h: int, out_w: int,
                    antialias: bool = True) -> np.ndarray:
    """(N, H, W, C) or (H, W, C) uint8 -> resized uint8.

    antialias=True matches PIL BILINEAR (TANet/PIL pipeline);
    antialias=False is classic 2-tap bilinear (cv2/mmcv INTER_LINEAR,
    Swin/mmaction pipeline)."""
    lib = get_lib()
    single = frames.ndim == 3
    if single:
        frames = frames[None]
    frames = np.ascontiguousarray(frames)
    n, h, w, c = frames.shape
    out = np.empty((n, out_h, out_w, c), np.uint8)
    if lib is None:
        from PIL import Image
        for i in range(n):
            img = Image.fromarray(frames[i])
            out[i] = np.asarray(img.resize((out_w, out_h), Image.BILINEAR))
    else:
        lib.resize_bilinear_u8_batch(_u8ptr(frames), n, h, w, c,
                                     _u8ptr(out), out_h, out_w,
                                     1 if antialias else 0)
    return out[0] if single else out


def resize_bilinear_window(frames: np.ndarray, out_h: int, out_w: int,
                           y0: int, x0: int, wh: int, ww: int,
                           antialias: bool = True) -> np.ndarray:
    """resize (N,H,W,C) -> (out_h, out_w) then crop (y0, x0, wh, ww) —
    fused: only the surviving output window is computed (bit-identical
    to resize-then-crop; csrc resize_bilinear_u8_window)."""
    lib = get_lib()
    single = frames.ndim == 3
    if single:
        frames = frames[None]
    frames = np.ascontiguousarray(frames)
    n, h, w, c = frames.shape
    if lib is None:
        full = resize_bilinear(frames, out_h, out_w, antialias)
        out = np.ascontiguousarray(full[:, y0:y0 + wh, x0:x0 + ww])
    else:
        out = np.empty((n, wh, ww, c), np.uint8)
        lib.resize_bilinear_u8_window(_u8ptr(frames), n, h, w, c,
                                      _u8ptr(out), out_h, out_w,
                                      1 if antialias else 0,
                                      y0, x0, wh, ww)
    return out[0] if single else out


def crop(frames: np.ndarray, y0: int, x0: int, ch: int, cw: int) -> np.ndarray:
    lib = get_lib()
    frames = np.ascontiguousarray(frames)
    n, h, w, c = frames.shape
    if lib is None:
        return np.ascontiguousarray(frames[:, y0:y0 + ch, x0:x0 + cw])
    out = np.empty((n, ch, cw, c), np.uint8)
    lib.crop_u8(_u8ptr(frames), n, h, w, c, y0, x0, ch, cw, _u8ptr(out))
    return out


def normalize(frames: np.ndarray, mean: Sequence[float], std: Sequence[float],
              div255: bool = True) -> np.ndarray:
    lib = get_lib()
    frames = np.ascontiguousarray(frames)
    c = frames.shape[-1]
    if lib is None:
        x = frames.astype(np.float32)
        if div255:
            x /= 255.0
        return (x - np.asarray(mean, np.float32)) / np.asarray(std, np.float32)
    out = np.empty(frames.shape, np.float32)
    m = np.asarray(mean, np.float32)
    s = np.asarray(std, np.float32)
    lib.normalize_f32(_u8ptr(frames), _f32ptr(out),
                      frames.size // c, c, _f32ptr(m), _f32ptr(s),
                      1 if div255 else 0)
    return out
