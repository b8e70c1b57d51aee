"""ctypes bindings for the native video decoder (csrc/vitta_decode.cpp).

First-party replacement for decord (the reference's C++/FFmpeg decode
dependency: requirements.txt:12; used at
models/tanet_models/video_dataset.py:320-341).  The library links
against the system libav*/libswscale and is built on demand with g++;
when libav headers or the toolchain are absent, :func:`available`
returns False and callers fall back to another :class:`VideoSource`
backend.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "csrc", "vitta_decode.cpp")
_BUILD_DIR = os.path.join(_REPO_ROOT, "build")
_LIB_PATH = os.path.join(_BUILD_DIR, "libvitta_decode.so")
_LIBAV_FLAGS = ["-lavformat", "-lavcodec", "-lavutil", "-lswscale"]

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
    cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", _SRC,
           "-o", _LIB_PATH] + _LIBAV_FLAGS
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
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        # A stale/foreign .so (e.g. restored by git with an arbitrary
        # mtime, or built against different libav sonames) fails to
        # load; rebuild from source before giving up.
        path = build_library(force=True)
        if path is None:
            return None
        try:
            lib = ctypes.CDLL(path)
        except OSError:
            return None
    lib.vd_open.argtypes = [ctypes.c_char_p]
    lib.vd_open.restype = ctypes.c_void_p
    lib.vd_num_frames.argtypes = [ctypes.c_void_p]
    lib.vd_width.argtypes = [ctypes.c_void_p]
    lib.vd_height.argtypes = [ctypes.c_void_p]
    lib.vd_get_batch.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8)]
    lib.vd_close.argtypes = [ctypes.c_void_p]
    lib.vd_write_test_video.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int]
    _lib = lib
    return _lib


def available() -> bool:
    return get_lib() is not None


class NativeVideoReader:
    """decord.VideoReader-shaped wrapper over one open container."""

    def __init__(self, path: str):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native decoder unavailable (libav/g++ missing)")
        self._lib = lib
        self._h = lib.vd_open(path.encode())
        if not self._h:
            raise IOError(f"cannot open video: {path}")
        self.num_frames = lib.vd_num_frames(self._h)
        self.height = lib.vd_height(self._h)
        self.width = lib.vd_width(self._h)

    def __len__(self) -> int:
        return self.num_frames

    def get_batch(self, indices) -> np.ndarray:
        idx = np.ascontiguousarray(np.asarray(indices, np.int64))
        out = np.empty((len(idx), self.height, self.width, 3), np.uint8)
        rc = self._lib.vd_get_batch(
            self._h, idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(idx), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        if rc != 0:
            raise IOError(f"decode failed (rc={rc})")
        return out

    def close(self) -> None:
        if self._h:
            self._lib.vd_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def write_test_video(path: str, frames: np.ndarray, fps: int = 25,
                     gop: int = 12) -> None:
    """Encode (N, H, W, 3) uint8 RGB frames as an mpeg4 AVI (test support)."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native decoder unavailable")
    frames = np.ascontiguousarray(frames, np.uint8)
    n, h, w, c = frames.shape
    assert c == 3
    rc = lib.vd_write_test_video(
        path.encode(), frames.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n, h, w, fps, gop)
    if rc != 0:
        raise IOError(f"encode failed (rc={rc})")
