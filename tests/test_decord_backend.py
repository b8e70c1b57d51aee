"""Decord-backend integration, gated on decord availability (the package
is not in this image — SURVEY.md §2.8; reference requirement
requirements.txt:12).  When decord is present, round-trip a real
container through DecordVideoSource and check the index-clamp decode
semantics (tanet_models/video_dataset.py:320-341)."""

import os

import numpy as np
import pytest

decord = pytest.importorskip("decord")


@pytest.fixture(scope="module")
def tiny_video(tmp_path_factory):
    """Write a tiny mp4 via imageio/ffmpeg if available, else skip."""
    iio = pytest.importorskip("imageio.v2")
    path = str(tmp_path_factory.mktemp("vid") / "tiny.mp4")
    rng = np.random.default_rng(0)
    frames = [rng.integers(0, 255, size=(32, 48, 3), dtype=np.uint8)
              for _ in range(12)]
    try:
        iio.mimwrite(path, frames, fps=8, codec="libx264")
    except Exception as e:  # no ffmpeg backend
        pytest.skip(f"cannot encode test video: {e}")
    return path


def test_decord_source_roundtrip(tiny_video):
    from vitta_tpu.data.video_reader import DecordVideoSource

    src = DecordVideoSource(os.path.dirname(tiny_video))
    name = os.path.basename(tiny_video)
    n = src.num_frames(name)
    assert n >= 10
    idx = np.array([0, 1, 5, n - 1, n + 3])   # overshoot must clamp
    frames = src.get_batch(name, idx)
    assert frames.shape[0] == len(idx)
    assert frames.dtype == np.uint8
    np.testing.assert_array_equal(frames[3], frames[4])  # clamped


def test_backend_selection_prefers_available():
    """make_video_source('decord') returns the decord backend when the
    module imports; the CLI default path is exercised either way."""
    from vitta_tpu.data.video_reader import (DecordVideoSource,
                                             make_video_source)

    src = make_video_source("decord", "", "")
    assert isinstance(src, DecordVideoSource)
