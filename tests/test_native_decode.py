"""Native FFmpeg decoder (csrc/vitta_decode.cpp) round-trip tests.

The reference decodes with decord (requirements.txt:12;
models/tanet_models/video_dataset.py:320-341).  vitta_decode is the
first-party replacement; these tests are hermetic — the library's own
mpeg4/AVI encoder writes the fixture, so no binary assets are needed.
Gated on the library building (libav dev headers + g++)."""

import os

import numpy as np
import pytest

from vitta_tpu.data import native_decode

if not native_decode.available():
    pytest.skip("libav toolchain unavailable", allow_module_level=True)


def _frames(n=25, h=64, w=80):
    """Each frame is a distinct flat color ramp: frame i has mean
    intensity ~ 10*i + 20, so decoded frames identify their index even
    through lossy mpeg4 (tolerance ±4)."""
    out = np.empty((n, h, w, 3), np.uint8)
    for i in range(n):
        out[i] = np.uint8(min(20 + 9 * i, 235))
    return out


@pytest.fixture(scope="module")
def tiny_avi(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("vid") / "ramp.avi")
    native_decode.write_test_video(path, _frames(), fps=10, gop=7)
    return path


def test_frame_count_and_dims(tiny_avi):
    vr = native_decode.NativeVideoReader(tiny_avi)
    assert len(vr) == 25
    assert (vr.height, vr.width) == (64, 80)
    vr.close()


def test_random_access_matches_frame_identity(tiny_avi):
    """Out-of-order + repeated + backward indices land on the right
    frames (exercises the keyframe-seek path: gop=7 < span of jumps)."""
    vr = native_decode.NativeVideoReader(tiny_avi)
    idx = np.array([24, 0, 13, 13, 5, 20, 1])
    got = vr.get_batch(idx)
    assert got.shape == (7, 64, 80, 3)
    ref = _frames()
    for k, i in enumerate(idx):
        expect = float(ref[i].mean())
        assert abs(float(got[k].astype(np.float32).mean()) - expect) < 4.0, \
            f"index {i}: mean {got[k].mean():.1f} vs {expect:.1f}"
    vr.close()


def test_sequential_then_forward_decode(tiny_avi):
    vr = native_decode.NativeVideoReader(tiny_avi)
    a = vr.get_batch(np.arange(10))
    b = vr.get_batch(np.arange(10, 20))  # continues forward, no seek
    ref = _frames()
    for i in range(10):
        assert abs(float(a[i].mean()) - float(ref[i].mean())) < 4.0
        assert abs(float(b[i].mean()) - float(ref[10 + i].mean())) < 4.0
    vr.close()


def test_video_source_interface(tiny_avi):
    from vitta_tpu.data.video_reader import FFmpegVideoSource, make_video_source

    d, name = os.path.split(tiny_avi)
    src = make_video_source("video", d, "")
    assert isinstance(src, FFmpegVideoSource)
    n = src.num_frames(name)
    assert n == 25
    # overshoot clamps like the decord path (video_dataset.py:328)
    frames = src.get_batch(name, np.array([0, n - 1, n + 5]))
    assert frames.shape == (3, 64, 80, 3)
    np.testing.assert_array_equal(frames[1], frames[2])


def test_concurrent_source_access_is_safe(tiny_avi, tmp_path_factory):
    """The Prefetcher calls num_frames/get_batch from a thread pool
    (data/pipeline.py); the per-thread reader cache must keep threads
    off each other's native handles even when their video cursors
    interleave (pre-fix this was a use-after-free, ADVICE round 2)."""
    from concurrent.futures import ThreadPoolExecutor
    from vitta_tpu.data.video_reader import FFmpegVideoSource

    vid_dir = tmp_path_factory.mktemp("cvid")
    names = []
    for j in range(3):
        p = str(vid_dir / f"v{j}.avi")
        native_decode.write_test_video(p, _frames(n=15 + 5 * j), fps=10, gop=5)
        names.append(f"v{j}.avi")

    src = FFmpegVideoSource(str(vid_dir))
    ref = _frames(n=30)

    def work(seed):
        rng = np.random.default_rng(seed)
        for _ in range(20):
            name = names[rng.integers(len(names))]
            n = src.num_frames(name)
            idx = rng.integers(0, n, size=4)
            got = src.get_batch(name, idx)
            for k, i in enumerate(idx):
                assert abs(float(got[k].astype(np.float32).mean())
                           - float(ref[i].mean())) < 4.0
        return True

    with ThreadPoolExecutor(max_workers=4) as pool:
        assert all(pool.map(work, range(8)))
    src.close()


def test_source_close_and_reuse(tiny_avi):
    """close() releases every reader; a closed source reopens on next
    use instead of touching a dead handle, and works as a context
    manager."""
    from vitta_tpu.data.video_reader import FFmpegVideoSource

    d, name = os.path.split(tiny_avi)
    with FFmpegVideoSource(d) as src:
        assert src.num_frames(name) == 25
    assert src._open_readers == []
    # reuse after close: generation bump forces a fresh reader
    assert src.num_frames(name) == 25
    src.close()


def test_dataset_end_to_end_with_native_decode(tiny_avi, tmp_path):
    """The full TANet TTA dataset path on a real container: sample views,
    decode natively, crop/normalize — shapes and determinism."""
    from vitta_tpu.config import tanet_ucf101_preset
    from vitta_tpu.data.dataset import TANetVideoDataset
    from vitta_tpu.data.records import VideoRecord
    from vitta_tpu.data.video_reader import FFmpegVideoSource

    d, name = os.path.split(tiny_avi)
    cfg = tanet_ucf101_preset()
    rec = [VideoRecord(name, 25, 3)]
    ds = TANetVideoDataset(cfg, FFmpegVideoSource(d), rec, dataset_type="tta")
    s = ds[0]
    t = cfg.data.clip_length
    v = cfg.tta.n_augmented_views
    assert s.frames.shape == (v, t, cfg.data.input_size, cfg.data.input_size, 3)
    assert s.label == 3
    s2 = ds[0]
    np.testing.assert_array_equal(s.frames, s2.frames)  # per-index RNG


def test_paired_fused_decode_native(tiny_avi):
    """Union-decode equivalence over the real container: one get_batch
    on the sorted-unique tta+eval indices must reproduce the two-call
    PairedTTADataset output bit-for-bit (same keyframe-seek decode)."""
    from vitta_tpu.config import tanet_ucf101_preset
    from vitta_tpu.data.dataset import PairedTTADataset
    from vitta_tpu.data.records import VideoRecord
    from vitta_tpu.data.video_reader import FFmpegVideoSource

    d, name = os.path.split(tiny_avi)
    cfg = tanet_ucf101_preset()
    rec = [VideoRecord(name, 25, 3)]
    fused = PairedTTADataset(cfg, FFmpegVideoSource(d), rec, seed=7,
                             fuse_decode=True)
    plain = PairedTTADataset(cfg, FFmpegVideoSource(d), rec, seed=7,
                             fuse_decode=False)
    fa, fb, fl = fused[0]
    pa, pb, pl = plain[0]
    np.testing.assert_array_equal(fa, pa)
    np.testing.assert_array_equal(fb, pb)
    assert fl == pl


def test_forward_seek_bit_exact(tmp_path_factory):
    """Sparse forward access (which triggers the keyframe forward-skip)
    must produce bit-identical pixels to a full sequential decode —
    both paths decode the same reference chain from the same keyframe."""
    rng = np.random.default_rng(3)
    n, h, w = 100, 48, 64
    t = np.arange(n, dtype=np.float32)[:, None, None, None]
    base = (np.linspace(0, 255, h)[None, :, None, None]
            + np.linspace(0, 255, w)[None, None, :, None] + 5 * t) % 256
    frames = (base + rng.integers(0, 8, (n, h, w, 3))).astype(np.uint8)
    path = str(tmp_path_factory.mktemp("vid") / "long.avi")
    native_decode.write_test_video(path, frames, fps=25, gop=7)

    vr = native_decode.NativeVideoReader(path)
    full = vr.get_batch(np.arange(len(vr)))
    sparse = np.array([3, 40, 41, 95])       # gaps >> gop: seek path
    got = vr.get_batch(sparse)
    np.testing.assert_array_equal(got, full[sparse])
    # backward then sparse-forward again on the warm cursor
    got2 = vr.get_batch(np.array([10, 60]))
    np.testing.assert_array_equal(got2, full[[10, 60]])
    vr.close()
