"""Parity tests of the temporal samplers against the reference
implementation (models/tanet_models/video_dataset.py, Swin
transforms_backup.py), executed directly as an oracle with a stub
`decord` module.  Deterministic styles must match index-for-index
(including the +1-then-clamp decode quirk); random styles are checked
for invariants."""

import sys
import types
import numpy as np
import pytest

# Stub decord/mmcv so the reference modules import on this machine.
for name in ("decord",):
    if name not in sys.modules:
        sys.modules[name] = types.ModuleType(name)
sys.path.insert(0, "/root/reference")

from vitta_tpu.data import sampling


def _ref_tanet_sampler():
    from models.tanet_models.video_dataset import Video_TANetDataSet
    return Video_TANetDataSet


class _FakeRecord:
    def __init__(self, n):
        self.num_frames = n


def _mk_ref(clip_len, n_views=2):
    cls = _ref_tanet_sampler()
    obj = cls.__new__(cls)  # skip __init__ (it parses list files)
    obj.num_segments = clip_len
    obj.new_length = 1
    obj.n_tta_aug_views = n_views
    obj.dense_sample = False
    obj.test_sample = "uniform-1"
    return obj


FRAME_COUNTS = [3, 7, 15, 16, 17, 40, 63, 64, 65, 100, 250, 999]


@pytest.mark.parametrize("style", ["uniform", "dense", "uniform_equidist", "dense_equidist"])
@pytest.mark.parametrize("nf", FRAME_COUNTS)
def test_tta_view_styles_match_reference(style, nf):
    clip_len = 16
    ref = _mk_ref(clip_len)
    want = ref._sample_tta_augmented_views(_FakeRecord(nf), style)
    want = np.minimum(np.asarray(want), nf - 1)  # decode clamp video_dataset.py:328
    got = sampling.sample_tta_views(nf, clip_len, style, n_views=2)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("nf", FRAME_COUNTS)
def test_val_uniform_matches_reference(nf):
    clip_len = 16
    ref = _mk_ref(clip_len)
    want = np.minimum(np.asarray(ref._get_val_indices(_FakeRecord(nf))), nf - 1)
    got = sampling.sample_val_uniform(nf, clip_len)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("stylestr", ["uniform-1", "uniform-3", "dense-1", "dense-3"])
@pytest.mark.parametrize("nf", [15, 64, 100, 250])
def test_test_sampling_matches_reference(stylestr, nf):
    clip_len = 16
    ref = _mk_ref(clip_len)
    ref.test_sample = stylestr
    want = np.minimum(np.asarray(ref._get_test_indices(_FakeRecord(nf))), nf - 1)
    got = sampling.sample_test(nf, clip_len, stylestr)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("nf", FRAME_COUNTS)
def test_swin_seq_frames_matches_reference(nf):
    """get_seq_frames oracle (transforms_backup.py:550-569)."""
    clip_len = 16
    seg_size = float(nf - 1) / clip_len
    want = []
    for i in range(clip_len):
        start = int(np.round(seg_size * i))
        end = int(np.round(seg_size * (i + 1)))
        want.append((start + end) // 2)
    want = np.minimum(np.array(want), nf - 1)
    got = sampling.sample_seq_frames(nf, clip_len, test_mode=True)
    np.testing.assert_array_equal(got, want)


def test_random_styles_invariants():
    rng = np.random.default_rng(0)
    for nf in FRAME_COUNTS:
        for style in ["uniform_rand", "dense_rand", "random"]:
            idx = sampling.sample_tta_views(nf, 16, style, n_views=2, rng=rng)
            assert idx.shape == (16,)
            assert idx.min() >= 0 and idx.max() <= nf - 1
    # train TSN sampler
    for nf in FRAME_COUNTS:
        idx = sampling.sample_train_tsn(nf, 16, rng)
        assert idx.shape == (16,) and idx.max() <= nf - 1


def test_dense_clips_swin():
    got = sampling.sample_dense_clips_test(250, 16, frame_interval=2, num_clips=4)
    assert got.shape == (64,)
    assert got.max() <= 249
