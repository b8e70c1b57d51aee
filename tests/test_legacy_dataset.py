"""LegacyVideoDataset config wiring + loud misconfiguration failures.

The legacy loaders reproduce the reference's deprecated I3D-era
datasets (datasets_/video_dataset.py:30-312) whose sampler is picked by
the undeclared ``args.tsn_style`` flag (corpus/basics.py:1372).  The
rebuild's ``cfg.data.tsn_style`` must reach the dataset through every
construction path, including the class-only ``dataset_cls_for`` route
(round-4 advisor finding: the knob was dead)."""

import dataclasses

import numpy as np
import pytest

from vitta_tpu.config import tanet_ucf101_preset
from vitta_tpu.data import sampling
from vitta_tpu.data.dataset import (LegacyVideoDataset, PairedTTADataset,
                                    TANetVideoDataset, dataset_cls_for)
from vitta_tpu.data.records import VideoRecord
from vitta_tpu.data.video_reader import SyntheticVideoSource

T, HW = 2, 32


def tiny_cfg(**data_kw):
    cfg = tanet_ucf101_preset()
    return cfg.replace(
        data=dataclasses.replace(cfg.data, clip_length=T, input_size=HW,
                                 scale_size=40, **data_kw))


def records(n=2):
    return [VideoRecord(f"vid{i}", 50 + 7 * i, i % 3) for i in range(n)]


def src():
    return SyntheticVideoSource(height=48, width=64, frames_per_video=60)


def test_tsn_style_config_knob_reaches_sampler():
    """cfg.data.tsn_style=False selects sample_legacy_consecutive even
    when the dataset is built without an explicit tsn_style argument."""
    recs = records()
    ds_tsn = LegacyVideoDataset(tiny_cfg(tsn_style=True), src(), recs)
    ds_consec = LegacyVideoDataset(tiny_cfg(tsn_style=False), src(), recs)
    assert ds_tsn.tsn_style is True
    assert ds_consec.tsn_style is False
    idx_tsn, _ = ds_tsn.sample_indices(0)
    idx_consec, _ = ds_consec.sample_indices(0)
    n = recs[0].num_frames
    np.testing.assert_array_equal(
        idx_tsn, sampling.sample_legacy_tsn(n, T, ds_tsn.num_clips,
                                            test_mode=True))
    np.testing.assert_array_equal(
        idx_consec,
        sampling.sample_legacy_consecutive(n, T, ds_consec.frame_interval,
                                           ds_consec.num_clips,
                                           test_mode=True))
    # the two samplers genuinely differ on this video, so the knob is live
    assert not np.array_equal(idx_tsn, idx_consec)


def test_tsn_style_explicit_arg_overrides_config():
    ds = LegacyVideoDataset(tiny_cfg(tsn_style=True), src(), records(),
                            tsn_style=False)
    assert ds.tsn_style is False


def test_paired_tta_dataset_routes_config_knob():
    """PairedTTADataset passes only the class; the knob must still land."""
    paired = PairedTTADataset(tiny_cfg(tsn_style=False), src(), records(),
                              dataset_cls=LegacyVideoDataset)
    assert paired.tta.tsn_style is False
    assert paired.eval.tsn_style is False
    views, clip, label = paired[0]
    assert views.ndim == 5 and clip.ndim == 5  # (clips, T, S, S, 3)


def test_dataset_cls_for_rejects_legacy_tanet():
    with pytest.raises(ValueError, match="legacy_loader"):
        dataset_cls_for("tanet", legacy_loader=True)
    assert dataset_cls_for("tanet", legacy_loader=False) is TANetVideoDataset
    assert dataset_cls_for("i3d_resnet50",
                           legacy_loader=True) is LegacyVideoDataset


def test_legacy_dataset_type_validation():
    with pytest.raises(ValueError, match="dataset_type"):
        LegacyVideoDataset(tiny_cfg(), src(), records(),
                           dataset_type="bogus")
    # 'tta' intentionally aliases the deterministic eval pipeline
    ds_tta = LegacyVideoDataset(tiny_cfg(), src(), records(),
                                dataset_type="tta")
    ds_eval = LegacyVideoDataset(tiny_cfg(), src(), records(),
                                 dataset_type="eval")
    np.testing.assert_array_equal(ds_tta[0].frames, ds_eval[0].frames)
