"""SSv2-C / Kinetics-400-C presets, drivers and the flip label map.

The reference ships UCF101 drivers only; its per-arch hyperparameters
are dataset-independent (tta_swin_ucf101.py:27-40) and the class counts
come from corpus/main_eval.py:39-47.  SSv2's direction-sensitive classes
swap labels under horizontal flip (utils/utils_.py:134-142)."""

import dataclasses

import numpy as np
import pytest

from vitta_tpu.cli.opts import get_opts
from vitta_tpu.cli.main_eval import evaluate
from vitta_tpu.config import (kinetics_preset, label_flip_map,
                              num_classes_for, ssv2_preset)
from vitta_tpu.data import transforms
from vitta_tpu.data.records import VideoRecord

T, HW = 2, 32


def test_ssv2_preset_fields():
    cfg = ssv2_preset()
    assert cfg.data.dataset == "somethingv2"
    assert cfg.model.arch == "videoswintransformer"
    assert cfg.model.num_classes == 174
    # Swin per-arch overrides carry over (tta_swin_ucf101.py:27-40)
    assert cfg.optim.lr == 1e-5
    assert cfg.tta.lambda_pred_consis == 0.05
    assert cfg.tta.momentum_mvg == 0.05
    assert "backbone.layers.2" in cfg.tta.chosen_blocks

    tanet = ssv2_preset(arch="tanet")
    assert tanet.model.num_classes == 174
    assert tanet.optim.lr == 5e-5
    assert tanet.tta.chosen_blocks == ("layer3", "layer4")


def test_kinetics_preset_fields():
    cfg = kinetics_preset()
    assert cfg.data.dataset == "kinetics"
    assert cfg.model.num_classes == 400
    assert kinetics_preset(arch="tanet").model.num_classes == 400


def test_label_flip_map():
    assert label_flip_map("ucf101") is None
    assert label_flip_map("kinetics") is None
    m = label_flip_map("somethingv2")
    assert m == {86: 87, 87: 86, 93: 94, 94: 93, 166: 167, 167: 166}


def test_cli_dataset_flag_wires_classes():
    for ds in ("somethingv2", "kinetics"):
        _, cfg = get_opts(["--dataset", ds, "--video_source", "synthetic"])
        assert cfg.model.num_classes == num_classes_for(ds)
        assert cfg.data.dataset == ds


def test_hflip_swap_mode():
    frames = np.arange(2 * 4 * 4 * 3, dtype=np.uint8).reshape(2, 4, 4, 3)
    m = label_flip_map("somethingv2")
    # force a flip (flip_ratio=1): mapped label must swap, frames flip
    out, lab = transforms.hflip_with_label(
        frames, 86, m, np.random.default_rng(0), flip_ratio=1.0, mode="swap")
    assert lab == 87
    np.testing.assert_array_equal(out, frames[:, :, ::-1])
    # unmapped label unchanged
    _, lab2 = transforms.hflip_with_label(
        frames, 3, m, np.random.default_rng(0), flip_ratio=1.0, mode="swap")
    assert lab2 == 3
    # no flip drawn -> no swap
    _, lab3 = transforms.hflip_with_label(
        frames, 86, m, np.random.default_rng(0), flip_ratio=0.0, mode="swap")
    assert lab3 == 86
    # skip mode never flips mapped labels
    out4, lab4 = transforms.hflip_with_label(
        frames, 86, m, np.random.default_rng(0), flip_ratio=1.0, mode="skip")
    assert lab4 == 86
    np.testing.assert_array_equal(out4, frames)


def test_train_augment_shapes_and_swap():
    rng = np.random.default_rng(1)
    frames = rng.integers(0, 256, size=(3, 40, 52, 3), dtype=np.uint8)
    m = label_flip_map("somethingv2")
    flipped = 0
    for seed in range(8):
        out, lab = transforms.train_augment(
            frames, 93, 32, np.random.default_rng(seed), m)
        assert out.shape == (3, 32, 32, 3)
        assert lab in (93, 94)
        flipped += lab == 94
    assert 0 < flipped < 8  # flips are drawn at p=0.5


@pytest.mark.slow  # engine compile
def test_evaluate_tta_ssv2_synthetic():
    """--dataset somethingv2 runs the synthetic TTA e2e path green."""
    argv = ["--clip_length", str(T), "--input_size", str(HW),
            "--scale_size", "40", "--result_dir", "/tmp/vitta_ssv2_test",
            "--video_source", "synthetic", "--dataset", "somethingv2",
            "--stat_reg", "BNS"]
    _, cfg = get_opts(argv)
    assert cfg.model.num_classes == 174
    cfg = cfg.replace(model=dataclasses.replace(cfg.model, num_classes=7))
    records = [VideoRecord(f"v{i}", 40 + 3 * i, i % 7) for i in range(2)]
    rows, _ = evaluate(cfg, "gauss", source_kind="synthetic",
                       records=records)
    assert len(rows) == 1 and 0.0 <= rows[0] <= 100.0


def test_evaluate_baseline_kinetics_synthetic():
    argv = ["--clip_length", str(T), "--input_size", str(HW),
            "--scale_size", "40", "--result_dir", "/tmp/vitta_k400_test",
            "--video_source", "synthetic", "--dataset", "kinetics",
            "--tta", "false", "--baseline", "source", "--batch_size", "2"]
    _, cfg = get_opts(argv)
    assert cfg.model.num_classes == 400
    cfg = cfg.replace(model=dataclasses.replace(cfg.model, num_classes=7))
    records = [VideoRecord(f"v{i}", 40 + 3 * i, i % 7) for i in range(2)]
    rows, _ = evaluate(cfg, "gauss", source_kind="synthetic",
                       records=records)
    assert 0.0 <= rows[0] <= 100.0
