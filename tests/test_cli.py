"""End-to-end CLI dispatcher tests on synthetic data (the framework's
--debug smoke path)."""

import dataclasses
import numpy as np

from vitta_tpu.cli.opts import get_opts
from vitta_tpu.cli.drivers import run_corruption_sweep
from vitta_tpu.cli.main_eval import evaluate, run_compute_stats
from vitta_tpu.data.records import VideoRecord
import pytest

T, HW = 2, 32


def tiny_cfg_via_flags(extra=()):
    argv = ["--clip_length", str(T), "--input_size", str(HW),
            "--scale_size", "40", "--result_dir", "/tmp/vitta_cli_test",
            "--video_source", "synthetic", "--dataset", "ucf101",
            *extra]
    args, cfg = get_opts(argv)
    return args, cfg


def records(n=2):
    return [VideoRecord(f"v{i}", 40 + 3 * i, i % 5) for i in range(n)]


def test_flags_roundtrip():
    args, cfg = tiny_cfg_via_flags(["--lambda_pred_consis", "0.05",
                                    "--chosen_blocks", "layer4",
                                    "--momentum_mvg", "0.2"])
    assert cfg.tta.lambda_pred_consis == 0.05
    assert cfg.tta.chosen_blocks == ("layer4",)
    assert cfg.tta.momentum_mvg == 0.2
    assert cfg.model.num_classes == 101
    assert cfg.data.clip_length == T


@pytest.mark.slow  # engine compile (~90 s)
def test_evaluate_tta_bns_synthetic():
    # BNS mode needs no precomputed stats file -> exercises the full TTA
    # dispatcher without fixtures
    args, cfg = tiny_cfg_via_flags(["--stat_reg", "BNS"])
    cfg = cfg.replace(model=dataclasses.replace(cfg.model, num_classes=5))
    rows, state = evaluate(cfg, "gauss", source_kind="synthetic",
                           records=records(2))
    assert len(rows) == 1 and 0.0 <= rows[0] <= 100.0


def test_evaluate_baseline_synthetic():
    args, cfg = tiny_cfg_via_flags(["--tta", "false", "--baseline", "source",
                                    "--batch_size", "2"])
    cfg = cfg.replace(model=dataclasses.replace(cfg.model, num_classes=5))
    rows, _ = evaluate(cfg, "gauss", source_kind="synthetic",
                       records=records(2))
    assert 0.0 <= rows[0] <= 100.0


def test_compute_stats_cli(tmp_path):
    args, cfg = tiny_cfg_via_flags(["--batch_size", "2"])
    cfg = cfg.replace(model=dataclasses.replace(cfg.model, num_classes=5))
    paths = run_compute_stats(cfg, source_kind="synthetic",
                              records=records(2), out_dir=str(tmp_path))
    mp, vp, npz = paths
    means = np.load(mp, allow_pickle=True)
    assert len(means) == 53  # BN2d count of TANet-R50
