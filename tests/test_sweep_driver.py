"""Driver-level corruption sweep end-to-end (ResultWriter rows, mean
aggregation) and the remaining group transforms."""

import dataclasses
import glob
import numpy as np

from vitta_tpu.cli.drivers import run_corruption_sweep
from vitta_tpu.cli.opts import get_opts
from vitta_tpu.data import transforms
from vitta_tpu.data.records import VideoRecord


def test_corruption_sweep_writes_rows(tmp_path):
    argv = ["--clip_length", "2", "--input_size", "32", "--scale_size", "40",
            "--result_dir", str(tmp_path), "--video_source", "synthetic",
            "--stat_reg", "BNS"]
    args, cfg = get_opts(argv)
    cfg = cfg.replace(model=dataclasses.replace(cfg.model, num_classes=4))
    records = [VideoRecord(f"v{i}", 40 + i, i % 4) for i in range(2)]
    results = run_corruption_sweep(cfg, ["gauss", "contrast"],
                                   source_kind="synthetic", records=records)
    assert set(results) == {"gauss", "contrast", "mean"}
    assert all(0.0 <= r[0] <= 100.0 for r in results.values())
    (result_file,) = glob.glob(str(tmp_path / "*_all_result"))
    lines = open(result_file).read().strip().splitlines()
    # config dump header then one row per corruption
    rows = [l for l in lines if l and not l.startswith(("{", "}", '"', " ", "#"))]
    assert len([l for l in lines if l.replace(".", "").replace(" ", "").isdigit()
                or (l.count(" ") == 0 and l.replace(".", "").isdigit())]) >= 0
    assert len(lines) >= 2  # header + rows


def test_oversample_10crop():
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, size=(2, 48, 64, 3), dtype=np.uint8)
    crops = transforms.oversample_10crop(frames, 32, scale_size=40)
    assert crops.shape == (10, 2, 32, 32, 3)
    # flip pairs mirror each other
    np.testing.assert_array_equal(crops[1], crops[0][:, :, ::-1])


def test_subgroupwise_hflip_label_guard():
    rng = np.random.default_rng(0)
    views = np.arange(2 * 2 * 4 * 4 * 3, dtype=np.uint8).reshape(2, 2, 4, 4, 3)
    # direction-sensitive label: never flipped
    out = transforms.subgroupwise_hflip(views, 86, transforms.SSV2_LABEL_FLIP, rng)
    np.testing.assert_array_equal(out, views)
    # plain label: with enough draws some view flips
    flipped_any = False
    for seed in range(5):
        out = transforms.subgroupwise_hflip(
            views, 0, transforms.SSV2_LABEL_FLIP, np.random.default_rng(seed))
        if not np.array_equal(out, views):
            flipped_any = True
    assert flipped_any
