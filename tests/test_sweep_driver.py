"""Driver-level corruption sweep end-to-end (ResultWriter rows, mean
aggregation) and the remaining group transforms."""

import dataclasses
import glob
import numpy as np

from vitta_tpu.cli.drivers import run_corruption_sweep
from vitta_tpu.cli.opts import get_opts
from vitta_tpu.data import transforms
from vitta_tpu.data.records import VideoRecord
import pytest


@pytest.mark.slow  # two-corruption sweep compile (~2 min)
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


def test_parallel_sweep_groups_without_padding(tmp_path, monkeypatch):
    """12 corruptions on an 8-device mesh must run as groups of 8 + 4 —
    no padded duplicate streams (each stream is a full adaptation run;
    padding wasted whole streams in round 1)."""
    import vitta_tpu.cli.drivers as drivers
    import vitta_tpu.parallel.streams as streams

    argv = ["--clip_length", "2", "--input_size", "32", "--scale_size", "40",
            "--result_dir", str(tmp_path), "--video_source", "synthetic",
            "--stat_reg", "BNS"]
    args, cfg = get_opts(argv)
    cfg = cfg.replace(model=dataclasses.replace(cfg.model, num_classes=4))
    records = [VideoRecord(f"v{i}", 40 + i, i % 4) for i in range(2)]

    group_sizes = []

    def fake_run(engine, mesh, group, seed=0, logger=None,
                 checkpointer=None):
        group_sizes.append((len(group), mesh.devices.size))
        return [float(10 * len(group) + k) for k in range(len(group))], None

    # the driver imports run_parallel_streams lazily at call time — patch
    # the defining module
    monkeypatch.setattr(streams, "run_parallel_streams", fake_run)
    corruptions = [f"c{i}" for i in range(12)]
    results = drivers.run_parallel_sweep(cfg, corruptions,
                                         source_kind="synthetic",
                                         records=records)
    assert group_sizes == [(8, 8), (4, 4)]      # mesh sized to the group
    assert set(results) == set(corruptions) | {"mean"}
    # per-stream results map back to their corruption in order
    assert results["c0"] == [80.0] and results["c8"] == [40.0]


def test_sweep_resume(tmp_path, monkeypatch):
    """--resume skips corruptions checkpointed in sweep_state.json and
    replays their rows; without the flag the state is ignored."""
    from vitta_tpu.cli import drivers

    calls = []

    def fake_eval(cfg, corruption, **kw):
        calls.append(corruption)
        return [42.0 + len(calls)], None

    monkeypatch.setattr(drivers, "evaluate", fake_eval)
    argv = ["--result_dir", str(tmp_path), "--resume"]
    _, cfg = drivers_opts(argv)
    r1 = drivers.run_corruption_sweep(cfg, ["gauss"], source_kind="synthetic",
                                      records=[])
    assert calls == ["gauss"] and r1["gauss"] == [43.0]
    assert (tmp_path / "sweep_state.json").exists()

    # resumed run over a longer list: gauss replayed, contrast evaluated
    r2 = drivers.run_corruption_sweep(cfg, ["gauss", "contrast"],
                                      source_kind="synthetic", records=[])
    assert calls == ["gauss", "contrast"]
    assert r2["gauss"] == [43.0] and r2["contrast"] == [44.0]

    # without --resume the sweep starts from scratch
    _, cfg_fresh = drivers_opts(["--result_dir", str(tmp_path)])
    drivers.run_corruption_sweep(cfg_fresh, ["gauss"],
                                 source_kind="synthetic", records=[])
    assert calls == ["gauss", "contrast", "gauss"]


def drivers_opts(argv):
    from vitta_tpu.cli.opts import get_opts
    return get_opts(argv)
