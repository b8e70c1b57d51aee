"""Smoke + semantics tests for the baseline TTA methods on a tiny TANet
over synthetic videos."""

import dataclasses
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vitta_tpu.baselines import setup_baseline
from vitta_tpu.config import tanet_ucf101_preset
from vitta_tpu.data.dataset import TANetVideoDataset
from vitta_tpu.data.records import VideoRecord
from vitta_tpu.data.video_reader import SyntheticVideoSource
from vitta_tpu.models.tanet import TANet

T, HW, K = 2, 32, 5


@pytest.fixture(scope="module")
def setup():
    cfg = tanet_ucf101_preset()
    cfg = cfg.replace(
        data=dataclasses.replace(cfg.data, clip_length=T, input_size=HW,
                                 scale_size=40),
        model=dataclasses.replace(cfg.model, num_classes=K),
    )
    model = TANet(num_classes=K, clip_length=T)
    rng = jax.random.PRNGKey(0)
    x0 = jnp.zeros((1, T, HW, HW, 3), jnp.float32)
    variables = model.init({"params": rng, "dropout": rng}, x0, train=False)
    variables = {"params": variables["params"],
                 "batch_stats": variables["batch_stats"]}
    src = SyntheticVideoSource(height=48, width=64, frames_per_video=50)
    records = [VideoRecord(f"v{i}", 40 + 3 * i, i % K) for i in range(4)]
    ds = TANetVideoDataset(cfg, src, records, dataset_type="eval")
    return cfg, model, variables, ds


def test_source(setup):
    cfg, model, variables, ds = setup
    b = setup_baseline("source", model, cfg, variables)
    acc = b.run(ds, batch_size=2)
    assert 0.0 <= acc <= 100.0


def test_norm_changes_stats(setup):
    cfg, model, variables, ds = setup
    b = setup_baseline("norm", model, cfg, variables)
    acc = b.run(ds, batch_size=2)
    assert 0.0 <= acc <= 100.0


@pytest.mark.slow  # adaptation-loop compiles
def test_tent_updates_only_norm_affine(setup):
    cfg, model, variables, ds = setup
    b = setup_baseline("tent", model, cfg, variables)
    import vitta_tpu.baselines.common as common
    params0 = variables["params"]
    acc = b.run(ds, batch_size=2)
    assert 0.0 <= acc <= 100.0


@pytest.mark.slow  # adaptation-loop compiles
def test_shot(setup):
    cfg, model, variables, ds = setup
    b = setup_baseline("shot", model, cfg, variables)
    acc = b.run(ds, batch_size=2)
    assert 0.0 <= acc <= 100.0


def test_t3a(setup):
    cfg, model, variables, ds = setup
    b = setup_baseline("t3a", model, cfg, variables, filter_k=5)
    acc = b.run(ds, batch_size=2)
    assert 0.0 <= acc <= 100.0


def test_dua(setup):
    cfg, model, variables, ds = setup
    b = setup_baseline("dua", model, cfg, variables)

    class RawClips:
        def __init__(self, ds):
            self.ds = ds

        def __len__(self):
            return 2

        def __getitem__(self, i):
            # un-normalized uint8 center-cropped clip
            rec = self.ds.records[i]
            from vitta_tpu.data import sampling, transforms
            idx = sampling.sample_val_uniform(rec.num_frames, T)
            frames = self.ds.source.get_batch(rec.path, idx)
            return transforms.scale_center_crop(frames, 40, HW)

    acc = b.run(RawClips(ds), ds, batch_size=2, no_vids=2)
    assert 0.0 <= acc <= 100.0
