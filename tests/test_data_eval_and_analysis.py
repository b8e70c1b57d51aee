"""Data-parallel sharded evaluation + model analysis utilities."""

import dataclasses
import numpy as np
import jax
import jax.numpy as jnp

from vitta_tpu.config import tanet_ucf101_preset
from vitta_tpu.data.dataset import TANetVideoDataset
from vitta_tpu.data.records import VideoRecord
from vitta_tpu.data.video_reader import SyntheticVideoSource
from vitta_tpu.models.tanet import TANet
from vitta_tpu.parallel.data_eval import sharded_validate
from vitta_tpu.parallel.mesh import make_mesh
from vitta_tpu.baselines import setup_baseline
from vitta_tpu.utils.analysis import count_params, model_analysis, param_table
import pytest

T, HW, K = 2, 32, 5


@pytest.mark.slow  # 8-device compile (~30 s)
def test_sharded_validate_matches_single_device():
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
    records = [VideoRecord(f"v{i}", 40 + 3 * i, i % K) for i in range(5)]
    ds = TANetVideoDataset(cfg, src, records, dataset_type="eval")

    mesh = make_mesh(2, ("data",))
    top1, top5 = sharded_validate(model, variables, ds, mesh, cfg,
                                  batch_size=2)
    ref = setup_baseline("source", model, cfg, variables).run(ds, batch_size=2)
    np.testing.assert_allclose(top1, ref, atol=1e-6)


def test_model_analysis_counts():
    model = TANet(num_classes=K, clip_length=T)
    rng = jax.random.PRNGKey(0)
    x0 = jnp.zeros((1, T, HW, HW, 3), jnp.float32)
    variables = model.init({"params": rng, "dropout": rng}, x0, train=False)
    info = model_analysis(variables)
    # TANet-R50: ~24M backbone + TAM params (K=5 head)
    assert 20_000_000 < info["total_params"] < 30_000_000
    from vitta_tpu.adapt.optim import tanet_trainable_mask
    info2 = model_analysis(variables,
                           trainable_mask=tanet_trainable_mask(variables["params"]))
    assert info2["trainable_params"] < info2["total_params"]
    table = param_table(variables["params"], max_rows=5)
    assert "base_model" in table
