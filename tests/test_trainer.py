"""Trainer + checkpoint save/resume + cossim precompute tests."""

import dataclasses
import numpy as np
import jax
import jax.numpy as jnp

from vitta_tpu.adapt.train import Trainer, save_checkpoint, restore_checkpoint
from vitta_tpu.adapt.precompute import compute_cossim_statistics
from vitta_tpu.models.tanet import TANet
import pytest

T, HW, K = 2, 32, 5


def _model_and_vars():
    model = TANet(num_classes=K, clip_length=T)
    rng = jax.random.PRNGKey(0)
    x0 = jnp.zeros((2, T, HW, HW, 3), jnp.float32)
    variables = model.init({"params": rng, "dropout": rng}, x0, train=False)
    return model, {"params": variables["params"],
                   "batch_stats": variables["batch_stats"]}


@pytest.mark.slow  # train-step compile (~60 s)
def test_train_step_learns_and_updates_bn(tmp_path):
    model, variables = _model_and_vars()
    trainer = Trainer(model, lr=1e-2, steps_per_epoch=4)
    # snapshot before training: the step donates its input state, which
    # aliases these arrays
    m0 = np.asarray(variables["batch_stats"]["base_model"]["bn1"]["mean"]).copy()
    state = trainer.init_state(variables)
    rng = np.random.default_rng(0)
    data = [(rng.normal(size=(2, T, HW, HW, 3)).astype(np.float32),
             np.asarray([i % K, (i + 1) % K], np.int32)) for i in range(3)]
    state, metrics = trainer.train_epoch(state, data, jax.random.PRNGKey(1))
    assert np.isfinite(metrics["loss"]) and int(state.step) == 3
    # BN running stats updated during training
    m1 = state.batch_stats["base_model"]["bn1"]["mean"]
    assert not np.allclose(m0, np.asarray(m1))

    # checkpoint round trip
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, {"params": state.params, "step": int(state.step)})
    restored = restore_checkpoint(path)
    np.testing.assert_allclose(
        np.asarray(restored["params"]["new_fc"]["bias"]),
        np.asarray(state.params["new_fc"]["bias"]))
    assert restored["step"] == 3


def test_lr_schedule_decays():
    from vitta_tpu.adapt.train import step_decay_schedule
    sched = step_decay_schedule(1.0, (2, 4), steps_per_epoch=10)
    assert float(sched(0)) == 1.0
    assert abs(float(sched(25)) - 0.1) < 1e-6
    assert abs(float(sched(45)) - 0.01) < 1e-7


def test_cossim_precompute():
    model, variables = _model_and_vars()
    rng = np.random.default_rng(0)
    data = [(rng.normal(size=(1, T, HW, HW, 3)).astype(np.float32), None)
            for _ in range(2)]
    sims = compute_cossim_statistics(
        model, variables, iter(data), clip_len=T, stat_type="temp",
        tap_filter=lambda n: "layer4_2.bn3" in n)
    (name, vec), = sims.items()
    assert "layer4_2.bn3" in name
    assert vec.shape == (T * (T - 1) // 2,)
    assert np.all(np.abs(vec) <= 1.0 + 1e-5)
