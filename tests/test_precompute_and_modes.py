"""Tests: source-stat precompute (+ reference .npy round-trip), BNS and
before_norm regularization modes, epoch-style adaptation, relation ops."""

import dataclasses
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from vitta_tpu.adapt.engine import VittaEngine, flatten_taps
from vitta_tpu.adapt.loops import tta_epoch_adapt
from vitta_tpu.adapt.precompute import (compute_source_statistics,
                                        save_source_statistics,
                                        load_source_statistics_npz)
from vitta_tpu.config import tanet_ucf101_preset
from vitta_tpu.models.tanet import TANet
from vitta_tpu.utils.checkpoint import load_reference_stats, tanet_norm_layers
from vitta_tpu.ops import relation

T, HW, K, V = 2, 32, 5, 2


def tiny_cfg(**tta):
    cfg = tanet_ucf101_preset()
    return cfg.replace(
        data=dataclasses.replace(cfg.data, clip_length=T, input_size=HW,
                                 scale_size=HW),
        model=dataclasses.replace(cfg.model, num_classes=K),
        tta=dataclasses.replace(cfg.tta, **tta),
    )


@pytest.fixture(scope="module")
def model_and_vars():
    model = TANet(num_classes=K, clip_length=T)
    rng = jax.random.PRNGKey(0)
    x0 = jnp.zeros((V, T, HW, HW, 3), jnp.float32)
    variables = model.init({"params": rng, "dropout": rng}, x0, train=False)
    return model, {"params": variables["params"],
                   "batch_stats": variables["batch_stats"]}


def test_precompute_and_roundtrip(model_and_vars, tmp_path):
    model, variables = model_and_vars
    rng = np.random.default_rng(0)

    def data_iter():
        for _ in range(3):
            yield (rng.normal(size=(2, T, HW, HW, 3)).astype(np.float32),
                   np.zeros(2, np.int32))

    bn2d = {n for n, kind in tanet_norm_layers() if kind == "bn2d"}
    stats = compute_source_statistics(model, variables, data_iter(),
                                      tap_filter=lambda n: n in bn2d)
    assert set(stats) == bn2d and len(bn2d) == 53
    c_mean, c_var = stats["base_model.layer3_0.bn1"]
    assert c_mean.shape == (256,) and np.all(c_var >= -1e-6)

    mp, vp, npz = save_source_statistics(stats, "tanet", str(tmp_path), tag="t")
    # reference-format round trip in choose_layers order
    loaded = load_reference_stats(mp, vp, "tanet")
    assert set(loaded) == bn2d
    np.testing.assert_allclose(loaded["base_model.layer3_0.bn1"][0], c_mean)
    # npz round trip
    loaded2 = load_source_statistics_npz(npz)
    np.testing.assert_allclose(loaded2["base_model.layer3_0.bn1"][1], c_var)


def test_weighted_accumulation_matches_reference_meter(model_and_vars):
    """AverageMeter weighting: avg = sum(val*n)/sum(n) (basics.py:298-300)."""
    model, variables = model_and_vars
    batches = [np.random.default_rng(i).normal(
        size=(1 + i, T, HW, HW, 3)).astype(np.float32) for i in range(2)]

    stats = compute_source_statistics(
        model, variables, ((b, None) for b in batches),
        tap_filter=lambda n: n == "base_model.bn1")
    taps = []
    for b in batches:
        _, aux = model.apply(variables, jnp.asarray(b), train=False,
                             mutable=["taps"])
        taps.append(flatten_taps(aux["taps"])["base_model.bn1"])
    want = (np.asarray(taps[0].mean) * 1 + np.asarray(taps[1].mean) * 2) / 3
    np.testing.assert_allclose(stats["base_model.bn1"][0], want, rtol=1e-4, atol=1e-7)


@pytest.mark.slow  # engine compiles (~35 s each)
def test_bns_mode_runs(model_and_vars):
    model, variables = model_and_vars
    cfg = tiny_cfg(stat_reg="BNS")
    eng = VittaEngine(model, cfg, variables, None, donate=False)
    assert len(eng.tap_names) > 0
    state = eng.init_state()
    rng = np.random.default_rng(1)
    views = jnp.asarray(rng.normal(size=(V, T, HW, HW, 3)).astype(np.float32))
    clip = jnp.asarray(rng.normal(size=(1, T, HW, HW, 3)).astype(np.float32))
    state, m = eng.adapt_eval_step(state, views, clip, jnp.asarray([0]),
                                   jax.random.PRNGKey(0))
    assert np.isfinite(float(m.loss_reg))


@pytest.mark.slow  # engine compiles (~35 s each)
def test_before_norm_mode(model_and_vars):
    model, variables = model_and_vars
    # source stats from input-side taps of a clean forward
    x = jax.random.normal(jax.random.PRNGKey(1), (V, T, HW, HW, 3))
    _, aux = model.apply(variables, x, train=False, mutable=["taps"])
    src = {n: (np.asarray(s.mean), np.asarray(s.var))
           for n, s in flatten_taps(aux["taps"], leaf="stat_in").items()
           if "g_bn" not in n and "l_bn" not in n}
    cfg = tiny_cfg(before_norm=True)
    eng = VittaEngine(model, cfg, variables, src, donate=False)
    assert eng.tap_leaf == "stat_in"
    state = eng.init_state()
    state, m = eng.adapt_eval_step(
        state, x, x[:1], jnp.asarray([0]), jax.random.PRNGKey(2))
    assert np.isfinite(float(m.loss_reg))


@pytest.mark.slow  # engine compiles (~35 s each)
def test_epoch_style_adaptation(model_and_vars):
    model, variables = model_and_vars
    x = jax.random.normal(jax.random.PRNGKey(1), (V, T, HW, HW, 3))
    _, aux = model.apply(variables, x, train=False, mutable=["taps"])
    src = {n: (np.asarray(s.mean), np.asarray(s.var))
           for n, s in flatten_taps(aux["taps"]).items()
           if "g_bn" not in n and "l_bn" not in n}
    cfg = tiny_cfg()
    eng = VittaEngine(model, cfg, variables, src, donate=False)
    rng = np.random.default_rng(3)

    class Item:
        def __init__(self, i):
            self.frames = rng.normal(size=(1, T, HW, HW, 3)).astype(np.float32)
            self.label = i % K

    tta_items = [(rng.normal(size=(V, T, HW, HW, 3)).astype(np.float32),
                  None, np.asarray([i % K], np.int32)) for i in range(2)]
    top1, state = tta_epoch_adapt(eng, tta_items, [Item(i) for i in range(2)])
    assert 0.0 <= top1 <= 100.0 and int(state.step) == 2


def test_relation_ops_match_torch():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 5, 7)).astype(np.float32)  # (N, E, D)
    got = np.asarray(relation.upper_triangle_cosine(jnp.asarray(x)))
    t = torch.from_numpy(x)
    i1, i2 = relation.upper_triangle_idx(5)
    want = F.cosine_similarity(t[:, i1, :], t[:, i2, :], dim=-1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)

    sym = rng.normal(size=(2, 4, 4)).astype(np.float32)
    got_map = np.asarray(relation.exp_norm_relation_map(jnp.asarray(sym)))
    ex = np.exp(sym)
    want_map = ex / ex.sum(2, keepdims=True)
    np.testing.assert_allclose(got_map, want_map, rtol=1e-5)

    feat = rng.normal(size=(2, T, 4, 4, 6)).astype(np.float32)  # N,T,H,W,C
    sim = np.asarray(relation.pairwise_similarity(jnp.asarray(feat), "spatiotemp"))
    assert sim.shape == ((T * 16) * (T * 16 - 1) // 2,)
    rm = np.asarray(relation.relation_map(jnp.asarray(feat), "temp"))
    assert rm.shape == (T, T)
