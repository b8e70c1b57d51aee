"""Statistic-type parameterization: channel_stats' spatial/temp/temp_v2
reductions against the reference hook math (ComputeNormStatsHook.
compute_stat_for_NCTHW, norm_stats_utils.py:80-98), the per-type taps in
the norm layers, and the per-type .npy save/load round-trip."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp
from flax import linen as nn

from vitta_tpu.models.layers import BatchNorm, LayerNorm, tap_leaf_name
from vitta_tpu.ops.stats import channel_stats

N, T, H, W, C = 2, 4, 5, 6, 8


def _ref_stats(feat_ncthw: torch.Tensor, stat_type: str):
    """The reference math, verbatim semantics."""
    n, c, t, h, w = feat_ncthw.shape
    o = feat_ncthw
    if stat_type == "spatiotemp":
        return (o.mean((0, 2, 3, 4)),
                o.permute(1, 0, 2, 3, 4).reshape(c, -1).var(1, unbiased=False))
    if stat_type == "spatial":
        return (o.mean((0, 3, 4)),
                o.permute(1, 2, 0, 3, 4).reshape(c, t, -1).var(-1, unbiased=False))
    if stat_type == "temp":
        return (o.mean((0, 2)),
                o.permute(1, 3, 4, 0, 2).reshape(c, h, w, -1).var(-1, unbiased=False))
    if stat_type == "temp_v2":
        o = o.mean((3, 4))
        return (o.mean((0, 2)),
                o.permute(1, 0, 2).reshape(c, -1).var(1, unbiased=False))
    raise ValueError(stat_type)


@pytest.mark.parametrize("stat_type", ["spatiotemp", "spatial", "temp", "temp_v2"])
def test_channel_stats_matches_reference_math(stat_type):
    rng = np.random.default_rng(0)
    x = rng.normal(size=(N, T, H, W, C)).astype(np.float32)  # channels-last
    xt = torch.from_numpy(np.transpose(x, (0, 4, 1, 2, 3)))  # NCTHW
    want_m, want_v = _ref_stats(xt, stat_type)
    got = channel_stats(jnp.asarray(x), stat_type=stat_type, time_axis=1)
    np.testing.assert_allclose(np.asarray(got.mean), want_m.numpy(),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got.var), want_v.numpy(),
                               rtol=1e-4, atol=1e-6)


def test_batchnorm_typed_taps_2d_feature():
    """BN on a folded (N*T, H, W, C) feature unfolds by clip_len for the
    time-resolved types (the reference hook's BN2d reshape,
    norm_stats_utils.py:59-64)."""
    bn = BatchNorm(C, stat_types=("spatiotemp", "spatial", "temp", "temp_v2"),
                   clip_len=T)
    x = jnp.asarray(np.random.default_rng(1).normal(
        size=(N * T, H, W, C)).astype(np.float32))
    variables = bn.init(jax.random.PRNGKey(0), x)
    y, aux = bn.apply(variables, x, mutable=["taps"])
    taps = aux["taps"]
    assert taps["stat"].mean.shape == (C,)
    assert taps["stat_spatial"].mean.shape == (C, T)
    assert taps["stat_temp"].mean.shape == (C, H, W)
    assert taps["stat_temp_v2"].mean.shape == (C,)
    # values equal the reference math on the unfolded normalized output
    yt = torch.from_numpy(np.asarray(y).reshape(N, T, H, W, C)
                          .transpose(0, 4, 1, 2, 3).copy())
    for st in ("spatial", "temp", "temp_v2"):
        want_m, want_v = _ref_stats(yt, st)
        leaf = taps[tap_leaf_name(st)]
        np.testing.assert_allclose(np.asarray(leaf.mean), want_m.numpy(),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(leaf.var), want_v.numpy(),
                                   rtol=1e-3, atol=1e-5)


def test_batchnorm_typed_taps_low_rank():
    """BN1d-style features: the temporal types coincide with the full
    per-channel reduction (norm_stats_utils.py:32-53); spatial taps are
    omitted (the reference's None placeholders)."""
    bn = BatchNorm(C, stat_types=("spatial", "temp"))
    x = jnp.asarray(np.random.default_rng(2).normal(
        size=(N * 7, C)).astype(np.float32))
    variables = bn.init(jax.random.PRNGKey(0), x)
    y, aux = bn.apply(variables, x, mutable=["taps"])
    taps = aux["taps"]
    assert "stat_spatial" not in taps
    np.testing.assert_allclose(
        np.asarray(taps["stat_temp"].mean),
        np.asarray(y).mean(0), rtol=1e-5, atol=1e-6)


def test_layernorm_typed_taps_rank5():
    ln = LayerNorm(C, stat_types=("spatiotemp", "spatial"))
    x = jnp.asarray(np.random.default_rng(3).normal(
        size=(N, T, H, W, C)).astype(np.float32))
    variables = ln.init(jax.random.PRNGKey(0), x)
    y, aux = ln.apply(variables, x, mutable=["taps"])
    assert aux["taps"]["stat_spatial"].mean.shape == (C, T)
    yt = torch.from_numpy(np.asarray(y).transpose(0, 4, 1, 2, 3).copy())
    want_m, _ = _ref_stats(yt, "spatial")
    np.testing.assert_allclose(np.asarray(aux["taps"]["stat_spatial"].mean),
                               want_m.numpy(), rtol=1e-4, atol=1e-5)


def test_missing_clip_len_raises():
    bn = BatchNorm(C, stat_types=("spatial",))   # no clip_len
    x = jnp.zeros((N * T, H, W, C), jnp.float32)
    with pytest.raises(ValueError, match="clip_len"):
        bn.init(jax.random.PRNGKey(0), x)


def test_temp_stats_npy_roundtrip(tmp_path):
    """temp-type stats for TANet include BN1d entries in choose_layers
    order (basics.py:231-238) and round-trip the reference layout."""
    from vitta_tpu.utils.checkpoint import (load_reference_stats, save_stats,
                                            tanet_norm_layers)

    layers = tanet_norm_layers()
    rng = np.random.default_rng(4)
    stats = {}
    for name, kind in layers:
        shape = (C, H, W) if kind == "bn2d" else (C,)
        stats[name] = (rng.normal(size=shape).astype(np.float32),
                       rng.random(shape).astype(np.float32))
    mp, vp = str(tmp_path / "m.npy"), str(tmp_path / "v.npy")
    save_stats(mp, vp, stats, "tanet", include_bn1d=True)
    assert len(np.load(mp, allow_pickle=True)) == len(layers)
    back = load_reference_stats(mp, vp, "tanet", include_bn1d=True)
    assert set(back) == {n for n, _ in layers}
    for name, _ in layers:
        np.testing.assert_array_equal(back[name][0], stats[name][0])


def test_engine_rejects_multi_stat_type():
    """Multi-type stat lists must fail loudly, mirroring the reference's
    assert (norm_stats_utils.py:131) rather than silently using one."""
    import dataclasses
    from vitta_tpu.adapt.engine import VittaEngine
    from vitta_tpu.config import tanet_ucf101_preset
    from vitta_tpu.models.tanet import TANet

    cfg = tanet_ucf101_preset()
    cfg = cfg.replace(tta=dataclasses.replace(
        cfg.tta, stat_type=("spatiotemp", "temp")))
    model = TANet(num_classes=3, clip_length=2)
    with pytest.raises(NotImplementedError, match="stat_type"):
        VittaEngine(model, cfg, {"params": {}, "batch_stats": {}}, {},
                    tap_names=())
