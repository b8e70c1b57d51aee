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


# --- multi-type regularization (the reference legacy loop's intent:
# several stat types at once, per-type source files and meters summed
# into one loss, basics.py:850-906) ---------------------------------------

def _tiny_multi_setup():
    import dataclasses
    from vitta_tpu.adapt.engine import flatten_taps
    from vitta_tpu.config import tanet_ucf101_preset
    from vitta_tpu.models.tanet import TANet

    Tc, HWc, Kc = 2, 16, 5
    cfg = tanet_ucf101_preset()
    cfg = cfg.replace(
        data=dataclasses.replace(cfg.data, clip_length=Tc, input_size=HWc,
                                 scale_size=HWc),
        model=dataclasses.replace(cfg.model, num_classes=Kc),
        tta=dataclasses.replace(cfg.tta, stat_type=("spatiotemp", "temp")))
    model = TANet(num_classes=Kc, clip_length=Tc,
                  stat_types=cfg.tta.tap_stat_types())
    rng = jax.random.PRNGKey(0)
    x0 = jnp.zeros((2, Tc, HWc, HWc, 3), jnp.float32)
    variables = model.init({"params": rng, "dropout": rng}, x0, train=False)
    variables = {"params": variables["params"],
                 "batch_stats": variables["batch_stats"]}
    clean = jax.random.normal(jax.random.PRNGKey(1), (2, Tc, HWc, HWc, 3))
    _, aux = model.apply(variables, clean, train=False, mutable=["taps"])
    # per-type source dicts: spatiotemp has None placeholders at BN1d
    # positions (basics.py:873-880) -> omit those names; temp includes them
    src_st = {n: (np.asarray(s.mean), np.asarray(s.var))
              for n, s in flatten_taps(aux["taps"], leaf="stat").items()
              if "g_bn" not in n and "l_bn" not in n}
    src_t = {n: (np.asarray(s.mean), np.asarray(s.var))
             for n, s in flatten_taps(aux["taps"], leaf="stat_temp").items()}
    return cfg, model, variables, src_st, src_t


def test_multi_type_engine_sums_single_type_losses():
    """At step 0 (zero EMA carries), the two-type loss_reg equals the sum
    of the single-type losses on the same forward."""
    import dataclasses
    from vitta_tpu.adapt.engine import VittaEngine

    cfg, model, variables, src_st, src_t = _tiny_multi_setup()
    views = jax.random.normal(jax.random.PRNGKey(2), (2, 2, 16, 16, 3))
    rngk = jax.random.PRNGKey(3)

    def loss_reg_of(engine):
        state = engine.init_state()
        _loss, (loss_reg, *_rest) = engine._losses(
            state.params, state.ema, state.batch_stats, views, rngk)
        return float(loss_reg)

    multi = VittaEngine(model, cfg, variables,
                        {"spatiotemp": src_st, "temp": src_t}, donate=False)
    assert multi._multi and len(multi.reg_specs) == 2
    cfg_a = cfg.replace(tta=dataclasses.replace(cfg.tta,
                                                stat_type=("spatiotemp",)))
    cfg_b = cfg.replace(tta=dataclasses.replace(cfg.tta, stat_type=("temp",)))
    la = loss_reg_of(VittaEngine(model, cfg_a, variables, src_st, donate=False))
    lb = loss_reg_of(VittaEngine(model, cfg_b, variables, src_t, donate=False))
    lm = loss_reg_of(multi)
    assert lm > 0
    np.testing.assert_allclose(lm, la + lb, rtol=1e-5)

    # EMA carry: one sub-dict per type, BN1d layers only under 'temp'
    state = multi.init_state()
    assert set(state.ema) == {"spatiotemp", "temp"}
    temp_names = set(dict(state.ema["temp"]))
    st_names = set(dict(state.ema["spatiotemp"]))
    assert any("g_bn" in n or "l_bn" in n for n in temp_names)
    assert not any("g_bn" in n or "l_bn" in n for n in st_names)


def test_multi_type_spec_layer_placement():
    """select_tap_names honors per-type BN1d placement: the temporal spec
    covers the TAM BatchNorm1d layers inside chosen blocks, the
    spatiotemp spec does not (basics.py:855-888)."""
    from vitta_tpu.adapt.engine import VittaEngine

    cfg, model, variables, src_st, src_t = _tiny_multi_setup()
    eng = VittaEngine(model, cfg, variables,
                      {"spatiotemp": src_st, "temp": src_t}, donate=False)
    by_key = {s.key: s for s in eng.reg_specs}
    assert set(by_key) == {"spatiotemp", "temp"}
    assert all(("layer3" in n) or ("layer4" in n)
               for s in eng.reg_specs for n in s.names)
    assert any("tam" in n for n in by_key["temp"].names)
    assert not any("tam" in n for n in by_key["spatiotemp"].names)
    # missing per-type source fails loudly
    with pytest.raises(KeyError, match="temp"):
        VittaEngine(model, cfg, variables, {"spatiotemp": src_st},
                    donate=False)
