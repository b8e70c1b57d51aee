"""Functional tests of the jitted ViTTA adaptation engine on a tiny
TANet: EMA semantics, optimizer masking (partial-BN), tta_standard
reset behavior, and mode invariants."""

import dataclasses
import numpy as np
import jax
import jax.flatten_util
import jax.numpy as jnp
import pytest

from vitta_tpu.config import tanet_ucf101_preset, DataConfig, ModelConfig, TTAConfig, OptimConfig
from vitta_tpu.models.tanet import TANet
from vitta_tpu.adapt.engine import VittaEngine, flatten_taps, select_tap_names

pytestmark = pytest.mark.slow  # full adapt-step XLA compiles (~5 min)

T, HW, K, V = 2, 32, 5, 2


def make_cfg(**tta_overrides):
    cfg = tanet_ucf101_preset()
    cfg = cfg.replace(
        data=dataclasses.replace(cfg.data, clip_length=T, input_size=HW, scale_size=HW),
        model=dataclasses.replace(cfg.model, num_classes=K),
        tta=dataclasses.replace(cfg.tta, **tta_overrides),
    )
    return cfg


@pytest.fixture(scope="module")
def setup():
    cfg = make_cfg()
    model = TANet(num_classes=K, clip_length=T)
    rng = jax.random.PRNGKey(0)
    x0 = jnp.zeros((V, T, HW, HW, 3), jnp.float32)
    variables = model.init({"params": rng, "dropout": rng}, x0, train=False)
    variables = {"params": variables["params"], "batch_stats": variables["batch_stats"]}
    # "clean" source stats from one tapped forward on random data
    clean = jax.random.normal(jax.random.PRNGKey(1), (V, T, HW, HW, 3))
    _, aux = model.apply(variables, clean, train=False, mutable=["taps"])
    taps = flatten_taps(aux["taps"])
    src = {name: (np.asarray(s.mean), np.asarray(s.var)) for name, s in taps.items()
           if "g_bn" not in name and "l_bn" not in name}  # bn2d only
    return cfg, model, variables, src


def _data(seed):
    rng = np.random.default_rng(seed)
    views = jnp.asarray(rng.normal(size=(V, T, HW, HW, 3)).astype(np.float32))
    clip = jnp.asarray(rng.normal(size=(1, T, HW, HW, 3)).astype(np.float32))
    label = jnp.asarray([seed % K])
    return views, clip, label


def test_select_tap_names(setup):
    cfg, model, variables, src = setup
    names = select_tap_names(src.keys(), ("layer3", "layer4"), src)
    assert len(names) == 29  # 19 in layer3 + 10 in layer4
    assert all(("layer3" in n) or ("layer4" in n) for n in names)


def test_online_adaptation_updates(setup):
    cfg, model, variables, src = setup
    # partial_bn=True here to exercise the freezing mask; the live default
    # is False (--partial_bn store_true, opts.py:48, basics.py:1474)
    cfg = cfg.replace(model=dataclasses.replace(cfg.model, partial_bn=True))
    eng = VittaEngine(model, cfg, variables, src, donate=False)
    state = eng.init_state()
    views, clip, label = _data(0)
    state1, m1 = eng.adapt_eval_step(state, views, clip, label, jax.random.PRNGKey(2))
    assert np.isfinite(float(m1.loss_reg)) and float(m1.loss_reg) > 0
    assert np.isfinite(float(m1.loss_consis))
    assert float(m1.top1) in (0.0, 100.0)

    # params changed (conv weights trainable under SGD-all)
    w0 = variables["params"]["base_model"]["layer3_0"]["conv1"]["kernel"]
    w1 = state1.params["base_model"]["layer3_0"]["conv1"]["kernel"]
    assert not np.array_equal(np.asarray(w0), np.asarray(w1))

    # partial-BN: bottleneck BN2d affine frozen, stem bn trainable
    b0 = variables["params"]["base_model"]["layer3_0"]["bn1"]["scale"]
    b1 = state1.params["base_model"]["layer3_0"]["bn1"]["scale"]
    np.testing.assert_array_equal(np.asarray(b0), np.asarray(b1))
    s0 = variables["params"]["base_model"]["bn1"]["scale"]
    s1 = state1.params["base_model"]["bn1"]["scale"]
    assert not np.array_equal(np.asarray(s0), np.asarray(s1))

    # TAM BN1d affine NOT frozen (torch partial-BN matches BatchNorm2d only):
    # the trainable mask marks it True and its gradient is nonzero.  (The
    # actual SGD delta can be below fp32 ulp of 1.0, so don't compare params.)
    from vitta_tpu.adapt.optim import tanet_trainable_mask
    mask = tanet_trainable_mask(variables["params"])
    assert bool(mask["base_model"]["layer3_0"]["tam"]["g_bn"]["scale"])
    assert not bool(mask["base_model"]["layer3_0"]["bn1"]["scale"])
    grads, _ = jax.grad(eng._losses, has_aux=True)(
        variables["params"], state.ema, state.batch_stats, views,
        jax.random.PRNGKey(9))
    g = grads["base_model"]["layer3_0"]["tam"]["g_bn"]["scale"]
    assert float(jnp.sum(jnp.abs(g))) > 0.0


def test_default_no_partial_bn_updates_bn_affine(setup):
    """Live default: partial_bn False (opts.py:48) -> BN2d affine params
    receive nonzero SGD updates."""
    cfg, model, variables, src = setup
    assert cfg.model.partial_bn is False
    eng = VittaEngine(model, cfg, variables, src, donate=False)
    state = eng.init_state()
    views, _clip, _label = _data(7)
    grads, _aux = jax.grad(eng._losses, has_aux=True)(
        state.params, state.ema, state.batch_stats, views,
        jax.random.PRNGKey(11))
    params2, _ = eng._sgd_step(state.params, state.opt_state, grads)
    u = (np.asarray(params2["base_model"]["layer3_0"]["bn1"]["scale"])
         - np.asarray(state.params["base_model"]["layer3_0"]["bn1"]["scale"]))
    assert float(np.sum(np.abs(u))) > 0.0


def test_ema_carries_across_steps(setup):
    cfg, model, variables, src = setup
    eng = VittaEngine(model, cfg, variables, src, donate=False)
    state = eng.init_state()
    name = eng.tap_names[0]
    m = cfg.tta.momentum_mvg

    views, clip, label = _data(1)
    rngk = jax.random.PRNGKey(3)
    # manual: taps of the adapt forward with the same rng/params
    _, taps, _bs = eng._forward_with_taps(
        state.params, state.batch_stats, views, jax.random.fold_in(rngk, 0))
    want1 = m * np.asarray(taps[name].mean)  # ema0 = 0
    state1, _ = eng.adapt_eval_step(state, views, clip, label, rngk)
    np.testing.assert_allclose(np.asarray(state1.ema[name].mean), want1, rtol=1e-4, atol=1e-7)

    views2, clip2, label2 = _data(2)
    rngk2 = jax.random.PRNGKey(4)
    _, taps2, _bs2 = eng._forward_with_taps(
        state1.params, state1.batch_stats, views2, jax.random.fold_in(rngk2, 0))
    want2 = m * np.asarray(taps2[name].mean) + (1 - m) * want1
    state2, _ = eng.adapt_eval_step(state1, views2, clip2, label2, rngk2)
    np.testing.assert_allclose(np.asarray(state2.ema[name].mean), want2, rtol=1e-4, atol=1e-7)


def test_tta_standard_resets_per_sample(setup):
    cfg, model, variables, src = setup
    cfg_std = make_cfg(if_tta_standard="tta_standard", momentum_mvg=1.0,
                       n_gradient_steps=2)
    eng = VittaEngine(model, cfg_std, variables, src, donate=False)
    state = eng.init_state()
    views, clip, label = _data(3)
    rngk = jax.random.PRNGKey(5)
    s1, m1 = eng.adapt_eval_step(state, views, clip, label, rngk)
    # feeding the same sample again must give identical metrics (the carry
    # is re-initialized per sample, basics.py:519-530)
    s2, m2 = eng.adapt_eval_step(s1, views, clip, label, rngk)
    np.testing.assert_allclose(float(m1.loss_reg), float(m2.loss_reg), rtol=1e-6)
    np.testing.assert_allclose(float(m1.top1), float(m2.top1))


def test_mode_invariants():
    with pytest.raises(AssertionError):
        make_cfg(if_tta_standard="tta_standard", momentum_mvg=0.1).tta.validate()
    with pytest.raises(AssertionError):
        make_cfg(if_tta_standard="tta_online", momentum_mvg=1.0).tta.validate()
