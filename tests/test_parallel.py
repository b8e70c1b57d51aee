"""Stream-parallel engine on the 8-device CPU mesh: sharded multi-stream
adaptation must match running each stream on the single-stream engine."""

import dataclasses
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vitta_tpu.adapt.engine import VittaEngine, flatten_taps
from vitta_tpu.config import tanet_ucf101_preset
from vitta_tpu.models.tanet import TANet
from vitta_tpu.parallel.mesh import make_mesh
from vitta_tpu.parallel.streams import StreamParallelEngine

pytestmark = pytest.mark.slow  # multi-device shard_map compiles (~4 min)

T, HW, K, V = 2, 24, 4, 2
S = 2  # streams


@pytest.fixture(scope="module")
def setup():
    cfg = tanet_ucf101_preset()
    cfg = cfg.replace(
        data=dataclasses.replace(cfg.data, clip_length=T, input_size=HW,
                                 scale_size=HW),
        model=dataclasses.replace(cfg.model, num_classes=K),
    )
    model = TANet(num_classes=K, clip_length=T)
    rng = jax.random.PRNGKey(0)
    x0 = jnp.zeros((V, T, HW, HW, 3), jnp.float32)
    variables = model.init({"params": rng, "dropout": rng}, x0, train=False)
    variables = {"params": variables["params"],
                 "batch_stats": variables["batch_stats"]}
    _, aux = model.apply(variables, x0 + 0.2, train=False, mutable=["taps"])
    src = {n: (np.asarray(s.mean), np.asarray(s.var))
           for n, s in flatten_taps(aux["taps"]).items()
           if "g_bn" not in n and "l_bn" not in n}
    return cfg, model, variables, src


def test_parallel_streams_match_sequential(setup):
    cfg, model, variables, src = setup
    assert len(jax.devices()) >= S
    engine = VittaEngine(model, cfg, variables, src, donate=False)
    mesh = make_mesh(S, ("stream",))
    spe = StreamParallelEngine(engine, mesh, n_streams=S)

    rng = np.random.default_rng(0)
    views = rng.normal(size=(S, V, T, HW, HW, 3)).astype(np.float32)
    clips = rng.normal(size=(S, 1, T, HW, HW, 3)).astype(np.float32)
    labels = np.asarray([[0], [1]], np.int32)
    keys = jax.random.split(jax.random.PRNGKey(7), S)

    state = spe.init_state()
    state, m = spe.adapt_eval_step(
        state, spe.shard_batch(views), spe.shard_batch(clips),
        spe.shard_batch(labels), keys)
    assert m.loss_reg.shape == (S,)

    # sequential single-stream engines with identical inputs/rngs
    for si in range(S):
        st = engine.init_state()
        st, ms = engine.adapt_eval_step(
            st, jnp.asarray(views[si]), jnp.asarray(clips[si]),
            jnp.asarray(labels[si]), keys[si])
        np.testing.assert_allclose(float(m.loss_reg[si]), float(ms.loss_reg),
                                   rtol=2e-4, atol=1e-6)
        np.testing.assert_allclose(float(m.top1[si]), float(ms.top1))
        # adapted params agree
        a = state.params["base_model"]["layer4_0"]["conv1"]["kernel"][si]
        b = st.params["base_model"]["layer4_0"]["conv1"]["kernel"]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-6)


def test_multiple_streams_per_chip_match_sequential(setup):
    """streams_per_chip > 1: 4 streams on a 2-device mesh (2 vmapped per
    device inside the shard_map blocks) must match sequential
    single-stream runs — the packing mode of the parallel sweep
    (cli/drivers.py, VERDICT round-2 item 6)."""
    cfg, model, variables, src = setup
    S4 = 4
    assert len(jax.devices()) >= 2
    engine = VittaEngine(model, cfg, variables, src, donate=False)
    mesh = make_mesh(2, ("stream",))        # 2 devices x 2 streams each
    spe = StreamParallelEngine(engine, mesh, n_streams=S4)

    rng = np.random.default_rng(5)
    views = rng.normal(size=(S4, V, T, HW, HW, 3)).astype(np.float32)
    clips = rng.normal(size=(S4, 1, T, HW, HW, 3)).astype(np.float32)
    labels = np.asarray([[0], [1], [2], [3]], np.int32)
    keys = jax.random.split(jax.random.PRNGKey(11), S4)

    state = spe.init_state()
    state, m = spe.adapt_eval_step(
        state, spe.shard_batch(views), spe.shard_batch(clips),
        spe.shard_batch(labels), keys)
    assert m.loss_reg.shape == (S4,)

    for si in range(S4):
        st = engine.init_state()
        _st, ms = engine.adapt_eval_step(
            st, jnp.asarray(views[si]), jnp.asarray(clips[si]),
            jnp.asarray(labels[si]), keys[si])
        np.testing.assert_allclose(float(m.loss_reg[si]), float(ms.loss_reg),
                                   rtol=2e-4, atol=1e-6)
        np.testing.assert_allclose(float(m.top1[si]), float(ms.top1))


def test_state_is_sharded_over_mesh(setup):
    cfg, model, variables, src = setup
    engine = VittaEngine(model, cfg, variables, src, donate=False)
    mesh = make_mesh(S, ("stream",))
    spe = StreamParallelEngine(engine, mesh, n_streams=S)
    state = spe.init_state()
    leaf = state.params["base_model"]["conv1"]["kernel"]
    assert leaf.shape[0] == S
    shard_devs = {sh.device for sh in leaf.addressable_shards}
    assert len(shard_devs) == S  # one stream replica per device
