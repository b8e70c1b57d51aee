"""Device-side normalization: uint8 frames through the jitted step must
match the host-normalized float32 path."""

import dataclasses
import numpy as np
import jax
import jax.numpy as jnp

from vitta_tpu.adapt.engine import VittaEngine, flatten_taps
from vitta_tpu.config import tanet_ucf101_preset
from vitta_tpu.data.dataset import TANetVideoDataset
from vitta_tpu.data.records import VideoRecord
from vitta_tpu.data.video_reader import SyntheticVideoSource
from vitta_tpu.models.tanet import TANet
import pytest

pytestmark = pytest.mark.slow  # two engine compiles (~80 s)

T, HW, K, V = 2, 32, 5, 2


def test_uint8_inputs_match_float32():
    cfg = tanet_ucf101_preset()
    cfg = cfg.replace(
        data=dataclasses.replace(cfg.data, clip_length=T, input_size=HW,
                                 scale_size=40),
        model=dataclasses.replace(cfg.model, num_classes=K),
    )
    model = TANet(num_classes=K, clip_length=T)
    rng = jax.random.PRNGKey(0)
    x0 = jnp.zeros((V, T, HW, HW, 3), jnp.float32)
    variables = model.init({"params": rng, "dropout": rng}, x0, train=False)
    variables = {"params": variables["params"],
                 "batch_stats": variables["batch_stats"]}
    _, aux = model.apply(variables, x0 + 0.1, train=False, mutable=["taps"])
    src = {n: (np.asarray(s.mean), np.asarray(s.var))
           for n, s in flatten_taps(aux["taps"]).items()
           if "g_bn" not in n and "l_bn" not in n}
    engine = VittaEngine(model, cfg, variables, src, donate=False)

    vsrc = SyntheticVideoSource(height=48, width=64, frames_per_video=60)
    records = [VideoRecord("v0", 50, 1)]
    ds_f32 = TANetVideoDataset(cfg, vsrc, records, dataset_type="eval", seed=3)
    ds_u8 = TANetVideoDataset(cfg, vsrc, records, dataset_type="eval", seed=3,
                              emit_uint8=True)
    s_f, s_u = ds_f32[0], ds_u8[0]
    assert s_u.frames.dtype == np.uint8 and s_f.frames.dtype == np.float32

    t1f, t5f, pf = engine.eval_step(engine.init_params, jnp.asarray(s_f.frames),
                                    jnp.asarray([1]))
    t1u, t5u, pu = engine.eval_step(engine.init_params, jnp.asarray(s_u.frames),
                                    jnp.asarray([1]))
    assert int(pf[0]) == int(pu[0])
    assert float(t1f) == float(t1u)

    # full adapt step on uint8 views runs and matches the f32 loss closely
    tta_f = TANetVideoDataset(cfg, vsrc, records, dataset_type="tta", seed=5)
    tta_u = TANetVideoDataset(cfg, vsrc, records, dataset_type="tta", seed=5,
                              emit_uint8=True)
    vf, vu = tta_f[0].frames, tta_u[0].frames
    st = engine.init_state()
    _, mf = engine.adapt_eval_step(st, jnp.asarray(vf), jnp.asarray(s_f.frames),
                                   jnp.asarray([1]), jax.random.PRNGKey(2))
    st2 = engine.init_state()
    _, mu = engine.adapt_eval_step(st2, jnp.asarray(vu), jnp.asarray(s_u.frames),
                                   jnp.asarray([1]), jax.random.PRNGKey(2))
    np.testing.assert_allclose(float(mf.loss_reg), float(mu.loss_reg),
                               rtol=1e-4)
