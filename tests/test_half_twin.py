"""bf16 param-twin mode (Swin): carrying pre-cast compute-dtype params
in TTAState must be trajectory-identical to the in-model cast — the
twin holds exactly the leaves flax's promote_dtype casts anyway
(engine.half_cast_flags)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vitta_tpu.adapt.engine import (VittaEngine, flatten_taps,
                                    half_cast_flags)
from vitta_tpu.config import swin_ucf101_preset
from vitta_tpu.models.swin import Recognizer3D

pytestmark = pytest.mark.slow  # two tiny-Swin engine compiles

T, HW, K, V = 2, 16, 5, 2


def _setup():
    cfg = swin_ucf101_preset()
    cfg = cfg.replace(
        data=dataclasses.replace(cfg.data, clip_length=T, input_size=HW,
                                 scale_size=20),
        model=dataclasses.replace(cfg.model, num_classes=K,
                                  compute_dtype="bfloat16"),
    )
    model = Recognizer3D(num_classes=K, drop_path_rate=0.0,
                         dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    x0 = jnp.zeros((V, T, HW, HW, 3), jnp.float32)
    variables = model.init({"params": rng, "dropout": rng}, x0, train=False)
    variables = {"params": variables["params"], "batch_stats": {}}
    _, aux = model.apply(variables, x0 + 0.1, train=False, mutable=["taps"])
    src = {n: (np.asarray(s.mean, np.float32), np.asarray(s.var, np.float32))
           for n, s in flatten_taps(aux["taps"]).items()}
    return model, cfg, variables, src


def test_half_flags_select_kernel_modules():
    model, cfg, variables, src = _setup()
    flags = half_cast_flags(variables["params"])
    flat = jax.tree_util.tree_flatten_with_path(flags)[0]
    by_name = {".".join(p.key for p in path if hasattr(p, "key")): v
               for path, v in flat}
    # norm affine + rel-pos tables stay f32; dense/conv kernels cast
    assert any(k.endswith("rpb_table") and not v for k, v in by_name.items())
    assert any(".qkv.kernel" in k and v for k, v in by_name.items())
    assert any(k.endswith("norm1.scale") and not v for k, v in by_name.items())
    assert any(k.endswith("norm1.bias") and not v for k, v in by_name.items())
    assert any("patch_embed_proj.kernel" in k and v for k, v in by_name.items())
    # the classifier head is f32 by design (I3DHead docstring) — outside
    # the backbone scope, never cast
    assert any("fc_cls" in k and not v for k, v in by_name.items())


def test_twin_trajectory_identical():
    model, cfg, variables, src = _setup()
    eng_on = VittaEngine(model, cfg, variables, src, donate=False)
    assert eng_on._half, "twin mode should engage for bf16 Swin"
    eng_off = VittaEngine(model, cfg, variables, src, donate=False)
    eng_off._half = False
    eng_off._half_flags = None

    rng = jax.random.PRNGKey(7)
    views = jax.random.uniform(rng, (V, T, HW, HW, 3), jnp.float32)
    eval_clip = jax.random.uniform(jax.random.fold_in(rng, 1),
                                   (1, T, HW, HW, 3), jnp.float32)
    label = jnp.asarray([2])

    s_on, s_off = eng_on.init_state(), eng_off.init_state()
    assert s_off.params_half is None and s_on.params_half is not None
    for step in range(2):
        srng = jax.random.fold_in(rng, 100 + step)
        s_on, m_on = eng_on.adapt_eval_step(s_on, views, eval_clip, label,
                                            srng)
        s_off, m_off = eng_off.adapt_eval_step(s_off, views, eval_clip,
                                               label, srng)
        if step == 0:
            # identical param VALUES feed both step-0 forwards -> the
            # losses (computed pre-update) must agree exactly
            assert float(m_on.loss_reg) == float(m_off.loss_reg)
            assert float(m_on.loss_consis) == float(m_off.loss_consis)
        else:
            # after one update the trajectories may differ by one bf16
            # rounding on the dense dW (the twin delivers bf16 grads;
            # XLA sometimes fuses the upcast into the off-path matmul,
            # emitting f32-precise grads there) — bounded, tiny
            assert float(m_on.loss_reg) == pytest.approx(
                float(m_off.loss_reg), rel=5e-3)
        assert int(m_on.pred[0]) == int(m_off.pred[0])
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a, np.float64), np.asarray(b, np.float64),
            rtol=0, atol=5e-6),
        s_on.params, s_off.params)
