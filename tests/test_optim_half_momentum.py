"""VITTA_BF16_MOMENTUM: bf16 momentum carry in the fused SGD.

Step-0 the update is exact (v starts at 0, arithmetic is f32); across
steps the only divergence source is the bf16 rounding of v, whose drift
scale this file pins down.
"""

import jax
import jax.numpy as jnp
import numpy as np

from vitta_tpu.adapt.optim import fused_sgd_step
from vitta_tpu.config import OptimConfig


def _tree(seed, n=3):
    ks = jax.random.split(jax.random.PRNGKey(seed), n)
    return {f"w{i}": jax.random.normal(ks[i], (16, 32)) * 0.1
            for i in range(n)}


def test_step0_exact_and_drift_bounded():
    cfg = OptimConfig()
    params = _tree(0)
    grads = [_tree(10 + s) for s in range(5)]

    p32 = params
    v32 = jax.tree_util.tree_map(jnp.zeros_like, params)
    p16 = params
    v16 = jax.tree_util.tree_map(
        lambda p: jnp.zeros(p.shape, jnp.bfloat16), params)

    for s in range(5):
        p32, v32 = fused_sgd_step(cfg, p32, v32, grads[s])
        p16, v16 = fused_sgd_step(cfg, p16, v16, grads[s])
        if s == 0:
            # v0 = 0 in both: step-0 parameters agree to f32 exactness
            jax.tree_util.tree_map(
                lambda a, b: np.testing.assert_allclose(a, b, rtol=0,
                                                        atol=1e-7),
                p32, p16)

    # momentum buffer stays bf16; parameter masters stay f32
    assert all(v.dtype == jnp.bfloat16
               for v in jax.tree_util.tree_leaves(v16))
    assert all(p.dtype == jnp.float32
               for p in jax.tree_util.tree_leaves(p16))

    # 5-step drift: bounded by bf16 resolution of v times lr-scale —
    # orders of magnitude below the reference's own run-to-run noise
    for a, b in zip(jax.tree_util.tree_leaves(p32),
                    jax.tree_util.tree_leaves(p16)):
        rel = float(jnp.max(jnp.abs(a - b)) / jnp.max(jnp.abs(a)))
        assert rel < 1e-5, rel


def test_engine_momentum_dtype_flag(monkeypatch):
    """Engine momentum buffers pick up the flag at init_state."""
    from vitta_tpu.adapt.optim import half_momentum_enabled

    monkeypatch.delenv("VITTA_BF16_MOMENTUM", raising=False)
    assert not half_momentum_enabled()
    monkeypatch.setenv("VITTA_BF16_MOMENTUM", "1")
    assert half_momentum_enabled()
