"""Pallas bias-expansion and fused-LayerNorm kernels: value + gradient
equivalence against the pure jnp paths (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vitta_tpu.models.swin import relative_position_bias
from vitta_tpu.ops.pallas_ln import layer_norm_pallas


# ---------------------------------------------------------------------------
# relative-position-bias expansion (ops/pallas_bias.py)
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("window,nh", [((8, 7, 7), 16), ((2, 3, 3), 4),
                                       ((2, 4, 4), 2)])
def test_bias_expansion_matches_einsum(window, nh):
    wd, wh, ww = window
    t4 = jax.random.normal(jax.random.PRNGKey(0),
                           (2 * wd - 1, 2 * wh - 1, 2 * ww - 1, nh))
    ref = relative_position_bias(t4, window, use_pallas=False)
    got = relative_position_bias(t4, window, use_pallas=False,
                                 interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


@pytest.mark.parametrize("window,nh", [((8, 7, 7), 16), ((2, 4, 4), 2)])
def test_bias_expansion_table_gradient(window, nh):
    wd, wh, ww = window
    t4 = jax.random.normal(jax.random.PRNGKey(1),
                           (2 * wd - 1, 2 * wh - 1, 2 * ww - 1, nh))

    def loss(impl):
        def f(t):
            out = impl(t)
            return jnp.sum(out * jnp.sin(out))
        return f

    g_ref = jax.grad(loss(
        lambda t: relative_position_bias(t, window, use_pallas=False)))(t4)
    g_pal = jax.grad(loss(
        lambda t: relative_position_bias(t, window, use_pallas=False,
                                         interpret=True)))(t4)
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref),
                               rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# fused LayerNorm (ops/pallas_ln.py)
# ---------------------------------------------------------------------------
def _ln_ref(x2, g, b, eps=1e-5):
    xf = x2.astype(jnp.float32)
    mu = jnp.mean(xf, -1, keepdims=True)
    var = jnp.mean(jnp.square(xf), -1, keepdims=True) - jnp.square(mu)
    return ((xf - mu) * jax.lax.rsqrt(var + eps) * g + b).astype(x2.dtype)


@pytest.mark.parametrize("r,c,dtype", [(64, 128, jnp.float32),
                                       (48, 256, jnp.float32),
                                       (64, 128, jnp.bfloat16)])
def test_ln_forward_matches_reference(r, c, dtype):
    ks = jax.random.split(jax.random.PRNGKey(2), 3)
    x2 = (jax.random.normal(ks[0], (r, c)) * 2 + 1).astype(dtype)
    g = jax.random.normal(ks[1], (c,))
    b = jax.random.normal(ks[2], (c,))
    ref = _ln_ref(x2, g, b)
    got = layer_norm_pallas(x2, g, b, 1e-5, True)
    assert got.dtype == x2.dtype
    tol = 3e-2 if dtype == jnp.bfloat16 else 1e-5
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=tol, atol=tol)


def test_ln_gradients_match_reference():
    r, c = 48, 256
    ks = jax.random.split(jax.random.PRNGKey(3), 4)
    x2 = jax.random.normal(ks[0], (r, c)) * 2 + 1
    g = jax.random.normal(ks[1], (c,))
    b = jax.random.normal(ks[2], (c,))
    ct = jax.random.normal(ks[3], (r, c))

    def loss(impl):
        return lambda x_, g_, b_: jnp.sum(impl(x_, g_, b_) * ct)

    grads_ref = jax.grad(loss(lambda *a: _ln_ref(*a)),
                         argnums=(0, 1, 2))(x2, g, b)
    grads_pal = jax.grad(loss(lambda *a: layer_norm_pallas(*a, 1e-5, True)),
                         argnums=(0, 1, 2))(x2, g, b)
    for g_ref, g_pal, name in zip(grads_ref, grads_pal, ("dx", "dg", "db")):
        np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref),
                                   rtol=2e-5, atol=2e-5, err_msg=name)
