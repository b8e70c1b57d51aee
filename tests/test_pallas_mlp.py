"""Fused MLP kernel (ops/pallas_mlp.py): value + gradient equivalence
against the unfused flax-Dense math (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vitta_tpu.ops.pallas_mlp import fused_mlp, mlp_reference, _tile_rows


def _params(key, c, f, dtype=jnp.float32):
    ks = jax.random.split(key, 5)
    x = jax.random.normal(ks[0], (2, 2, 4, 8, c), dtype) * 0.5
    w1 = jax.random.normal(ks[1], (c, f), dtype) * (c ** -0.5)
    b1 = jax.random.normal(ks[2], (f,), dtype) * 0.1
    w2 = jax.random.normal(ks[3], (f, c), dtype) * (f ** -0.5)
    b2 = jax.random.normal(ks[4], (c,), dtype) * 0.1
    return x, w1, b1, w2, b2


@pytest.mark.parametrize("c,f", [(32, 128), (24, 96)])
def test_fused_mlp_forward_matches_reference(c, f):
    x, w1, b1, w2, b2 = _params(jax.random.PRNGKey(0), c, f)
    ref = mlp_reference(x, w1, b1, w2, b2)
    got = fused_mlp(x, w1, b1, w2, b2, use_pallas=False, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-6, atol=2e-6)


def test_fused_mlp_gradients_match_reference():
    c, f = 32, 128
    x, w1, b1, w2, b2 = _params(jax.random.PRNGKey(1), c, f)

    def loss(impl):
        def fn(args):
            out = impl(*args)
            return jnp.sum(out * jnp.cos(out))
        return fn

    args = (x, w1, b1, w2, b2)
    g_ref = jax.grad(loss(mlp_reference))(args)
    g_pal = jax.grad(loss(
        lambda *a: fused_mlp(*a, use_pallas=False, interpret=True)))(args)
    for gr, gp, name in zip(g_ref, g_pal, "x w1 b1 w2 b2".split()):
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gr),
                                   rtol=2e-5, atol=2e-5, err_msg=name)


def test_fused_mlp_bf16_close_to_f32_reference():
    c, f = 32, 128
    x, w1, b1, w2, b2 = _params(jax.random.PRNGKey(2), c, f)
    ref = mlp_reference(x, w1, b1, w2, b2)
    got = fused_mlp(x, w1, b1, w2, b2, dtype=jnp.bfloat16,
                    use_pallas=False, interpret=True)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32), np.asarray(ref),
                               rtol=0.05, atol=0.05)


def test_fused_mlp_bf16_param_grads_are_f32_masters():
    """Params arrive f32 (masters); grads must come back f32 through the
    kernel's bf16 compute, like nn.Dense's promote_dtype path."""
    c, f = 32, 128
    x, w1, b1, w2, b2 = _params(jax.random.PRNGKey(3), c, f)

    def fn(w1_):
        out = fused_mlp(x, w1_, b1, w2, b2, dtype=jnp.bfloat16,
                        use_pallas=False, interpret=True)
        return jnp.sum(out.astype(jnp.float32))

    g = jax.grad(fn)(w1)
    assert g.dtype == jnp.float32
    g_ref = jax.grad(
        lambda w1_: jnp.sum(mlp_reference(
            x.astype(jnp.bfloat16), w1_.astype(jnp.bfloat16),
            b1.astype(jnp.bfloat16), w2.astype(jnp.bfloat16),
            b2.astype(jnp.bfloat16)).astype(jnp.float32)))(w1)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=0.1, atol=0.5)


def test_tile_rows_divides_and_caps():
    for m in (392, 784, 1568, 3136, 12544, 25088, 50176):
        for f in (512, 1024, 2048, 4096):
            t = _tile_rows(m, f)
            assert m % t == 0
            assert t * f <= max(m * f, 1 << 21)
    assert _tile_rows(7, 512) == 7


def test_inkernel_erf_matches_lax_erf():
    from vitta_tpu.ops.pallas_mlp import _erf
    x = jnp.linspace(-6.0, 6.0, 100001, dtype=jnp.float32)
    err = float(jnp.max(jnp.abs(_erf(x) - jax.lax.erf(x))))
    assert err < 5e-7, err
