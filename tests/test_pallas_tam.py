"""Pallas fused TAM dynamic temporal conv: value + gradient equivalence
against the jnp reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vitta_tpu.ops.pallas_tam import (shapes_qualify, tam_dynamic_conv,
                                      tam_dynamic_conv_reference)


def _inputs(n=2, t=5, h=8, w=4, c=32, seed=0, dtype=jnp.float32):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    x = jax.random.normal(ks[0], (n, t, h, w, c), dtype)
    attn = jax.nn.sigmoid(jax.random.normal(ks[1], (n, t, c), jnp.float32))
    kernel = jax.nn.softmax(
        jax.random.normal(ks[2], (n, c, 3), jnp.float32), axis=-1)
    return x, attn, kernel


def test_shapes_qualify():
    assert shapes_qualify((2, 16, 56, 56, 64))    # layer1: 56*64 = 3584
    assert shapes_qualify((2, 16, 7, 7, 512))     # layer4: 7*512 = 3584
    assert not shapes_qualify((2, 16, 10, 5, 30))


def test_forward_matches_reference():
    x, attn, kernel = _inputs()
    ref = tam_dynamic_conv_reference(x, attn, kernel)
    got = tam_dynamic_conv(x, attn, kernel, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_forward_zero_pad_boundaries():
    """First/last frames must see zero-padded neighbors, not clamped ones."""
    x, attn, kernel = _inputs(t=3)
    ref = tam_dynamic_conv_reference(x, attn, kernel)
    got = tam_dynamic_conv(x, attn, kernel, interpret=True)
    np.testing.assert_allclose(np.asarray(got[:, 0]), np.asarray(ref[:, 0]),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got[:, -1]), np.asarray(ref[:, -1]),
                               rtol=1e-5, atol=1e-5)


def test_gradients_match_reference():
    x, attn, kernel = _inputs()

    def loss(impl):
        def f(x_, a_, k_):
            out = impl(x_, a_, k_)
            return jnp.sum(out * jnp.cos(out))   # non-trivial cotangent
        return f

    ref_grads = jax.grad(loss(tam_dynamic_conv_reference),
                         argnums=(0, 1, 2))(x, attn, kernel)
    pal_grads = jax.grad(
        loss(lambda *a: tam_dynamic_conv(*a, interpret=True)),
        argnums=(0, 1, 2))(x, attn, kernel)
    for g_ref, g_pal, name in zip(ref_grads, pal_grads,
                                  ("dx", "dattn", "dkernel")):
        np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref),
                                   rtol=2e-4, atol=2e-4, err_msg=name)


def test_gradients_match_with_multiple_h_blocks():
    """h=16 tiles into two 8-row blocks — exercises the da/dk
    accumulate-across-h path."""
    x, attn, kernel = _inputs(h=16)

    def loss(impl):
        return lambda x_, a_, k_: jnp.sum(jnp.square(impl(x_, a_, k_)))

    ref = jax.grad(loss(tam_dynamic_conv_reference), argnums=(0, 1, 2))(
        x, attn, kernel)
    pal = jax.grad(loss(lambda *a: tam_dynamic_conv(*a, interpret=True)),
                   argnums=(0, 1, 2))(x, attn, kernel)
    for g_ref, g_pal, name in zip(ref, pal, ("dx", "dattn", "dkernel")):
        np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref),
                                   rtol=2e-4, atol=2e-4, err_msg=name)


def test_bfloat16_forward():
    x, attn, kernel = _inputs(dtype=jnp.bfloat16)
    ref = tam_dynamic_conv_reference(x, attn, kernel)
    got = tam_dynamic_conv(x, attn, kernel, interpret=True)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=2e-2, atol=2e-2)


def test_fallback_on_unaligned_shapes():
    x, attn, kernel = _inputs(w=5, c=30)
    out = tam_dynamic_conv(x, attn, kernel, interpret=True)
    ref = tam_dynamic_conv_reference(x, attn, kernel)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
