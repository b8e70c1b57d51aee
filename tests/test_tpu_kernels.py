"""On-chip equivalence of the Pallas kernels vs their jnp references.

These compile the real (non-interpret) kernels, so they only run when a
TPU backend is live (the CPU suite covers the same math in interpret
mode: test_pallas_tam.py, test_pallas_attention.py).  Run with the TPU
visible:  VITTA_TEST_TPU=1 python -m pytest tests/test_tpu_kernels.py -q
"""

import os

import pytest

# conftest pins the suite to CPU; only proceed when the host actually
# exposes a TPU and the pin is lifted
if os.environ.get("JAX_PLATFORMS", "cpu") == "cpu":
    pytest.skip("TPU-only kernel tests (CPU suite uses interpret mode)",
                allow_module_level=True)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

if jax.default_backend() != "tpu":
    pytest.skip("no TPU backend", allow_module_level=True)

pytestmark = pytest.mark.slow


@pytest.mark.parametrize("h,w,c", [(56, 56, 64), (7, 7, 512)])
def test_tam_kernel_on_chip(h, w, c):
    from vitta_tpu.ops.pallas_tam import (tam_dynamic_conv,
                                          tam_dynamic_conv_reference)

    ks = jax.random.split(jax.random.PRNGKey(c), 3)
    x = jax.random.normal(ks[0], (2, 16, h, w, c), jnp.float32)
    attn = jax.nn.sigmoid(jax.random.normal(ks[1], (2, 16, c)))
    kern = jax.nn.softmax(jax.random.normal(ks[2], (2, c, 3)), axis=-1)

    def loss(impl, *a):
        o = impl(*a)
        return jnp.sum(o * jnp.cos(o))

    ref = jax.jit(lambda *a: jax.value_and_grad(
        lambda *s: loss(tam_dynamic_conv_reference, *s),
        argnums=(0, 1, 2))(*a))(x, attn, kern)
    pal = jax.jit(lambda *a: jax.value_and_grad(
        lambda *s: loss(lambda *q: tam_dynamic_conv(*q, use_pallas=True), *s),
        argnums=(0, 1, 2))(*a))(x, attn, kern)
    np.testing.assert_allclose(float(ref[0]), float(pal[0]), rtol=1e-4)
    for a, b in zip(ref[1], pal[1]):
        scale = max(float(jnp.max(jnp.abs(a))), 1e-6)
        assert float(jnp.max(jnp.abs(a - b))) / scale < 1e-4


@pytest.mark.parametrize("with_mask", [False, True])
def test_window_attention_kernel_on_chip(with_mask):
    from vitta_tpu.ops.pallas_attention import (attention_reference,
                                                fused_window_attention)

    b_, n, nh, hd, nw = 8, 392, 4, 32, 4
    ks = jax.random.split(jax.random.PRNGKey(7), 5)
    q = jax.random.normal(ks[0], (b_, n, nh, hd), jnp.float32)
    k = jax.random.normal(ks[1], (b_, n, nh, hd), jnp.float32)
    v = jax.random.normal(ks[2], (b_, n, nh, hd), jnp.float32)
    bias = jax.random.normal(ks[3], (nh, n, n), jnp.float32)
    mask = None
    if with_mask:
        raw = jax.random.bernoulli(ks[4], 0.3, (nw, n, n))
        mask = jnp.where(raw, -100.0, 0.0).astype(jnp.float32)
    scale = hd ** -0.5

    def loss(impl, q_, k_, v_, b_a):
        o = impl(q_, k_, v_, b_a, mask, scale)
        return jnp.sum(o * jnp.sin(o))

    ref = jax.jit(lambda *a: jax.value_and_grad(
        lambda *s: loss(attention_reference, *s),
        argnums=(0, 1, 2, 3))(*a))(q, k, v, bias)
    pal = jax.jit(lambda *a: jax.value_and_grad(
        lambda *s: loss(
            lambda *w: fused_window_attention(*w, use_pallas=True), *s),
        argnums=(0, 1, 2, 3))(*a))(q, k, v, bias)
    np.testing.assert_allclose(float(ref[0]), float(pal[0]), rtol=1e-4)
    # the jnp reference's einsums run as XLA default-precision (bf16-pass)
    # matmuls on TPU while the kernel accumulates full f32 — the kernel
    # is the *more* precise side, so per-element deltas reflect the
    # reference's bf16 truncation (up to ~1% of scale on the largest
    # elements).  Bound the max loosely and the mean tightly: a wrong
    # mask/shift/bias produces O(scale) deltas over many elements.
    for a, b in zip(ref[1], pal[1]):
        scale_g = max(float(jnp.max(jnp.abs(a))), 1e-6)
        d = jnp.abs(a - b)
        assert float(jnp.max(d)) / scale_g < 2e-2
        assert float(jnp.mean(d)) / scale_g < 2e-4
