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


@pytest.mark.parametrize("with_mask,nh,dtype",
                         [(False, 4, jnp.float32), (True, 16, jnp.bfloat16)])
def test_packed_window_attention_kernel_on_chip(with_mask, nh, dtype):
    from vitta_tpu.ops.pallas_attention import (
        attention_reference, fused_window_attention_packed)

    b_, n, hd, nw = 8, 392, 32, 4
    c = nh * hd
    ks = jax.random.split(jax.random.PRNGKey(11), 3)
    qkv = jax.random.normal(ks[0], (b_, n, 3 * c), dtype)
    bias = jax.random.normal(ks[1], (nh, n, n), jnp.float32)
    mask = None
    if with_mask:
        raw = jax.random.bernoulli(ks[2], 0.3, (nw, n, n))
        mask = jnp.where(raw, -100.0, 0.0).astype(jnp.float32)
    scale = hd ** -0.5

    def ref_impl(qkv_, bias_):
        q5 = qkv_.reshape(b_, n, 3, nh, hd)
        return attention_reference(q5[:, :, 0], q5[:, :, 1], q5[:, :, 2],
                                   bias_, mask, scale).reshape(b_, n, c)

    def loss(impl, qkv_, bias_):
        o = impl(qkv_, bias_).astype(jnp.float32)
        return jnp.sum(o * jnp.sin(o))

    ref = jax.jit(lambda *a: jax.value_and_grad(
        lambda *s: loss(ref_impl, *s), argnums=(0, 1))(*a))(qkv, bias)
    pal = jax.jit(lambda *a: jax.value_and_grad(
        lambda *s: loss(
            lambda *w: fused_window_attention_packed(
                *w, mask, scale, nh, use_pallas=True), *s),
        argnums=(0, 1))(*a))(qkv, bias)
    rtol = 1e-4 if dtype == jnp.float32 else 5e-2
    np.testing.assert_allclose(float(ref[0]), float(pal[0]), rtol=rtol)
    # same loose-max/tight-mean bounds as above: the jnp side's einsums
    # run at XLA default (bf16-pass) precision
    for a, b in zip(ref[1], pal[1]):
        scale_g = max(float(jnp.max(jnp.abs(a.astype(jnp.float32)))), 1e-6)
        d = jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))
        assert float(jnp.max(d)) / scale_g < (2e-2 if dtype == jnp.float32
                                              else 6e-2)
        assert float(jnp.mean(d)) / scale_g < (2e-4 if dtype == jnp.float32
                                               else 2e-3)


@pytest.mark.parametrize("window,nh", [((8, 7, 7), 16), ((2, 4, 4), 2)])
def test_bias_expansion_kernel_on_chip(window, nh):
    from vitta_tpu.models.swin import relative_position_bias

    wd, wh, ww = window
    t4 = jax.random.normal(jax.random.PRNGKey(3),
                           (2 * wd - 1, 2 * wh - 1, 2 * ww - 1, nh))

    def loss(use_pallas, t):
        out = relative_position_bias(t, window, use_pallas=use_pallas)
        return jnp.sum(out * jnp.sin(out))

    ref = jax.jit(jax.value_and_grad(lambda t: loss(False, t)))(t4)
    pal = jax.jit(jax.value_and_grad(lambda t: loss(True, t)))(t4)
    np.testing.assert_allclose(float(ref[0]), float(pal[0]), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(pal[1]), np.asarray(ref[1]),
                               rtol=1e-4, atol=1e-4)


def test_layer_norm_kernel_on_chip():
    from vitta_tpu.ops.pallas_ln import layer_norm_pallas

    r, c = 1024, 512
    ks = jax.random.split(jax.random.PRNGKey(4), 4)
    x2 = jax.random.normal(ks[0], (r, c)) * 2 + 1
    g = jax.random.normal(ks[1], (c,))
    b = jax.random.normal(ks[2], (c,))
    ct = jax.random.normal(ks[3], (r, c))

    def ref_ln(x_, g_, b_):
        mu = jnp.mean(x_, -1, keepdims=True)
        var = jnp.mean(jnp.square(x_), -1, keepdims=True) - jnp.square(mu)
        return (x_ - mu) * jax.lax.rsqrt(var + 1e-5) * g_ + b_

    def loss(impl, x_, g_, b_):
        return jnp.sum(impl(x_, g_, b_) * ct)

    ref = jax.jit(lambda *a: jax.value_and_grad(
        lambda *s: loss(ref_ln, *s), argnums=(0, 1, 2))(*a))(x2, g, b)
    pal = jax.jit(lambda *a: jax.value_and_grad(
        lambda *s: loss(lambda *w: layer_norm_pallas(*w, 1e-5), *s),
        argnums=(0, 1, 2))(*a))(x2, g, b)
    np.testing.assert_allclose(float(ref[0]), float(pal[0]), rtol=1e-4)
    for a, b_g, name in zip(ref[1], pal[1], ("dx", "dg", "db")):
        scale_g = max(float(jnp.max(jnp.abs(a))), 1e-6)
        assert float(jnp.max(jnp.abs(a - b_g))) / scale_g < 1e-3, name


def _proj_inputs(nh=4, hd=32, b_=8, n=392, nw=4, with_mask=True, seed=21):
    c = nh * hd
    ks = jax.random.split(jax.random.PRNGKey(seed), 7)
    x = jax.random.normal(ks[0], (b_, n, c), jnp.float32)
    w = jax.random.normal(ks[1], (c, 3 * c)) * 0.05
    b = jax.random.normal(ks[2], (3 * c,)) * 0.01
    wp = jax.random.normal(ks[3], (c, c)) * 0.05
    bp = jax.random.normal(ks[4], (c,)) * 0.01
    bias = jax.random.normal(ks[5], (nh, n, n), jnp.float32)
    mask = None
    if with_mask:
        raw = jax.random.bernoulli(ks[6], 0.3, (nw, n, n))
        mask = jnp.where(raw, -100.0, 0.0).astype(jnp.float32)
    return x, w, b, wp, bp, bias, mask, nh, hd


def _grad_close(ref, pal, max_rel, mean_rel):
    for a, b in zip(ref, pal):
        scale_g = max(float(jnp.max(jnp.abs(a.astype(jnp.float32)))), 1e-6)
        d = jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))
        assert float(jnp.max(d)) / scale_g < max_rel
        assert float(jnp.mean(d)) / scale_g < mean_rel


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_proj_attention_kernel_on_chip(dtype, monkeypatch):
    from vitta_tpu.ops.pallas_attention import fused_window_attention_proj

    # packed is the measured production default (round-4 sweep); pin the
    # proj-fused kernel so its on-chip path keeps real coverage
    monkeypatch.setenv("VITTA_ATTN_PROJ_FUSED", "1")
    x, w, b, wp, bp, bias, mask, nh, hd = _proj_inputs()
    scale = hd ** -0.5

    def loss(use_pallas, x_, w_, b_, wp_, bp_, bias_):
        o = fused_window_attention_proj(
            x_, w_, b_, wp_, bp_, bias_, mask, scale, nh, dtype=dtype,
            use_pallas=use_pallas).astype(jnp.float32)
        return jnp.sum(o * jnp.sin(o))

    args = (x, w, b, wp, bp, bias)
    ref = jax.jit(lambda *a: jax.value_and_grad(
        lambda *s: loss(False, *s), argnums=tuple(range(6)))(*a))(*args)
    pal = jax.jit(lambda *a: jax.value_and_grad(
        lambda *s: loss(True, *s), argnums=tuple(range(6)))(*a))(*args)
    rtol = 1e-3 if dtype == jnp.float32 else 5e-2
    np.testing.assert_allclose(float(ref[0]), float(pal[0]), rtol=rtol)
    # bf16 mean-rel 6e-3: the kernel backward RE-COMPUTES qkv in bf16
    # while the composition's VJP reuses the forward-saved product — two
    # valid bf16 roundings of the same math (measured 4.2e-3 on a v5e)
    _grad_close(ref[1], pal[1], 2e-2 if dtype == jnp.float32 else 8e-2,
                3e-4 if dtype == jnp.float32 else 6e-3)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_ln_proj_attention_kernel_on_chip(dtype):
    from vitta_tpu.ops.pallas_attention import (
        fused_window_attention_ln_proj)

    x, w, b, wp, bp, bias, mask, nh, hd = _proj_inputs(seed=23)
    c = x.shape[-1]
    gamma = 1.0 + 0.1 * jax.random.normal(jax.random.PRNGKey(5), (c,))
    beta = 0.05 * jax.random.normal(jax.random.PRNGKey(6), (c,))
    scale = hd ** -0.5

    def loss(use_pallas, x_, gamma_, beta_, w_, b_, wp_, bp_, bias_):
        o, y = fused_window_attention_ln_proj(
            x_, gamma_, beta_, 1e-5, w_, b_, wp_, bp_, bias_, mask, scale,
            nh, dtype=dtype, use_pallas=use_pallas)
        o = o.astype(jnp.float32)
        return jnp.sum(o * jnp.sin(o)) + jnp.sum(jnp.cos(
            y.astype(jnp.float32)))

    args = (x, gamma, beta, w, b, wp, bp, bias)
    ref = jax.jit(lambda *a: jax.value_and_grad(
        lambda *s: loss(False, *s), argnums=tuple(range(8)))(*a))(*args)
    pal = jax.jit(lambda *a: jax.value_and_grad(
        lambda *s: loss(True, *s), argnums=tuple(range(8)))(*a))(*args)
    rtol = 1e-3 if dtype == jnp.float32 else 5e-2
    np.testing.assert_allclose(float(ref[0]), float(pal[0]), rtol=rtol)
    _grad_close(ref[1], pal[1], 2e-2 if dtype == jnp.float32 else 8e-2,
                4e-4 if dtype == jnp.float32 else 4e-3)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_fused_mlp_kernels_on_chip(dtype):
    from vitta_tpu.ops.pallas_mlp import fused_ln_mlp, fused_mlp

    m, c = 1568, 256
    ks = jax.random.split(jax.random.PRNGKey(7), 7)
    x = jax.random.normal(ks[0], (m, c), jnp.float32)
    w1 = jax.random.normal(ks[1], (c, 4 * c)) * 0.05
    b1 = jax.random.normal(ks[2], (4 * c,)) * 0.01
    w2 = jax.random.normal(ks[3], (4 * c, c)) * 0.05
    b2 = jax.random.normal(ks[4], (c,)) * 0.01
    g = 1.0 + 0.1 * jax.random.normal(ks[5], (c,))
    bt = 0.05 * jax.random.normal(ks[6], (c,))

    def loss_mlp(use_pallas, x_, w1_, b1_, w2_, b2_):
        o = fused_mlp(x_, w1_, b1_, w2_, b2_, dtype=dtype,
                      use_pallas=use_pallas).astype(jnp.float32)
        return jnp.sum(o * jnp.sin(o))

    def loss_lnmlp(use_pallas, x_, g_, bt_, w1_, b1_, w2_, b2_):
        o, y = fused_ln_mlp(x_, g_, bt_, w1_, b1_, w2_, b2_, 1e-5,
                            dtype=dtype, use_pallas=use_pallas)
        return jnp.sum(o.astype(jnp.float32) ** 2) + jnp.sum(
            jnp.cos(y.astype(jnp.float32)))

    rtol = 1e-3 if dtype == jnp.float32 else 5e-2
    max_rel = 2e-2 if dtype == jnp.float32 else 8e-2
    mean_rel = 4e-4 if dtype == jnp.float32 else 4e-3

    a1 = (x, w1, b1, w2, b2)
    ref = jax.jit(lambda *a: jax.value_and_grad(
        lambda *s: loss_mlp(False, *s), argnums=tuple(range(5)))(*a))(*a1)
    pal = jax.jit(lambda *a: jax.value_and_grad(
        lambda *s: loss_mlp(True, *s), argnums=tuple(range(5)))(*a))(*a1)
    np.testing.assert_allclose(float(ref[0]), float(pal[0]), rtol=rtol)
    _grad_close(ref[1], pal[1], max_rel, mean_rel)

    a2 = (x, g, bt, w1, b1, w2, b2)
    ref = jax.jit(lambda *a: jax.value_and_grad(
        lambda *s: loss_lnmlp(False, *s), argnums=tuple(range(7)))(*a))(*a2)
    pal = jax.jit(lambda *a: jax.value_and_grad(
        lambda *s: loss_lnmlp(True, *s), argnums=tuple(range(7)))(*a))(*a2)
    np.testing.assert_allclose(float(ref[0]), float(pal[0]), rtol=rtol)
    _grad_close(ref[1], pal[1], max_rel, mean_rel)
