"""Fused window attention: value + gradient equivalence against the jnp
einsum path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vitta_tpu.ops.pallas_attention import (attention_reference,
                                            fused_window_attention)


def _inputs(b_=6, n=24, nh=2, hd=8, nw=3, with_mask=True, seed=0,
            dtype=jnp.float32):
    ks = jax.random.split(jax.random.PRNGKey(seed), 5)
    q = jax.random.normal(ks[0], (b_, n, nh, hd), dtype)
    k = jax.random.normal(ks[1], (b_, n, nh, hd), dtype)
    v = jax.random.normal(ks[2], (b_, n, nh, hd), dtype)
    bias = jax.random.normal(ks[3], (nh, n, n), jnp.float32)
    mask = None
    if with_mask:
        raw = jax.random.bernoulli(ks[4], 0.3, (nw, n, n))
        mask = jnp.where(raw, -100.0, 0.0).astype(jnp.float32)
    return q, k, v, bias, mask


@pytest.mark.parametrize("with_mask", [False, True])
def test_forward_matches_reference(with_mask):
    q, k, v, bias, mask = _inputs(with_mask=with_mask)
    scale = (q.shape[-1]) ** -0.5
    ref = attention_reference(q, k, v, bias, mask, scale)
    got = fused_window_attention(q, k, v, bias, mask, scale, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("with_mask", [False, True])
def test_gradients_match_reference(with_mask):
    q, k, v, bias, mask = _inputs(with_mask=with_mask)
    scale = (q.shape[-1]) ** -0.5

    def loss(impl):
        def f(q_, k_, v_, b_):
            out = impl(q_, k_, v_, b_, mask, scale)
            return jnp.sum(out * jnp.sin(out))
        return f

    ref = jax.grad(loss(attention_reference), argnums=(0, 1, 2, 3))(
        q, k, v, bias)
    pal = jax.grad(
        loss(lambda *a: fused_window_attention(*a, interpret=True)),
        argnums=(0, 1, 2, 3))(q, k, v, bias)
    for g_ref, g_pal, name in zip(ref, pal, ("dq", "dk", "dv", "dbias")):
        np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref),
                                   rtol=2e-4, atol=2e-4, err_msg=name)


def test_bfloat16_forward():
    q, k, v, bias, mask = _inputs(dtype=jnp.bfloat16)
    scale = (q.shape[-1]) ** -0.5
    ref = attention_reference(q, k, v, bias, mask, scale)
    got = fused_window_attention(q, k, v, bias, mask, scale, interpret=True)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=3e-2, atol=3e-2)


def _pack(q, k, v):
    """(B_, N, nh, hd) triple -> packed (B_, N, 3C), lanes (3, nh, hd)."""
    b_, n, nh, hd = q.shape
    return jnp.concatenate(
        [t.reshape(b_, n, nh * hd) for t in (q, k, v)], axis=-1)


@pytest.mark.parametrize("with_mask", [False, True])
def test_packed_forward_matches_reference(with_mask):
    from vitta_tpu.ops.pallas_attention import fused_window_attention_packed

    q, k, v, bias, mask = _inputs(with_mask=with_mask)
    b_, n, nh, hd = q.shape
    scale = hd ** -0.5
    ref = attention_reference(q, k, v, bias, mask, scale)
    got = fused_window_attention_packed(_pack(q, k, v), bias, mask, scale,
                                        nh, interpret=True)
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(ref.reshape(b_, n, nh * hd)),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("with_mask", [False, True])
def test_packed_gradients_match_reference(with_mask):
    from vitta_tpu.ops.pallas_attention import fused_window_attention_packed

    q, k, v, bias, mask = _inputs(with_mask=with_mask)
    b_, n, nh, hd = q.shape
    scale = hd ** -0.5

    def ref_loss(qkv, b):
        q5 = qkv.reshape(b_, n, 3, nh, hd)
        out = attention_reference(q5[:, :, 0], q5[:, :, 1], q5[:, :, 2],
                                  b, mask, scale).reshape(b_, n, nh * hd)
        return jnp.sum(out * jnp.sin(out))

    def pal_loss(qkv, b):
        out = fused_window_attention_packed(qkv, b, mask, scale, nh,
                                            interpret=True)
        return jnp.sum(out * jnp.sin(out))

    qkv = _pack(q, k, v).reshape(b_, n, 3, nh * hd).reshape(b_, n, -1)
    ref = jax.grad(ref_loss, argnums=(0, 1))(qkv, bias)
    pal = jax.grad(pal_loss, argnums=(0, 1))(qkv, bias)
    for g_ref, g_pal, name in zip(ref, pal, ("dqkv", "dbias")):
        np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref),
                                   rtol=2e-4, atol=2e-4, err_msg=name)


def test_packed_bfloat16_forward():
    from vitta_tpu.ops.pallas_attention import fused_window_attention_packed

    q, k, v, bias, mask = _inputs(dtype=jnp.bfloat16)
    b_, n, nh, hd = q.shape
    scale = hd ** -0.5
    ref = attention_reference(q, k, v, bias, mask, scale)
    got = fused_window_attention_packed(_pack(q, k, v), bias, mask, scale,
                                        nh, interpret=True)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32).reshape(b_, n, -1),
                               rtol=3e-2, atol=3e-2)


def _compact_inputs(b_=6, nh=2, hd=8, wd=3, wh=2, ww=4, nw=3,
                    with_mask=True, seed=0, dtype=jnp.float32):
    """Window-structured inputs with the bias in BOTH forms: dense
    (nh, N, N) and compact Toeplitz (nh, 2wd-1, hw, hw)."""
    from vitta_tpu.ops.pallas_bias import assemble_dense
    n = wd * wh * ww
    hw = wh * ww
    ks = jax.random.split(jax.random.PRNGKey(seed), 5)
    q = jax.random.normal(ks[0], (b_, n, nh, hd), dtype)
    k = jax.random.normal(ks[1], (b_, n, nh, hd), dtype)
    v = jax.random.normal(ks[2], (b_, n, nh, hd), dtype)
    vc = jax.random.normal(ks[3], (nh, 2 * wd - 1, hw, hw), jnp.float32)
    dense = assemble_dense(vc, wd, use_pallas=False)
    mask = None
    if with_mask:
        raw = jax.random.bernoulli(ks[4], 0.3, (nw, n, n))
        mask = jnp.where(raw, -100.0, 0.0).astype(jnp.float32)
    return q, k, v, vc, dense, mask, wd


def test_assemble_dense_pallas_matches_jnp():
    from vitta_tpu.ops.pallas_bias import assemble_dense
    vc = jax.random.normal(jax.random.PRNGKey(3), (2, 5, 8, 8), jnp.float32)
    got = assemble_dense(vc, 3, use_pallas=False, interpret=True)
    want = assemble_dense(vc, 3, use_pallas=False)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    # block-Toeplitz structure spot check: block (d1, d2) == slice d1-d2+wd-1
    w = np.asarray(want)
    np.testing.assert_array_equal(w[:, 16:24, 0:8], np.asarray(vc)[:, 4])


@pytest.mark.parametrize("with_mask", [False, True])
def test_packed_compact_bias_matches_dense(with_mask):
    """The packed kernel consuming the compact Toeplitz bias equals the
    dense-bias path — forward and (dqkv, d compact-bias) gradients."""
    from vitta_tpu.ops.pallas_attention import fused_window_attention_packed
    from vitta_tpu.ops.pallas_bias import assemble_dense

    q, k, v, vc, dense, mask, wd = _compact_inputs(with_mask=with_mask)
    b_, n, nh, hd = q.shape
    scale = hd ** -0.5
    qkv = _pack(q, k, v)

    out_c = fused_window_attention_packed(qkv, vc, mask, scale, nh,
                                          interpret=True)
    out_d = fused_window_attention_packed(qkv, dense, mask, scale, nh,
                                          interpret=True)
    np.testing.assert_allclose(np.asarray(out_c), np.asarray(out_d),
                               rtol=1e-5, atol=1e-5)

    def loss_c(qkv_, vc_):
        out = fused_window_attention_packed(qkv_, vc_, mask, scale, nh,
                                            interpret=True)
        return jnp.sum(out * jnp.sin(out))

    def loss_ref(qkv_, vc_):
        d = assemble_dense(vc_, wd, use_pallas=False)
        q5 = qkv_.reshape(b_, n, 3, nh, hd)
        out = attention_reference(q5[:, :, 0], q5[:, :, 1], q5[:, :, 2],
                                  d, mask, scale).reshape(b_, n, nh * hd)
        return jnp.sum(out * jnp.sin(out))

    g_c = jax.grad(loss_c, argnums=(0, 1))(qkv, vc)
    g_r = jax.grad(loss_ref, argnums=(0, 1))(qkv, vc)
    for a, b, name in zip(g_c, g_r, ("dqkv", "dvc")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4, err_msg=name)


def test_compact_bias_from_table_matches_expansion():
    """compact_bias + assemble equals the einsum relative_position_bias
    for a real table (both are exact selections)."""
    from vitta_tpu.models.swin import relative_position_bias
    from vitta_tpu.ops.pallas_bias import assemble_dense, compact_bias
    ws = (2, 3, 3)
    t4 = jax.random.normal(jax.random.PRNGKey(4),
                           (3, 5, 5, 2), jnp.float32)
    want = relative_position_bias(t4, ws, use_pallas=False)
    vc = compact_bias(t4, ws)
    got = assemble_dense(vc, ws[0], use_pallas=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_prefer_compact_bias_router():
    """Auto-compact engages exactly for the dense-overflow shape class:
    Swin-B stage-4 f32 (n=392, c=1024, nh=32) — and nowhere the dense
    packed kernel already fits."""
    from vitta_tpu.ops.pallas_attention import (packed_fits,
                                                prefer_compact_bias)
    win = (8, 7, 7)
    n = 392
    # stage-4 f32: dense overflows (117.67 MB measured on-chip), compact
    # must fit and be preferred
    assert not packed_fits(n, 1024, 32, 4, True)
    assert prefer_compact_bias(n, 1024, 32, 4, True, win)
    # stage-4 bf16 and stage-3 f32: dense fits -> dense stays
    assert packed_fits(n, 1024, 32, 2, True)
    assert not prefer_compact_bias(n, 1024, 32, 2, True, win)
    assert not prefer_compact_bias(n, 512, 16, 4, True, win)
    # clamped window never routes compact
    assert not prefer_compact_bias(24, 1024, 32, 4, True, win)


def test_window_attention_compact_flag_equivalence(monkeypatch):
    """WindowAttention3D under VITTA_COMPACT_BIAS=1 (interpret kernels)
    matches the default jnp path — outputs and parameter gradients."""
    from vitta_tpu.models.swin import WindowAttention3D
    import vitta_tpu.ops.pallas_attention as pa

    n = 2 * 3 * 3
    mod = WindowAttention3D(16, (2, 3, 3), 2)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, n, 16), jnp.float32)
    params = mod.init(jax.random.PRNGKey(2), x)

    def loss(p):
        return jnp.sum(jnp.square(mod.apply(p, x)))

    g_ref = jax.grad(loss)(params)
    orig = pa.fused_window_attention_packed
    try:
        monkeypatch.setenv("VITTA_COMPACT_BIAS", "1")
        pa.fused_window_attention_packed = lambda *a, **kw: orig(
            *a, **{**kw, "interpret": True})
        g_pal = jax.grad(loss)(params)
    finally:
        pa.fused_window_attention_packed = orig
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=2e-4, atol=2e-4),
        g_ref, g_pal)


def test_swin_block_uses_fused_path_equivalently():
    """Full WindowAttention3D module: interpret-pallas vs default (jnp)
    path produce the same output and parameter gradients."""
    from vitta_tpu.models.swin import WindowAttention3D
    import vitta_tpu.ops.pallas_attention as pa

    n = 2 * 3 * 3
    mod = WindowAttention3D(16, (2, 3, 3), 2)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, n, 16), jnp.float32)
    params = mod.init(jax.random.PRNGKey(2), x)

    def loss(p):
        return jnp.sum(jnp.square(mod.apply(p, x)))

    g_ref = jax.grad(loss)(params)
    orig = pa.fused_window_attention_packed
    try:
        pa.fused_window_attention_packed = lambda *a, **kw: orig(
            *a, **{**kw, "interpret": True})
        g_pal = jax.grad(loss)(params)
    finally:
        pa.fused_window_attention_packed = orig
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=2e-4, atol=2e-4),
        g_ref, g_pal)


@pytest.mark.parametrize("with_mask", [False, True])
def test_proj_fused_forward_matches_composition(with_mask):
    from vitta_tpu.ops.pallas_attention import fused_window_attention_proj

    q, k, v, bias, mask = _inputs(with_mask=with_mask)
    b_, n, nh, hd = q.shape
    c = nh * hd
    scale = hd ** -0.5
    rng = jax.random.PRNGKey(11)
    x = jax.random.normal(rng, (b_, n, c), jnp.float32)
    w = jax.random.normal(jax.random.fold_in(rng, 1), (c, 3 * c)) * 0.05
    b = jax.random.normal(jax.random.fold_in(rng, 2), (3 * c,)) * 0.01

    wp = jax.random.normal(jax.random.fold_in(rng, 3), (c, c)) * 0.05
    bp = jax.random.normal(jax.random.fold_in(rng, 4), (c,)) * 0.01
    qkv = jnp.dot(x, w) + b
    q5 = qkv.reshape(b_, n, 3, nh, hd)
    att = attention_reference(q5[:, :, 0], q5[:, :, 1], q5[:, :, 2],
                              bias, mask, scale).reshape(b_, n, c)
    ref = jnp.dot(att, wp) + bp
    got = fused_window_attention_proj(x, w, b, wp, bp, bias, mask, scale,
                                      nh, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("with_mask", [False, True])
def test_proj_fused_gradients_match_composition(with_mask):
    from vitta_tpu.ops.pallas_attention import fused_window_attention_proj

    q, k, v, bias, mask = _inputs(with_mask=with_mask)
    b_, n, nh, hd = q.shape
    c = nh * hd
    scale = hd ** -0.5
    rng = jax.random.PRNGKey(13)
    x = jax.random.normal(rng, (b_, n, c), jnp.float32)
    w = jax.random.normal(jax.random.fold_in(rng, 1), (c, 3 * c)) * 0.05
    b = jax.random.normal(jax.random.fold_in(rng, 2), (3 * c,)) * 0.01

    wp = jax.random.normal(jax.random.fold_in(rng, 3), (c, c)) * 0.05
    bp = jax.random.normal(jax.random.fold_in(rng, 4), (c,)) * 0.01

    def ref_loss(x, w, b, wp, bp, bias):
        qkv = jnp.dot(x, w) + b
        q5 = qkv.reshape(b_, n, 3, nh, hd)
        att = attention_reference(q5[:, :, 0], q5[:, :, 1], q5[:, :, 2],
                                  bias, mask, scale).reshape(b_, n, c)
        out = jnp.dot(att, wp) + bp
        return jnp.sum(out * jnp.sin(out))

    def pal_loss(x, w, b, wp, bp, bias):
        out = fused_window_attention_proj(x, w, b, wp, bp, bias, mask,
                                          scale, nh, interpret=True)
        return jnp.sum(out * jnp.sin(out))

    args = (x, w, b, wp, bp, bias)
    ref = jax.grad(ref_loss, argnums=tuple(range(6)))(*args)
    pal = jax.grad(pal_loss, argnums=tuple(range(6)))(*args)
    names = ("dx", "dw", "db", "dwp", "dbp", "dbias")
    for g_ref, g_pal, name in zip(ref, pal, names):
        np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref),
                                   rtol=4e-4, atol=4e-4, err_msg=name)


def test_proj_fused_bfloat16():
    from vitta_tpu.ops.pallas_attention import fused_window_attention_proj

    q, k, v, bias, mask = _inputs(with_mask=True)
    b_, n, nh, hd = q.shape
    c = nh * hd
    scale = hd ** -0.5
    rng = jax.random.PRNGKey(17)
    x = jax.random.normal(rng, (b_, n, c), jnp.float32)
    w = jax.random.normal(jax.random.fold_in(rng, 1), (c, 3 * c)) * 0.05
    b = jax.random.normal(jax.random.fold_in(rng, 2), (3 * c,)) * 0.01

    wp = jax.random.normal(jax.random.fold_in(rng, 3), (c, c)) * 0.05
    bp = jax.random.normal(jax.random.fold_in(rng, 4), (c,)) * 0.01
    # f32 masters, bf16 compute — matches the model's promote path
    ref = fused_window_attention_proj(x, w, b, wp, bp, bias, mask, scale,
                                      nh, dtype=jnp.bfloat16,
                                      use_pallas=False)
    got = fused_window_attention_proj(x, w, b, wp, bp, bias, mask, scale,
                                      nh, dtype=jnp.bfloat16,
                                      interpret=True)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=3e-2, atol=3e-2)


# ---------------------------------------------------------------------------
# LayerNorm-prologue variant (norm1 fused into the kernel, VITTA_ATTN_LN)
# ---------------------------------------------------------------------------


def _ln_proj_inputs(seed=19, with_mask=True):
    q, k, v, bias, mask = _inputs(with_mask=with_mask, seed=seed)
    b_, n, nh, hd = q.shape
    c = nh * hd
    rng = jax.random.PRNGKey(seed)
    x = jax.random.normal(rng, (b_, n, c), jnp.float32) * 2.0 + 0.3
    gamma = 1.0 + 0.1 * jax.random.normal(jax.random.fold_in(rng, 5), (c,))
    beta = 0.05 * jax.random.normal(jax.random.fold_in(rng, 6), (c,))
    w = jax.random.normal(jax.random.fold_in(rng, 1), (c, 3 * c)) * 0.05
    b = jax.random.normal(jax.random.fold_in(rng, 2), (3 * c,)) * 0.01
    wp = jax.random.normal(jax.random.fold_in(rng, 3), (c, c)) * 0.05
    bp = jax.random.normal(jax.random.fold_in(rng, 4), (c,)) * 0.01
    return x, gamma, beta, w, b, wp, bp, bias, mask, nh, hd


@pytest.mark.parametrize("with_mask", [False, True])
def test_ln_proj_forward_matches_composition(with_mask):
    from vitta_tpu.ops.pallas_attention import (
        fused_window_attention_ln_proj, ln_reference)

    (x, gamma, beta, w, b, wp, bp, bias, mask, nh,
     hd) = _ln_proj_inputs(with_mask=with_mask)
    b_, n, c = x.shape
    scale = hd ** -0.5
    eps = 1e-5
    y_ref = ln_reference(x, gamma, beta, eps)
    qkv = jnp.dot(y_ref, w) + b
    q5 = qkv.reshape(b_, n, 3, nh, hd)
    att = attention_reference(q5[:, :, 0], q5[:, :, 1], q5[:, :, 2],
                              bias, mask, scale).reshape(b_, n, c)
    ref = jnp.dot(att, wp) + bp
    got, y_got = fused_window_attention_ln_proj(
        x, gamma, beta, eps, w, b, wp, bp, bias, mask, scale, nh,
        interpret=True)
    np.testing.assert_allclose(np.asarray(y_got), np.asarray(y_ref),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("with_mask", [False, True])
def test_ln_proj_gradients_match_composition(with_mask):
    """Both cotangents exercised: the attention output's AND the tap
    cotangent on y (the LayerNorm output the kernel re-emits)."""
    from vitta_tpu.ops.pallas_attention import (
        fused_window_attention_ln_proj, ln_reference)

    (x, gamma, beta, w, b, wp, bp, bias, mask, nh,
     hd) = _ln_proj_inputs(with_mask=with_mask)
    b_, n, c = x.shape
    scale = hd ** -0.5
    eps = 1e-5

    def combined(out, y):
        return jnp.sum(out * jnp.sin(out)) + jnp.sum(jnp.cos(y))

    def ref_loss(x, gamma, beta, w, b, wp, bp, bias):
        y = ln_reference(x, gamma, beta, eps)
        qkv = jnp.dot(y, w) + b
        q5 = qkv.reshape(b_, n, 3, nh, hd)
        att = attention_reference(q5[:, :, 0], q5[:, :, 1], q5[:, :, 2],
                                  bias, mask, scale).reshape(b_, n, c)
        return combined(jnp.dot(att, wp) + bp, y)

    def pal_loss(x, gamma, beta, w, b, wp, bp, bias):
        out, y = fused_window_attention_ln_proj(
            x, gamma, beta, eps, w, b, wp, bp, bias, mask, scale, nh,
            interpret=True)
        return combined(out, y)

    args = (x, gamma, beta, w, b, wp, bp, bias)
    ref = jax.grad(ref_loss, argnums=tuple(range(8)))(*args)
    pal = jax.grad(pal_loss, argnums=tuple(range(8)))(*args)
    names = ("dx", "dgamma", "dbeta", "dw", "db", "dwp", "dbp", "dbias")
    for g_ref, g_pal, name in zip(ref, pal, names):
        np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref),
                                   rtol=6e-4, atol=6e-4, err_msg=name)


def test_ln_proj_bfloat16():
    from vitta_tpu.ops.pallas_attention import (
        fused_window_attention_ln_proj)

    (x, gamma, beta, w, b, wp, bp, bias, mask, nh,
     hd) = _ln_proj_inputs(with_mask=True)
    scale = hd ** -0.5
    out, y = fused_window_attention_ln_proj(
        x, gamma, beta, 1e-5, w, b, wp, bp, bias, mask, scale, nh,
        dtype=jnp.bfloat16, interpret=True)
    ref, y_ref = fused_window_attention_ln_proj(
        x, gamma, beta, 1e-5, w, b, wp, bp, bias, mask, scale, nh,
        dtype=jnp.bfloat16, use_pallas=False)
    assert out.dtype == jnp.bfloat16 and y.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(
        np.asarray(y, np.float32), np.asarray(y_ref, np.float32),
        rtol=2e-2, atol=2e-2)


def test_proj_fusion_vmem_router():
    """The projection-fused backward must route around scoped VMEM.

    Swin-B's real per-stage window shapes (2 views x 16 frames @ 224,
    window (8,7,7)): stages 1-3 fit the fused kernel's 100 MB scoped
    stack; stage 4 (C=1024, 32 heads) measured 104.09 MB on a v5e and
    must fall back to the packed path, in both bf16 and fp32 and with
    the LN-prologue variant."""
    from vitta_tpu.ops.pallas_attention import (_proj_bwd_vmem_bytes,
                                                proj_fusion_fits)

    stages = [  # (n, c, nh) per Swin-B stage at the ViTTA operating point
        (392, 128, 4), (392, 256, 8), (392, 512, 16), (392, 1024, 32)]
    for itemsize in (2, 4):
        for with_ln in (False, True):
            fits = [proj_fusion_fits(n, c, nh, itemsize, True, with_ln)
                    for n, c, nh in stages]
            assert fits[:3] == [True, True, True], (itemsize, with_ln, fits)
            assert fits[3] is False, (itemsize, with_ln)
    # the estimator is calibrated against Mosaic's measured stage-4
    # stack (104.09 MB): keep it within a few percent so the budget
    # margin stays meaningful
    est = _proj_bwd_vmem_bytes(392, 1024, 32, 2, True)
    assert abs(est - 104.09e6) / 104.09e6 < 0.05, est
