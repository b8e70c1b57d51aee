"""VITTA_PATCHIFY: Swin patch-embed as host/engine unfold + flat matmul.

``patchify`` (models/swin.py) must reproduce the strided VALID Conv3d
exactly (same parameters, same contraction order), and the engine's
pre-normalize unfold must commute with the device-side normalization
(per-channel constants tiled across the packed axis).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vitta_tpu.models.swin import Recognizer3D, SwinTransformer3D, patchify

PATCH = (2, 2, 2)


def test_patchify_matmul_matches_conv():
    bb = SwinTransformer3D(patch_size=PATCH, embed_dim=16, depths=(2,),
                           num_heads=(2,), window_size=(2, 3, 3))
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 12, 12, 3),
                          jnp.float32)
    variables = bb.init(jax.random.PRNGKey(1), x)
    y0, _ = bb.apply(variables, x, mutable=["taps"])
    xp = patchify(x, PATCH)
    assert xp.shape == (2, 2, 6, 6, 24)
    y1, _ = bb.apply(variables, xp, mutable=["taps"])
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               rtol=2e-5, atol=2e-5)


def test_patchify_v2_matches_conv(monkeypatch):
    """VITTA_PATCHIFY_V2: the in-model conv-foreign unfold + permuted
    kernel matmul equals the strided Conv3d exactly (fwd and param
    grads) on the raw (B, T, H, W, 3) input."""
    bb = SwinTransformer3D(patch_size=PATCH, embed_dim=16, depths=(2,),
                           num_heads=(2,), window_size=(2, 3, 3))
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 12, 12, 3),
                          jnp.float32)
    variables = bb.init(jax.random.PRNGKey(1), x)

    def loss(v, flag):
        monkeypatch.setenv("VITTA_PATCHIFY_V2", flag)
        y, _ = bb.apply(v, x, mutable=["taps"])
        return jnp.sum(y ** 2)

    l0, g0 = jax.value_and_grad(lambda v: loss(v, "0"))(variables)
    l1, g1 = jax.value_and_grad(lambda v: loss(v, "1"))(variables)
    np.testing.assert_allclose(float(l1), float(l0), rtol=2e-5)
    f0, td0 = jax.tree_util.tree_flatten(g0)
    f1, td1 = jax.tree_util.tree_flatten(g1)
    assert td0 == td1
    for a0, a1 in zip(f0, f1):
        np.testing.assert_allclose(np.asarray(a1), np.asarray(a0),
                                   rtol=2e-4, atol=2e-4)


def test_patchify_mm_element_order():
    """patchify_mm packs (c, t, h, w) row-major and kernel_mm permutes
    the Conv3d kernel rows to match."""
    from vitta_tpu.models.swin import kernel_mm, patchify_mm
    x = jnp.arange(2 * 2 * 2 * 3, dtype=jnp.float32).reshape(1, 2, 2, 2, 3)
    xp = patchify_mm(x, (2, 2, 2))
    # element k of the packed axis is x[c, t, h, w] with (c,t,h,w) row-major
    want = np.transpose(np.asarray(x)[0], (3, 0, 1, 2)).ravel()
    np.testing.assert_array_equal(np.asarray(xp).ravel(), want)
    k = jnp.arange(2 * 2 * 2 * 3 * 4, dtype=jnp.float32).reshape(2, 2, 2, 3, 4)
    np.testing.assert_allclose(
        np.asarray(xp.reshape(1, -1) @ kernel_mm(k)),
        np.asarray(patchify(x, (2, 2, 2)).reshape(1, -1) @ k.reshape(-1, 4)),
        rtol=1e-6)


def test_patchify_element_order_is_conv_contraction():
    """Brute-force one patch: packed element k = (t, h, w, c) row-major —
    the Conv3d kernel's (kt, kh, kw, in) flattening."""
    x = jnp.arange(2 * 2 * 2 * 3, dtype=jnp.float32).reshape(1, 2, 2, 2, 3)
    xp = patchify(x, (2, 2, 2))
    np.testing.assert_array_equal(np.asarray(xp).ravel(),
                                  np.arange(24, dtype=np.float32))


def test_engine_patchify_commutes_with_normalize(monkeypatch):
    monkeypatch.setenv("VITTA_PATCHIFY", "1")
    from vitta_tpu.adapt.engine import VittaEngine, flatten_taps
    from vitta_tpu.config import swin_ucf101_preset

    cfg = swin_ucf101_preset()
    cfg = cfg.replace(
        data=dataclasses.replace(cfg.data, clip_length=4, input_size=12,
                                 scale_size=12),
        model=dataclasses.replace(cfg.model, num_classes=5,
                                  patch_size=PATCH),
    )
    model = Recognizer3D(num_classes=5, patch_size=PATCH, embed_dim=16,
                         depths=(2, 2), num_heads=(2, 2),
                         window_size=(2, 3, 3))
    x0 = jnp.zeros((2, 4, 12, 12, 3), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x0)
    _, aux = model.apply(variables, x0 + 0.1, mutable=["taps"])
    src = {n: (np.asarray(s.mean), np.asarray(s.var))
           for n, s in flatten_taps(aux["taps"]).items()}
    engine = VittaEngine(model, cfg, dict(variables), src, donate=False)
    assert engine._patchify == PATCH

    u8 = jnp.asarray(np.random.default_rng(0).integers(
        0, 256, size=(2, 4, 12, 12, 3), dtype=np.uint8))
    got = engine._maybe_normalize(u8)
    mean = jnp.asarray(cfg.data.input_mean, jnp.float32)
    std = jnp.asarray(cfg.data.input_std, jnp.float32)
    ref = patchify((u8.astype(jnp.float32) - mean) / std, PATCH)
    assert got.shape == (2, 2, 6, 6, 24)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    # indivisible shapes pass through un-patchified
    odd = jnp.zeros((1, 3, 12, 12, 3), jnp.uint8)
    assert engine._maybe_normalize(odd).shape == (1, 3, 12, 12, 3)
