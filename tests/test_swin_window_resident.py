"""Window-resident Swin stage (VITTA_WINDOW_RESIDENT) equivalence.

The flag keeps activations in window layout across a whole BasicLayer
(models/swin.py:_forward_window_resident) — a perf-only relayout change;
these tests pin that outputs, taps, gradients and the DropPath
randomness are identical to the spatial per-block path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vitta_tpu.models.swin import BasicLayer, Recognizer3D

B, D, H, W, C = 2, 4, 6, 6, 16
WINDOW = (2, 3, 3)          # shift (1, 1, 1) on odd blocks


def make_layer(stat_types=("spatiotemp",), drop=(0.0, 0.0), depth=2):
    return BasicLayer(dim=C, depth=depth, num_heads=2, window_size=WINDOW,
                      drop_paths=drop, downsample=False,
                      stat_types=stat_types)


def run(layer, x, use_wr, monkeypatch, deterministic=True, rng=0):
    # tri-state gate, default ON since the round-4 sweep: "0" is the
    # explicit spatial-path baseline
    monkeypatch.setenv("VITTA_WINDOW_RESIDENT", "1" if use_wr else "0")
    variables = layer.init(jax.random.PRNGKey(1), x)
    kw = {}
    if not deterministic:
        kw["rngs"] = {"dropout": jax.random.PRNGKey(rng)}
    y, aux = layer.apply(variables, x, deterministic=deterministic,
                         mutable=["taps"], **kw)
    return y, aux["taps"], variables


@pytest.fixture
def x():
    return jax.random.normal(jax.random.PRNGKey(0), (B, D, H, W, C),
                             jnp.float32)


def test_forward_and_taps_match(x, monkeypatch):
    layer = make_layer()
    y0, taps0, _ = run(layer, x, False, monkeypatch)
    y1, taps1, _ = run(layer, x, True, monkeypatch)
    np.testing.assert_allclose(y0, y1, rtol=2e-5, atol=2e-5)
    flat0 = jax.tree_util.tree_leaves_with_path(taps0)
    flat1 = jax.tree_util.tree_leaves_with_path(taps1)
    assert [p for p, _ in flat0] == [p for p, _ in flat1]
    for (path, a), (_, b) in zip(flat0, flat1):
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-5,
                                   err_msg=str(path))


def test_count_leaf_is_true_batch(x, monkeypatch):
    layer = make_layer()
    _, taps, _ = run(layer, x, True, monkeypatch)
    counts = [v for p, v in jax.tree_util.tree_leaves_with_path(taps)
              if "stat_n" in str(p)]
    assert counts and all(float(c) == B for c in counts)


def test_gradients_match(x, monkeypatch):
    layer = make_layer()
    _, _, variables = run(layer, x, False, monkeypatch)

    def loss(params, wr):
        monkeypatch.setenv("VITTA_WINDOW_RESIDENT", "1" if wr else "0")
        y, aux = layer.apply({"params": params}, x, deterministic=True,
                             mutable=["taps"])
        tap_sum = sum(jnp.sum(v) for p, v in
                      jax.tree_util.tree_leaves_with_path(aux["taps"])
                      if "stat_n" not in str(p))
        return jnp.sum(y * y) + tap_sum

    g0 = jax.grad(loss)(variables["params"], False)
    g1 = jax.grad(loss)(variables["params"], True)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=5e-4, atol=1e-5),
        g0, g1)


def test_droppath_draws_identical(x, monkeypatch):
    """Stochastic depth must drop the same per-sample branches in both
    layouts: the WR path draws (B,)-shaped masks and repeats across
    windows, consuming the same random bits as the spatial path."""
    layer = make_layer(drop=(0.5, 0.5))
    y0, _, _ = run(layer, x, False, monkeypatch, deterministic=False, rng=7)
    y1, _, _ = run(layer, x, True, monkeypatch, deterministic=False, rng=7)
    np.testing.assert_allclose(y0, y1, rtol=2e-5, atol=2e-5)


def test_gate_falls_back(monkeypatch):
    """Padding-requiring shapes and non-spatiotemp taps take the spatial
    path under the flag — same results either way."""
    xpad = jax.random.normal(jax.random.PRNGKey(2), (B, D, 5, 5, C),
                             jnp.float32)
    layer = make_layer()
    assert not layer._window_resident_ok(xpad.shape)
    y0, _, _ = run(layer, xpad, False, monkeypatch)
    y1, _, _ = run(layer, xpad, True, monkeypatch)
    np.testing.assert_allclose(y0, y1, rtol=1e-6, atol=1e-6)

    multi = make_layer(stat_types=("spatiotemp", "temp"))
    assert not multi._window_resident_ok((B, D, H, W, C))


def test_full_model_smoke(monkeypatch):
    """Recognizer3D end-to-end under the flag (clamped stage-4-like
    windows included) matches the spatial path."""
    model = Recognizer3D(num_classes=5, patch_size=(2, 2, 2), embed_dim=16,
                         depths=(2, 2), num_heads=(2, 2), window_size=WINDOW,
                         drop_path_rate=0.0)
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 4, 12, 12, 3),
                          jnp.float32)
    variables = model.init(jax.random.PRNGKey(4), x)

    monkeypatch.setenv("VITTA_WINDOW_RESIDENT", "0")
    y0 = model.apply(variables, x)
    monkeypatch.setenv("VITTA_WINDOW_RESIDENT", "1")
    y1 = model.apply(variables, x)
    np.testing.assert_allclose(y0, y1, rtol=2e-5, atol=2e-5)


# ---------------------------------------------------------------------------
# VITTA_ATTN_LN: norm1 fused into the attention kernel prologue
# ---------------------------------------------------------------------------


def run_flags(layer, x, flags, monkeypatch):
    for var in ("VITTA_WINDOW_RESIDENT", "VITTA_ATTN_LN"):
        monkeypatch.setenv(var, "0")
    for var in flags:
        monkeypatch.setenv(var, "1")
    variables = layer.init(jax.random.PRNGKey(1), x)
    y, aux = layer.apply(variables, x, deterministic=True, mutable=["taps"])
    return y, aux["taps"], variables


@pytest.mark.parametrize("flags", [("VITTA_ATTN_LN",),
                                   ("VITTA_ATTN_LN", "VITTA_WINDOW_RESIDENT")])
def test_attn_ln_forward_and_taps_match(x, monkeypatch, flags):
    layer = make_layer()
    y0, taps0, _ = run_flags(layer, x, (), monkeypatch)
    y1, taps1, _ = run_flags(layer, x, flags, monkeypatch)
    np.testing.assert_allclose(y0, y1, rtol=2e-5, atol=2e-5)
    flat0 = jax.tree_util.tree_leaves_with_path(taps0)
    flat1 = jax.tree_util.tree_leaves_with_path(taps1)
    assert [p for p, _ in flat0] == [p for p, _ in flat1]
    for (path, a), (_, b) in zip(flat0, flat1):
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-5,
                                   err_msg=str(path))


def test_attn_ln_gradients_match(x, monkeypatch):
    layer = make_layer()
    _, _, variables = run_flags(layer, x, (), monkeypatch)

    def loss(params, on):
        for var in ("VITTA_WINDOW_RESIDENT", "VITTA_ATTN_LN"):
            monkeypatch.setenv(var, "0")
        if on:
            monkeypatch.setenv("VITTA_ATTN_LN", "1")
        y, aux = layer.apply({"params": params}, x, deterministic=True,
                             mutable=["taps"])
        tap_sum = sum(jnp.sum(v) for p, v in
                      jax.tree_util.tree_leaves_with_path(aux["taps"])
                      if "stat_n" not in str(p))
        return jnp.sum(y * y) + tap_sum

    g0 = jax.grad(loss)(variables["params"], False)
    g1 = jax.grad(loss)(variables["params"], True)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=5e-4, atol=1e-5),
        g0, g1)


def test_attn_ln_gate_excludes_multitype(monkeypatch):
    monkeypatch.setenv("VITTA_ATTN_LN", "1")
    from vitta_tpu.models.swin import SwinBlock3D
    blk = SwinBlock3D(dim=C, num_heads=2, window_size=WINDOW,
                      stat_types=("spatiotemp", "temp"))
    assert not blk._use_attn_ln()
    assert SwinBlock3D(dim=C, num_heads=2,
                       window_size=WINDOW)._use_attn_ln()
