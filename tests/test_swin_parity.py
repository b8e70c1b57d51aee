"""Numerical parity: JAX Video Swin vs plain-torch oracle through the
checkpoint converter, on a tiny config that exercises shifted windows,
window clamping, and patch-merging padding."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from vitta_tpu.models.swin import Recognizer3D
from vitta_tpu.utils.checkpoint import convert_swin_checkpoint, swin_norm_layers
from vitta_tpu.adapt.engine import flatten_taps, select_tap_names
from tests.torch_swin import TorchRecognizer3D

K = 6
DEPTHS = (1, 1, 2, 1)
EMBED = 8
HEADS = (1, 2, 4, 8)
WINDOW = (2, 3, 3)
PATCH = (2, 4, 4)
T, HW = 4, 24


@pytest.fixture(scope="module")
def models():
    torch.manual_seed(0)
    tm = TorchRecognizer3D(K, PATCH, EMBED, DEPTHS, HEADS, WINDOW)
    # non-trivial rpb tables
    with torch.no_grad():
        for m in tm.modules():
            if hasattr(m, "relative_position_bias_table"):
                m.relative_position_bias_table.normal_(0, 0.5)
    tm.eval()
    variables = convert_swin_checkpoint(tm.state_dict(), K, depths=DEPTHS,
                                        window_size=WINDOW)
    jm = Recognizer3D(num_classes=K, patch_size=PATCH, window_size=WINDOW,
                      embed_dim=EMBED, depths=DEPTHS, num_heads=HEADS,
                      drop_path_rate=0.0)
    return tm, jm, variables


def test_swin_forward_parity(models):
    tm, jm, variables = models
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, T, HW, HW, 3)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(np.transpose(x, (0, 4, 1, 2, 3)))).numpy()
    got = np.asarray(jax.jit(lambda v, xx: jm.apply(v, xx, train=False))(
        variables, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)


def test_swin_taps_match_reference_selection(models):
    tm, jm, variables = models
    x = jnp.zeros((1, T, HW, HW, 3), jnp.float32)
    _, aux = jm.apply(variables, x, train=False, mutable=["taps"])
    taps = flatten_taps(aux["taps"])
    # all LN except patch-embed norm; order util must list exactly these
    expected = {n for n, _ in swin_norm_layers(DEPTHS)}
    assert set(taps) == expected
    assert not any("patch_embed" in n for n in taps)
    # reference-style chosen_blocks select stage 2/3 + final norm
    chosen = select_tap_names(
        taps.keys(), ("backbone.layers.2", "backbone.layers.3", "backbone.norm"))
    assert "backbone.norm" in chosen
    assert any("layers_2" in n for n in chosen)
    assert any("layers_3" in n for n in chosen)
    assert not any("layers_0" in n or "layers_1" in n for n in chosen)


def test_swin_tap_values_match_torch_hook(models):
    """Tap stats equal the reference LN hook math (BTHWC -> permute ->
    channel mean / biased var, norm_stats_utils.py:222-236)."""
    tm, jm, variables = models
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, T, HW, HW, 3)).astype(np.float32)
    captured = {}

    def hook(_m, _i, o):
        c = o.shape[-1]
        feat = o.permute(0, 4, 1, 2, 3).contiguous()
        captured["mean"] = feat.mean((0, 2, 3, 4)).numpy()
        captured["var"] = feat.permute(1, 0, 2, 3, 4).reshape(c, -1).var(
            1, unbiased=False).numpy()

    h = tm.backbone.layers[2].blocks[1].norm1.register_forward_hook(hook)
    with torch.no_grad():
        tm(torch.from_numpy(np.transpose(x, (0, 4, 1, 2, 3))))
    h.remove()
    _, aux = jm.apply(variables, jnp.asarray(x), train=False, mutable=["taps"])
    tap = flatten_taps(aux["taps"])["backbone.layers_2.blocks_1.norm1"]
    np.testing.assert_allclose(np.asarray(tap.mean), captured["mean"],
                               rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(tap.var), captured["var"],
                               rtol=1e-3, atol=1e-5)


def test_factored_relative_position_bias_matches_gather():
    """relative_position_bias (three one-hot einsums, no gather/scatter)
    must equal the reference's table[relative_position_index] lookup
    exactly, for the real Swin-B window and an asymmetric one."""
    import jax.numpy as jnp
    import numpy as np
    from vitta_tpu.models.swin import (relative_position_bias,
                                       relative_position_index)

    for window, nh in (((8, 7, 7), 4), ((2, 3, 4), 2)):
        wd, wh, ww = window
        rows = (2 * wd - 1) * (2 * wh - 1) * (2 * ww - 1)
        rng = np.random.default_rng(rows)
        table = jnp.asarray(rng.normal(size=(rows, nh)).astype(np.float32))
        n = wd * wh * ww
        idx = relative_position_index(window)
        want = np.asarray(table)[np.asarray(idx).reshape(-1)].reshape(n, n, nh)
        t4 = table.reshape(2 * wd - 1, 2 * wh - 1, 2 * ww - 1, nh)
        got = np.asarray(relative_position_bias(t4, window))      # (nh, N, N)
        np.testing.assert_array_equal(got, want.transpose(2, 0, 1))
