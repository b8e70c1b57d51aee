"""Numerical parity: JAX TANet vs plain-torch oracle, through the
checkpoint converter — the round-1 gate of SURVEY.md §7 step 3."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from vitta_tpu.models.tanet import TANet
from vitta_tpu.utils.checkpoint import (convert_tanet_checkpoint,
                                        tanet_norm_layers)
from tests.torch_tanet import TorchTSN, randomize_bn_stats

T = 4
NUM_CLASSES = 7
HW = 32


@pytest.fixture(scope="module")
def models():
    torch.manual_seed(0)
    tm = TorchTSN(NUM_CLASSES, T)
    with torch.no_grad():
        randomize_bn_stats(tm)
    tm.eval()
    variables = convert_tanet_checkpoint(tm.state_dict(), NUM_CLASSES)
    jm = TANet(num_classes=NUM_CLASSES, clip_length=T)
    return tm, jm, variables


def test_forward_parity(models):
    tm, jm, variables = models
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, T, HW, HW, 3)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(np.transpose(x, (0, 1, 4, 2, 3)))).numpy()
    got = np.asarray(jax.jit(
        lambda v, xx: jm.apply(v, xx, train=False))(variables, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)


def test_module_prefix_stripped(models):
    tm, jm, _ = models
    sd = {f"module.{k}": v for k, v in tm.state_dict().items()}
    variables = convert_tanet_checkpoint(sd, NUM_CLASSES)
    assert "new_fc" in variables["params"]


def test_taps_present_and_selectable(models):
    """All BN2d taps appear under the expected names; chosen_blocks
    substring selection (corpus/basics.py:571-587) finds layer3/layer4."""
    tm, jm, variables = models
    x = jnp.zeros((1, T, HW, HW, 3), jnp.float32)
    _, aux = jm.apply(variables, x, train=False, mutable=["taps"])
    flat = jax.tree_util.tree_flatten_with_path(aux["taps"])[0]
    names = set()
    for path, _leaf in flat:
        parts = [p.key for p in path if hasattr(p, "key")]
        names.add(".".join(parts[:-1]))  # drop trailing 'stat'
    expected_bn2d = {n for n, kind in tanet_norm_layers() if kind == "bn2d"}
    assert expected_bn2d <= names, expected_bn2d - names
    chosen = [n for n in names
              if any(b in n for b in ("layer3", "layer4"))]
    # layer3: 6 blocks * 3 bn + 1 downsample = 19 BN2d, + 6*2 TAM BN1d = 31
    # layer4: 3*3+1 = 10 BN2d, + 3*2 BN1d = 16; BN1d taps are later excluded
    # by the source-stat filter (None placeholders, basics.py:488-498)
    assert len([n for n in chosen if "layer3" in n]) == 31
    assert len([n for n in chosen if "layer4" in n]) == 16


def test_tap_values_match_torch_hook(models):
    """Tap statistics equal the reference hook math on the same torch
    activations (norm_stats_utils.py:238-253) for a sample layer."""
    tm, jm, variables = models
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, T, HW, HW, 3)).astype(np.float32)

    captured = {}

    def hook(_m, _i, o):
        c = o.shape[1]
        feat = o.view(-1, T, c, o.shape[2], o.shape[3]).permute(0, 2, 1, 3, 4)
        captured["mean"] = feat.mean((0, 2, 3, 4)).detach().numpy()
        captured["var"] = (feat.permute(1, 0, 2, 3, 4).contiguous()
                           .view([c, -1]).var(1, unbiased=False).detach().numpy())

    h = tm.base_model.layer3[1].net.bn2.register_forward_hook(hook)
    with torch.no_grad():
        tm(torch.from_numpy(np.transpose(x, (0, 1, 4, 2, 3))))
    h.remove()

    _, aux = jm.apply(variables, jnp.asarray(x), train=False, mutable=["taps"])
    tap = aux["taps"]["base_model"]["layer3_1"]["bn2"]["stat"]
    np.testing.assert_allclose(np.asarray(tap.mean), captured["mean"],
                               rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(tap.var), captured["var"],
                               rtol=1e-3, atol=1e-5)
