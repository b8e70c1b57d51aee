"""Shape/tap smoke tests for the secondary model families
(I3D-ResNet, R(2+1)D, VideoMAE)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vitta_tpu.adapt.engine import flatten_taps
from vitta_tpu.models.i3d import I3D, inflate_conv2d_to_3d
from vitta_tpu.models.r2plus1d import R2Plus1D
from vitta_tpu.models.videomae import VideoMAE

K = 5


def _init_apply(model, x):
    rng = jax.random.PRNGKey(0)
    variables = model.init({"params": rng, "dropout": rng}, x, train=False)
    out, aux = model.apply(variables, x, train=False, mutable=["taps"])
    return out, aux


@pytest.mark.parametrize("depth,blocks_bn", [(18, "bn2"), (50, "bn3")])
@pytest.mark.slow  # forward compile of a full model
def test_i3d_shapes_and_taps(depth, blocks_bn):
    x = jnp.zeros((1, 4, 32, 32, 3), jnp.float32)
    model = I3D(num_classes=K, depth=depth)
    out, aux = _init_apply(model, x)
    assert out.shape == (1, K)
    taps = flatten_taps(aux["taps"])
    assert "backbone.bn1" in taps
    assert f"backbone.layer4_0.{blocks_bn}" in taps
    assert taps["backbone.bn1"].mean.shape == (64,)


def test_i3d_inflation():
    w2d = np.random.default_rng(0).normal(size=(7, 7, 3, 64)).astype(np.float32)
    w3d = inflate_conv2d_to_3d(w2d, 5)
    assert w3d.shape == (5, 7, 7, 3, 64)
    # sum over temporal axis reproduces the 2D kernel (energy preserved)
    np.testing.assert_allclose(w3d.sum(0), w2d, rtol=1e-6)


@pytest.mark.slow  # forward compile of a full model
def test_r2plus1d_shapes():
    x = jnp.zeros((1, 4, 32, 32, 3), jnp.float32)
    model = R2Plus1D(num_classes=K)
    out, aux = _init_apply(model, x)
    assert out.shape == (1, K)
    taps = flatten_taps(aux["taps"])
    assert any("layer4" in n for n in taps)


@pytest.mark.slow  # forward compile of a full model
def test_i3d_inception_shapes():
    from vitta_tpu.models.i3d_incep import InceptionI3d
    x = jnp.zeros((1, 8, 32, 32, 3), jnp.float32)
    model = InceptionI3d(num_classes=K)
    out, aux = _init_apply(model, x)
    assert out.shape == (1, K)
    taps = flatten_taps(aux["taps"])
    assert "Mixed_5c.b0.bn" in taps


@pytest.mark.slow  # forward compile of a full model
def test_videomae_shapes_and_ln_taps():
    x = jnp.zeros((1, 4, 32, 32, 3), jnp.float32)
    model = VideoMAE(num_classes=K, embed_dim=32, depth=2, num_heads=2)
    out, aux = _init_apply(model, x)
    assert out.shape == (1, K)
    taps = flatten_taps(aux["taps"])
    assert "blocks_0.norm1" in taps and "norm" in taps


def test_videomae_checkpoint_converter():
    """timm-style VideoMAE state_dict -> flax variables (incl. the split
    q_bias/v_bias convention with zero k bias)."""
    import torch
    import torch.nn as nn
    from vitta_tpu.utils.checkpoint import convert_videomae_checkpoint

    D, DEPTH = 32, 2

    class Block(nn.Module):
        def __init__(self):
            super().__init__()
            self.norm1, self.norm2 = nn.LayerNorm(D), nn.LayerNorm(D)
            self.attn = nn.Module()
            self.attn.qkv = nn.Linear(D, 3 * D)
            self.attn.proj = nn.Linear(D, D)
            self.mlp = nn.Module()
            self.mlp.fc1 = nn.Linear(D, 4 * D)
            self.mlp.fc2 = nn.Linear(4 * D, D)

    class TorchViT(nn.Module):
        def __init__(self):
            super().__init__()
            self.patch_embed = nn.Module()
            self.patch_embed.proj = nn.Conv3d(3, D, (2, 16, 16), (2, 16, 16))
            self.blocks = nn.ModuleList([Block() for _ in range(DEPTH)])
            self.norm = nn.LayerNorm(D)
            self.head = nn.Linear(D, K)

    torch.manual_seed(0)
    variables = convert_videomae_checkpoint(TorchViT().state_dict(), K,
                                            depth=DEPTH)
    model = VideoMAE(num_classes=K, embed_dim=D, depth=DEPTH, num_heads=2,
                     drop_path_rate=0.0)
    out = model.apply(variables, jnp.zeros((1, 4, 32, 32, 3), jnp.float32),
                      train=False)
    assert out.shape == (1, K)
