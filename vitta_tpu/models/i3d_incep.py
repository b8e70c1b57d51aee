"""I3D Inception-v1 (DeepMind I3D) — secondary model family.

Re-design of reference models/i3d_incep.py (Unit3D:48, InceptionModule:124,
InceptionI3d:152): TF-style SAME padding throughout (the reference
hand-computes it; XLA's padding='SAME' is the same rule), BN(eps 1e-3,
momentum 0.01 in torch convention) after every conv, no conv bias, final
global avg-pool + dropout + 1x1x1 logits conv.

Channels-last (B, T, H, W, C) with BatchNorm taps on every BN3d.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from vitta_tpu.models.layers import BatchNorm

# (out channels per branch) for each Inception block, torch reference order:
# b0_1x1, b1_1x1, b1_3x3, b2_1x1, b2_3x3, b3_1x1
INCEPTION_CFG = {
    "Mixed_3b": (64, 96, 128, 16, 32, 32),
    "Mixed_3c": (128, 128, 192, 32, 96, 64),
    "Mixed_4b": (192, 96, 208, 16, 48, 64),
    "Mixed_4c": (160, 112, 224, 24, 64, 64),
    "Mixed_4d": (128, 128, 256, 24, 64, 64),
    "Mixed_4e": (112, 144, 288, 32, 64, 64),
    "Mixed_4f": (256, 160, 320, 32, 128, 128),
    "Mixed_5b": (256, 160, 320, 32, 128, 128),
    "Mixed_5c": (384, 192, 384, 48, 128, 128),
}


class Unit3D(nn.Module):
    features: int
    kernel: Tuple[int, int, int] = (1, 1, 1)
    stride: Tuple[int, int, int] = (1, 1, 1)
    use_bn: bool = True
    activation: bool = True

    @nn.compact
    def __call__(self, x, **bn_kw):
        x = nn.Conv(self.features, self.kernel, strides=self.stride,
                    padding="SAME", use_bias=not self.use_bn, name="conv3d")(x)
        if self.use_bn:
            x = BatchNorm(self.features, eps=1e-3, momentum=0.01, name="bn")(
                x, **bn_kw)
        if self.activation:
            x = nn.relu(x)
        return x


class InceptionModule(nn.Module):
    cfg: Tuple[int, int, int, int, int, int]

    @nn.compact
    def __call__(self, x, **bn_kw):
        c0, c1a, c1b, c2a, c2b, c3 = self.cfg
        b0 = Unit3D(c0, name="b0")(x, **bn_kw)
        b1 = Unit3D(c1a, name="b1a")(x, **bn_kw)
        b1 = Unit3D(c1b, (3, 3, 3), name="b1b")(b1, **bn_kw)
        b2 = Unit3D(c2a, name="b2a")(x, **bn_kw)
        b2 = Unit3D(c2b, (3, 3, 3), name="b2b")(b2, **bn_kw)
        b3 = nn.max_pool(x, (3, 3, 3), strides=(1, 1, 1), padding="SAME")
        b3 = Unit3D(c3, name="b3b")(b3, **bn_kw)
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


class InceptionI3d(nn.Module):
    """(B, T, H, W, 3) -> (B, K)."""

    num_classes: int
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x, *, train: bool = False,
                 use_running_average: bool = True,
                 update_running_stats: bool = False):
        bn_kw = dict(use_running_average=use_running_average,
                     update_running_stats=update_running_stats)
        x = Unit3D(64, (7, 7, 7), (2, 2, 2), name="Conv3d_1a_7x7")(x, **bn_kw)
        x = nn.max_pool(x, (1, 3, 3), strides=(1, 2, 2), padding="SAME")
        x = Unit3D(64, name="Conv3d_2b_1x1")(x, **bn_kw)
        x = Unit3D(192, (3, 3, 3), name="Conv3d_2c_3x3")(x, **bn_kw)
        x = nn.max_pool(x, (1, 3, 3), strides=(1, 2, 2), padding="SAME")
        x = InceptionModule(INCEPTION_CFG["Mixed_3b"], name="Mixed_3b")(x, **bn_kw)
        x = InceptionModule(INCEPTION_CFG["Mixed_3c"], name="Mixed_3c")(x, **bn_kw)
        x = nn.max_pool(x, (3, 3, 3), strides=(2, 2, 2), padding="SAME")
        for name in ("Mixed_4b", "Mixed_4c", "Mixed_4d", "Mixed_4e", "Mixed_4f"):
            x = InceptionModule(INCEPTION_CFG[name], name=name)(x, **bn_kw)
        x = nn.max_pool(x, (2, 2, 2), strides=(2, 2, 2), padding="SAME")
        x = InceptionModule(INCEPTION_CFG["Mixed_5b"], name="Mixed_5b")(x, **bn_kw)
        x = InceptionModule(INCEPTION_CFG["Mixed_5c"], name="Mixed_5c")(x, **bn_kw)
        x = jnp.mean(x, axis=(1, 2, 3))                       # global avg pool
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        # reference 'logits' is a 1x1x1 conv == Dense on pooled features
        return nn.Dense(self.num_classes, name="logits")(x)
