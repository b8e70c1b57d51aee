"""I3D — 3D-ResNet backbone + I3D head (secondary model family).

Re-design of reference models/i3d.py + models/backbones/resnet3d.py:

* 5x7x7/2 stem, (1,3,3)/2 max-pool (resnet3d.py:190-198);
* BasicBlock3d (3x3x3 pairs, resnet18/34) and Bottleneck3d
  (1x1x1 / 3x3x3 / 1x1x1, resnet50+), spatial-only downsampling
  stride (1, s, s) (resnet3d.py:19-31);
* I3DHead: global avg-pool + Dropout(0.5) + Linear (i3d.py:28-61);
* ``inflate_conv2d_to_3d`` — 2D->3D weight inflation by temporal
  replication scaled by 1/kt (resnet3d.py:276-307).

Channels-last (B, T, H, W, C); BatchNorm taps fire on every BN3d (the
(N, C, T, H, W) reduction of the reference hook equals our all-but-C
reduction).
"""

from __future__ import annotations


import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from vitta_tpu.models.layers import BatchNorm

I3D_DEPTHS = {
    18: ("basic", (2, 2, 2, 2)),
    34: ("basic", (3, 4, 6, 3)),
    50: ("bottleneck", (3, 4, 6, 3)),
    101: ("bottleneck", (3, 4, 23, 3)),
    152: ("bottleneck", (3, 8, 36, 3)),
}


def _conv3d(features, kernel, stride=(1, 1, 1), name=None):
    pad = [((k - 1) // 2, (k - 1) // 2) for k in kernel]
    return nn.Conv(features, kernel, strides=stride, padding=pad,
                   use_bias=False, name=name)


class BasicBlock3d(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x, **bn_kw):
        identity = x
        s = (1, self.stride, self.stride)
        out = _conv3d(self.planes, (3, 3, 3), s, name="conv1")(x)
        out = BatchNorm(self.planes, name="bn1")(out, **bn_kw)
        out = nn.relu(out)
        out = _conv3d(self.planes, (3, 3, 3), name="conv2")(out)
        out = BatchNorm(self.planes, name="bn2")(out, **bn_kw)
        if self.downsample:
            identity = nn.Conv(self.planes, (1, 1, 1), strides=s,
                               use_bias=False, name="downsample_conv")(x)
            identity = BatchNorm(self.planes, name="downsample_bn")(identity, **bn_kw)
        return nn.relu(out + identity)


class Bottleneck3d(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x, **bn_kw):
        identity = x
        s = (1, self.stride, self.stride)
        out_planes = self.planes * 4
        out = nn.Conv(self.planes, (1, 1, 1), use_bias=False, name="conv1")(x)
        out = BatchNorm(self.planes, name="bn1")(out, **bn_kw)
        out = nn.relu(out)
        out = _conv3d(self.planes, (3, 3, 3), s, name="conv2")(out)
        out = BatchNorm(self.planes, name="bn2")(out, **bn_kw)
        out = nn.relu(out)
        out = nn.Conv(out_planes, (1, 1, 1), use_bias=False, name="conv3")(out)
        out = BatchNorm(out_planes, name="bn3")(out, **bn_kw)
        if self.downsample:
            identity = nn.Conv(out_planes, (1, 1, 1), strides=s,
                               use_bias=False, name="downsample_conv")(x)
            identity = BatchNorm(out_planes, name="downsample_bn")(identity, **bn_kw)
        return nn.relu(out + identity)


class ResNet3d(nn.Module):
    """(B, T, H, W, 3) -> (B, T', H', W', F) feature maps."""

    depth: int = 50

    @nn.compact
    def __call__(self, x, *, use_running_average: bool = True,
                 update_running_stats: bool = False):
        bn_kw = dict(use_running_average=use_running_average,
                     update_running_stats=update_running_stats)
        kind, layers = I3D_DEPTHS[self.depth]
        block = BasicBlock3d if kind == "basic" else Bottleneck3d

        x = nn.Conv(64, (5, 7, 7), strides=(2, 2, 2),
                    padding=[(2, 2), (3, 3), (3, 3)], use_bias=False,
                    name="conv1")(x)
        x = BatchNorm(64, name="bn1")(x, **bn_kw)
        x = nn.relu(x)
        x = nn.max_pool(x, (1, 3, 3), strides=(2, 2, 2),
                        padding=[(0, 0), (1, 1), (1, 1)])

        expansion = 1 if kind == "basic" else 4
        inplanes = 64
        for li, blocks in enumerate(layers, start=1):
            planes = 64 * (2 ** (li - 1))
            for bi in range(blocks):
                stride = 2 if (li > 1 and bi == 0) else 1
                down = (stride != 1) or (inplanes != planes * expansion)
                x = block(planes=planes, stride=stride, downsample=down,
                          name=f"layer{li}_{bi}")(x, **bn_kw)
                inplanes = planes * expansion
        return x


class I3D(nn.Module):
    """Backbone + head (reference i3d.py:7-25)."""

    num_classes: int
    depth: int = 50
    dropout: float = 0.5

    def setup(self):
        self.backbone = ResNet3d(depth=self.depth)
        self.fc_cls = nn.Dense(self.num_classes)
        self.drop = nn.Dropout(self.dropout)

    def __call__(self, x, *, train: bool = False,
                 use_running_average: bool = True,
                 update_running_stats: bool = False):
        feats = self.backbone(x, use_running_average=use_running_average,
                              update_running_stats=update_running_stats)
        pooled = jnp.mean(feats, axis=(1, 2, 3))
        pooled = self.drop(pooled, deterministic=not train)
        return self.fc_cls(pooled)

    def features(self, x, *, use_running_average: bool = True,
                 update_running_stats: bool = False):
        feats = self.backbone(x, use_running_average=use_running_average,
                              update_running_stats=update_running_stats)
        return jnp.mean(feats, axis=(1, 2, 3))

    def classify(self, feats):
        return self.fc_cls(feats)


# alias used by the model-zoo dispatcher
I3DResNet = I3D


def inflate_conv2d_to_3d(w2d: np.ndarray, kt: int) -> np.ndarray:
    """2D (kh, kw, cin, cout) -> 3D (kt, kh, kw, cin, cout) inflation by
    temporal replication / kt (reference resnet3d.py:276-307)."""
    w = np.repeat(w2d[None], kt, axis=0) / float(kt)
    return w.astype(w2d.dtype)
