"""R(2+1)D-18 (secondary model family).

Re-design of reference models/r2plus1d.py (torchvision
``r2plus1d_18`` with a fresh classifier, normal(0.01) init): every 3D
conv factored into a spatial (1,3,3) conv + BN + ReLU + temporal (3,1,1)
conv, with the torchvision midplane formula

    mid = floor(t*s*s*cin*cout*... ) -> (kt*kh*kw*cin*cout) /
          (kh*kw*cin + kt*cout)

Channels-last (B, T, H, W, C); BatchNorm taps throughout.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from vitta_tpu.models.layers import BatchNorm


def _midplanes(cin: int, cout: int, kt=3, kh=3, kw=3) -> int:
    return (kt * kh * kw * cin * cout) // (kh * kw * cin + kt * cout)


class Conv2Plus1D(nn.Module):
    features: int
    stride: tuple = (1, 1, 1)

    @nn.compact
    def __call__(self, x, **bn_kw):
        cin = x.shape[-1]
        mid = _midplanes(cin, self.features)
        st, sh, sw = self.stride
        x = nn.Conv(mid, (1, 3, 3), strides=(1, sh, sw),
                    padding=[(0, 0), (1, 1), (1, 1)], use_bias=False,
                    name="spatial")(x)
        x = BatchNorm(mid, name="bn_mid")(x, **bn_kw)
        x = nn.relu(x)
        return nn.Conv(self.features, (3, 1, 1), strides=(st, 1, 1),
                       padding=[(1, 1), (0, 0), (0, 0)], use_bias=False,
                       name="temporal")(x)


class BasicBlock2Plus1D(nn.Module):
    planes: int
    stride: tuple = (1, 1, 1)
    downsample: bool = False

    @nn.compact
    def __call__(self, x, **bn_kw):
        identity = x
        out = Conv2Plus1D(self.planes, self.stride, name="conv1")(x, **bn_kw)
        out = BatchNorm(self.planes, name="bn1")(out, **bn_kw)
        out = nn.relu(out)
        out = Conv2Plus1D(self.planes, name="conv2")(out, **bn_kw)
        out = BatchNorm(self.planes, name="bn2")(out, **bn_kw)
        if self.downsample:
            identity = nn.Conv(self.planes, (1, 1, 1), strides=self.stride,
                               use_bias=False, name="downsample_conv")(x)
            identity = BatchNorm(self.planes, name="downsample_bn")(identity, **bn_kw)
        return nn.relu(out + identity)


class R2Plus1D(nn.Module):
    """R(2+1)D-18: (B, T, H, W, 3) -> (B, K)."""

    num_classes: int

    @nn.compact
    def __call__(self, x, *, train: bool = False,
                 use_running_average: bool = True,
                 update_running_stats: bool = False):
        bn_kw = dict(use_running_average=use_running_average,
                     update_running_stats=update_running_stats)
        # torchvision R(2+1)D stem: 45 midplanes, (1,7,7)/ (1,2,2) then
        # (3,1,1) temporal
        x = nn.Conv(45, (1, 7, 7), strides=(1, 2, 2),
                    padding=[(0, 0), (3, 3), (3, 3)], use_bias=False,
                    name="stem_spatial")(x)
        x = BatchNorm(45, name="stem_bn_mid")(x, **bn_kw)
        x = nn.relu(x)
        x = nn.Conv(64, (3, 1, 1), padding=[(1, 1), (0, 0), (0, 0)],
                    use_bias=False, name="stem_temporal")(x)
        x = BatchNorm(64, name="stem_bn")(x, **bn_kw)
        x = nn.relu(x)

        for li, (planes, blocks) in enumerate(
                ((64, 2), (128, 2), (256, 2), (512, 2)), start=1):
            for bi in range(blocks):
                stride = (2, 2, 2) if (li > 1 and bi == 0) else (1, 1, 1)
                down = (li > 1 and bi == 0)
                x = BasicBlock2Plus1D(planes=planes, stride=stride,
                                      downsample=down,
                                      name=f"layer{li}_{bi}")(x, **bn_kw)
        feats = jnp.mean(x, axis=(1, 2, 3))
        return nn.Dense(self.num_classes,
                        kernel_init=nn.initializers.normal(0.01),
                        name="clsfr")(feats)
