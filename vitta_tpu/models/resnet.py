"""ResNet-50 backbone with optional per-bottleneck TAM (TANet).

TPU-native re-design of the reference base model
(models/tanet_models/tanet.py:125-150 building torchvision resnet50 with
``make_temporal_modeling`` patching every Bottleneck into a
TemporalBottleneck, temporal_module.py:68-140).

* channels-last (NHWC) frames — XLA:TPU's native conv layout;
* stride on the 3x3 conv2 (torchvision v1.5 Bottleneck);
* TAM inserted after conv1/bn1/relu (temporal_module.py:85-91);
* every BatchNorm sows output channel stats into the ``taps`` collection
  (the reference registers hooks on all BN2d in chosen blocks,
  corpus/basics.py:565-587).

Module names mirror the torch checkpoint layout (``layer3_2`` for torch
``layer3.2``) so checkpoint conversion and ``chosen_blocks`` substring
selection (e.g. "layer3") behave identically.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from vitta_tpu.models.layers import BatchNorm, max_pool_torch, global_avg_pool_2d
from vitta_tpu.models.tam import TAM


class Bottleneck(nn.Module):
    """torchvision Bottleneck (+TAM) with expansion 4."""

    planes: int
    stride: int = 1
    downsample: bool = False
    use_tam: bool = True
    stat_types: Tuple[str, ...] = ("spatiotemp",)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, clip_len: int, *, use_running_average: bool = True,
                 update_running_stats: bool = False):
        bn_kw = dict(use_running_average=use_running_average,
                     update_running_stats=update_running_stats)
        mk_kw = dict(stat_types=self.stat_types, clip_len=clip_len)
        out_planes = self.planes * 4
        identity = x

        out = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype, name="conv1")(x)
        out = BatchNorm(self.planes, name="bn1", **mk_kw)(out, **bn_kw)
        out = nn.relu(out)
        if self.use_tam:
            out = TAM(self.planes, dtype=self.dtype, stat_types=self.stat_types, name="tam")(out, clip_len, **bn_kw)

        out = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                      padding=[(1, 1), (1, 1)], use_bias=False,
                      dtype=self.dtype, name="conv2")(out)
        out = BatchNorm(self.planes, name="bn2", **mk_kw)(out, **bn_kw)
        out = nn.relu(out)

        out = nn.Conv(out_planes, (1, 1), use_bias=False, dtype=self.dtype, name="conv3")(out)
        out = BatchNorm(out_planes, name="bn3", **mk_kw)(out, **bn_kw)

        if self.downsample:
            identity = nn.Conv(out_planes, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype,
                               name="downsample_conv")(x)
            identity = BatchNorm(out_planes, name="downsample_bn", **mk_kw)(identity, **bn_kw)
        return nn.relu(out + identity)


RESNET50_LAYERS: Tuple[Tuple[int, int, int], ...] = (
    # (planes, blocks, first-stride)
    (64, 3, 1),
    (128, 4, 2),
    (256, 6, 2),
    (512, 3, 2),
)


class ResNetTAM(nn.Module):
    """ResNet-50 (+TAM) feature extractor: (N*T, H, W, 3) -> (N*T, 2048)."""

    use_tam: bool = True
    stat_types: Tuple[str, ...] = ("spatiotemp",)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, clip_len: int, *, use_running_average: bool = True,
                 update_running_stats: bool = False):
        bn_kw = dict(use_running_average=use_running_average,
                     update_running_stats=update_running_stats)
        x = x.astype(self.dtype)
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = BatchNorm(64, name="bn1", stat_types=self.stat_types,
                      clip_len=clip_len)(x, **bn_kw)
        x = nn.relu(x)
        x = max_pool_torch(x, 3, 2, 1)

        for li, (planes, blocks, stride) in enumerate(RESNET50_LAYERS, start=1):
            for bi in range(blocks):
                x = Bottleneck(
                    planes=planes,
                    stride=stride if bi == 0 else 1,
                    downsample=(bi == 0),
                    use_tam=self.use_tam,
                    stat_types=self.stat_types,
                    dtype=self.dtype,
                    name=f"layer{li}_{bi}",
                )(x, clip_len, **bn_kw)
        return global_avg_pool_2d(x.astype(jnp.float32))
