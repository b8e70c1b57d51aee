"""Temporal Adaptive Module (TAM) — TPU-native formulation.

Functional re-design of the reference TAM
(models/tanet_models/temporal_module.py:12-65):

* global branch ``G``: Linear(T->2T, no bias) + BN1d + ReLU +
  Linear(2T->K, no bias) + softmax, producing a per-(sample, channel)
  dynamic temporal kernel of size K (=3);
* local branch ``L``: Conv1d(C->C/4, k3, pad1, no bias) + BN1d + ReLU +
  Conv1d(C/4->C, k1, no bias) + sigmoid, a temporal attention over (C,T);
* the dynamic depthwise temporal convolution.

The reference realizes the dynamic conv as a grouped ``F.conv2d`` with
``groups = N*C`` (temporal_module.py:56-61) — a shape XLA/TPU handles
poorly (degenerate 1-wide MXU tiles).  Here it is K fused shift-multiply-
accumulates on the VPU instead: for kernel size 3 the output is
``k0*x[t-1] + k1*x[t] + k2*x[t+1]`` with zero padding, which XLA fuses
with the attention multiply into one elementwise pass — no gather, no
grouped conv, no layout change.

Layout: frames arrive channels-last ``(N*T, H, W, C)``; all temporal
mixing happens on the small pooled ``(N, T, C)`` tensor.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from vitta_tpu.models.layers import BatchNorm


class TAM(nn.Module):
    in_channels: int
    kernel_size: int = 3
    padding: int = 1
    stat_types: Tuple[str, ...] = ("spatiotemp",)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, clip_len: int, *, use_running_average: bool = True,
                 update_running_stats: bool = False):
        nt, h, w, c = x.shape
        t = clip_len
        n = nt // t
        bn_kw = dict(use_running_average=use_running_average,
                     update_running_stats=update_running_stats)

        # spatial pool: (N*T, H, W, C) -> (N, T, C)
        pooled = jnp.mean(x.astype(jnp.float32), axis=(1, 2)).reshape(n, t, c)

        # --- global branch: dynamic kernel, computed per (sample, channel).
        # torch runs G on (N*C, T) (temporal_module.py:52); we keep (N, C, T)
        # folded as the leading batch of a Dense over the T axis.
        g_in = jnp.transpose(pooled, (0, 2, 1)).reshape(n * c, t)      # (N*C, T)
        g = nn.Dense(2 * t, use_bias=False, dtype=jnp.float32, name="g_fc1")(g_in)
        g = BatchNorm(2 * t, stat_types=self.stat_types, name="g_bn")(g, **bn_kw)
        g = nn.relu(g)
        g = nn.Dense(self.kernel_size, use_bias=False, name="g_fc2")(g)
        kernel = nn.softmax(g, axis=-1).reshape(n, c, self.kernel_size)  # (N, C, K)

        # --- local branch: temporal attention over (C, T).
        # torch Conv1d(C, C/4, 3) on (N, C, T) == lax NWC conv on (N, T, C).
        l = nn.Conv(self.in_channels // 4, kernel_size=(self.kernel_size,),
                    padding=[(self.kernel_size // 2,) * 2], use_bias=False,
                    name="l_conv1")(pooled)                             # (N, T, C/4)
        l = BatchNorm(self.in_channels // 4, stat_types=self.stat_types,
                      name="l_bn")(l, **bn_kw)
        l = nn.relu(l)
        l = nn.Conv(self.in_channels, kernel_size=(1,), use_bias=False,
                    name="l_conv2")(l)                                  # (N, T, C)
        attn = nn.sigmoid(l)

        # --- apply attention and the dynamic depthwise temporal conv.
        # One fused Pallas kernel on TPU (fwd + custom VJP) — the jnp
        # shift-MAC formulation cost ~14% of the adaptation step in
        # backward pad/slice/reduce ops (see ops/pallas_tam.py); the jnp
        # reference path is used automatically off-TPU.
        from vitta_tpu.ops.pallas_tam import tam_dynamic_conv
        xv = x.reshape(n, t, h, w, c)
        out = tam_dynamic_conv(xv, attn, kernel)
        return out.reshape(nt, h, w, c)
