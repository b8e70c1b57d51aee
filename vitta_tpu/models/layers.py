"""Norm layers with statistic taps, and conv helpers.

These replace the reference's *mutable hook on mutable module* pattern
(utils/norm_stats_utils.py hooks registered in corpus/basics.py:565-600)
with norm modules that *sow* their output channel statistics into a
``taps`` collection.  When the ``taps`` collection is not marked mutable
(plain inference) the sown reductions are dead code and XLA eliminates
them — the functional equivalent of "remove hooks before inference"
(corpus/basics.py:682-686).

BatchNorm is hand-rolled (rather than ``flax.linen.BatchNorm``) because
the TTA baselines need all three behaviors:

* inference form (``fix_BNS=True``, corpus/basics.py:606-611) — default;
* batch-stat normalization (NORM baseline, baselines/norm.py);
* running-stat EMA updates without gradient steps (DUA, baselines/dua.py).

Layout convention: channels-last everywhere (TPU native).  2D features
are ``(N*T, H, W, C)``; the tap's spatiotemporal statistics are invariant
to the (N,T)-fold so this matches the reference's
``(N*T,C,H,W)->(N,C,T,H,W)`` reshape before reduction
(norm_stats_utils.py:186-236).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from vitta_tpu.ops.stats import TapStats, channel_stats

# Tap collection name used across the framework.
TAPS = "taps"

STAT_TYPES = ("spatiotemp", "spatial", "temp", "temp_v2", "cossim")

# Leaf carrying the reference's per-layer batch count ``bz`` — the ``n``
# of the cumulative meters (AverageMeterTensor.update(value, n=bz),
# norm_stats_utils.py:177-182,244-249): the folded (views x videos) batch
# for 4D/5D features, the raw leading dim for BN1d-style features.
COUNT_LEAF = "stat_n"


def _tap_overwrite(old, new):
    return new


def tap_leaf_name(stat_type: str, input_side: bool = False) -> str:
    """Leaf name in the ``taps`` collection for a statistic type.

    ``spatiotemp`` keeps the round-1 names (``stat`` / ``stat_in``); other
    types get suffixed leaves so several can coexist (the reference's
    ComputeNormStatsHook is parameterized the same way,
    norm_stats_utils.py:80-98)."""
    base = "stat_in" if input_side else "stat"
    return base if stat_type == "spatiotemp" else f"{base}_{stat_type}"


def _sow_cossim(mod: nn.Module, x, leaf: str, clip_len: int) -> None:
    """Sow the temporal pairwise-similarity vector, wrapped as a
    TapStats with zero variance so the EMA/cumulative meters and the
    l1/mse regularization apply unchanged (the var term contributes 0,
    making compute_regularization coincide with the reference's cossim
    l1_loss/mse_loss, relation_map_utils.py:326-331).

    Feature handling mirrors CombineCossimRegHook.hook_fn
    (relation_map_utils.py:254-299): 5D/unfolded-4D features give the
    (T, T) upper-triangle map over CHW rows; rank-3 BN1d features the
    (T, T) map over C rows; rank-2 features have no relation map
    (sim_vec None, relation_map_utils.py:129-132) — no tap sown.
    """
    from vitta_tpu.ops.relation import (pairwise_similarity,
                                        upper_triangle_cosine)
    sim = None
    if x.ndim == 5:
        sim = pairwise_similarity(x, "temp")
    elif x.ndim == 4 and clip_len > 0:
        xr = x.reshape(x.shape[0] // clip_len, clip_len, *x.shape[1:])
        sim = pairwise_similarity(xr, "temp")
    elif x.ndim == 3:                    # (N, T, C) channels-last BN1d
        sim = jnp.mean(upper_triangle_cosine(x), axis=0)
    if sim is not None:
        mod.sow(TAPS, leaf, TapStats(sim, jnp.zeros_like(sim)),
                reduce_fn=_tap_overwrite)


def _sow_typed_stats(mod: nn.Module, x, stat_types: Tuple[str, ...],
                     clip_len: int, input_side: bool = False,
                     count: Optional[float] = None) -> None:
    """Sow one tap per requested statistic type.

    Mirrors ComputeNormStatsHook.compute_stat_for_NCTHW
    (norm_stats_utils.py:80-98): 2D features (N*T, H, W, C) are unfolded
    by ``clip_len`` for the time-resolved types; BN1d-style low-rank
    features get the 'temp' reduction, which in channels-last layout
    coincides with the full per-channel reduction (norm_stats_utils.py:32-53).
    """
    for st in stat_types:
        if st not in STAT_TYPES:
            raise NotImplementedError(f"stat_type={st!r}")
        leaf = tap_leaf_name(st, input_side)
        if st == "cossim":
            _sow_cossim(mod, x, leaf, clip_len)
        elif st == "spatiotemp":
            mod.sow(TAPS, leaf, channel_stats(x), reduce_fn=_tap_overwrite)
        elif x.ndim >= 5:                       # (N, T, H, W, C)
            mod.sow(TAPS, leaf, channel_stats(x, stat_type=st, time_axis=1),
                    reduce_fn=_tap_overwrite)
        elif x.ndim == 4:                       # (N*T, H, W, C): unfold time
            if clip_len <= 0:
                raise ValueError(
                    f"stat_type={st!r} on a 2D-feature norm layer needs clip_len "
                    "(the reference hook receives it at registration, "
                    "norm_stats_utils.py:22)")
            xr = x.reshape(x.shape[0] // clip_len, clip_len, *x.shape[1:])
            mod.sow(TAPS, leaf, channel_stats(xr, stat_type=st, time_axis=1),
                    reduce_fn=_tap_overwrite)
        elif st in ("temp", "temp_v2"):         # BN1d features, rank 2/3
            mod.sow(TAPS, leaf, channel_stats(x), reduce_fn=_tap_overwrite)
        # 'spatial' on BN1d features: undefined — the reference emits None
        # placeholders at BatchNorm1d positions (basics.py:873-880); the
        # omitted tap is the placeholder here.
    if not input_side and stat_types:
        # reference bz for this layer's feature (see COUNT_LEAF); ``count``
        # overrides when the caller's layout folds extra axes into dim 0
        # (window-resident Swin: (B*nW, N, C) carries bz == B)
        if count is None:
            count = x.shape[0] // clip_len if (x.ndim == 4 and clip_len > 0) \
                else x.shape[0]
        mod.sow(TAPS, COUNT_LEAF, jnp.float32(count), reduce_fn=_tap_overwrite)


class BatchNorm(nn.Module):
    """BatchNorm (any rank, channels-last) in explicit-state form.

    Matches torch BatchNorm semantics: eps 1e-5, running-stat momentum
    0.1, *unbiased* variance for the running-var update but biased for
    batch normalization (torch F.batch_norm behavior).
    """

    features: int
    eps: float = 1e-5
    momentum: float = 0.1
    tap: bool = True
    stat_types: Tuple[str, ...] = ("spatiotemp",)
    clip_len: int = 0        # needed to unfold (N*T, ...) for time-resolved types
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, *, use_running_average: bool = True,
                 update_running_stats: bool = False):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((self.features,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((self.features,), jnp.float32))

        xf = x.astype(jnp.float32)
        if self.tap:
            # input-side stats serve the before_norm option and the BNS
            # regularization (BNFeatureHook compares the BN *input* batch
            # stats against the layer's running stats, BNS_utils.py:19-77);
            # dead-code-eliminated when unused.
            _sow_typed_stats(self, xf, self.stat_types, self.clip_len,
                             input_side=True)
        reduce_axes = tuple(range(x.ndim - 1))
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            mean = jnp.mean(xf, axis=reduce_axes)
            var = jnp.mean(jnp.square(xf), axis=reduce_axes) - jnp.square(mean)
            if update_running_stats and not self.is_initializing():
                n = xf.size / self.features
                unbiased = var * (n / max(n - 1.0, 1.0))
                ra_mean.value = ((1 - self.momentum) * ra_mean.value
                                 + self.momentum * mean)
                ra_var.value = ((1 - self.momentum) * ra_var.value
                                + self.momentum * unbiased)
        inv = jax.lax.rsqrt(var + self.eps) * scale
        y = (xf - mean) * inv + bias
        y = y.astype(x.dtype)
        if self.tap:
            # channel stats of the normalized output (before_norm=False
            # default path, norm_stats_utils.py:154).
            _sow_typed_stats(self, y.astype(jnp.float32), self.stat_types,
                             self.clip_len)
        return y


class LayerNorm(nn.Module):
    """LayerNorm over the last axis with an output-stat tap.

    The Swin tap points are all LayerNorms except the patch-embed one
    (corpus/basics.py:500-505); features at those points are
    (B, T, H, W, C) — exactly our layout, so the tap's reduction equals
    the reference's BTHWC->BCTHW permute + reduce
    (norm_stats_utils.py:222-236).
    """

    features: int
    eps: float = 1e-5
    tap: bool = True
    stat_types: Tuple[str, ...] = ("spatiotemp",)

    @nn.compact
    def __call__(self, x, mode: str = "full",
                 stat_count: Optional[int] = None):
        """mode:
        * "full" — normalize ``x`` and return y (taps on both sides);
        * "params" — sow the input-side tap of ``x`` and return
          ``(scale, bias)`` for a fused consumer (ops/pallas_mlp.py
          computes the normalization in the MLP kernel's scratch);
        * "sow_output" — ``x`` is the externally computed y: sow the
          output-side tap under this module's scope (tap names must not
          move when the normalize itself is fused away) and return it.

        ``stat_count`` overrides the tap's COUNT_LEAF when dim 0 of ``x``
        is not the reference batch (window-resident Swin layout).
        """
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        if mode == "sow_output":
            if self.tap:
                _sow_typed_stats(self, x.astype(jnp.float32),
                                 self.stat_types, 0, count=stat_count)
            return x
        if self.tap:
            _sow_typed_stats(self, x.astype(jnp.float32), self.stat_types, 0,
                             input_side=True)
        if mode == "params":
            return scale, bias
        c = x.shape[-1]
        rows = x.size // c
        if jax.default_backend() == "tpu" and rows % 8 == 0 and c % 128 == 0:
            # fused one-read-one-write kernel (ops/pallas_ln.py): XLA's
            # separate lane-axis reductions + normalize profiled 17x off
            # HBM bandwidth across Swin-B's ~50 LayerNorms
            from vitta_tpu.ops.pallas_ln import layer_norm_pallas
            y = layer_norm_pallas(x.reshape(rows, c), scale, bias,
                                  self.eps).reshape(x.shape)
        else:
            xf = x.astype(jnp.float32)
            # one-pass E[x^2]-E[x]^2 in f32: normalized-scale activations
            # make cancellation a non-issue, and one pass saves a full
            # activation read per LN
            mean = jnp.mean(xf, axis=-1, keepdims=True)
            mean_sq = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
            var = mean_sq - jnp.square(mean)
            y = (xf - mean) * jax.lax.rsqrt(var + self.eps) * scale + bias
            y = y.astype(x.dtype)
        if self.tap:
            _sow_typed_stats(self, y.astype(jnp.float32), self.stat_types, 0,
                             count=stat_count)
        return y


def max_pool_torch(x, window: int, stride: int, padding: int):
    """torch MaxPool2d with explicit padding (pads with -inf)."""
    return nn.max_pool(
        x, (window, window), strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)])


def global_avg_pool_2d(x):
    """AdaptiveAvgPool2d(1) over (N, H, W, C) -> (N, C)."""
    return jnp.mean(x, axis=(1, 2))
