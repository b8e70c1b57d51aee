"""Feature-statistic computation — the functional core of ViTTA.

Re-expresses the reference's forward-hook statistics engine
(reference utils/norm_stats_utils.py:18-258) as pure functions over
channels-last feature tensors.

Reference semantics being replicated exactly:

* ``compute_stat_for_NCTHW`` / ``compute_reg_for_NCTHW``
  (norm_stats_utils.py:80-98, 238-253): per-channel mean and *biased*
  variance over all non-channel axes ("spatiotemp"), or partial
  reductions for "spatial" / "temp" / "temp_v2" stat types.
* Multi-view inputs fold the view axis into batch — a single statistic
  over the combined volume ("onereg", norm_stats_utils.py:186-204).
* ``MovingAverageTensor`` (utils/utils_.py:204-211):
  ``avg = m*val + (1-m)*stop_gradient(avg_prev)`` with ``avg0 = 0`` —
  gradient flows only through the current batch's contribution.
* ``AverageMeterTensor`` (utils/utils_.py:190-202):
  ``sum = stop_gradient(sum) + val*n; avg = sum/count`` — same property
  for the cumulative mean.

TPU notes: statistics are reduced at the tap point inside the model
forward, so a (N,T,H,W,C) activation collapses to two (C,) vectors
before leaving the fusion — XLA fuses the reduction into the producing
op's epilogue and no extra HBM round-trip is paid.  Variance uses the
one-pass E[x^2] - E[x]^2 form in float32: normalized features are O(1)
so cancellation is not a concern, and one pass halves the read traffic
versus torch's two-pass ``.var()``.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class TapStats(NamedTuple):
    """Per-layer channel statistics captured at a tap point."""

    mean: jax.Array  # (C,) for 'spatiotemp'
    var: jax.Array   # (C,) biased variance


def channel_stats(x: jax.Array, channel_axis: int = -1,
                  stat_type: str = "spatiotemp",
                  time_axis: int | None = None) -> TapStats:
    """Channel mean/biased-variance of a feature tensor.

    ``x`` is channels-last ``(..., C)`` (TPU-native layout).  For
    ``spatiotemp`` every non-channel axis is reduced, which subsumes the
    reference's per-layer-type reshapes (norm_stats_utils.py:59-79):
    (N*T,H,W,C), (N,T,H,W,C) and (N,V,T,H,W,C) all reduce identically
    because views/time are folded into the reduction either way.

    ``spatial`` keeps (C, T): requires ``time_axis``.
    ``temp`` keeps (C, H, W): reduces over batch and ``time_axis`` only
    (reference norm_stats_utils.py:84-89).
    ``temp_v2`` first averages spatial dims then reduces over (N, T).
    """
    x = x.astype(jnp.float32)
    ndim = x.ndim
    caxis = channel_axis % ndim
    if stat_type == "spatiotemp":
        axes = tuple(a for a in range(ndim) if a != caxis)
        mean = jnp.mean(x, axis=axes)
        mean_sq = jnp.mean(jnp.square(x), axis=axes)
        return TapStats(mean, mean_sq - jnp.square(mean))
    elif stat_type == "spatial":
        if time_axis is None:
            raise ValueError("stat_type='spatial' needs time_axis")
        taxis = time_axis % ndim
        axes = tuple(a for a in range(ndim) if a not in (caxis, taxis))
        mean = jnp.mean(x, axis=axes)       # (..., C/T order per axes)
        mean_sq = jnp.mean(jnp.square(x), axis=axes)
        var = mean_sq - jnp.square(mean)
        # normalize to (C, T) ordering like the reference (C, T)
        if caxis > taxis:
            mean, var = mean.T, var.T
        return TapStats(mean, var)
    elif stat_type == "temp":
        if time_axis is None:
            raise ValueError("stat_type='temp' needs time_axis")
        taxis = time_axis % ndim
        axes = (0, taxis) if taxis != 0 else (0,)
        mean = jnp.mean(x, axis=axes)        # (H, W, C) for NTHWC input
        mean_sq = jnp.mean(jnp.square(x), axis=axes)
        var = mean_sq - jnp.square(mean)
        # reference layout is (C, H, W) (norm_stats_utils.py:86-89)
        mean = jnp.moveaxis(mean, -1, 0)
        var = jnp.moveaxis(var, -1, 0)
        return TapStats(mean, var)
    elif stat_type == "temp_v2":
        if time_axis is None:
            raise ValueError("stat_type='temp_v2' needs time_axis")
        taxis = time_axis % ndim
        spatial_axes = tuple(a for a in range(ndim) if a not in (caxis, taxis) and a != 0)
        xs = jnp.mean(x, axis=spatial_axes)  # (N, T, C)-ish
        caxis2 = sum(1 for a in (0, taxis) if a < caxis)  # new channel pos
        axes2 = tuple(a for a in range(xs.ndim) if a != caxis2)
        mean = jnp.mean(xs, axis=axes2)
        mean_sq = jnp.mean(jnp.square(xs), axis=axes2)
        return TapStats(mean, mean_sq - jnp.square(mean))
    else:
        raise NotImplementedError(f"stat_type={stat_type}")


def ema_update(ema: TapStats, batch: TapStats, momentum: float | jax.Array) -> TapStats:
    """MovingAverageTensor.update (reference utils/utils_.py:210-211).

    ``avg = m*val + (1-m)*stop_gradient(avg)``; the regularization loss is
    evaluated on the *updated* average, so the gradient w.r.t. the current
    batch statistic is scaled by ``m``.
    """
    return TapStats(
        momentum * batch.mean + (1.0 - momentum) * jax.lax.stop_gradient(ema.mean),
        momentum * batch.var + (1.0 - momentum) * jax.lax.stop_gradient(ema.var),
    )


class CumulativeState(NamedTuple):
    """AverageMeterTensor state (reference utils/utils_.py:190-202)."""

    sum_mean: jax.Array
    sum_var: jax.Array
    count: jax.Array  # scalar float


def cumulative_update(state: CumulativeState, batch: TapStats,
                      n: float | jax.Array) -> Tuple[CumulativeState, TapStats]:
    """``sum = stop_grad(sum) + val*n; avg = sum/count`` per utils_.py:198-202."""
    new = CumulativeState(
        jax.lax.stop_gradient(state.sum_mean) + batch.mean * n,
        jax.lax.stop_gradient(state.sum_var) + batch.var * n,
        state.count + n,
    )
    return new, TapStats(new.sum_mean / new.count, new.sum_var / new.count)
