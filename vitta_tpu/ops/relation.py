"""Relation-map / pairwise-similarity statistics (ablation machinery).

Functional re-expression of reference utils/relation_map_utils.py:

* ``get_upper_triangle_idx_pair`` / ``compute_upper_triangle_similarity``
  (:18-43): cosine similarity for all unordered element pairs;
* ``compute_exp_norm_relation_map`` (:11-16): row-normalized exponential
  relation map;
* the per-stat-type rearrangements of ``ComputePairwiseSimilarityHook``
  (:116-185): 'temp' -> (N, T, CHW), 'spatiotemp' -> (N, THW, C),
  'channel' -> (N, C, THW), 'spatial' -> PCA-reduced (N, HW, T);
* cossim regularization of ``CombineCossimRegHook`` (:186-331).

Used by the ``stat_reg='cossim'`` ablation and the
``compute_cos_similarity`` precompute (corpus/basics.py:311-401).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def upper_triangle_idx(n: int) -> Tuple[np.ndarray, np.ndarray]:
    """Index pairs (i, j), i<j, in the reference's enumeration order
    (relation_map_utils.py:18-28)."""
    i1, i2 = [], []
    for v in range(n - 1):
        i1 += [v] * (n - 1 - v)
    for s in range(1, n):
        i2 += list(range(s, n))
    return np.asarray(i1), np.asarray(i2)


def upper_triangle_cosine(feature: jax.Array) -> jax.Array:
    """feature (N, E, D) -> (N, E*(E-1)/2) pairwise cosine similarities."""
    n, e, d = feature.shape
    i1, i2 = upper_triangle_idx(e)
    a = feature[:, i1]
    b = feature[:, i2]
    num = jnp.sum(a * b, -1)
    den = jnp.linalg.norm(a, axis=-1) * jnp.linalg.norm(b, axis=-1)
    return num / jnp.maximum(den, 1e-8)


def exp_norm_relation_map(sym: jax.Array) -> jax.Array:
    """(N, E, E) -> row-sum-normalized exp map (relation_map_utils.py:11-16)."""
    ex = jnp.exp(sym)
    return ex / jnp.sum(ex, axis=2, keepdims=True)


def _rearrange_ncthw(x: jax.Array, stat_type: str) -> jax.Array:
    """x is channels-last (N, T, H, W, C) -> (N, E, D) per stat type."""
    n, t, h, w, c = x.shape
    if stat_type == "temp":
        return jnp.transpose(x, (0, 1, 4, 2, 3)).reshape(n, t, c * h * w)
    if stat_type == "spatiotemp":
        return x.reshape(n, t * h * w, c)
    if stat_type == "channel":
        return jnp.transpose(x, (0, 4, 1, 2, 3)).reshape(n, c, t * h * w)
    if stat_type == "spatial":
        # PCA-reduce (HW, CT) columns to T (relation_map_utils.py:170-175)
        flat = jnp.transpose(x, (0, 4, 1, 2, 3)).reshape(n * c * t, h * w).T
        # torch.pca_lowrank equivalent: center + truncated SVD
        centered = flat - jnp.mean(flat, axis=0, keepdims=True)
        u, s, _ = jnp.linalg.svd(centered, full_matrices=False)
        red = (u[:, :t] * s[:t]).T                    # (T', HW)-ish
        return red.reshape(1, *red.shape)
    raise NotImplementedError(stat_type)


def pairwise_similarity(x: jax.Array, stat_type: str = "temp") -> jax.Array:
    """Batch-mean upper-triangle cosine similarity vector of a
    channels-last feature tensor (ComputePairwiseSimilarityHook)."""
    feat = _rearrange_ncthw(x, stat_type)
    return jnp.mean(upper_triangle_cosine(feat), axis=0)


def relation_map(x: jax.Array, stat_type: str = "temp") -> jax.Array:
    """Batch-mean exp-normalized relation map (ComputeRelationMapHook)."""
    feat = _rearrange_ncthw(x, stat_type)
    sym = jnp.einsum("ned,nfd->nef", feat, feat)
    return jnp.mean(exp_norm_relation_map(sym), axis=0)


def cossim_regularization(sim_true: jax.Array, sim_pred: jax.Array,
                          reg_type: str = "l1_loss") -> jax.Array:
    if reg_type == "l1_loss":
        return jnp.mean(jnp.abs(sim_pred - sim_true))
    if reg_type == "mse_loss":
        return jnp.mean(jnp.square(sim_pred - sim_true))
    raise NotImplementedError(reg_type)
