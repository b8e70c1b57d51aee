"""Loss functions for test-time adaptation.

Exact re-expressions of:

* ``compute_regularization`` (reference utils/norm_stats_utils.py:531-542):
  mean-reduced L1/MSE of variance + of mean, or a KL divergence between
  Gaussians (``compute_kld``, norm_stats_utils.py:8-16).
* ``compute_pred_consis`` (reference utils/pred_consistency_utils.py:15-31):
  softmax each view, mean over views (NOT detached), then **sum-reduced**
  L1 between each view's softmax and the mean, averaged over views.
* ``softmax_entropy`` (reference baselines/tent.py:29-32) for the TENT
  baseline.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vitta_tpu.ops.stats import TapStats


def gaussian_kld(mean_true, mean_pred, var_true, var_pred) -> jax.Array:
    """Sum-reduced KL(N(true) || N(pred)) (norm_stats_utils.py:8-16)."""
    kld = (0.5 * jnp.log(var_pred / var_true)
           + (var_true + jnp.square(mean_true - mean_pred)) / (2.0 * var_pred)
           - 0.5)
    return jnp.sum(kld)


def compute_regularization(source: TapStats, estimate: TapStats,
                           reg_type: str = "l1_loss") -> jax.Array:
    """Alignment loss between source stats and the online estimate.

    Matches norm_stats_utils.py:537-542: ``loss(var) + loss(mean)`` with
    mean reduction for l1/mse.
    """
    if reg_type == "l1_loss":
        return (jnp.mean(jnp.abs(source.var - estimate.var))
                + jnp.mean(jnp.abs(source.mean - estimate.mean)))
    elif reg_type == "mse_loss":
        return (jnp.mean(jnp.square(source.var - estimate.var))
                + jnp.mean(jnp.square(source.mean - estimate.mean)))
    elif reg_type == "kld":
        return gaussian_kld(source.mean, estimate.mean, source.var, estimate.var)
    raise NotImplementedError(f"reg_type={reg_type}")


def pred_consistency(view_logits: jax.Array) -> jax.Array:
    """Prediction-consistency loss over augmented views.

    ``view_logits``: (batch, n_views, n_class) pre-softmax.
    Per pred_consistency_utils.py:15-31: per-view softmax; mean softmax
    over views (gradient flows into the mean); sum-reduced L1 of each
    view vs. the mean; average of the per-view sums.
    """
    softmaxs = jax.nn.softmax(view_logits, axis=-1)           # (B, V, K)
    avg = jnp.mean(softmaxs, axis=1, keepdims=True)           # (B, 1, K)
    per_view = jnp.sum(jnp.abs(softmaxs - avg), axis=(0, 2))  # (V,)
    return jnp.mean(per_view)


def softmax_entropy(logits: jax.Array) -> jax.Array:
    """Per-sample entropy of softmax(logits) (baselines/tent.py:29-32)."""
    log_p = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.sum(jnp.exp(log_p) * log_p, axis=-1)


def cross_entropy(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Mean cross-entropy with integer labels (torch CrossEntropyLoss)."""
    log_p = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.take_along_axis(log_p, labels[:, None], axis=-1))


def topk_accuracy(logits: jax.Array, labels: jax.Array, ks=(1, 5)):
    """Top-k precision in percent (reference utils/utils_.py:224-237)."""
    maxk = min(max(ks), logits.shape[-1])
    _, pred = jax.lax.top_k(logits, maxk)                      # (B, maxk)
    correct = (pred == labels[:, None])                        # (B, maxk)
    return tuple(100.0 * jnp.mean(jnp.sum(correct[:, :min(k, maxk)],
                                          axis=1).astype(jnp.float32))
                 for k in ks)
