"""Source-statistic precompute — sharded map over the training set.

Re-design of ``compute_statistics`` (corpus/basics.py:220-309): run the
clean training list through the model with statistic taps, accumulate
per-layer channel mean/variance weighted by batch size
(``AverageMeter.update(value, n=batch)``, basics.py:298-300 — note the
reference averages per-batch *biased variances*, not the variance of the
pooled set; replicated here), and save both the reference-compatible
object-array ``.npy`` pair (basics.py:306-307) and a name-keyed ``.npz``.

TPU-native: the per-batch forward is jitted with the batch axis sharded
over the mesh's ``data`` axis — XLA inserts the cross-device reductions
for the channel statistics automatically (the tap reduces over the
sharded axis), so the accumulation loop sees replicated (C,) vectors.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vitta_tpu.adapt.engine import flatten_taps
from vitta_tpu.ops.stats import TapStats


class StatAccumulator:
    """AverageMeter over tap dicts (reference utils_.py:171-187)."""

    def __init__(self):
        self.sum_mean: Dict[str, np.ndarray] = {}
        self.sum_var: Dict[str, np.ndarray] = {}
        self.count = 0.0

    def update(self, taps: Dict[str, TapStats], n: float):
        for name, s in taps.items():
            m = np.asarray(s.mean, np.float64)
            v = np.asarray(s.var, np.float64)
            if name not in self.sum_mean:
                self.sum_mean[name] = m * n
                self.sum_var[name] = v * n
            else:
                self.sum_mean[name] += m * n
                self.sum_var[name] += v * n
        self.count += n

    def result(self) -> Dict[str, Tuple[np.ndarray, np.ndarray]]:
        return {name: ((self.sum_mean[name] / self.count).astype(np.float32),
                       (self.sum_var[name] / self.count).astype(np.float32))
                for name in self.sum_mean}


def compute_source_statistics(model, variables, data_iter,
                              mesh: Optional[Mesh] = None,
                              tap_filter=None, logger=None,
                              print_freq: int = 50,
                              stat_type: str = "spatiotemp"):
    """``data_iter`` yields (clips (B, T, S, S, 3) float32, labels).

    Returns {tap_name: (mean, var)} with per-``stat_type`` shapes
    (ComputeNormStatsHook, norm_stats_utils.py:80-98): (C,) spatiotemp /
    temp_v2, (C, T) spatial, (C, H, W) temp.  With a mesh, the batch is
    sharded over the 'data' axis.  The model must have been built with
    ``stat_type`` in its ``stat_types`` so the taps exist.
    """
    from vitta_tpu.models.layers import tap_leaf_name

    shard = None
    if mesh is not None:
        shard = NamedSharding(mesh, P("data"))
    leaf = tap_leaf_name(stat_type)

    @jax.jit
    def batch_stats(v, x):
        _, aux = model.apply(v, x, train=False, mutable=["taps"])
        return flatten_taps(aux["taps"], leaf=leaf)

    acc = StatAccumulator()
    for bi, (clips, _labels) in enumerate(data_iter):
        x = jnp.asarray(clips)
        if shard is not None:
            x = jax.device_put(x, shard)
        taps = batch_stats(variables, x)
        if tap_filter is not None:
            taps = {k: s for k, s in taps.items() if tap_filter(k)}
        acc.update(taps, n=float(clips.shape[0]))
        if logger and bi % print_freq == 0:
            logger.debug(f"compute_stats batch {bi}")
    return acc.result()


def compute_cossim_statistics(model, variables, data_iter, clip_len: int,
                              stat_type: str = "temp", tap_filter=None,
                              logger=None):
    """Pairwise-similarity precompute — counterpart of
    ``compute_cos_similarity`` (corpus/basics.py:311-401) with
    ``ComputePairwiseSimilarityHook``: per chosen norm layer, the batch-
    mean upper-triangle cosine-similarity vector, accumulated with
    AverageMeter weighting, saved as ``list_{stat_type}_relationmap``.

    Norm-layer outputs are captured via flax ``capture_intermediates`` —
    the functional form of registering a second hook kind on the same
    modules.
    """
    from vitta_tpu.models.layers import BatchNorm, LayerNorm
    from vitta_tpu.ops.relation import (pairwise_similarity,
                                        upper_triangle_cosine)

    def is_norm(mdl, method_name):
        return isinstance(mdl, (BatchNorm, LayerNorm)) and method_name == "__call__"

    @jax.jit
    def batch_sims(v, x):
        _, aux = model.apply(v, x, train=False, mutable=["intermediates"],
                             capture_intermediates=is_norm)
        flat = jax.tree_util.tree_flatten_with_path(
            aux["intermediates"])[0]
        out = {}
        for path, feat in flat:
            parts = [p.key for p in path if hasattr(p, "key")]
            name = ".".join(parts[:-1])  # drop '__call__'
            if feat.ndim == 4:           # (N*T, H, W, C) -> (N, T, H, W, C)
                nt = feat.shape[0]
                feat = feat.reshape(nt // clip_len, clip_len, *feat.shape[1:])
            elif feat.ndim == 3:
                # rank-3 BN1d feature, channels-last (N, T, C): the
                # reference computes the temporal relation map over its
                # T rows (compute_sim_for_NCT, relation_map_utils.py:153-162)
                # — only for stat_type 'temp'; other types are None
                # placeholders at BN1d positions (basics.py:333-335)
                if stat_type == "temp":
                    out[name] = jnp.mean(upper_triangle_cosine(feat), axis=0)
                continue
            elif feat.ndim != 5:
                continue                  # rank-2 BN1d features: no relation map
            out[name] = pairwise_similarity(feat, stat_type)
        return out

    acc = StatAccumulator()
    for bi, (clips, _labels) in enumerate(data_iter):
        sims = batch_sims(variables, jnp.asarray(clips))
        if tap_filter is not None:
            sims = {k: s for k, s in sims.items() if tap_filter(k)}
        acc.update({k: TapStats(s, jnp.zeros_like(s)) for k, s in sims.items()},
                   n=float(clips.shape[0]))
        if logger and bi % 50 == 0:
            logger.debug(f"compute_cossim batch {bi}")
    return {k: m for k, (m, _v) in acc.result().items()}


def save_source_statistics(stats, arch: str, out_dir: str,
                           use_tam: bool = True, tag: Optional[str] = None,
                           stat_type: str = "spatiotemp"):
    """Write reference-format ``list_{stat_type}_{mean,var}_{tag}.npy``
    pair (basics.py:306-307) plus a name-keyed npz; returns the three
    paths."""
    import os
    import time
    from vitta_tpu.utils.checkpoint import save_stats

    os.makedirs(out_dir, exist_ok=True)
    tag = tag or time.strftime("%Y%m%d_%H%M%S")
    mean_path = os.path.join(out_dir, f"list_{stat_type}_mean_{tag}.npy")
    var_path = os.path.join(out_dir, f"list_{stat_type}_var_{tag}.npy")
    save_stats(mean_path, var_path, stats, arch, use_tam=use_tam,
               include_bn1d=(arch == "tanet"
                             and stat_type in ("temp", "temp_v2")))
    npz_path = os.path.join(out_dir, f"{stat_type}_stats_{tag}.npz")
    flat = {}
    for name, (m, v) in stats.items():
        flat[f"mean/{name}"] = m
        flat[f"var/{name}"] = v
    np.savez(npz_path, **flat)
    return mean_path, var_path, npz_path


def load_source_statistics_npz(path: str):
    data = np.load(path)
    out = {}
    for key in data.files:
        kind, name = key.split("/", 1)
        m, v = out.setdefault(name, [None, None])
        if kind == "mean":
            out[name][0] = data[key]
        else:
            out[name][1] = data[key]
    return {k: (m, v) for k, (m, v) in out.items()}
