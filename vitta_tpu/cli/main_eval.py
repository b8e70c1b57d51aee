"""Evaluation dispatcher — the runtime entry of the framework.

Re-design of reference ``eval()`` (corpus/main_eval.py:30-232): build the
model, load + convert the torch checkpoint, construct the data pipeline
for one corruption, then dispatch on the run mode:

* ``compute_stat='mean_var'``  -> source-statistic precompute;
* ``tta=True``                 -> the ViTTA stream (online or standard);
* otherwise                    -> one of the baselines.

Returns ``(epoch_result_list, state_or_none)`` like the reference
(basics.py:740-747).
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np

from vitta_tpu.adapt.engine import VittaEngine
from vitta_tpu.adapt.loops import tta_stream
from vitta_tpu.adapt.precompute import (compute_source_statistics,
                                        save_source_statistics)
from vitta_tpu.baselines import setup_baseline
from vitta_tpu.baselines.common import batched_eval_iter
from vitta_tpu.config import VittaConfig
from vitta_tpu.data.dataset import PairedTTADataset, TANetVideoDataset
from vitta_tpu.data.pipeline import Prefetcher
from vitta_tpu.data.video_reader import make_video_source
from vitta_tpu.models import get_model
from vitta_tpu.utils.checkpoint import (convert_swin_checkpoint,
                                        convert_tanet_checkpoint,
                                        load_reference_stats)
from vitta_tpu.utils.logging import get_logger


def load_variables(cfg: VittaConfig, model, seed: int = 0):
    """Checkpoint load + convert (reference main_eval.py:51-65); random
    init when no checkpoint path is given (synthetic/dev runs)."""
    if cfg.model.checkpoint_path:
        import torch
        sd = torch.load(cfg.model.checkpoint_path, map_location="cpu",
                        weights_only=False)
        if cfg.model.arch == "tanet":
            return convert_tanet_checkpoint(sd, cfg.model.num_classes)
        if cfg.model.arch == "videoswintransformer":
            return convert_swin_checkpoint(sd, cfg.model.num_classes,
                                           depths=cfg.model.depths)
        raise NotImplementedError(cfg.model.arch)
    import jax
    import jax.numpy as jnp
    rng = jax.random.PRNGKey(seed)
    t = cfg.data.clip_length
    s = 32  # init shapes are spatial-size independent
    x0 = jnp.zeros((1, t, s, s, 3), jnp.float32)
    init_fn = jax.jit(lambda r, x: model.init(
        {"params": r, "dropout": r}, x, train=False))
    variables = init_fn(rng, x0)
    return {"params": variables["params"],
            "batch_stats": variables.get("batch_stats", {})}


def load_source_stats(cfg: VittaConfig):
    t = cfg.tta
    if t.spatiotemp_mean_clean_file and t.spatiotemp_var_clean_file:
        return load_reference_stats(t.spatiotemp_mean_clean_file,
                                    t.spatiotemp_var_clean_file,
                                    cfg.model.arch)
    return None


def make_datasets(cfg: VittaConfig, source_kind: str = "decord",
                  records=None, seed: int = 0):
    from vitta_tpu.data.dataset import dataset_cls_for
    source = make_video_source(source_kind, cfg.data.video_data_dir,
                               cfg.data.vid_format)
    paired = PairedTTADataset(cfg, source, records, seed=seed,
                              dataset_cls=dataset_cls_for(cfg.model.arch))
    return paired


def evaluate(cfg: VittaConfig, corruption: str = "",
             source_kind: str = "decord", records=None,
             logger=None) -> Tuple[list, Optional[object]]:
    logger = logger or get_logger(cfg.runtime.result_dir,
                                  verbose=cfg.runtime.verbose)
    logger.info(f"=== evaluate corruption={corruption or 'n/a'} "
                f"arch={cfg.model.arch} tta={cfg.tta.tta} "
                f"baseline={cfg.runtime.baseline}")
    model = get_model(cfg)
    variables = load_variables(cfg, model, seed=cfg.runtime.seed)

    paired = make_datasets(cfg, source_kind, records, seed=cfg.runtime.seed)

    if cfg.tta.tta:
        src_stats = load_source_stats(cfg)
        if src_stats is None and cfg.tta.stat_reg != "BNS":
            raise FileNotFoundError(
                "tta=True needs precomputed source statistics "
                "(--spatiotemp_{mean,var}_clean_file) — run compute_stats first")
        engine = VittaEngine(model, cfg, variables, src_stats)
        result, state, meters = tta_stream(
            engine, Prefetcher(paired, device_put=False),
            seed=cfg.runtime.seed, logger=logger,
            print_freq=cfg.runtime.print_freq)
        logger.info(f"[{corruption}] ViTTA top1 {result[0]:.3f} "
                    f"(mean step time {meters['batch_time'].avg * 1000:.1f} ms)")
        return result, state
    else:
        baseline_name = cfg.runtime.baseline
        kw = {"filter_k": cfg.runtime.t3a_filter_k} if baseline_name == "t3a" else {}
        b = setup_baseline(baseline_name, model, cfg, variables, **kw)
        acc = b.run(paired.eval, batch_size=max(1, cfg.data.batch_size))
        logger.info(f"[{corruption}] baseline={baseline_name} top1 {acc:.3f}")
        return [acc], None


def run_compute_stats(cfg: VittaConfig, source_kind: str = "decord",
                      records=None, out_dir: Optional[str] = None,
                      logger=None):
    """Source-statistic precompute entry (reference
    compute_stats/compute_spatiotemp_stats_clean_train_*.py)."""
    from vitta_tpu.utils.checkpoint import tanet_norm_layers

    logger = logger or get_logger(cfg.runtime.result_dir)
    model = get_model(cfg)
    variables = load_variables(cfg, model, seed=cfg.runtime.seed)
    from vitta_tpu.data.dataset import dataset_cls_for
    source = make_video_source(source_kind, cfg.data.video_data_dir,
                               cfg.data.vid_format)
    ds = dataset_cls_for(cfg.model.arch)(cfg, source, records,
                                         dataset_type="eval")
    if cfg.model.arch == "tanet":
        bn2d = {n for n, kind in tanet_norm_layers() if kind == "bn2d"}
        tap_filter = lambda n: n in bn2d
    else:
        tap_filter = None
    stats = compute_source_statistics(
        model, variables, batched_eval_iter(ds, cfg.data.batch_size),
        tap_filter=tap_filter, logger=logger)
    out = out_dir or cfg.runtime.result_dir
    paths = save_source_statistics(stats, cfg.model.arch, out)
    logger.info(f"saved source stats: {paths}")
    return paths
