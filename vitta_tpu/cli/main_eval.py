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
                                           depths=cfg.model.depths,
                                           window_size=cfg.model.window_size)
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
    """Load the precomputed stat-file pair(s) for the configured stat
    type(s) (reference load_precomputed_statistics, basics.py:749-757;
    the temporal pair serves both temp and temp_v2), or the relation-map
    targets for the cossim regularization (basics.py:908-916).

    Returns ``{name: (mean, var)}`` for one statistic type,
    ``{stat_type: {name: (mean, var)}}`` when several types are
    regularized at once, ``{name: sim_vec|None}`` for cossim, or
    ``None`` when a required file is missing."""
    t = cfg.tta
    if t.stat_reg == "cossim":
        if not t.temp_cossim_clean_file:
            return None
        from vitta_tpu.utils.checkpoint import load_reference_cossim
        return load_reference_cossim(t.temp_cossim_clean_file, cfg.model.arch)
    pairs = {
        "spatiotemp": (t.spatiotemp_mean_clean_file, t.spatiotemp_var_clean_file),
        "spatial": (t.spatial_mean_clean_file, t.spatial_var_clean_file),
        "temp": (t.temp_mean_clean_file, t.temp_var_clean_file),
        "temp_v2": (t.temp_mean_clean_file, t.temp_var_clean_file),
    }
    out = {}
    for st in (t.stat_type or ("spatiotemp",)):
        mf, vf = pairs[st]
        if not (mf and vf):
            return None
        out[st] = load_reference_stats(
            mf, vf, cfg.model.arch,
            include_bn1d=(cfg.model.arch == "tanet"
                          and st in ("temp", "temp_v2")))
    if len(out) == 1:
        return next(iter(out.values()))
    return out


def make_datasets(cfg: VittaConfig, source_kind: str = "decord",
                  records=None, seed: int = 0,
                  emit_uint8: Optional[bool] = None):
    """emit_uint8 defaults to the TTA mode: the engine normalizes uint8
    frames device-side (engine._maybe_normalize), so the live loop ships
    4x fewer H2D bytes and skips the host normalize.  Baselines consume
    host-normalized float frames (BaselineBase.evaluate applies the model
    directly)."""
    from vitta_tpu.data.dataset import dataset_cls_for
    source = make_video_source(source_kind, cfg.data.video_data_dir,
                               cfg.data.vid_format)
    if emit_uint8 is None:
        emit_uint8 = bool(cfg.tta.tta)
    if cfg.data.legacy_loader and cfg.tta.tta:
        raise ValueError(
            "legacy_loader has no TTA-view mode (the reference's legacy "
            "get_dataset path, basics.py:1350-1444, predates the TTA "
            "samplers) — it serves baseline/source evaluation only")
    paired = PairedTTADataset(cfg, source, records, seed=seed,
                              dataset_cls=dataset_cls_for(
                                  cfg.model.arch, cfg.data.legacy_loader),
                              emit_uint8=emit_uint8)
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
                "tta=True needs precomputed source statistics (one "
                "--<stat_type>_{mean,var}_clean_file pair per configured "
                "stat_type, or --temp_cossim_clean_file for "
                "stat_reg='cossim') — run compute_stats first")
        engine = VittaEngine(model, cfg, variables, src_stats)
        # mid-stream state checkpointing (adapt/stream_ckpt.py): resume a
        # preempted corruption from the last saved TTAState instead of
        # restarting the whole stream
        ckpt, state0, start, meter_state = None, None, 0, None
        if cfg.runtime.stream_ckpt_every > 0:
            import shutil

            from vitta_tpu.adapt.stream_ckpt import StreamCheckpointer
            ckpt_dir = os.path.join(cfg.runtime.result_dir,
                                    f"stream_ckpt_{corruption or 'run'}")
            if not cfg.runtime.resume:
                # a stale state must not leak into a later --resume
                shutil.rmtree(ckpt_dir, ignore_errors=True)
            ckpt = StreamCheckpointer(
                ckpt_dir, cfg.runtime.stream_ckpt_every,
                manifest={"corruptions": [corruption or "run"]})
            if cfg.runtime.resume:
                got = ckpt.restore(engine.init_state())
                if got is not None:
                    state0, start, meter_state = got
                    logger.info(f"resume: mid-stream checkpoint at video "
                                f"{start} ({corruption})")
        # JSONL scalar stream in the result dir — the counterpart of the
        # reference's tensorboardX writer (main_eval.py:85)
        from vitta_tpu.utils.observability import MetricsWriter
        mw = MetricsWriter(cfg.runtime.result_dir,
                           name=f"metrics_{corruption or 'run'}")
        try:
            result, state, meters = tta_stream(
                engine, Prefetcher(paired, device_put=False,
                                   n_workers=cfg.data.num_workers,
                                   start=start),
                seed=cfg.runtime.seed, logger=logger,
                print_freq=cfg.runtime.print_freq, metrics_writer=mw,
                checkpointer=ckpt, start_index=start,
                meter_state=meter_state, state=state0)
        finally:
            mw.close()
        logger.info(f"[{corruption}] ViTTA top1 {result[0]:.3f} "
                    f"(mean step time {meters['batch_time'].avg * 1000:.1f} ms)")
        return result, state
    else:
        baseline_name = cfg.runtime.baseline
        kw = {"filter_k": cfg.runtime.t3a_filter_k} if baseline_name == "t3a" else {}
        b = setup_baseline(baseline_name, model, cfg, variables, **kw)
        if baseline_name == "dua":
            # DUA consumes a (raw-frames, eval) dataset pair and adapts
            # per video on augmented batches (reference main_eval.py:177-207,
            # get_dataset_tanet_dua basics.py:1294-1347)
            from vitta_tpu.data.dataset import dataset_cls_for
            source = make_video_source(source_kind, cfg.data.video_data_dir,
                                       cfg.data.vid_format)
            raw_ds = dataset_cls_for(cfg.model.arch)(
                cfg, source, paired.eval.records, dataset_type="raw",
                seed=cfg.runtime.seed, emit_uint8=True)
            acc = b.run(raw_ds, paired.eval,
                        batch_size=max(1, cfg.data.batch_size),
                        seed=cfg.runtime.seed)
        else:
            acc = b.run(paired.eval, batch_size=max(1, cfg.data.batch_size))
        logger.info(f"[{corruption}] baseline={baseline_name} top1 {acc:.3f}")
        return [acc], None


def run_compute_stats(cfg: VittaConfig, source_kind: str = "decord",
                      records=None, out_dir: Optional[str] = None,
                      logger=None, compute_stat: str = "mean_var"):
    """Source-statistic precompute entry (reference
    compute_stats/compute_spatiotemp_stats_clean_train_*.py), dispatching
    on ``compute_stat`` like the reference ``eval()``
    (corpus/main_eval.py:87-94): 'mean_var' -> per-layer channel stats,
    'cossim' -> pairwise-similarity relation maps."""
    import os
    import time

    from vitta_tpu.utils.checkpoint import tanet_norm_layers
    from vitta_tpu.adapt.precompute import compute_cossim_statistics

    logger = logger or get_logger(cfg.runtime.result_dir)
    stat_type = cfg.tta.stat_type[0] if cfg.tta.stat_type else "spatiotemp"
    model = get_model(cfg)
    variables = load_variables(cfg, model, seed=cfg.runtime.seed)
    from vitta_tpu.data.dataset import dataset_cls_for
    source = make_video_source(source_kind, cfg.data.video_data_dir,
                               cfg.data.vid_format)
    ds = dataset_cls_for(cfg.model.arch)(cfg, source, records,
                                         dataset_type="eval")
    if cfg.model.arch == "tanet" and stat_type not in ("temp", "temp_v2"):
        # spatial/spatiotemp stats only exist on the BN2d layers; the
        # temporal types include BatchNorm1d too (basics.py:231-238)
        bn2d = {n for n, kind in tanet_norm_layers() if kind == "bn2d"}
        tap_filter = lambda n: n in bn2d
    else:
        tap_filter = None
    out = out_dir or cfg.runtime.result_dir
    if compute_stat == "cossim":
        sims = compute_cossim_statistics(
            model, variables, batched_eval_iter(ds, cfg.data.batch_size),
            clip_len=cfg.data.clip_length, stat_type=stat_type,
            tap_filter=tap_filter, logger=logger)
        os.makedirs(out, exist_ok=True)
        tag = time.strftime("%Y%m%d_%H%M%S")
        # reference layout: one object-array entry per norm layer in
        # choose_layers order, None where no relation map exists
        # (basics.py:328-338,397-401)
        from vitta_tpu.utils.checkpoint import save_cossim
        path = os.path.join(out, f"list_{stat_type}_relationmap_{tag}.npy")
        save_cossim(path, sims, cfg.model.arch)
        logger.info(f"saved cossim relation maps: {path}")
        return (path,)
    stats = compute_source_statistics(
        model, variables, batched_eval_iter(ds, cfg.data.batch_size),
        tap_filter=tap_filter, logger=logger, stat_type=stat_type)
    paths = save_source_statistics(stats, cfg.model.arch, out,
                                   stat_type=stat_type)
    logger.info(f"saved source stats: {paths}")
    return paths
