"""Corruption-sweep drivers.

Reproduces the reference entry scripts' protocol
(tta_tanet_ucf101.py:31-45): iterate the 12 shuffled corruptions, run
``evaluate`` per corruption (the ``val_vid_list`` path is a template
with a ``{}`` for the corruption name), and append one accuracy row per
corruption to the ``all_result`` file.

Adds a TPU-native mode the reference doesn't have: with
``n_parallel_streams > 1``, corruption streams are adapted concurrently,
sharded over the device mesh (vitta_tpu.parallel.streams).
"""

from __future__ import annotations

from typing import Sequence

import json
import os

from vitta_tpu.cli.main_eval import evaluate, load_variables, load_source_stats
from vitta_tpu.config import VittaConfig
from vitta_tpu.utils.logging import ResultWriter, get_logger


def _sweep_state_path(result_dir: str) -> str:
    return os.path.join(result_dir, "sweep_state.json")


def _load_sweep_state(cfg, logger) -> dict:
    """Completed {corruption: rows} from a previous interrupted sweep
    (``--resume``); empty when resume is off or no state exists."""
    if not cfg.runtime.resume:
        return {}
    path = _sweep_state_path(cfg.runtime.result_dir)
    if not os.path.exists(path):
        return {}
    with open(path) as f:
        done = json.load(f)
    if done:
        logger.info(f"resume: skipping {len(done)} completed corruptions: "
                    f"{sorted(done)}")
    return done


def _save_sweep_state(result_dir: str, results: dict) -> None:
    """Atomic checkpoint of completed corruption rows."""
    path = _sweep_state_path(result_dir)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump({k: [float(v) for v in rows]
                   for k, rows in results.items() if k != "mean"}, f)
    os.replace(tmp, path)


def run_corruption_sweep(cfg: VittaConfig, corruptions: Sequence[str],
                         source_kind: str = "decord", records=None,
                         logger=None) -> dict:
    """Sequential sweep (the reference protocol)."""
    import dataclasses

    logger = logger or get_logger(cfg.runtime.result_dir,
                                  verbose=cfg.runtime.verbose)
    writer = ResultWriter(cfg.runtime.result_dir, cfg)
    done = _load_sweep_state(cfg, logger)
    results = {}
    for ci, corruption in enumerate(corruptions):
        if corruption in done:
            # replay the completed row so the all_result file of the
            # resumed run is complete
            results[corruption] = done[corruption]
            writer.write_row(done[corruption])
            continue
        ccfg = cfg
        if "{}" in cfg.data.val_vid_list:
            ccfg = cfg.replace(data=dataclasses.replace(
                cfg.data, val_vid_list=cfg.data.val_vid_list.format(corruption)))
        rows, _state = evaluate(ccfg, corruption, source_kind=source_kind,
                                records=records, logger=logger)
        results[corruption] = rows
        writer.write_row(rows)
        _save_sweep_state(cfg.runtime.result_dir, results)
    writer.close()
    mean_top1 = sum(r[0] for r in results.values()) / max(len(results), 1)
    logger.info(f"mean top-1 over {len(results)} corruptions: {mean_top1:.3f}")
    results["mean"] = [mean_top1]
    return results


def run_parallel_sweep(cfg: VittaConfig, corruptions: Sequence[str],
                       source_kind: str = "decord", records=None,
                       logger=None) -> dict:
    """Stream-parallel sweep: one corruption stream per mesh slot."""
    import dataclasses

    from vitta_tpu.adapt.engine import VittaEngine
    from vitta_tpu.cli.main_eval import make_datasets
    from vitta_tpu.models import get_model
    from vitta_tpu.parallel.mesh import make_mesh
    from vitta_tpu.parallel.streams import run_parallel_streams

    logger = logger or get_logger(cfg.runtime.result_dir,
                                  verbose=cfg.runtime.verbose)
    done = _load_sweep_state(cfg, logger)
    pending = [c for c in corruptions if c not in done]
    model = get_model(cfg)
    variables = load_variables(cfg, model, seed=cfg.runtime.seed)
    src_stats = load_source_stats(cfg)
    engine = VittaEngine(model, cfg, variables, src_stats, donate=False)

    datasets = []
    for corruption in pending:
        ccfg = cfg
        if "{}" in cfg.data.val_vid_list:
            ccfg = cfg.replace(data=dataclasses.replace(
                cfg.data, val_vid_list=cfg.data.val_vid_list.format(corruption)))
        datasets.append(make_datasets(ccfg, source_kind, records,
                                      seed=cfg.runtime.seed))
    import jax
    n_dev = min(len(jax.devices()),
                cfg.runtime.n_parallel_streams if cfg.runtime.n_parallel_streams > 1
                else len(jax.devices()))
    # streams are sharded over the mesh: run in groups of <=
    # n_dev * streams_per_chip.  With streams_per_chip > 1 each device
    # vmaps several streams (batched per-stream weights), so e.g. the
    # 12-corruption sweep could run as one group of 12 on 6 chips at
    # 2/chip instead of an 8+4 split.  MEASURED (round 5,
    # benchmarks/results/multistream_r5.jsonl): packing 2 TANet bf16
    # streams costs 38.2 ms/step vs 2x17.6 sequential — 0.92x
    # throughput, far from the 1.33x-gate — XLA lowers the batched
    # per-stream conv weights to grouped convs at ~full per-stream
    # cost.  The default stays 1 stream/chip; the knob remains for
    # chips>>streams deployments.
    # No padded duplicate streams: the per-group device count is the
    # largest that divides the group evenly.
    spc = max(1, cfg.runtime.streams_per_chip)
    group_cap = n_dev * spc
    results = dict(done)
    for g0 in range(0, len(datasets), group_cap):
        group = datasets[g0:g0 + group_cap]
        d = min(n_dev, (len(group) + spc - 1) // spc)
        while len(group) % d:
            d -= 1
        mesh = make_mesh(d, ("stream",))
        # mid-stream state checkpointing (adapt/stream_ckpt.py): directory
        # keyed by a short hash of the group's corruption list (full names
        # can exceed filename limits for 12 long corruptions); the full
        # list is pinned in the directory's manifest, so a changed group
        # composition errors loudly instead of restoring a mismatched
        # state under a colliding key
        ckpt = None
        if cfg.runtime.stream_ckpt_every > 0:
            import hashlib

            from vitta_tpu.adapt.stream_ckpt import StreamCheckpointer
            group_names = list(pending[g0:g0 + group_cap])
            gkey = hashlib.sha1(
                "|".join(group_names).encode()).hexdigest()[:12]
            ckpt_dir = os.path.join(cfg.runtime.result_dir,
                                    f"stream_ckpt_group_{gkey}")
            if not cfg.runtime.resume:
                # primary clears; others wait so the constructor's
                # manifest check never races the rmtree
                if jax.process_index() == 0:
                    import shutil
                    shutil.rmtree(ckpt_dir, ignore_errors=True)
                if jax.process_count() > 1:
                    from vitta_tpu.parallel.mesh import coordination_barrier
                    coordination_barrier("stream_ckpt_clear")
            ckpt = StreamCheckpointer(ckpt_dir,
                                      cfg.runtime.stream_ckpt_every,
                                      manifest={"corruptions": group_names})
        got, _state = run_parallel_streams(engine, mesh, group,
                                           seed=cfg.runtime.seed, logger=logger,
                                           checkpointer=ckpt)
        for corruption, acc in zip(pending[g0:g0 + group_cap], got):
            results[corruption] = [float(acc)]
        # host-side filesystem mutations are primary-only under
        # multi-process (same protocol as stream_ckpt.py): every process
        # computes identical results (the metric gather replicates), so
        # only one needs to persist them — and concurrent writers could
        # interleave in the result file
        if jax.process_index() == 0:
            _save_sweep_state(cfg.runtime.result_dir, results)
    if jax.process_index() == 0:
        writer = ResultWriter(cfg.runtime.result_dir, cfg)
        for corruption in corruptions:
            writer.write_row(results[corruption])
        writer.close()
    accs = [results[c][0] for c in corruptions]
    results["mean"] = [sum(accs) / len(accs)]
    return results
