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

from vitta_tpu.cli.main_eval import evaluate, load_variables, load_source_stats
from vitta_tpu.config import VittaConfig
from vitta_tpu.utils.logging import ResultWriter, get_logger


def run_corruption_sweep(cfg: VittaConfig, corruptions: Sequence[str],
                         source_kind: str = "decord", records=None,
                         logger=None) -> dict:
    """Sequential sweep (the reference protocol)."""
    import dataclasses

    logger = logger or get_logger(cfg.runtime.result_dir,
                                  verbose=cfg.runtime.verbose)
    writer = ResultWriter(cfg.runtime.result_dir, cfg)
    results = {}
    for ci, corruption in enumerate(corruptions):
        ccfg = cfg
        if "{}" in cfg.data.val_vid_list:
            ccfg = cfg.replace(data=dataclasses.replace(
                cfg.data, val_vid_list=cfg.data.val_vid_list.format(corruption)))
        rows, _state = evaluate(ccfg, corruption, source_kind=source_kind,
                                records=records, logger=logger)
        results[corruption] = rows
        writer.write_row(rows)
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
    model = get_model(cfg)
    variables = load_variables(cfg, model, seed=cfg.runtime.seed)
    src_stats = load_source_stats(cfg)
    engine = VittaEngine(model, cfg, variables, src_stats, donate=False)

    datasets = []
    for corruption in corruptions:
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
    # 12-corruption sweep runs as one group of 12 on 6 chips at 2/chip
    # instead of an 8+4 split — gate the setting on multistream_bench.
    # No padded duplicate streams: the per-group device count is the
    # largest that divides the group evenly.
    spc = max(1, cfg.runtime.streams_per_chip)
    group_cap = n_dev * spc
    accs = []
    for g0 in range(0, len(datasets), group_cap):
        group = datasets[g0:g0 + group_cap]
        d = min(n_dev, (len(group) + spc - 1) // spc)
        while len(group) % d:
            d -= 1
        mesh = make_mesh(d, ("stream",))
        got, _state = run_parallel_streams(engine, mesh, group,
                                           seed=cfg.runtime.seed, logger=logger)
        accs.extend(got)
    writer = ResultWriter(cfg.runtime.result_dir, cfg)
    results = {}
    for corruption, acc in zip(corruptions, accs):
        results[corruption] = [acc]
        writer.write_row([acc])
    writer.close()
    results["mean"] = [sum(accs) / len(accs)]
    return results
