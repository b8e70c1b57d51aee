"""Shared helpers for the baseline methods."""

from __future__ import annotations

from typing import Iterator, Tuple

import jax.numpy as jnp
import numpy as np

from vitta_tpu.utils.meters import AverageMeter
from vitta_tpu.ops.losses import topk_accuracy


def batched_eval_iter(dataset, batch_size: int) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    """Yield (clips (B*E, T, S, S, 3), labels (B,)) batches from an eval
    dataset of per-video samples (last partial batch included — the
    reference DataLoader does not drop_last)."""
    buf_x, buf_y = [], []
    for i in range(len(dataset)):
        s = dataset[i]
        buf_x.append(s.frames)
        buf_y.append(s.label)
        if len(buf_x) == batch_size:
            yield np.concatenate(buf_x, 0), np.asarray(buf_y, np.int32)
            buf_x, buf_y = [], []
    if buf_x:
        yield np.concatenate(buf_x, 0), np.asarray(buf_y, np.int32)


def eval_views_of(cfg) -> int:
    if cfg.model.arch == "tanet":
        return cfg.data.test_crops * int(cfg.data.sample_style.split("-")[-1])
    return cfg.data.test_crops * cfg.data.num_clips


class BaselineBase:
    def __init__(self, model, cfg, variables):
        self.model = model
        self.cfg = cfg
        self.variables = variables
        self.n_eval_views = eval_views_of(cfg)

    def _mean_logits(self, logits):
        e = self.n_eval_views
        b = logits.shape[0] // e
        return jnp.mean(logits.reshape(b, e, -1), axis=1)

    def evaluate(self, apply_fn, dataset, batch_size: int = 1) -> float:
        top1 = AverageMeter()
        for clips, labels in batched_eval_iter(dataset, batch_size):
            logits = apply_fn(jnp.asarray(clips))
            mean = self._mean_logits(logits)
            t1, _ = topk_accuracy(mean, jnp.asarray(labels))
            top1.update(float(t1), n=labels.shape[0])
        return top1.avg
