"""Data-parallel evaluation / precompute over a ``data`` mesh axis.

The reference's evaluation is embarrassingly parallel over videos
(SURVEY.md §2.7); here a batch's leading axis is sharded over the mesh
and XLA keeps the whole forward device-local until the final metric
reduction (a psum it inserts automatically).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vitta_tpu.baselines.common import batched_eval_iter, eval_views_of
from vitta_tpu.utils.meters import AverageMeter
from vitta_tpu.ops.losses import topk_accuracy


def sharded_validate(model, variables, dataset, mesh: Mesh, cfg,
                     batch_size: Optional[int] = None,
                     logger=None) -> Tuple[float, float]:
    """Top-1/top-5 over ``dataset`` with the video batch sharded on the
    mesh's 'data' axis.  batch_size defaults to one video per device and
    is rounded to a multiple of the axis size (remainder evaluated on a
    single device)."""
    n_dev = mesh.devices.size
    batch_size = batch_size or n_dev
    batch_size = max(n_dev, (batch_size // n_dev) * n_dev)
    shard = NamedSharding(mesh, P("data"))
    e = eval_views_of(cfg)

    @jax.jit
    def fwd(v, x, labels):
        logits = model.apply(v, x, train=False)
        b = logits.shape[0] // e
        mean = jnp.mean(logits.reshape(b, e, -1), axis=1)
        return topk_accuracy(mean, labels)

    top1, top5 = AverageMeter(), AverageMeter()
    for bi, (clips, labels) in enumerate(batched_eval_iter(dataset, batch_size)):
        n = labels.shape[0]
        if n % n_dev == 0:
            x = jax.device_put(jnp.asarray(clips), shard)
            y = jax.device_put(jnp.asarray(labels), shard)
        else:  # remainder batch: single-device
            x, y = jnp.asarray(clips), jnp.asarray(labels)
        t1, t5 = fwd(variables, x, y)
        top1.update(float(t1), n=n)
        top5.update(float(t5), n=n)
        if logger and bi % 20 == 0:
            logger.debug(f"sharded eval [{bi}] top1 {top1.avg:.3f}")
    return top1.avg, top5.avg
