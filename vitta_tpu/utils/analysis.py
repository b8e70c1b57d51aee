"""Model analysis (reference utils/utils_.py:113-121): structure dump +
parameter counts, extended with per-collection and trainable counts."""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np


def count_params(tree) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(tree))


def model_analysis(variables, trainable_mask=None, logger=None) -> dict:
    """Log total / trainable parameter counts (utils_.py:113-121 prints
    the torch module and requires_grad sums)."""
    params = variables.get("params", variables)
    total = count_params(params)
    trainable = total
    if trainable_mask is not None:
        trainable = sum(
            int(np.prod(x.shape))
            for x, m in zip(jax.tree_util.tree_leaves(params),
                            jax.tree_util.tree_leaves(trainable_mask)) if m)
    stats = count_params(variables.get("batch_stats", {}))
    info = {"total_params": total, "trainable_params": trainable,
            "batch_stat_buffers": stats}
    if logger:
        logger.info(f"Parameter number: {total:,} "
                    f"(trainable {trainable:,}; BN buffers {stats:,})")
    return info


def param_table(params, max_rows: Optional[int] = None) -> str:
    """Human-readable name/shape table (the structure dump)."""
    rows = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        name = ".".join(p.key for p in path if hasattr(p, "key"))
        rows.append(f"{name:70s} {str(leaf.shape):20s} {leaf.dtype}")
        if max_rows and len(rows) >= max_rows:
            rows.append("...")
            break
    return "\n".join(rows)
