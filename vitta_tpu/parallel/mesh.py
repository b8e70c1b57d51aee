"""Device mesh utilities.

The reference's only multi-device mechanism is single-process
``torch.nn.DataParallel`` pinned to one GPU (corpus/main_eval.py:61-65).
The TPU-native equivalent is a ``jax.sharding.Mesh``:

* a ``stream`` axis — independent corruption streams adapted in
  parallel, each device carrying its own model/optimizer/EMA state
  (the online-TTA stream is inherently sequential per video, so
  parallelism lives *across* streams, SURVEY.md §2.7);
* a ``data`` axis — batch-parallel source-stat precompute and
  source-only evaluation (embarrassingly parallel over videos).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(coordinator: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> int:
    """Multi-host initialization (the reference has no multi-process path
    at all — no torch.distributed anywhere, SURVEY.md §2.7).  On a
    multi-host TPU slice call this once per host before building meshes;
    jax picks coordinates from the TPU environment when args are None.
    Returns the global device count."""
    import jax.distributed

    try:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except (RuntimeError, ValueError):
        pass  # single-process / already initialized
    return len(jax.devices())


_BARRIER_SEQ = 0


def coordination_barrier(tag: str, timeout_ms: int = 600_000) -> None:
    """Host-side process barrier via the jax.distributed coordination
    service — an RPC, NOT a device collective, so it is immune to the
    backend collectives' fixed rendezvous timeouts.

    Why it exists: the first executed collective initializes the
    communicator (gloo on CPU, similar on TPU pods), whose key-value
    exchange has a hard ~30 s timeout.  Per-process compile-time skew
    easily exceeds that (measured 50 s between two identical workers on
    a 1-core host), killing the whole run before the first step.
    Calling this after compilation and before the first collective
    dispatch aligns every process at a point where only execution —
    milliseconds of skew — remains.  No-op single-process; every call
    site must reach barriers in the same order on all processes (the
    sequence number is appended to the id)."""
    if jax.process_count() <= 1:
        return
    try:
        from jax._src import distributed
        client = distributed.global_state.client
    except Exception:
        client = None
    if client is None:
        return
    global _BARRIER_SEQ
    _BARRIER_SEQ += 1
    client.wait_at_barrier(f"vitta:{tag}:{_BARRIER_SEQ}", timeout_ms)


def make_mesh(n_devices: Optional[int] = None,
              axis_names: Sequence[str] = ("stream",),
              shape: Optional[Sequence[int]] = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    devs = devs[:n]
    if shape is None:
        shape = (n,) + (1,) * (len(axis_names) - 1)
    arr = np.array(devs).reshape(shape)
    return Mesh(arr, axis_names)


def shard_leading_axis(tree, mesh: Mesh, axis: str = "stream"):
    """Place every leaf with its leading axis sharded over ``axis``."""
    sharding = NamedSharding(mesh, P(axis))

    def put(x):
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(put, tree)


def replicated(tree, mesh: Mesh):
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
