"""Stream-parallel test-time adaptation over a device mesh.

The ViTTA stream is sequential per video (the EMA and optimizer state
carry across steps), so scaling comes from adapting many *corruption
streams* at once: all per-stream state gets a leading ``S`` axis sharded
over the mesh's ``stream`` axis, and the jitted step is the vmap of the
single-stream step.  On a v5e-8 this adapts 8 of the benchmark's 12
corruption streams concurrently — per-chip work identical to the
single-stream case, zero inter-chip communication inside the step
(metrics are gathered on host read).

This is the TPU-native replacement for running the reference's
single-GPU loop 12 times (tta_tanet_ucf101.py:31-45).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vitta_tpu.adapt.engine import TTAState, VittaEngine


class StreamParallelEngine:
    """vmap+shard wrapper of :class:`VittaEngine` over S streams."""

    def __init__(self, engine: VittaEngine, mesh: Mesh, n_streams: int,
                 axis: str = "stream"):
        self.engine = engine
        self.mesh = mesh
        self.n_streams = n_streams
        self.axis = axis
        self._shard = NamedSharding(mesh, P(axis))
        # shard_map (not bare GSPMD sharding of a vmapped program): each
        # device runs the unbatched per-stream program on its local block.
        # This expresses the intended semantics directly — no cross-stream
        # communication inside the step — and avoids the partitioner
        # mis-handling the grouped convolutions that vmap-with-batched-
        # weights lowers to (observed wrong numerics on the CPU backend).
        try:
            shard_map = jax.shard_map
        except AttributeError:  # older jax
            from jax.experimental.shard_map import shard_map
        inner = jax.vmap(engine._adapt_eval_impl)
        self._step = jax.jit(shard_map(
            inner, mesh=mesh, in_specs=P(axis), out_specs=P(axis),
            check_vma=False))
        # single jitted identity-with-replication; created once so the
        # per-video metric gather hits the jit cache (out_shardings is a
        # prefix pytree: one sharding broadcasts over the output tree)
        self._gather = jax.jit(lambda t: t,
                               out_shardings=NamedSharding(mesh, P()))
        self._aligned = False

    # ------------------------------------------------------------------
    def _make_sharded(self, x):
        """Build a stream-sharded global array from a host-resident full
        array.  Per-shard callbacks (not a whole-array device_put) so the
        same code works multi-process, where this process addresses only
        its mesh slice and every process holds the full host batch."""
        x = np.asarray(x)
        return jax.make_array_from_callback(
            x.shape, self._shard, lambda idx: x[idx])

    def init_state(self) -> TTAState:
        """Stacked per-stream state, sharded over the mesh."""
        s0 = self.engine.init_state()

        def stack(x):
            y = np.broadcast_to(np.asarray(x), (self.n_streams,) + x.shape)
            return self._make_sharded(y)

        return jax.tree_util.tree_map(stack, s0)

    def shard_batch(self, tree):
        return jax.tree_util.tree_map(self._make_sharded, tree)

    def gather_metrics(self, tree):
        """Fully replicate (all-gather) sharded per-stream metrics so the
        host can read them — required under multi-process, harmless (one
        copy) single-process."""
        if not self._aligned and jax.process_count() > 1:
            # the gather is the step's ONLY collective, so its first
            # execution initializes the communicator (gloo on CPU) whose
            # rendezvous has a hard ~30 s key-value timeout.  By now each
            # process has paid its own step-compile time — skew that can
            # exceed that window — so drain local work and align on the
            # coordination-service barrier before dispatching it
            # (parallel/mesh.py:coordination_barrier)
            from vitta_tpu.parallel.mesh import coordination_barrier
            jax.block_until_ready(tree)   # local shards; no collective
            coordination_barrier("first_gather")
            self._aligned = True
        gathered = self._gather(tree)
        return jax.tree_util.tree_map(np.asarray, gathered)

    # ------------------------------------------------------------------
    def adapt_eval_step(self, state: TTAState, views, eval_clips, labels, rngs):
        """One step for all streams.

        views: (S, B*V, T, S, S, 3); eval_clips: (S, E, T, S, S, 3);
        labels: (S, B); rngs: (S,) PRNG keys.
        """
        if self.engine.cfg.tta.if_tta_standard == "tta_standard":
            state = self.init_state()._replace(step=state.step)
        return self._step(state, views, eval_clips, labels, rngs)


def run_parallel_streams(engine: VittaEngine, mesh: Mesh, stream_datasets,
                         seed: int = 0, logger=None, checkpointer=None):
    """Adapt several corruption streams in lock step.

    ``stream_datasets``: list of paired datasets (one per stream), all
    the same length (streams over the same video list, different
    corruptions).  Returns per-stream top-1 averages.

    ``checkpointer`` (adapt/stream_ckpt.StreamCheckpointer) persists the
    sharded per-stream state every N videos; on restart the group
    resumes mid-corruption with the uninterrupted trajectory (RNGs fold
    the absolute video index).
    """
    n = len(stream_datasets)
    spe = StreamParallelEngine(engine, mesh, n)
    state = spe.init_state()
    lengths = {len(d) for d in stream_datasets}
    assert len(lengths) == 1, "streams must have equal length"
    n_videos = lengths.pop()
    base = jax.random.PRNGKey(seed)
    correct1 = np.zeros(n)
    count = 0
    start = 0
    if checkpointer is not None:
        got = checkpointer.restore(state)
        if got is not None:
            state, start, meta = got
            correct1 = np.asarray(meta["correct1"][0], np.float64)
            count = int(meta["correct1"][1])
            if logger:
                logger.info(f"resume: parallel group mid-stream at video "
                            f"{start}")
    for bi in range(start, n_videos):
        items = [d[bi] for d in stream_datasets]
        views = np.stack([it[0] for it in items])
        clips = np.stack([it[1] for it in items])
        labels = np.stack([it[2] for it in items])
        rngs = jax.vmap(lambda i: jax.random.fold_in(base, i * n_videos + bi))(
            jnp.arange(n))
        state, m = spe.adapt_eval_step(
            state, spe.shard_batch(views), spe.shard_batch(clips),
            spe.shard_batch(labels), spe.shard_batch(rngs))
        correct1 += spe.gather_metrics(m.top1)
        count += 1
        if logger and bi % 20 == 0:
            logger.debug(f"parallel-TTA [{bi}/{n_videos}] "
                         f"top1 {correct1 / max(count, 1)}")
        if checkpointer is not None and (bi + 1) % checkpointer.every == 0:
            checkpointer.save(state, bi + 1,
                              {"correct1": (correct1, count)})
    if checkpointer is not None:
        checkpointer.clear()
    return (correct1 / count).tolist(), state
