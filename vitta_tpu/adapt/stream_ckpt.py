"""Mid-stream TTA state checkpointing.

The sweep drivers resume at corruption granularity
(cli/drivers.py:_sweep_state); for long streams (UCF101-C is ~3.8 k
videos per corruption) a preemption mid-corruption loses the whole
stream.  This module checkpoints the carried ``TTAState`` (params,
optimizer momentum, EMA statistics, step — everything the online loop
threads across videos) plus the host-side meters every N videos, so a
killed run resumes mid-stream and reproduces the uninterrupted
trajectory exactly (the stream, its per-video RNG folds, the loss/acc
meter averages and the data pipeline are all deterministic in the video
index; only wall-clock ``batch_time`` restarts).

The reference has no equivalent — its adapted model is never saved
(corpus/basics.py:742-745 commented out) and an interrupted run restarts
the corruption from scratch.

Layout under ``directory``:
  step_<n>/...    orbax PyTree checkpoint of the state (the next video
                  index to process is <n>)
  latest.json     commit marker {"next_bi", "path", "meters"} — written
                  only after the orbax save completes, so a kill during
                  save leaves the previous checkpoint valid
  manifest.json   identity of the stream group this directory belongs
                  to (corruption names etc.); a mismatch on open errors
                  loudly instead of silently restoring a state adapted
                  on a different group layout

Multi-process runs (jax.distributed pods): orbax coordinates the array
save across hosts itself; the commit marker, manifest and superseded-
checkpoint cleanup are host-side filesystem mutations and are executed
by process 0 only, so concurrent hosts never race rmtree against
another host's in-flight save.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Optional, Tuple


def _is_primary() -> bool:
    import jax
    return jax.process_index() == 0


def _align_processes(tag: str) -> None:
    """Host barrier before any orbax operation under multi-process.

    orbax's internal cross-host sync is a device collective; on the CPU
    backend its first execution rendezvous-initializes a gloo context
    through the coordination KV store with a hard ~30 s timeout.  Entry
    skew into save()/restore() can exceed that window (per-process
    compile-cache hits vs misses before the first restore were observed
    >30 s apart under host load), so align on the coordination-service
    barrier (600 s) first — the same protocol as the stream layer's
    first-gather barrier (parallel/streams.py:gather_metrics)."""
    import jax

    if jax.process_count() > 1:
        from vitta_tpu.parallel.mesh import coordination_barrier
        coordination_barrier(tag)


class StreamCheckpointer:
    def __init__(self, directory: str, every: int = 50,
                 manifest: Optional[dict] = None):
        self.directory = os.path.abspath(directory)
        self.every = max(1, int(every))
        os.makedirs(self.directory, exist_ok=True)
        if manifest is not None:
            self._check_manifest(manifest)

    @property
    def _latest_path(self) -> str:
        return os.path.join(self.directory, "latest.json")

    @property
    def _manifest_path(self) -> str:
        return os.path.join(self.directory, "manifest.json")

    def _check_manifest(self, manifest: dict) -> None:
        """Pin the directory to one stream-group identity.  The sweep
        drivers key directories by a short hash of the group's
        corruption list (cli/drivers.py); the full list lives here so a
        hash collision or a hand-edited directory can never silently
        resume a state adapted under a different group layout."""
        if os.path.exists(self._manifest_path):
            with open(self._manifest_path) as f:
                stored = json.load(f)
            if stored != manifest:
                raise RuntimeError(
                    f"stream checkpoint directory {self.directory} belongs "
                    f"to a different stream group: stored manifest "
                    f"{stored!r} != requested {manifest!r}. Use a fresh "
                    f"result_dir or clear the checkpoint.")
        elif _is_primary():
            tmp = self._manifest_path + ".tmp"
            with open(tmp, "w") as f:
                json.dump(manifest, f)
            os.replace(tmp, self._manifest_path)

    def save(self, state, next_bi: int, meters: dict) -> None:
        """Checkpoint ``state``; ``meters`` is {name: (sum, count)} where
        ``sum`` is a scalar (AverageMeter) or a per-stream vector (the
        parallel group's correct-counts)."""
        import numpy as np
        import orbax.checkpoint as ocp

        path = os.path.join(self.directory, f"step_{next_bi}")
        # orbax coordinates the multi-host array save internally
        _align_processes("stream_ckpt_save")
        ocp.PyTreeCheckpointer().save(path, state, force=True)
        if not _is_primary():
            return
        tmp = self._latest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"next_bi": int(next_bi), "path": path,
                       "meters": {k: [np.asarray(s, np.float64).tolist(),
                                      int(c)]
                                  for k, (s, c) in meters.items()}}, f)
        os.replace(tmp, self._latest_path)
        # drop superseded checkpoints (primary only — a non-primary host
        # must never rmtree a directory another host is still writing)
        for name in os.listdir(self.directory):
            if name.startswith("step_") and name != f"step_{next_bi}":
                shutil.rmtree(os.path.join(self.directory, name),
                              ignore_errors=True)

    def restore(self, template) -> Optional[Tuple[object, int, dict]]:
        """(state, next_bi, meters) of the latest commit, or None.

        ``template`` supplies the pytree structure/dtypes (an
        ``engine.init_state()``); restored leaves are host arrays that
        re-device on first use."""
        import orbax.checkpoint as ocp

        try:
            with open(self._latest_path) as f:
                meta = json.load(f)
        except FileNotFoundError:
            # no checkpoint, or a concurrent completion clear()ed the
            # directory between listing and open — either way: fresh start
            return None
        # item= restores straight into the template's pytree structure
        # (TTAState NamedTuple incl. None subtrees).  All processes reach
        # this point or none do (latest.json is on the shared filesystem),
        # so the barrier call pattern stays lockstep.
        _align_processes("stream_ckpt_restore")
        state = ocp.PyTreeCheckpointer().restore(meta["path"], item=template)
        meters = {k: (s if isinstance(s, list) else float(s), int(c))
                  for k, (s, c) in meta["meters"].items()}
        return state, int(meta["next_bi"]), meters

    def clear(self) -> None:
        """Remove the checkpoint (called when the stream completes, so a
        later --resume of the sweep does not resurrect a stale state).
        Primary-host only under multi-process."""
        if _is_primary():
            shutil.rmtree(self.directory, ignore_errors=True)
