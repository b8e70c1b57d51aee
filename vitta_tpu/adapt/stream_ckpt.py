"""Mid-stream TTA state checkpointing.

The sweep drivers resume at corruption granularity
(cli/drivers.py:_sweep_state); for long streams (UCF101-C is ~3.8 k
videos per corruption) a preemption mid-corruption loses the whole
stream.  This module checkpoints the carried ``TTAState`` (params,
optimizer momentum, EMA statistics, step — everything the online loop
threads across videos) plus the host-side meters every N videos, so a
killed run resumes mid-stream and reproduces the uninterrupted
trajectory exactly (the stream, its per-video RNG folds and the data
pipeline are all deterministic in the video index).

The reference has no equivalent — its adapted model is never saved
(corpus/basics.py:742-745 commented out) and an interrupted run restarts
the corruption from scratch.

Layout under ``directory``:
  step_<n>/...    orbax PyTree checkpoint of the state (the next video
                  index to process is <n>)
  latest.json     commit marker {"next_bi", "path", "meters"} — written
                  only after the orbax save completes, so a kill during
                  save leaves the previous checkpoint valid
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Optional, Tuple


class StreamCheckpointer:
    def __init__(self, directory: str, every: int = 50):
        self.directory = os.path.abspath(directory)
        self.every = max(1, int(every))
        os.makedirs(self.directory, exist_ok=True)

    @property
    def _latest_path(self) -> str:
        return os.path.join(self.directory, "latest.json")

    def save(self, state, next_bi: int, meters: dict) -> None:
        """Checkpoint ``state``; ``meters`` is {name: (sum, count)} where
        ``sum`` is a scalar (AverageMeter) or a per-stream vector (the
        parallel group's correct-counts)."""
        import numpy as np
        import orbax.checkpoint as ocp

        path = os.path.join(self.directory, f"step_{next_bi}")
        ocp.PyTreeCheckpointer().save(path, state, force=True)
        tmp = self._latest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"next_bi": int(next_bi), "path": path,
                       "meters": {k: [np.asarray(s, np.float64).tolist(),
                                      int(c)]
                                  for k, (s, c) in meters.items()}}, f)
        os.replace(tmp, self._latest_path)
        # drop superseded checkpoints
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
        # (TTAState NamedTuple incl. None subtrees)
        state = ocp.PyTreeCheckpointer().restore(meta["path"], item=template)
        meters = {k: (s if isinstance(s, list) else float(s), int(c))
                  for k, (s, c) in meta["meters"].items()}
        return state, int(meta["next_bi"]), meters

    def clear(self) -> None:
        """Remove the checkpoint (called when the stream completes, so a
        later --resume of the sweep does not resurrect a stale state)."""
        shutil.rmtree(self.directory, ignore_errors=True)
