"""Source-only baseline: plain evaluation, no adaptation
(reference setup_baseline.py:47-52)."""

from __future__ import annotations

import jax

from vitta_tpu.baselines.common import BaselineBase


class SourceBaseline(BaselineBase):
    def __init__(self, model, cfg, variables):
        super().__init__(model, cfg, variables)
        self._fwd = jax.jit(lambda v, x: self.model.apply(v, x, train=False))

    def run(self, eval_dataset, batch_size: int = 1) -> float:
        return self.evaluate(lambda x: self._fwd(self.variables, x),
                             eval_dataset, batch_size)
