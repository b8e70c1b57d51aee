"""NORM baseline: test-time batch normalization
(reference baselines/norm.py:4-49 + adaptation pre-pass
corpus/basics.py:129-143).

BN layers normalize with the statistics of the *test batch* (train-mode
BN); running stats are also EMA-updated with momentum 0.1 during the
pre-pass.  Predictions depend only on the batch statistics, so the
functional form is an eval forward with ``use_running_average=False``.
"""

from __future__ import annotations

import jax

from vitta_tpu.baselines.common import BaselineBase


class NormBaseline(BaselineBase):
    def __init__(self, model, cfg, variables):
        super().__init__(model, cfg, variables)
        self._fwd = jax.jit(lambda v, x: self.model.apply(
            v, x, train=False, use_running_average=False,
            update_running_stats=True, mutable=["batch_stats"]))

    def run(self, eval_dataset, batch_size: int = 1) -> float:
        variables = dict(self.variables)

        def apply_fn(x):
            nonlocal variables
            logits, mutated = self._fwd(variables, x)
            variables = {"params": variables["params"],
                         "batch_stats": mutated["batch_stats"]}
            return logits

        return self.evaluate(apply_fn, eval_dataset, batch_size)
