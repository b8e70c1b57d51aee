"""TENT baseline: entropy minimization over BN affine parameters
(reference baselines/tent.py; hyperparameters hard-coded in
setup_baseline.py:9-14: Adam lr 1e-5, beta 0.9, wd 0, 1 step/batch).

Functional form: BN layers normalize with batch statistics and update
running stats (configure_model sets BN train mode, tent.py:61-71); only
norm-layer gamma/beta receive gradient updates (collect_params,
tent.py:29-45); loss is the mean softmax entropy of the view-averaged
batch outputs (forward_and_adapt, tent.py:12-26).  The reference runs
one adaptation pass over the loader inside validate (basics.py:116-128)
and then evaluates; ``run`` reproduces that protocol.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from vitta_tpu.adapt.optim import norm_affine_mask, _with_frozen
from vitta_tpu.baselines.common import BaselineBase

TENT_LR = 1e-5
TENT_BETA = 0.9


class TentBaseline(BaselineBase):
    def __init__(self, model, cfg, variables):
        super().__init__(model, cfg, variables)
        self.tx = _with_frozen(optax.adam(TENT_LR, b1=TENT_BETA, b2=0.999),
                               norm_affine_mask(variables["params"]))
        self._adapt = jax.jit(self._adapt_impl)
        self._fwd = jax.jit(lambda v, x: self.model.apply(
            v, x, train=False, use_running_average=False))

    def _adapt_impl(self, params, batch_stats, opt_state, x):
        def loss_fn(p):
            logits, mutated = self.model.apply(
                {"params": p, "batch_stats": batch_stats}, x, train=False,
                use_running_average=False, update_running_stats=True,
                mutable=["batch_stats"])
            mean = self._mean_logits(logits)
            log_p = jax.nn.log_softmax(mean, axis=-1)
            ent = -jnp.sum(jnp.exp(log_p) * log_p, axis=-1)
            return jnp.mean(ent), mutated["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = self.tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_stats, opt_state, loss

    def run(self, eval_dataset, batch_size: int = 1) -> float:
        from vitta_tpu.baselines.common import batched_eval_iter
        params = self.variables["params"]
        stats = self.variables["batch_stats"]
        opt_state = self.tx.init(params)
        # adaptation pass over the stream (basics.py:116-128)
        for clips, _labels in batched_eval_iter(eval_dataset, batch_size):
            params, stats, opt_state, _loss = self._adapt(
                params, stats, opt_state, jnp.asarray(clips))
        variables = {"params": params, "batch_stats": stats}
        # evaluation with the adapted model, BN still in batch-stat mode
        return self.evaluate(lambda x: self._fwd(variables, x),
                             eval_dataset, batch_size)
