"""Supervised source training — counterpart of the reference's legacy
trainer (corpus/main_train.py:23-122, corpus/basics.py:35-93):

* SGD(momentum 0.9, weight decay) with step-decay lr (x0.1 at lr_steps,
  utils/utils_.py:214-221) and optional gradient-norm clipping
  (basics.py:70-76);
* BN layers in batch-stat mode with running-stat updates;
* periodic validation + best-checkpoint saving
  (utils_.py:240-249, main_train.py:61-71) — here via orbax so training
  state (params, batch_stats, optimizer, step) resumes exactly.

The reference's trainer is partially dead code (undefined flags,
SURVEY.md §2.2); this one is live and tested.
"""

from __future__ import annotations

import os
from typing import Any, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax

from vitta_tpu.ops.losses import cross_entropy, topk_accuracy
from vitta_tpu.utils.meters import AverageMeter


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jax.Array


def step_decay_schedule(base_lr: float, lr_steps: Sequence[int],
                        steps_per_epoch: int):
    """lr * 0.1^(#epochs passed in lr_steps) (utils_.py:214-221)."""
    boundaries = {int(e * steps_per_epoch): 0.1 for e in lr_steps}
    return optax.piecewise_constant_schedule(base_lr, boundaries)


class Trainer:
    def __init__(self, model, lr: float = 1e-3, momentum: float = 0.9,
                 weight_decay: float = 5e-4,
                 lr_steps: Sequence[int] = (30, 60),
                 steps_per_epoch: int = 1000,
                 clip_gradient: Optional[float] = None):
        self.model = model
        sched = step_decay_schedule(lr, lr_steps, steps_per_epoch)
        chain = [optax.add_decayed_weights(weight_decay),
                 optax.trace(decay=momentum)]
        if clip_gradient is not None:
            # torch clip_grad_norm_ over the total norm (basics.py:70-76)
            chain.insert(0, optax.clip_by_global_norm(clip_gradient))
        chain.append(optax.scale_by_schedule(lambda c: -sched(c)))
        self.tx = optax.chain(*chain)
        self._step = jax.jit(self._step_impl, donate_argnums=(0,))

    def init_state(self, variables) -> TrainState:
        return TrainState(variables["params"],
                          variables.get("batch_stats", {}),
                          self.tx.init(variables["params"]),
                          jnp.zeros((), jnp.int32))

    def _step_impl(self, state: TrainState, clips, labels, rng):
        def loss_fn(params):
            out, mutated = self.model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                clips, train=True, use_running_average=False,
                update_running_stats=True, mutable=["batch_stats"],
                rngs={"dropout": rng})
            loss = cross_entropy(out, labels)
            return loss, (out, mutated["batch_stats"])

        (loss, (out, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        top1, top5 = topk_accuracy(out, labels)
        return TrainState(params, new_stats, opt_state, state.step + 1), \
            (loss, top1, top5)

    def train_epoch(self, state: TrainState, data_iter, rng,
                    logger=None, print_freq: int = 20) -> Tuple[TrainState, dict]:
        losses, top1 = AverageMeter(), AverageMeter()
        for bi, (clips, labels) in enumerate(data_iter):
            state, (loss, t1, _t5) = self._step(
                state, jnp.asarray(clips), jnp.asarray(labels),
                jax.random.fold_in(rng, bi))
            losses.update(float(loss), n=labels.shape[0])
            top1.update(float(t1), n=labels.shape[0])
            if logger and bi % print_freq == 0:
                logger.debug(f"train [{bi}] loss {losses.val:.4f} "
                             f"({losses.avg:.4f}) top1 {top1.avg:.2f}")
        return state, {"loss": losses.avg, "top1": top1.avg}


# ---------------------------------------------------------------------------
# Checkpoint save / resume (orbax)
# ---------------------------------------------------------------------------

def save_checkpoint(path: str, state, keep_best: bool = False,
                    is_best: bool = False):
    """Save a pytree state (TrainState/TTAState/variables) to ``path``;
    with is_best, also copy to ``<path>_best`` (utils_.py:240-249)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, state, force=True)
    if keep_best and is_best:
        ckptr.save(path + "_best", state, force=True)


def restore_checkpoint(path: str, target=None):
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    return ckptr.restore(os.path.abspath(path), item=target)
