"""Host-side adaptation / evaluation loops.

The runtime layer (reference corpus/basics.py ``tta_standard`` 403-747,
``validate`` 96-217): iterate the video stream, invoke the jitted steps,
aggregate meters, return per-corruption accuracy rows.
"""

from __future__ import annotations

import time
from typing import Optional, Tuple

import jax
import numpy as np

from vitta_tpu.adapt.engine import VittaEngine, TTAState
from vitta_tpu.utils.meters import AverageMeter


def _preload_meter(meter: AverageMeter, sum_count) -> AverageMeter:
    meter.sum, meter.count = sum_count
    meter.avg = meter.sum / max(meter.count, 1)
    return meter


def tta_stream(engine: VittaEngine, paired_data, seed: int = 0,
               logger=None, print_freq: int = 20,
               state: Optional[TTAState] = None,
               metrics_writer=None, checkpointer=None,
               start_index: int = 0,
               meter_state: Optional[dict] = None) -> Tuple[list, TTAState, dict]:
    """Run the online TTA loop over one corruption stream.

    ``paired_data`` yields (tta_views (V,T,S,S,3), eval_clip (E,T,S,S,3),
    label (1,)) per video.  Returns ([top1_avg], final_state, meters) —
    the reference returns ``[top1.avg]`` (basics.py:740-747).

    Mid-stream resume: pass ``checkpointer``
    (adapt/stream_ckpt.StreamCheckpointer) to persist the carried state
    every ``checkpointer.every`` videos; on restart the caller restores
    (state, start_index, meter_state) from it and feeds a ``paired_data``
    that begins at ``start_index`` (Prefetcher(start=...)).  Per-video
    RNGs fold the absolute video index, so the resumed trajectory is the
    uninterrupted one.
    """
    if state is None:
        state = engine.init_state()
    rng = jax.random.PRNGKey(seed)
    top1, top5 = AverageMeter(), AverageMeter()
    losses_reg, losses_consis, losses_ce = AverageMeter(), AverageMeter(), AverageMeter()
    if meter_state:
        _preload_meter(top1, meter_state["top1"])
        _preload_meter(top5, meter_state["top5"])
        # loss meters are part of the resumed trajectory too (the JSONL
        # metric averages and the returned meters dict must match an
        # uninterrupted run); batch_time is wall-clock of THIS process
        # and deliberately restarts.
        for name, meter in (("loss_reg", losses_reg),
                            ("loss_consis", losses_consis),
                            ("loss_ce", losses_ce)):
            if name in meter_state:
                _preload_meter(meter, meter_state[name])
    batch_time = AverageMeter()
    end = time.time()
    for bi, (views, clip, label) in enumerate(paired_data, start=start_index):
        step_rng = jax.random.fold_in(rng, bi)
        state, m = engine.adapt_eval_step(state, views, clip, label, step_rng)
        # host sync happens on metric read; keep it after dispatch
        top1.update(float(m.top1), n=label.shape[0])
        top5.update(float(m.top5), n=label.shape[0])
        losses_reg.update(float(m.loss_reg))
        losses_consis.update(float(m.loss_consis))
        losses_ce.update(float(m.loss_ce))
        batch_time.update(time.time() - end)
        end = time.time()
        if metrics_writer is not None:
            metrics_writer.scalar("tta/loss_reg", losses_reg.val, bi)
            metrics_writer.scalar("tta/loss_consis", losses_consis.val, bi)
            metrics_writer.scalar("tta/top1_avg", top1.avg, bi)
            metrics_writer.scalar("tta/step_ms", batch_time.val * 1000, bi)
        if logger and (bi % print_freq == 0):
            logger.debug(
                f"TTA [{bi}] time {batch_time.val:.3f} ({batch_time.avg:.3f}) "
                f"reg {losses_reg.val:.4f} ({losses_reg.avg:.4f}) "
                f"consis {losses_consis.val:.4f} ({losses_consis.avg:.4f}) "
                f"top1 {top1.val:.3f} ({top1.avg:.3f})")
        if checkpointer is not None and (bi + 1) % checkpointer.every == 0:
            checkpointer.save(state, bi + 1,
                              {"top1": (top1.sum, top1.count),
                               "top5": (top5.sum, top5.count),
                               "loss_reg": (losses_reg.sum, losses_reg.count),
                               "loss_consis": (losses_consis.sum,
                                               losses_consis.count),
                               "loss_ce": (losses_ce.sum, losses_ce.count)})
    if checkpointer is not None:
        checkpointer.clear()
    meters = dict(top1=top1, top5=top5, loss_reg=losses_reg,
                  loss_consis=losses_consis, loss_ce=losses_ce,
                  batch_time=batch_time)
    return [top1.avg], state, meters


def tta_epoch_adapt(engine: VittaEngine, tta_data, eval_data,
                    n_epochs: int = 1, seed: int = 0, logger=None) -> Tuple[float, TTAState]:
    """Epoch-style legacy adaptation (``test_time_adapt``,
    corpus/basics.py:760-1084): hooks stay registered while adapting over
    the whole stream for ``n_epochs``, then a single evaluation pass
    (``validate_brief``, basics.py:1105-1189)."""
    state = engine.init_state()
    rng = jax.random.PRNGKey(seed)
    for ep in range(n_epochs):
        for bi, item in enumerate(tta_data):
            views, _clip, label = item if isinstance(item, tuple) else (
                item.frames, None, np.asarray([item.label], np.int32))
            state, losses = engine.adapt_step(
                state, views, label, jax.random.fold_in(rng, ep * 100003 + bi))
            if logger and bi % 20 == 0:
                logger.debug(f"epoch-TTA [{ep}][{bi}] reg {float(losses[0]):.4f}")
    top1, _top5 = validate(engine, eval_data, params=state.params, logger=logger)
    return top1, state


def validate(engine_or_apply, data, params=None, logger=None,
             print_freq: int = 20) -> Tuple[float, float]:
    """Plain evaluation loop (reference basics.py:96-217 without the
    baseline adaptation pre-passes)."""
    top1, top5 = AverageMeter(), AverageMeter()
    for bi, item in enumerate(data):
        clip, label = (item.frames, np.asarray([item.label], np.int32)) \
            if hasattr(item, "frames") else item
        t1, t5, _pred = engine_or_apply.eval_step(
            params if params is not None else engine_or_apply.init_params,
            clip, label)
        top1.update(float(t1), n=label.shape[0])
        top5.update(float(t5), n=label.shape[0])
        if logger and (bi % print_freq == 0):
            logger.debug(f"Eval [{bi}] top1 {top1.val:.3f} ({top1.avg:.3f})")
    return top1.avg, top5.avg
