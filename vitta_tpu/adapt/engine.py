"""The ViTTA adaptation engine — one jitted step per test video.

Functional re-design of the reference live loop ``tta_standard``
(corpus/basics.py:403-747).  Where the reference mutates a torch module
(register hooks -> forward -> backward -> SGD step -> remove hooks ->
no-grad eval -> re-register hooks), here the whole sequence is a single
pure function of carried state:

    state = (params, opt_state, ema, step)
    adapt_eval_step(state, views, eval_clip, label, rng)
        -> (state', metrics)

* forward-with-taps on the augmented views (hooks firing ==
  ``taps`` collection mutable);
* per chosen layer: EMA update of channel stats
  (``MovingAverageTensor`` semantics) and L1 alignment against source
  statistics — gradient flows only through the current batch's
  contribution (utils/utils_.py:211);
* sum-L1 prediction consistency across views
  (pred_consistency_utils.py:15-31);
* ``loss = lambda_reg * sum(reg) + lambda_consis * consis``
  (basics.py:657-667); one optimizer step (or ``n_gradient_steps`` for
  tta_standard mode);
* inference on the deterministic eval clip of the same video with the
  *updated* parameters and **no taps** (basics.py:691-716) — the
  functional analogue of removing hooks;
* in ``tta_standard`` mode the parameter/EMA carry is reset to the
  initial pytree every step (the reference's ``cp.deepcopy(model_origin)``
  at basics.py:530 — free here).

Everything is static-shaped, so the XLA program is compiled once and
re-used for the whole corruption stream.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from vitta_tpu.config import VittaConfig
from vitta_tpu.ops.losses import (compute_regularization, cross_entropy,
                                  pred_consistency, topk_accuracy)
from vitta_tpu.ops.stats import (CumulativeState, TapStats, cumulative_update,
                                 ema_update)

TapDict = Dict[str, TapStats]


class RegSpec(NamedTuple):
    """One statistic-regularization channel: a tap leaf to read, the
    chosen layer names, and their source-side targets.

    mean_var mode has one spec per configured ``stat_type`` (the
    reference's multi-type legacy path sums per-type hooks into one
    loss, basics.py:850-906); BNS and cossim modes have a single spec
    keyed 'BNS' / 'cossim'."""

    key: str
    leaf: str
    names: Tuple[str, ...]
    source: Dict[str, TapStats]


def flatten_taps(tree, leaf: str = "stat") -> TapDict:
    """Flatten a ``taps`` collection to {dotted.name: TapStats}.

    ``leaf='stat'`` selects output-side statistics (the default hook
    placement, before_norm=False); ``leaf='stat_in'`` the input-side ones
    (before_norm=True / BNS regularization)."""
    flat = {}
    leaves = jax.tree_util.tree_flatten_with_path(
        tree, is_leaf=lambda x: isinstance(x, TapStats))[0]
    for path, value in leaves:
        parts = [p.key for p in path if hasattr(p, "key")]
        if parts[-1] != leaf:
            continue
        flat[".".join(parts[:-1])] = value
    return flat


def batch_stats_as_tapdict(batch_stats) -> TapDict:
    """The model's BN running statistics as {name: TapStats} — the
    'source' side of the BNS regularization (BNFeatureHook captures
    running_mean/var at init, BNS_utils.py:28-30)."""
    out = {}
    leaves = jax.tree_util.tree_flatten_with_path(batch_stats)[0]
    means, variances = {}, {}
    for path, value in leaves:
        parts = [p.key for p in path if hasattr(p, "key")]
        name = ".".join(parts[:-1])
        (means if parts[-1] == "mean" else variances)[name] = value
    for name in means:
        out[name] = TapStats(jnp.asarray(means[name]),
                             jnp.asarray(variances[name]))
    return out


def select_tap_names(available, chosen_blocks, source_stats=None) -> Tuple[str, ...]:
    """Layer selection by name-substring (corpus/basics.py:571-587) in
    deterministic order; restricted to layers with source statistics
    (BatchNorm1d positions carry ``None`` placeholders in the reference,
    basics.py:488-498 — omitted dict entries here)."""
    names = []
    for name in sorted(available):
        dotted = name.replace("_", ".")
        if not any((b in name) or (b in dotted) for b in chosen_blocks):
            continue
        if source_stats is not None and name not in source_stats:
            continue
        names.append(name)
    return tuple(names)


class TTAState(NamedTuple):
    params: Any
    opt_state: Any
    ema: TapDict          # per chosen layer: TapStats (EMA) or
                          # CumulativeState (moving_avg=False meter)
    step: jax.Array       # int32
    batch_stats: Any = {}  # BN running stats; carried (and updated each
                           # adapt forward) when fix_BNS=False
                           # (corpus/basics.py:606-611)
    params_half: Any = None  # SPARSE compute-dtype twin of the flax-cast
                             # param leaves (Swin bf16 mode; None at
                             # uncast positions — a shared f32 leaf would
                             # be donated twice with the state) — kills
                             # the bulk f32->bf16 convert both forwards
                             # otherwise pay per step (~0.65 ms each for
                             # 88 M params); emitted fused with the SGD
                             # update


def half_cast_flags(params, scope: str = "backbone"):
    """True for every leaf of a ``scope``-subtree module that owns a
    ``kernel`` — exactly the leaves flax's promote_dtype casts to the
    compute dtype in Swin (Dense/Conv kernel+bias, the fused-MLP
    _DenseParams pairs).  Norm scale/bias and the rel-pos tables stay
    f32 (their modules do f32 math on f32 masters), and the classifier
    head outside ``scope`` is f32 by design (models/swin.py I3DHead), so
    pre-casting the flagged set is value-identical to the in-model
    cast."""
    from collections.abc import Mapping

    def walk(node, cast, in_scope):
        if isinstance(node, Mapping):
            here = cast or (in_scope and "kernel" in node)
            return {k: walk(v, here, in_scope or k == scope)
                    for k, v in node.items()}
        return cast

    # with no scope subtree at the root (backbone-only param trees), the
    # whole tree is in scope
    return walk(params, False, scope not in params)


class StepMetrics(NamedTuple):
    loss_reg: jax.Array
    loss_consis: jax.Array
    loss_ce: jax.Array
    top1: jax.Array       # 0/100 for batch of 1; percentage for batches
    top5: jax.Array
    pred: jax.Array       # argmax of eval logits (B,)


class VittaEngine:
    """Builds and owns the jitted adapt+eval step for one model/config."""

    def __init__(self, model, cfg: VittaConfig, variables,
                 source_stats: Optional[Dict[str, Tuple[Any, Any]]] = None,
                 tap_names: Optional[Tuple[str, ...]] = None,
                 donate: bool = True):
        cfg.tta.validate()
        self.model = model
        self.cfg = cfg
        # device-side normalization constants: when a step receives uint8
        # frames, (x[/255] - mean)/std fuses into the jitted step — 4x less
        # host->device traffic than shipping normalized float32
        self._norm_mean = jnp.asarray(cfg.data.input_mean, jnp.float32)
        self._norm_std = jnp.asarray(cfg.data.input_std, jnp.float32)
        self._norm_div255 = cfg.model.arch != "videoswintransformer"
        # VITTA_PATCHIFY: unfold Swin's patch grid on the raw frames
        # inside the step, before normalize — the patch-embed Conv3d then
        # runs as a flat matmul (models/swin.py:patchify)
        from vitta_tpu.ops.dispatch import patchify_enabled
        self._patchify = tuple(cfg.model.patch_size) \
            if (patchify_enabled()
                and cfg.model.arch == "videoswintransformer") else None
        self.batch_stats = variables.get("batch_stats", {})
        self.init_params = variables["params"]
        # Regularization channels.  The reference live hook only supports
        # ['spatiotemp'] (norm_stats_utils.py:131); the legacy loop's
        # intent — several statistic types regularized at once with
        # per-type source files and per-type meters summed into one loss
        # (basics.py:850-906, loader :749-757) — is realized here as one
        # RegSpec per type.  'cossim' mirrors CombineCossimRegHook
        # registration (basics.py:908-925).  Tap side per
        # opts.py:92 before_norm; BNS always reads the norm *input* and
        # compares against the layer's running stats (BNS_utils.py:19-77).
        from vitta_tpu.models.layers import tap_leaf_name
        tcfg = cfg.tta
        self.stat_types = tuple(tcfg.stat_type)

        def pick(src):
            if tap_names is None:
                names = select_tap_names(src.keys(), tcfg.chosen_blocks, src)
            else:  # explicit override, restricted to layers this spec covers
                names = tuple(n for n in tap_names if n in src)
            return tuple(names), {k: src[k] for k in names}

        specs = []
        if tcfg.stat_reg == "BNS":
            src = batch_stats_as_tapdict(self.batch_stats)
            specs.append(RegSpec("BNS", "stat_in", *pick(src)))
        elif tcfg.stat_reg == "cossim":
            assert source_stats is not None, \
                "cossim mode needs relation-map targets (temp_cossim_clean_file)"
            # targets wrapped as zero-variance TapStats: l1/mse
            # compute_regularization then coincides with the reference's
            # cossim loss (relation_map_utils.py:326-331); None entries
            # (layers without a relation map) are skipped like the
            # reference registration (basics.py:916)
            src = {}
            for k, v in source_stats.items():
                if v is None:
                    continue
                vec = jnp.asarray(v, jnp.float32)
                src[k] = TapStats(vec, jnp.zeros_like(vec))
            leaf = tap_leaf_name("cossim", input_side=tcfg.before_norm)
            specs.append(RegSpec("cossim", leaf, *pick(src)))
        else:
            assert source_stats is not None, "mean_var mode needs source stats"
            # accept {name: (mean, var)} for a single type, or the
            # per-type nesting {stat_type: {name: (mean, var)}}
            nested = source_stats and all(
                isinstance(v, dict) for v in source_stats.values())
            per_type = source_stats if nested else \
                {self.stat_types[0]: source_stats}
            for st in self.stat_types:
                if st not in per_type:
                    raise KeyError(
                        f"stat_type {st!r} has no source statistics (got "
                        f"types {sorted(per_type)}; pass the per-type "
                        "*_clean_file pair, basics.py:749-757)")
                src = {k: TapStats(jnp.asarray(m, jnp.float32),
                                   jnp.asarray(v, jnp.float32))
                       for k, (m, v) in per_type[st].items()}
                leaf = tap_leaf_name(st, input_side=tcfg.before_norm)
                specs.append(RegSpec(st, leaf, *pick(src)))
        self.reg_specs = tuple(specs)
        self._multi = len(specs) > 1
        # single-spec compatibility views
        self.tap_leaf = specs[0].leaf
        self.tap_names = specs[0].names
        self.source = specs[0].source

        # SGD (the live default) is a hand-fused per-leaf update — the
        # optax chain costs thousands of tiny device ops per step (see
        # optim.fused_sgd_step); the Adam-on-affine option keeps the
        # optax pipeline (non-default, far fewer trainable leaves).
        from vitta_tpu.adapt.optim import (build_optimizer, fused_sgd_mask,
                                           fused_sgd_step)
        self._fused_sgd = not cfg.optim.update_only_bn_affine
        # bf16-twin mode (Swin only: there, every kernel-owning module is
        # dtype-threaded, so the twin is value-identical — see
        # half_cast_flags; TANet keeps new_fc/TAM in f32 by design)
        try:
            compute_dtype = jnp.dtype(getattr(model, "dtype", jnp.float32))
        except TypeError:
            compute_dtype = jnp.float32
        from vitta_tpu.ops.dispatch import flag_enabled
        self._half = (self._fused_sgd
                      and compute_dtype == jnp.bfloat16
                      and cfg.model.arch == "videoswintransformer"
                      and not flag_enabled("VITTA_NO_HALF_TWIN", False))
        self._half_flags = (half_cast_flags(self.init_params)
                            if self._half else None)
        if self._fused_sgd:
            self.tx = None
            self._sgd_mask = fused_sgd_mask(self.init_params, cfg.model.arch,
                                            cfg.model.partial_bn)
            self._sgd_step_fn = fused_sgd_step
        else:
            self.tx = build_optimizer(cfg.optim, self.init_params,
                                      arch=cfg.model.arch,
                                      partial_bn=cfg.model.partial_bn)
        self._adapt_eval = jax.jit(
            self._adapt_eval_impl,
            donate_argnums=(0,) if donate else (),
        )
        # tta_standard resets the carry to the initial pytree every video
        # (basics.py:519-530).  Rebuilding that state eagerly per step
        # costs hundreds of tiny zeros/cast dispatches outside jit, so the
        # reset template is built ONCE and re-passed each step through a
        # NON-donating jit (donation would invalidate the template's
        # buffers on the first call).  The std step returns ONLY
        # (step, metrics): the updated params/momentum/EMA are dead (the
        # next video resets them), and materializing them as jit outputs
        # of a non-donating call forced XLA to copy ~660 leaves into
        # fresh output buffers — the round-5 TANet bf16 trace shows that
        # swarm as ~1.5 ms/step of 30-70 us copy-dones.  Dropping the
        # outputs lets XLA dead-code-eliminate the write-backs while the
        # eval forward still consumes the updated values internally.
        self._std_template: Optional[TTAState] = None
        self._adapt_eval_std = jax.jit(self._adapt_eval_std_impl)
        self._eval_only = jax.jit(self._eval_only_impl)
        self._adapt_only = jax.jit(self._adapt_only_impl)

    # ------------------------------------------------------------------
    def _init_ema_for(self, spec: RegSpec) -> dict:
        if self.cfg.tta.moving_avg or spec.key == "BNS":
            # MovingAverageTensor starts from 0 (utils_.py:204-208)
            return {k: TapStats(jnp.zeros_like(s.mean),
                                jnp.zeros_like(s.var))
                    for k, s in spec.source.items()}
        # AverageMeterTensor: running sum + count (utils_.py:190-202)
        return {k: CumulativeState(jnp.zeros_like(s.mean),
                                   jnp.zeros_like(s.var),
                                   jnp.zeros((), jnp.float32))
                for k, s in spec.source.items()}

    def init_state(self) -> TTAState:
        if self._multi:
            zeros_ema = {s.key: self._init_ema_for(s) for s in self.reg_specs}
        else:
            zeros_ema = self._init_ema_for(self.reg_specs[0])
        if self._fused_sgd:
            from vitta_tpu.adapt.optim import half_momentum_enabled
            vdt = jnp.bfloat16 if half_momentum_enabled() else None
            opt_state = jax.tree_util.tree_map(
                lambda p: jnp.zeros(p.shape, vdt or p.dtype),
                self.init_params)
        else:
            opt_state = self.tx.init(self.init_params)
        return TTAState(
            params=self.init_params,
            opt_state=opt_state,
            ema=zeros_ema,
            step=jnp.zeros((), jnp.int32),
            batch_stats=self.batch_stats,
            params_half=self._cast_half(self.init_params),
        )

    def _cast_half(self, params):
        """Compute-dtype twin of the flagged leaves (None when the twin
        mode is off).  Inside the jitted step XLA fuses the per-leaf cast
        into the SGD update fusion that produced the leaf — no separate
        HBM pass.

        The twin is SPARSE: unflagged positions hold None rather than the
        f32 param leaf.  Carrying the leaf itself would make ``params``
        and ``params_half`` share device buffers, and donating the state
        (donate_argnums=(0,)) would then donate one buffer twice — a
        runtime InvalidArgument on TPU (bisected on-chip: donation +
        full twin fails, donation + no twin or no donation succeed)."""
        if not self._half:
            return None
        return jax.tree_util.tree_map(
            lambda p, f: p.astype(jnp.bfloat16) if f else None,
            params, self._half_flags)

    def _merge_half(self, half, params):
        """Full forward tree from the sparse twin: twin leaf where cast,
        the f32 master leaf elsewhere (what flax's promote_dtype leaves
        uncast anyway)."""
        return jax.tree_util.tree_map(
            lambda h, p: p if h is None else h, half, params,
            is_leaf=lambda x: x is None)

    # ------------------------------------------------------------------
    def _maybe_normalize(self, x):
        if self._patchify is not None:
            pd, ph, pw = self._patchify
            _, t, hh, ww, c = x.shape
            if c == 3 and t % pd == 0 and hh % ph == 0 and ww % pw == 0:
                from vitta_tpu.models.swin import patchify
                x = patchify(x, self._patchify)
        if x.dtype != jnp.uint8:
            return x
        xf = x.astype(jnp.float32)
        if self._norm_div255:
            xf = xf / 255.0
        # per-channel constants tile across the packed patch axis
        # (patchify keeps c as the minor dim of each patch)
        reps = x.shape[-1] // self._norm_mean.shape[0]
        mean = jnp.tile(self._norm_mean, reps) if reps > 1 else self._norm_mean
        std = jnp.tile(self._norm_std, reps) if reps > 1 else self._norm_std
        return (xf - mean) / std

    def _forward_tree(self, params, batch_stats, views, rng):
        """One tapped forward; returns the raw ``taps`` tree."""
        views = self._maybe_normalize(views)
        variables = {"params": params, "batch_stats": batch_stats}
        if self.cfg.tta.fix_BNS:
            # norm layers stay in inference form during adaptation
            # (model.train() + forced BN .eval(), corpus/basics.py:606-611)
            logits, aux = self.model.apply(
                variables, views, train=True, mutable=["taps"],
                rngs={"dropout": rng})
            new_batch_stats = batch_stats
        else:
            # fix_BNS=False: BN layers remain in train mode — batch-stat
            # normalization AND running-stat updates during the adapt
            # forward (basics.py:606-611 skipped)
            logits, aux = self.model.apply(
                variables, views, train=True,
                use_running_average=False, update_running_stats=True,
                mutable=["taps", "batch_stats"], rngs={"dropout": rng})
            new_batch_stats = aux["batch_stats"]
        return logits, aux["taps"], new_batch_stats

    def _forward_with_taps(self, params, batch_stats, views, rng):
        logits, tree, new_batch_stats = self._forward_tree(
            params, batch_stats, views, rng)
        return logits, flatten_taps(tree, leaf=self.tap_leaf), new_batch_stats

    def _losses(self, params, ema, batch_stats, views, rng):
        from vitta_tpu.models.layers import COUNT_LEAF
        tcfg = self.cfg.tta
        logits, tree, new_batch_stats = self._forward_tree(
            params, batch_stats, views, rng)
        # prediction consistency over augmented views
        n_views = tcfg.n_augmented_views if tcfg.if_sample_tta_aug_views else 1
        bv = logits.shape[0]
        # per-layer reference batch counts for the cumulative meters
        # (AverageMeterTensor.update(value, n=bz), the bz of each layer's
        # feature shape — norm_stats_utils.py:166-182,239-249)
        counts = flatten_taps(tree, leaf=COUNT_LEAF)
        # statistic alignment over chosen layers ("onereg": views already
        # folded into batch before the taps), one spec per stat channel,
        # all summed into one loss (basics.py:900-906)
        loss_reg = jnp.float32(0.0)
        new_ema_subs = {}
        for spec in self.reg_specs:
            taps = flatten_taps(tree, leaf=spec.leaf)
            ema_sub = ema[spec.key] if self._multi else ema
            new_sub = {}
            for name in spec.names:
                if spec.key == "BNS":
                    # BNFeatureHook: raw batch stats, or running-manner EMA
                    # with momentum_bns (BNS_utils.py:55-77)
                    updated = (ema_update(ema_sub[name], taps[name],
                                          tcfg.momentum_bns)
                               if tcfg.running_manner else taps[name])
                    new_sub[name] = updated
                elif tcfg.moving_avg:
                    updated = ema_update(ema_sub[name], taps[name],
                                         tcfg.momentum_mvg)
                    new_sub[name] = updated
                else:
                    new_sub[name], updated = cumulative_update(
                        ema_sub[name], taps[name],
                        counts.get(name, jnp.float32(bv)))
                loss_reg = loss_reg + compute_regularization(
                    spec.source[name], updated, tcfg.reg_type)
            new_ema_subs[spec.key] = new_sub
        new_ema = (new_ema_subs if self._multi
                   else new_ema_subs[self.reg_specs[0].key])
        view_logits = logits.reshape(bv // n_views, n_views, -1)
        if tcfg.if_sample_tta_aug_views and tcfg.if_pred_consistency:
            loss_consis = pred_consistency(view_logits)
            loss = (tcfg.lambda_feature_reg * loss_reg
                    + tcfg.lambda_pred_consis * loss_consis)
        else:
            loss_consis = jnp.float32(0.0)
            loss = loss_reg
        mean_logits = jnp.mean(view_logits, axis=1)
        return loss, (loss_reg, loss_consis, mean_logits, new_ema,
                      new_batch_stats)

    def _sgd_step(self, params, opt_state, grads):
        if self._fused_sgd:
            return self._sgd_step_fn(self.cfg.optim, params, opt_state,
                                     grads, self._sgd_mask)
        import optax
        updates, opt_state = self.tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state

    def _adapt_eval_impl(self, state: TTAState, views, eval_clip, label, rng):
        grad_fn = jax.grad(self._losses, has_aux=True)

        params, opt_state, ema = state.params, state.opt_state, state.ema
        batch_stats = state.batch_stats
        # twin mode: the forwards consume the carried compute-dtype twin;
        # the cast's VJP is the identity on values (flax would cast the
        # same leaves anyway), so grads/trajectories are unchanged while
        # the bulk f32->bf16 converts disappear from the step
        half = state.params_half
        fwd_params = self._merge_half(half, params) if self._half else params
        loss_reg = loss_consis = jnp.float32(0.0)
        loss_ce = jnp.float32(0.0)
        for gs in range(self.cfg.tta.n_gradient_steps):
            step_rng = jax.random.fold_in(rng, gs)
            grads, (loss_reg, loss_consis, mean_logits, ema,
                    batch_stats) = grad_fn(fwd_params, ema, batch_stats,
                                           views, step_rng)
            params, opt_state = self._sgd_step(params, opt_state, grads)
            if self._half:
                half = self._cast_half(params)
                fwd_params = self._merge_half(half, params)
            else:
                fwd_params = params
            loss_ce = cross_entropy(mean_logits, label)
        # detach EMA carry (the meter's sum is detached between steps)
        ema = jax.tree_util.tree_map(jax.lax.stop_gradient, ema)

        # inference on the eval clip with updated params, no taps
        # (model.eval() at basics.py:692: running-average normalization,
        # which under fix_BNS=False uses the just-updated running stats)
        eval_logits = self._apply_eval(fwd_params, eval_clip, batch_stats)
        top1, top5 = topk_accuracy(eval_logits, label)
        metrics = StepMetrics(loss_reg, loss_consis, loss_ce, top1, top5,
                              jnp.argmax(eval_logits, -1))
        new_state = TTAState(params, opt_state, ema,
                             state.step + 1, batch_stats,
                             half if self._half else None)
        return new_state, metrics

    def _apply_eval(self, params, eval_clip, batch_stats=None):
        """Deterministic forward; clips/crops folded in the batch axis are
        averaged (basics.py:695-708)."""
        eval_clip = self._maybe_normalize(eval_clip)
        variables = {"params": params,
                     "batch_stats": self.batch_stats
                     if batch_stats is None else batch_stats}
        logits = self.model.apply(variables, eval_clip, train=False)
        n_eval_views = self.cfg.data.test_crops * int(
            self.cfg.data.sample_style.split("-")[-1]) \
            if self.cfg.model.arch == "tanet" else \
            self.cfg.data.test_crops * self.cfg.data.num_clips
        b = logits.shape[0] // n_eval_views
        return jnp.mean(logits.reshape(b, n_eval_views, -1), axis=1)

    def _adapt_eval_std_impl(self, state: TTAState, views, eval_clip, label,
                             rng):
        """tta_standard step: same math as ``_adapt_eval_impl`` but the
        carried state stays inside the jit (see __init__ — only the step
        counter leaves, which also keeps consecutive dispatches
        data-dependent for honest serialized timing)."""
        new_state, metrics = self._adapt_eval_impl(state, views, eval_clip,
                                                   label, rng)
        return new_state.step, metrics

    def _adapt_only_impl(self, state: TTAState, views, label, rng):
        """Adaptation without the per-sample eval — the epoch-style legacy
        loop ``test_time_adapt`` (basics.py:760-1084) adapts over the whole
        stream first and evaluates once at the end."""
        fwd_params = (self._merge_half(state.params_half, state.params)
                      if self._half else state.params)
        grads, (loss_reg, loss_consis, mean_logits, ema, batch_stats) = \
            jax.grad(self._losses, has_aux=True)(
                fwd_params, state.ema, state.batch_stats, views, rng)
        params, opt_state = self._sgd_step(state.params, state.opt_state,
                                           grads)
        ema = jax.tree_util.tree_map(jax.lax.stop_gradient, ema)
        loss_ce = cross_entropy(mean_logits, label)
        return TTAState(params, opt_state, ema, state.step + 1, batch_stats,
                        self._cast_half(params)), \
            (loss_reg, loss_consis, loss_ce)

    def adapt_step(self, state: TTAState, views, label, rng):
        return self._adapt_only(state, views, label, rng)

    def _eval_only_impl(self, params, eval_clip, label):
        logits = self._apply_eval(params, eval_clip)
        top1, top5 = topk_accuracy(logits, label)
        return top1, top5, jnp.argmax(logits, -1)

    # ------------------------------------------------------------------
    def adapt_eval_step(self, state: TTAState, views, eval_clip, label, rng):
        """One test video: adapt on its augmented views, then evaluate it.

        tta_standard mode re-initializes model/optimizer/EMA per sample
        (basics.py:519-530) — the carry is reset before the step.
        """
        if self.cfg.tta.if_tta_standard == "tta_standard":
            if self._std_template is None:
                self._std_template = self.init_state()
            state = self._std_template._replace(step=state.step)
            new_step, metrics = self._adapt_eval_std(state, views, eval_clip,
                                                     label, rng)
            # the post-step state's semantic value IS the reset template
            # (plus the advanced counter) — reconstruct it host-side so
            # callers (stream loop, mid-stream checkpointing) still see a
            # full TTAState
            return self._std_template._replace(step=new_step), metrics
        return self._adapt_eval(state, views, eval_clip, label, rng)

    def eval_step(self, params, eval_clip, label):
        return self._eval_only(params, eval_clip, label)
