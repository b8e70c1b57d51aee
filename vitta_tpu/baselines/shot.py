"""SHOT baseline: source-hypothesis transfer
(reference baselines/shot.py + shot_utils.py).

Protocol (shot.py:62-137): split the net into feature extractor (new_fc
replaced by identity) and a frozen classifier (configure_shot,
shot.py:41-59); per epoch (a) compute cluster-refined pseudo-labels over
the whole stream with the extractor in eval mode (``ext.eval()``,
shot.py:70: running-stat BN, no dropout; obtain_shot_label,
shot_utils.py:7-68: class centroids from softmax-weighted normalized
features with an appended ones column, cosine cdist, one refinement
round), (b) one SGD(lr 5e-5, momentum 0.9) pass minimizing
0.001*CE(pseudo) + entropy - diversity (shot.py:102-117) with the
extractor in train mode (``ext.train()``, shot.py:73: active dropout,
batch-stat BN with running-stat updates), then evaluate in eval mode
with the adapted running stats (validate, basics.py:152).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax
from scipy.spatial.distance import cdist

from vitta_tpu.baselines.common import BaselineBase, batched_eval_iter

CLS_PAR = 0.001     # args_shot.cls_par
ENT_PAR = 1.0       # args_shot.ent_par
SHOT_LR = 5e-5      # args_shot.lr
N_EPOCH = 1         # args_shot.nepoch


class ShotBaseline(BaselineBase):
    def __init__(self, model, cfg, variables):
        super().__init__(model, cfg, variables)
        self.tx = optax.chain(optax.trace(decay=0.9), optax.scale(-SHOT_LR))
        # pseudo-label pass: extractor in eval mode (ext.eval(),
        # shot.py:70) — running-average BN, deterministic
        self._feat = jax.jit(lambda v, x: self.model.apply(
            v, x, method="features"))
        self._cls = jax.jit(lambda v, f: self.model.apply(v, f, method="classify"))
        self._adapt = jax.jit(self._adapt_impl)

    # ------------------------------------------------------------------
    def _pseudo_labels(self, dataset, variables, batch_size):
        """obtain_shot_label (shot_utils.py:7-68)."""
        feats, outs = [], []
        for clips, _ in batched_eval_iter(dataset, batch_size):
            f = self._feat(variables, jnp.asarray(clips))     # (B*E, F)
            o = self._cls(variables, f)
            e = self.n_eval_views
            b = f.shape[0] // e
            feats.append(np.asarray(f.reshape(b, e, -1).mean(1)))
            outs.append(np.asarray(o.reshape(b, e, -1).mean(1)))
        all_fea = np.concatenate(feats, 0)
        all_out = jax.nn.softmax(jnp.asarray(np.concatenate(outs, 0)), -1)
        all_out = np.asarray(all_out)
        all_fea = np.concatenate([all_fea, np.ones((len(all_fea), 1), np.float32)], 1)
        all_fea = all_fea / np.linalg.norm(all_fea, axis=1, keepdims=True)
        k = all_out.shape[1]
        aff = all_out
        initc = aff.T @ all_fea / (1e-8 + aff.sum(0)[:, None])
        pred = cdist(all_fea, initc, "cosine").argmin(1)
        for _ in range(1):  # one refinement round (shot_utils.py:59-65)
            aff = np.eye(k, dtype=np.float32)[pred]
            initc = aff.T @ all_fea / (1e-8 + aff.sum(0)[:, None])
            pred = cdist(all_fea, initc, "cosine").argmin(1)
        return pred.astype(np.int32)

    def _adapt_impl(self, params, batch_stats, opt_state, x, pseudo, rng):
        """One train-mode SGD step on the extractor (ext.train(),
        shot.py:73-120): active dropout, batch-stat BN normalization with
        running-stat updates carried forward."""
        def loss_fn(p, bs):
            variables = {"params": p, "batch_stats": bs}
            f, mut = self.model.apply(
                variables, x, train=True, use_running_average=False,
                update_running_stats=True, mutable=["batch_stats"],
                rngs={"dropout": rng}, method="features")
            logits = self.model.apply(variables, f, method="classify")
            e = self.n_eval_views
            b = logits.shape[0] // e
            out = logits.reshape(b, e, -1).mean(1)
            log_p = jax.nn.log_softmax(out, -1)
            ce = -jnp.mean(jnp.take_along_axis(log_p, pseudo[:, None], -1))
            sm = jnp.exp(log_p)
            ent = jnp.mean(-jnp.sum(sm * jnp.log(sm + 1e-5), -1))
            msm = jnp.mean(sm, 0)
            div = jnp.sum(-msm * jnp.log(msm + 1e-5))
            return CLS_PAR * ce + ENT_PAR * (ent - div), mut["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, batch_stats)
        # classifier frozen (configure_shot, shot.py:47-52)
        grads["new_fc" if "new_fc" in grads else "cls_head"] = \
            jax.tree_util.tree_map(jnp.zeros_like,
                                   grads["new_fc" if "new_fc" in grads else "cls_head"])
        updates, opt_state = self.tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_stats, opt_state, loss

    def run(self, eval_dataset, batch_size: int = 4, seed: int = 0) -> float:
        params = self.variables["params"]
        stats = self.variables["batch_stats"]
        opt_state = self.tx.init(params)
        rng = jax.random.PRNGKey(seed)
        best = 0.0
        for epoch in range(N_EPOCH):
            variables = {"params": params, "batch_stats": stats}
            pseudo = self._pseudo_labels(eval_dataset, variables, batch_size)
            off = 0
            for bi, (clips, labels) in enumerate(
                    batched_eval_iter(eval_dataset, batch_size)):
                pl = jnp.asarray(pseudo[off:off + labels.shape[0]])
                off += labels.shape[0]
                params, stats, opt_state, _ = self._adapt(
                    params, stats, opt_state, jnp.asarray(clips), pl,
                    jax.random.fold_in(rng, epoch * 100003 + bi))
            # model.eval() for the accuracy pass (validate, basics.py:152)
            # — running-average BN with the adaptation-updated stats
            variables = {"params": params, "batch_stats": stats}
            fwd = jax.jit(lambda v, x: self.model.apply(v, x, train=False))
            best = max(best, self.evaluate(lambda x: fwd(variables, x),
                                           eval_dataset, batch_size))
        return best
