"""T3A baseline: test-time template adjustment
(reference baselines/t3a.py:29-127).

Keeps a support set initialized from the classifier weight rows; per
batch appends (feature, one-hot pseudo-label, entropy); keeps the
``filter_K`` lowest-entropy supports per class; classifies by
``z @ normalize(supports_normalized^T @ labels)``.  Support management
is host-side numpy (unbounded growth between filters); feature
extraction is jitted."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from vitta_tpu.baselines.common import BaselineBase, batched_eval_iter
from vitta_tpu.utils.meters import AverageMeter

DEFAULT_FILTER_K = 100  # args.t3a_filter_k is undeclared in the reference
                        # (t3a.py:52) — it must be injected manually there.


def _entropy(p_logits: np.ndarray) -> np.ndarray:
    x = p_logits - p_logits.max(-1, keepdims=True)
    sm = np.exp(x)
    sm /= sm.sum(-1, keepdims=True)
    return -(sm * np.log(np.clip(sm, 1e-30, None))).sum(-1)


class T3ABaseline(BaselineBase):
    def __init__(self, model, cfg, variables, filter_k: int = DEFAULT_FILTER_K):
        super().__init__(model, cfg, variables)
        self.filter_k = filter_k
        self._feat = jax.jit(lambda v, x: self.model.apply(
            v, x, method="features"))
        self._cls = jax.jit(lambda v, f: self.model.apply(v, f, method="classify"))

    def run(self, eval_dataset, batch_size: int = 1) -> float:
        variables = self.variables
        k = self.cfg.model.num_classes
        head = variables["params"].get("new_fc",
                                       variables["params"].get("cls_head", {}).get("fc_cls"))
        w = np.asarray(head["kernel"]).T           # (K, F) rows = class weights
        warm_logits = np.asarray(self._cls(variables, jnp.asarray(w)))
        supports = [w]
        labels = [np.eye(k, dtype=np.float32)[warm_logits.argmax(1)]]
        ents = [_entropy(warm_logits)]

        top1 = AverageMeter()
        for clips, y in batched_eval_iter(eval_dataset, batch_size):
            z = self._feat(variables, jnp.asarray(clips))
            e = self.n_eval_views
            b = z.shape[0] // e
            z = np.asarray(z.reshape(b, e, -1).mean(1))          # (B, F)
            p = np.asarray(self._cls(variables, jnp.asarray(z)))
            supports.append(z)
            labels.append(np.eye(k, dtype=np.float32)[p.argmax(1)])
            ents.append(_entropy(p))

            s = np.concatenate(supports, 0)
            l = np.concatenate(labels, 0)
            en = np.concatenate(ents, 0)
            keep = []
            yhat = l.argmax(1)
            for c in range(k):
                idx = np.nonzero(yhat == c)[0]
                order = idx[np.argsort(en[idx])][:self.filter_k]
                keep.append(order)
            keep = np.concatenate(keep)
            supports, labels, ents = [s[keep]], [l[keep]], [en[keep]]

            sn = s[keep] / np.linalg.norm(s[keep], axis=1, keepdims=True)
            weights = sn.T @ l[keep]                              # (F, K)
            weights = weights / np.clip(
                np.linalg.norm(weights, axis=0, keepdims=True), 1e-12, None)
            logits = z @ weights
            pred = logits.argmax(1)
            top1.update(100.0 * float((pred == y).mean()), n=y.shape[0])
        return top1.avg
