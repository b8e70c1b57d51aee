"""TANet — TSN wrapper around ResNet-50+TAM with average consensus.

Re-design of the reference ``TSN`` (models/tanet_models/tanet.py:16-333):

* input ``(B, T, H, W, 3)`` (any number of view/crop folds in B),
  frames folded into batch for the 2D backbone (tanet.py:317);
* last fc replaced by Dropout(0.8) + ``new_fc`` Linear(2048 -> K)
  (tanet.py:93-123);
* per-frame logits averaged over T — avg ``ConsensusModule``
  (tanet.py:329-333, basic_ops.py:71-86).

``fix_BNS`` semantics (corpus/basics.py:606-611): norm layers always use
running statistics; training mode only toggles dropout.  Partial-BN
(tanet.py:182-198) — BN2d affine frozen except the very first bn — is
realized as an optimizer mask, not module state (see
vitta_tpu/adapt/optim.py).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from vitta_tpu.models.resnet import ResNetTAM


class TANet(nn.Module):
    num_classes: int
    clip_length: int = 16
    dropout: float = 0.8
    use_tam: bool = True
    stat_types: tuple = ("spatiotemp",)
    dtype: str = "float32"   # compute dtype; "bfloat16" for speed runs

    def setup(self):
        import jax.numpy as _jnp
        self.base_model = ResNetTAM(use_tam=self.use_tam,
                                    stat_types=tuple(self.stat_types),
                                    dtype=_jnp.dtype(self.dtype))
        self.new_fc = nn.Dense(self.num_classes)
        self.drop = nn.Dropout(self.dropout)

    def _features(self, x, use_running_average, update_running_stats):
        b, t, h, w, c = x.shape
        frames = x.reshape(b * t, h, w, c)
        feats = self.base_model(
            frames, t, use_running_average=use_running_average,
            update_running_stats=update_running_stats)          # (B*T, 2048)
        return feats

    def __call__(self, x, *, train: bool = False,
                 use_running_average: bool = True,
                 update_running_stats: bool = False):
        """x: (B, T, H, W, 3) -> logits (B, num_classes)."""
        b, t = x.shape[0], x.shape[1]
        feats = self._features(x, use_running_average, update_running_stats)
        feats = self.drop(feats, deterministic=not train)
        logits = self.new_fc(feats)
        logits = logits.reshape(b, t, self.num_classes)
        return jnp.mean(logits, axis=1)

    def features(self, x, *, train: bool = False,
                 use_running_average: bool = True,
                 update_running_stats: bool = False):
        """Clip-level backbone features (consensus over T before the
        classifier) — used by SHOT/T3A (baselines/shot.py:41-59,
        t3a.py:29-95).

        ``train=True`` applies the TSN dropout to the per-frame features
        before the temporal mean — the extractor's forward during SHOT
        adaptation runs in train mode (``ext.train()``, reference
        baselines/shot.py:73; the Dropout sits in the base model's fc
        slot, tanet.py:100-104, so ``ext`` output with new_fc=Identity
        is consensus-mean of dropped features)."""
        b, t = x.shape[0], x.shape[1]
        feats = self._features(x, use_running_average, update_running_stats)
        feats = self.drop(feats, deterministic=not train)
        return feats.reshape(b, t, -1).mean(axis=1)

    def classify(self, feats):
        """Classifier head on clip features (SHOT's frozen classifier)."""
        return self.new_fc(feats)
