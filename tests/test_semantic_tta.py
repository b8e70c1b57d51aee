"""Semantic end-to-end validation without real checkpoints/data:

random-feature TANet backbone + closed-form ridge classifier head on
class-separable synthetic videos -> precompute source statistics on the
clean stream -> apply a contrast/desaturation/noise corruption (source
accuracy drops, feature statistics shift) -> run the ViTTA stream and
verify the *mechanism*: gradient adaptation drives the online feature
statistics toward the source statistics (the alignment loss falls
relative to a frozen model), while accuracy does not collapse.

Accuracy *recovery* itself depends on a properly trained source model
(the real UCF101 checkpoints), so it is not asserted here — the full
accuracy experiment is the real-data run (see README).
"""

import dataclasses
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vitta_tpu.adapt.engine import VittaEngine
from vitta_tpu.adapt.precompute import compute_source_statistics
from vitta_tpu.baselines import setup_baseline
from vitta_tpu.baselines.common import batched_eval_iter
from vitta_tpu.config import tanet_ucf101_preset
from vitta_tpu.data.dataset import PairedTTADataset, TANetVideoDataset
from vitta_tpu.data.records import VideoRecord
from vitta_tpu.data.video_reader import SyntheticVideoSource
from vitta_tpu.models.tanet import TANet
from vitta_tpu.utils.checkpoint import tanet_norm_layers

pytestmark = pytest.mark.slow  # end-to-end mechanism run (~2 min)

T, HW, K = 2, 32, 3


class ClassSource(SyntheticVideoSource):
    """Synthetic videos with a channel-offset class signal; optional
    contrast + desaturation + noise corruption (the distribution shift)."""

    def __init__(self, labels, corrupt=None, **kw):
        super().__init__(**kw)
        self.labels = labels
        self.corrupt = corrupt  # (contrast, desaturate_mix, noise_sigma)

    def get_batch(self, path, indices):
        f = super().get_batch(path, indices).astype(np.float32)
        f[..., self.labels[path]] += 50.0
        if self.corrupt:
            contrast, mix, sigma = self.corrupt
            rng = np.random.default_rng(self._seed(path) ^ 0xC0FFEE)
            gray = f.mean(-1, keepdims=True)
            f = (1 - mix) * f + mix * gray
            f = contrast * (f - 128.0) + 128.0 + 25.0
            f += rng.normal(0, sigma, f.shape)
        return np.clip(f, 0, 255).astype(np.uint8)


def test_vitta_mechanism_end_to_end():
    base = tanet_ucf101_preset()
    cfg = base.replace(
        data=dataclasses.replace(base.data, clip_length=T, input_size=HW,
                                 scale_size=40),
        model=dataclasses.replace(base.model, num_classes=K, dropout=0.0),
        optim=dataclasses.replace(base.optim, lr=5e-4),
        tta=dataclasses.replace(base.tta, momentum_mvg=0.2),
    )
    n_train, n_test = 12, 6
    train_recs = [VideoRecord(f"tr{i}", 40 + i, i % K) for i in range(n_train)]
    test_recs = [VideoRecord(f"te{i}", 40 + i, i % K) for i in range(n_test)]
    labels = {r.path: r.label for r in train_recs + test_recs}
    clean = ClassSource(labels, None, height=48, width=64, frames_per_video=60)
    corrupt = ClassSource(labels, (0.25, 0.7, 30.0), height=48, width=64,
                          frames_per_video=60)

    model = TANet(num_classes=K, clip_length=T, dropout=0.0)
    rng = jax.random.PRNGKey(0)
    x0 = jnp.zeros((1, T, HW, HW, 3), jnp.float32)
    v = model.init({"params": rng, "dropout": rng}, x0, train=False)
    variables = {"params": v["params"], "batch_stats": v["batch_stats"]}

    # closed-form ridge head on random backbone features ("source model")
    feat_fn = jax.jit(lambda vv, x: model.apply(vv, x, method="features"))
    train_ds = TANetVideoDataset(cfg, clean, train_recs, dataset_type="eval")
    feats = np.concatenate([np.asarray(feat_fn(variables,
                                               jnp.asarray(train_ds[i].frames)))
                            for i in range(n_train)])
    onehot = np.eye(K, dtype=np.float32)[[r.label for r in train_recs]]
    lam = 1e-3 * np.trace(feats.T @ feats) / feats.shape[1]
    w = np.linalg.solve(feats.T @ feats + lam * np.eye(feats.shape[1]),
                        feats.T @ (2 * onehot - 1)).astype(np.float32)
    variables["params"]["new_fc"]["kernel"] = jnp.asarray(w)
    variables["params"]["new_fc"]["bias"] = jnp.zeros(K)

    # 1) source model separates clean data; corruption hurts it
    src_only = setup_baseline("source", model, cfg, variables)
    clean_ds = TANetVideoDataset(cfg, clean, test_recs, dataset_type="eval")
    corr_ds = TANetVideoDataset(cfg, corrupt, test_recs, dataset_type="eval")
    acc_clean = src_only.run(clean_ds, batch_size=3)
    acc_corr = src_only.run(corr_ds, batch_size=3)
    assert acc_clean >= 80.0
    assert acc_corr < acc_clean

    # 2) source statistics from the clean stream
    bn2d = {n for n, kind in tanet_norm_layers() if kind == "bn2d"}
    stats = compute_source_statistics(
        model, variables, batched_eval_iter(train_ds, 3),
        tap_filter=lambda n: n in bn2d)

    # 3) the adaptation mechanism: per-video alignment loss under gradient
    # adaptation ends lower than under a frozen model with the same EMA
    def run_stream(lr):
        c = cfg.replace(optim=dataclasses.replace(cfg.optim, lr=lr))
        eng = VittaEngine(model, c, variables, stats, donate=False)
        paired = PairedTTADataset(c, corrupt, test_recs, seed=5)
        st = eng.init_state()
        trace = []
        correct = 0
        for bi in range(n_test):
            vw, cl, lb = paired[bi]
            st, m = eng.adapt_eval_step(st, jnp.asarray(vw), jnp.asarray(cl),
                                        jnp.asarray(lb),
                                        jax.random.fold_in(rng, bi))
            trace.append(float(m.loss_reg))
            correct += float(m.top1) / 100.0
        return trace, 100.0 * correct / n_test

    trace_frozen, acc_frozen = run_stream(lr=0.0)
    trace_adapt, acc_adapt = run_stream(lr=5e-4)
    tail_frozen = np.mean(trace_frozen[-3:])
    tail_adapt = np.mean(trace_adapt[-3:])
    assert tail_adapt < tail_frozen, (trace_adapt, trace_frozen)
    # adaptation must not collapse predictions
    assert acc_adapt >= 100.0 / K - 1e-6, (acc_frozen, acc_adapt)
