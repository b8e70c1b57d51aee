"""Golden tests of the statistics/loss math against a plain-torch oracle
that re-states the reference equations (utils/norm_stats_utils.py,
utils/pred_consistency_utils.py, utils/utils_.py:190-211)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from vitta_tpu.ops.stats import (TapStats, channel_stats, cumulative_update,
                                 CumulativeState, ema_update)
from vitta_tpu.ops.losses import (compute_regularization, pred_consistency,
                                  softmax_entropy, cross_entropy, topk_accuracy)


def torch_spatiotemp_stats(x_ncthw):
    """Oracle: norm_stats_utils.py:242-243 (mean over (0,2,3,4), biased var)."""
    t = torch.from_numpy(x_ncthw)
    c = t.shape[1]
    mean = t.mean((0, 2, 3, 4))
    var = t.permute(1, 0, 2, 3, 4).contiguous().view([c, -1]).var(1, unbiased=False)
    return mean.numpy(), var.numpy()


def test_spatiotemp_stats_match_torch():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(4, 8, 3, 5, 6)).astype(np.float32)  # N,C,T,H,W
    ref_mean, ref_var = torch_spatiotemp_stats(x)
    # our layout is channels-last: (N, T, H, W, C)
    x_cl = np.transpose(x, (0, 2, 3, 4, 1))
    got = channel_stats(jnp.asarray(x_cl))
    np.testing.assert_allclose(np.asarray(got.mean), ref_mean, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got.var), ref_var, rtol=1e-4, atol=1e-5)


def test_views_fold_into_batch_onereg():
    """Multi-view stats equal stats over the view-folded volume
    (norm_stats_utils.py:186-204)."""
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 3, 4, 5, 6, 7)).astype(np.float32)  # N,V,T,H,W,C
    folded = x.reshape((-1,) + x.shape[2:])
    a = channel_stats(jnp.asarray(x))
    b = channel_stats(jnp.asarray(folded))
    np.testing.assert_allclose(np.asarray(a.mean), np.asarray(b.mean), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(a.var), np.asarray(b.var), rtol=1e-5, atol=1e-6)


def test_ema_semantics_match_moving_average_tensor():
    """MovingAverageTensor: avg0=0; avg = m*val + (1-m)*detach(avg)
    (utils_.py:204-211), gradient scaled by m."""
    m = 0.1
    vals = [np.float32([1.0, 2.0]), np.float32([3.0, 4.0]), np.float32([5.0, 6.0])]
    # torch oracle
    avg_t = torch.zeros(2)
    for v in vals:
        avg_t = m * torch.from_numpy(v) + (1 - m) * avg_t.detach()
    ema = TapStats(jnp.zeros(2), jnp.zeros(2))
    for v in vals:
        ema = ema_update(ema, TapStats(jnp.asarray(v), jnp.asarray(v)), m)
    np.testing.assert_allclose(np.asarray(ema.mean), avg_t.numpy(), rtol=1e-6)

    # gradient of loss(ema') w.r.t. current batch stat must be scaled by m only
    def loss(v):
        e = ema_update(TapStats(jnp.asarray([7.0, 8.0]), jnp.zeros(2)),
                       TapStats(v, jnp.zeros(2)), m)
        return jnp.sum(e.mean)
    g = jax.grad(loss)(jnp.asarray([1.0, 2.0]))
    np.testing.assert_allclose(np.asarray(g), [m, m], rtol=1e-6)


def test_cumulative_meter_semantics():
    """AverageMeterTensor (utils_.py:190-202)."""
    st = CumulativeState(jnp.zeros(2), jnp.zeros(2), jnp.float32(0.0))
    st, avg1 = cumulative_update(st, TapStats(jnp.asarray([2.0, 4.0]), jnp.asarray([1.0, 1.0])), 2.0)
    st, avg2 = cumulative_update(st, TapStats(jnp.asarray([4.0, 8.0]), jnp.asarray([3.0, 3.0])), 2.0)
    np.testing.assert_allclose(np.asarray(avg1.mean), [2.0, 4.0])
    np.testing.assert_allclose(np.asarray(avg2.mean), [3.0, 6.0])
    np.testing.assert_allclose(np.asarray(avg2.var), [2.0, 2.0])


@pytest.mark.parametrize("reg_type", ["l1_loss", "mse_loss", "kld"])
def test_compute_regularization_matches_torch(reg_type):
    rng = np.random.default_rng(2)
    sm, se = rng.normal(size=8).astype(np.float32), rng.normal(size=8).astype(np.float32)
    vv = rng.uniform(0.5, 2.0, size=8).astype(np.float32)
    ve = rng.uniform(0.5, 2.0, size=8).astype(np.float32)
    got = compute_regularization(TapStats(jnp.asarray(sm), jnp.asarray(vv)),
                                 TapStats(jnp.asarray(se), jnp.asarray(ve)), reg_type)
    tsm, tse = torch.from_numpy(sm), torch.from_numpy(se)
    tvv, tve = torch.from_numpy(vv), torch.from_numpy(ve)
    if reg_type == "l1_loss":
        want = F.l1_loss(tvv, tve) + F.l1_loss(tsm, tse)
    elif reg_type == "mse_loss":
        want = F.mse_loss(tvv, tve) + F.mse_loss(tsm, tse)
    else:
        want = (0.5 * torch.log(tve / tvv) + (tvv + (tsm - tse) ** 2) / (2 * tve) - 0.5).sum()
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)


def test_pred_consistency_matches_torch():
    """Oracle transcribing pred_consistency_utils.py:15-31."""
    rng = np.random.default_rng(3)
    logits = rng.normal(size=(2, 3, 10)).astype(np.float32)
    t = torch.from_numpy(logits)
    softmaxs = [F.softmax(t[:, v, :], dim=1) for v in range(3)]
    avg = torch.stack(softmaxs, 0).mean(0)
    want = sum(F.l1_loss(s, avg, reduction="sum") for s in softmaxs) / 3
    got = pred_consistency(jnp.asarray(logits))
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)


def test_entropy_ce_topk():
    rng = np.random.default_rng(4)
    logits = rng.normal(size=(6, 11)).astype(np.float32)
    labels = rng.integers(0, 11, size=6)
    t = torch.from_numpy(logits)
    tl = torch.from_numpy(labels)
    want_ent = -(F.softmax(t, 1) * F.log_softmax(t, 1)).sum(1)
    np.testing.assert_allclose(np.asarray(softmax_entropy(jnp.asarray(logits))),
                               want_ent.numpy(), rtol=1e-4, atol=1e-5)
    want_ce = F.cross_entropy(t, tl)
    np.testing.assert_allclose(float(cross_entropy(jnp.asarray(logits), jnp.asarray(labels))),
                               float(want_ce), rtol=1e-5)
    # topk vs torch-style oracle (utils_.py:224-237)
    maxk = 5
    _, pred = t.topk(maxk, 1, True, True)
    correct = pred.t().eq(tl.view(1, -1).expand_as(pred.t()))
    want1 = correct[:1].reshape(-1).float().sum(0) * (100.0 / 6)
    want5 = correct[:5].reshape(-1).float().sum(0) * (100.0 / 6)
    got1, got5 = topk_accuracy(jnp.asarray(logits), jnp.asarray(labels))
    assert abs(float(got1) - float(want1)) < 1e-4
    assert abs(float(got5) - float(want5)) < 1e-4
