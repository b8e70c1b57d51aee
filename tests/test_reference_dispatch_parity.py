"""Drive the reference's ACTUAL ``tta_standard`` function end-to-end.

``tests/test_reference_loop_parity.py`` verifies trajectory parity
against the reference's hook/loss machinery, but replicates the
``tta_standard`` inner loop by hand.  This module retires that seam: it
imports ``/root/reference/corpus/basics.py`` itself (third-party deps
stubbed, CUDA calls rerouted to CPU), monkeypatches only its two
dataset factories, and runs ``basics.tta_standard`` (basics.py:403-747)
unmodified on the tiny torch oracles — so the dispatcher-level
behaviors are exercised by construction, not by replication:

* the ``.npy`` stat loading + BN1d None-placeholder remap
  (basics.py:480-509), fed from files written by this repo's
  ``save_stats`` (both-ways interop),
* optimizer construction (basics.py:547-560),
* hook registration order, per-video re-setup in tta_standard mode,
  close-before-eval and ``add_hook_back`` counting (basics.py:565-600,
  682-686, 721-728).

Trajectories (per gradient step r_feature / consistency loss, per-video
post-adaptation eval logits) are captured with recording wrappers
around the hook class / ``compute_pred_consis`` / ``accuracy`` and
compared against ``VittaEngine`` on identical weights and tensors.
"""

import sys
import types

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax

from vitta_tpu.adapt.engine import VittaEngine
from vitta_tpu.config import tanet_ucf101_preset, swin_ucf101_preset
from vitta_tpu.utils.checkpoint import save_stats

from tests.test_reference_loop_parity import (
    _assert_trajectories_match, _run_engine_stream,
    tanet_rig, swin_rig, N_STREAM, T, HW, K, V, LR,
    SW_T, SW_HW, SW_DEPTHS, SW_WIN)

pytestmark = pytest.mark.slow


# ---------------------------------------------------------------------------
# import rig for corpus.basics: stub absent third-party deps, de-CUDA
# ---------------------------------------------------------------------------
def _stub(name, **attrs):
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


@pytest.fixture(scope="module")
def basics_mod():
    saved = {n: sys.modules.get(n) for n in (
        "decord", "torchvision", "torchvision.transforms",
        "torchvision.models", "timm", "timm.models", "timm.models.layers",
        "mmcv", "mmcv.runner", "mmcv.cnn", "mmaction", "mmaction.utils")}
    tv = _stub("torchvision")
    tv.transforms = _stub("torchvision.transforms",
                          Compose=lambda *a, **k: None)
    tv.models = _stub("torchvision.models")
    _stub("decord")
    timm = _stub("timm")
    timm.models = _stub("timm.models", create_model=None)
    timm.models.layers = _stub("timm.models.layers", DropPath=nn.Identity,
                               trunc_normal_=lambda *a, **k: None)
    mmcv = _stub("mmcv")
    mmcv.runner = _stub("mmcv.runner", load_checkpoint=None)
    mmcv.cnn = _stub("mmcv.cnn", normal_init=lambda *a, **k: None)
    mmaction = _stub("mmaction")
    mmaction.utils = _stub("mmaction.utils",
                           get_root_logger=lambda *a, **k: None)

    orig_cuda, orig_to = torch.Tensor.cuda, torch.Tensor.to

    def _safe_to(self, *args, **kwargs):
        args = tuple(a for a in args
                     if not (isinstance(a, torch.device) and a.type == "cuda"))
        dev = kwargs.get("device")
        if isinstance(dev, torch.device) and dev.type == "cuda":
            kwargs.pop("device")
        return orig_to(self, *args, **kwargs)

    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.Tensor.to = _safe_to
    sys.path.insert(0, "/root/reference")
    try:
        import corpus.basics as basics
        import utils.norm_stats_utils as nsu
        yield types.SimpleNamespace(basics=basics, nsu=nsu)
    finally:
        torch.Tensor.cuda = orig_cuda
        torch.Tensor.to = orig_to
        sys.path.remove("/root/reference")
        for name, mod in saved.items():
            if mod is None:
                sys.modules.pop(name, None)
            else:
                sys.modules[name] = mod


class _ListDataset(torch.utils.data.Dataset):
    def __init__(self, items):
        self.items = items

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        return self.items[i]


class _SwinRefAdapter(nn.Module):
    """Present the reference Recognizer3D calling convention
    ((B, V, C, T, H, W) -> (avg_score, per-view scores), basics.py:653-658)
    on top of the flat torch oracle.  The oracle is the sole child, so
    ``choose_layers`` order and ``backbone.*`` name matching survive the
    wrap."""

    def __init__(self, inner):
        super().__init__()
        self.inner = inner

    def forward(self, x):
        b, v = x.shape[0], x.shape[1]
        flat = x.reshape((b * v,) + x.shape[2:])
        scores = self.inner(flat).reshape(b, v, -1)
        return scores.mean(1), scores


def _recorders(rig, monkeypatch):
    """Wrap the hook class / compute_pred_consis / accuracy with
    recorders; returns (r_feature log, consis log, eval-logits log)."""
    basics, nsu = rig.basics, rig.nsu
    r_log, c_log, e_log = [], [], []

    class RecHook(nsu.CombineNormStatsRegHook_onereg):
        def hook_fn(self, module, inp, out):
            super().hook_fn(module, inp, out)
            r_log.append(float(self.r_feature.detach()))

    real_consis = basics.compute_pred_consis
    real_acc = basics.accuracy

    def rec_consis(view_logits):
        out = real_consis(view_logits)
        c_log.append(float(out.detach()))
        return out

    def rec_acc(output, target, topk=(1,)):
        e_log.append(np.array(output.detach()))
        return real_acc(output, target, topk)

    monkeypatch.setattr(nsu, "CombineNormStatsRegHook_onereg", RecHook)
    monkeypatch.setattr(basics, "compute_pred_consis", rec_consis)
    monkeypatch.setattr(basics, "accuracy", rec_acc)
    return r_log, c_log, e_log


def _trajectories(r_log, c_log, e_log, n_videos, n_grad):
    """Per-video (last-step r_feature sum, last-step consis, eval logits)."""
    n_fwd = n_videos * n_grad
    assert len(r_log) % n_fwd == 0, (len(r_log), n_fwd)
    n_hooks = len(r_log) // n_fwd
    assert len(c_log) == n_fwd and len(e_log) == n_videos
    sums = [sum(r_log[i * n_hooks:(i + 1) * n_hooks]) for i in range(n_fwd)]
    return [(sums[(i + 1) * n_grad - 1], c_log[(i + 1) * n_grad - 1],
             e_log[i]) for i in range(n_videos)]


def _base_args(**over):
    args = types.SimpleNamespace(
        batch_size=1, workers=0, test_crops=1,
        if_sample_tta_aug_views=True, if_pred_consistency=True,
        n_augmented_views=V, n_epoch_adapat=1,
        stat_reg="mean_var", stat_type=["spatiotemp"], reg_type="l1_loss",
        reduce_dim=True, before_norm=False, fix_BNS=True,
        update_only_bn_affine=False, lr=LR, momentum=0.9, weight_decay=5e-4,
        verbose=False)
    for k, v in over.items():
        setattr(args, k, v)
    return args


# ---------------------------------------------------------------------------
# TANet
# ---------------------------------------------------------------------------
def _run_tanet_reference(rig, tm, src, stream, tmp_path, monkeypatch,
                         mode, n_grad, mvg, moving_avg):
    basics = rig.basics
    mean_f = str(tmp_path / "st_mean.npy")
    var_f = str(tmp_path / "st_var.npy")
    # this repo's writer -> the reference's loader (basics.py:484-498)
    save_stats(mean_f, var_f, src, arch="tanet")

    def to_flat(x):                    # (B, T, H, W, 3) -> (B*T*3, H, W)
        xt = torch.from_numpy(np.transpose(x, (0, 1, 4, 2, 3)))
        return xt.reshape(-1, xt.shape[-2], xt.shape[-1])

    tta = _ListDataset([(to_flat(v), torch.tensor(0)) for v, _, _ in stream])
    ev = _ListDataset([(to_flat(c), torch.tensor(0)) for _, c, _ in stream])
    monkeypatch.setattr(
        basics, "get_dataset_tanet",
        lambda args, split="val", dataset_type=None:
        tta if dataset_type == "tta" else ev)

    args = _base_args(
        arch="tanet", sample_style="uniform-1", clip_length=T,
        if_tta_standard=mode, n_gradient_steps=n_grad, momentum_mvg=mvg,
        moving_avg=moving_avg, chosen_blocks=["layer3", "layer4"],
        spatiotemp_mean_clean_file=mean_f, spatiotemp_var_clean_file=var_f,
        lambda_feature_reg=1.0, lambda_pred_consis=0.1)

    r_log, c_log, e_log = _recorders(rig, monkeypatch)
    top1 = basics.tta_standard(tm, nn.CrossEntropyLoss(), args=args)
    assert len(top1) == 1
    return _trajectories(r_log, c_log, e_log, len(stream), n_grad)


@pytest.mark.parametrize("mode,n_grad,mvg,moving_avg", [
    ("tta_online", 1, 0.1, True),     # the live default config
    ("tta_standard", 2, 1.0, True),   # per-sample reset + multi-step
])
def test_tanet_tta_standard_dispatch(basics_mod, tanet_rig, tmp_path,
                                     monkeypatch, mode, n_grad, mvg,
                                     moving_avg):
    tm, jm, variables, src, _stats, stream = tanet_rig
    want = _run_tanet_reference(basics_mod, tm, src, stream, tmp_path,
                                monkeypatch, mode, n_grad, mvg, moving_avg)

    import dataclasses
    cfg = tanet_ucf101_preset()
    cfg = cfg.replace(
        data=dataclasses.replace(cfg.data, clip_length=T, input_size=HW),
        tta=dataclasses.replace(cfg.tta, if_tta_standard=mode,
                                momentum_mvg=mvg, n_gradient_steps=n_grad,
                                moving_avg=moving_avg),
    )
    engine = VittaEngine(jm, cfg, variables, src, donate=False)
    got = _run_engine_stream(engine, stream, "tanet")
    _assert_trajectories_match(got, want, logits_atol=2e-3)


# ---------------------------------------------------------------------------
# Video Swin
# ---------------------------------------------------------------------------
def test_swin_tta_standard_dispatch(basics_mod, swin_rig, tmp_path,
                                    monkeypatch):
    basics = basics_mod.basics
    tm, jm, variables, src, _stats, stream = swin_rig
    mean_f = str(tmp_path / "st_mean.npy")
    var_f = str(tmp_path / "st_var.npy")
    save_stats(mean_f, var_f, src, arch="videoswintransformer",
               depths=SW_DEPTHS)

    def to_ncthw(x):                   # (B, T, H, W, 3) -> (B, 3, T, H, W)
        return torch.from_numpy(np.transpose(x, (0, 4, 1, 2, 3)))

    tta = _ListDataset([(to_ncthw(v), torch.tensor(0))
                        for v, _, _ in stream])
    ev = _ListDataset([(to_ncthw(c), torch.tensor(0))
                       for _, c, _ in stream])
    monkeypatch.setattr(
        basics, "get_dataset_videoswin",
        lambda args, split="val", dataset_type=None:
        tta if dataset_type == "tta" else ev)

    args = _base_args(
        arch="videoswintransformer", num_clips=1, clip_length=SW_T,
        if_tta_standard="tta_online", n_gradient_steps=1, momentum_mvg=0.05,
        moving_avg=True,
        chosen_blocks=["backbone.layers.1", "backbone.norm"],
        spatiotemp_mean_clean_file=mean_f, spatiotemp_var_clean_file=var_f,
        lambda_feature_reg=1.0, lambda_pred_consis=0.05)

    adapter = _SwinRefAdapter(tm)
    r_log, c_log, e_log = _recorders(basics_mod, monkeypatch)
    top1 = basics.tta_standard(adapter, nn.CrossEntropyLoss(), args=args)
    assert len(top1) == 1
    want = _trajectories(r_log, c_log, e_log, len(stream), 1)

    import dataclasses
    cfg = swin_ucf101_preset()
    cfg = cfg.replace(
        data=dataclasses.replace(cfg.data, clip_length=SW_T,
                                 input_size=SW_HW, scale_size=SW_HW),
        tta=dataclasses.replace(
            cfg.tta, chosen_blocks=("backbone.layers.1", "backbone.norm"),
            momentum_mvg=0.05),
    )
    engine = VittaEngine(jm, cfg, variables, src, donate=False)
    got = _run_engine_stream(engine, stream, "swin")
    _assert_trajectories_match(got, want, logits_atol=2e-3)
