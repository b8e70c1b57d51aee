"""Measure the reference's own ``tta_standard`` per-video step on CPU.

The reference repo publishes no latency numbers and this environment
has no GPU, so ``bench.py``'s ``vs_baseline`` is a labeled estimate.
This script produces the one *measured* anchor available here: the
reference's actual live loop (`/root/reference/corpus/basics.py:403-747`,
imported and run unmodified — the same import rig as
tests/test_reference_dispatch_parity.py) at the real operating point
(224x224, T=16, 2 augmented views, 1 SGD step over all params, hooks on
layer3/layer4 resp. Swin layers.2/3+norm, then a deterministic eval
forward), timed per video on this host's CPU.

The model is a faithful full-size torch replica (tests/torch_tanet.py /
tests/torch_swin.py: torchvision/mmcv are not installed here, and the
reference model classes import them; the replicas match the reference
architectures layer-for-layer — forward-parity-tested in
tests/test_{tanet,swin}_parity.py).  Setup cost (deepcopy, hook
registration) is cancelled by differencing two run lengths.

Usage: python benchmarks/ref_cpu_bench.py [tanet|swin] [n_videos]
Prints one JSON line: {"model":..., "ms_per_video":..., ...}.
"""

from __future__ import annotations

import copy
import json
import os
import sys
import time
import types

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"

T, HW, K, V = 16, 224, 101, 2


def _stub(name, **attrs):
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def import_reference_basics():
    """Import corpus.basics with absent third-party deps stubbed and
    CUDA transfers rerouted to CPU (mirrors the dispatch-parity rig)."""
    import torch
    import torch.nn as nn

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

    orig_to = torch.Tensor.to

    def _safe_to(self, *args, **kwargs):
        args = tuple(a for a in args
                     if not (isinstance(a, torch.device) and a.type == "cuda"))
        dev = kwargs.get("device")
        if isinstance(dev, torch.device) and dev.type == "cuda":
            kwargs.pop("device")
        return orig_to(self, *args, **kwargs)

    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.Tensor.to = _safe_to
    sys.path.insert(0, REFERENCE)
    import corpus.basics as basics
    return basics


class _ListDataset:
    def __init__(self, items):
        self.items = items

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        return self.items[i]


def _synth_stats_for(model, arch, out_dir):
    """Full-size source-stat .npy pair in the reference's exact layout
    (basics.py:480-509): for TANet one (C,) entry per BN2d in
    choose_layers order (BN1d positions are re-inserted as None by the
    loader); for Swin one entry per LayerNorm except the first."""
    import torch.nn as nn
    sys.path.insert(0, REFERENCE)
    from utils.BNS_utils import choose_layers

    if arch == "tanet":
        chosen = choose_layers(model, [nn.BatchNorm2d, nn.BatchNorm3d])
        dims = [m.num_features for _, m in chosen]
    else:
        chosen = choose_layers(model, [nn.LayerNorm])[1:]
        dims = [m.normalized_shape[-1] for _, m in chosen]
    rng = np.random.default_rng(0)

    def obj_array(items):
        arr = np.empty(len(items), dtype=object)
        for i, it in enumerate(items):
            arr[i] = it
        return arr

    means = obj_array([rng.normal(0, 0.05, d).astype(np.float32)
                       for d in dims])
    variances = obj_array([(rng.random(d) * 0.5 + 0.5).astype(np.float32)
                           for d in dims])
    mp = os.path.join(out_dir, f"{arch}_st_mean.npy")
    vp = os.path.join(out_dir, f"{arch}_st_var.npy")
    np.save(mp, means, allow_pickle=True)
    np.save(vp, variances, allow_pickle=True)
    return mp, vp


def _base_args(**over):
    args = types.SimpleNamespace(
        batch_size=1, workers=0, test_crops=1,
        if_sample_tta_aug_views=True, if_pred_consistency=True,
        n_augmented_views=V, n_epoch_adapat=1,
        stat_reg="mean_var", stat_type=["spatiotemp"], reg_type="l1_loss",
        reduce_dim=True, before_norm=False, fix_BNS=True,
        update_only_bn_affine=False, lr=5e-5, momentum=0.9,
        weight_decay=5e-4, verbose=False,
        if_tta_standard="tta_online", n_gradient_steps=1,
        momentum_mvg=0.1, moving_avg=True)
    for k, v in over.items():
        setattr(args, k, v)
    return args


def _run_reference(basics, model, args, n_videos, make_item):
    """One tta_standard call over n_videos; returns per-video wall times.

    ``accuracy`` fires exactly once per video at the end of its
    adapt+eval step (basics.py:713) — timestamp diffs between
    consecutive calls are whole per-video step times, free of the
    one-time setup (deepcopy, stat load, first-video hook/optimizer
    construction) that a whole-call measurement would smear in."""
    import torch
    import torch.nn as nn
    gen = np.random.default_rng(1)
    tta, ev = [], []
    for _ in range(n_videos):
        views = gen.normal(size=(1, V, T, 3, HW, HW)).astype(np.float32)
        clip = gen.normal(size=(1, 1, T, 3, HW, HW)).astype(np.float32)
        tta.append(make_item(views))
        ev.append(make_item(clip))
    basics.get_dataset_tanet = (
        lambda a, split="val", dataset_type=None:
        _ListDataset(tta) if dataset_type == "tta" else _ListDataset(ev))
    basics.get_dataset_videoswin = basics.get_dataset_tanet
    stamps = []
    real_acc = basics.accuracy

    def rec_acc(output, target, topk=(1,)):
        stamps.append(time.perf_counter())
        return real_acc(output, target, topk)

    basics.accuracy = rec_acc
    model_run = copy.deepcopy(model)
    try:
        basics.tta_standard(model_run, nn.CrossEntropyLoss(), args=args)
    finally:
        basics.accuracy = real_acc
    return np.diff(np.asarray(stamps))


def main():
    arch = sys.argv[1] if len(sys.argv) > 1 else "tanet"
    n_meas = int(sys.argv[2]) if len(sys.argv) > 2 else (4 if arch == "tanet"
                                                         else 3)
    import torch
    torch.manual_seed(0)
    torch.set_num_threads(os.cpu_count() or 1)
    basics = import_reference_basics()

    sys.path.insert(0, os.path.join(REPO, "tests"))
    out_dir = "/tmp/ref_cpu_bench"
    os.makedirs(out_dir, exist_ok=True)

    if arch == "tanet":
        from torch_tanet import TorchTSN
        model = TorchTSN(K, T).eval()
        mp, vp = _synth_stats_for(model, "tanet", out_dir)
        args = _base_args(arch="tanet", sample_style="uniform-1",
                          clip_length=T,
                          chosen_blocks=["layer3", "layer4"],
                          spatiotemp_mean_clean_file=mp,
                          spatiotemp_var_clean_file=vp,
                          lambda_feature_reg=1.0, lambda_pred_consis=0.1)

        def make_item(x):  # (1, n, T, 3, H, W) -> ((n*T*3, H, W), label)
            flat = torch.from_numpy(x[0]).reshape(-1, HW, HW)
            return (flat, torch.tensor(0))
    else:
        from torch_swin import TorchRecognizer3D

        class SwinRefAdapter(torch.nn.Module):
            """Reference Recognizer3D calling convention on the flat
            oracle ((B, V, 3, T, H, W) -> (avg, per-view), basics.py:
            653-658)."""

            def __init__(self, inner):
                super().__init__()
                self.inner = inner

            def forward(self, x):
                b, v = x.shape[0], x.shape[1]
                flat = x.reshape((b * v,) + x.shape[2:])
                scores = self.inner(flat).reshape(b, v, -1)
                return scores.mean(1), scores

        inner = TorchRecognizer3D(K, patch_size=(2, 4, 4), embed_dim=128,
                                  depths=(2, 2, 18, 2),
                                  num_heads=(4, 8, 16, 32),
                                  window_size=(8, 7, 7)).eval()
        model = SwinRefAdapter(inner)
        mp, vp = _synth_stats_for(model, "videoswintransformer", out_dir)
        args = _base_args(arch="videoswintransformer", num_clips=1,
                          clip_length=T, lr=1e-5, momentum_mvg=0.05,
                          lambda_pred_consis=0.05,
                          chosen_blocks=["backbone.layers.2",
                                         "backbone.layers.3",
                                         "backbone.norm"],
                          spatiotemp_mean_clean_file=mp,
                          spatiotemp_var_clean_file=vp,
                          lambda_feature_reg=1.0)

        def make_item(x):  # (1, n, T, 3, H, W) -> ((n, 3, T, H, W), label)
            nct = torch.from_numpy(np.transpose(x[0], (0, 2, 1, 3, 4)))
            return (nct, torch.tensor(0))

    # video 0 carries warmup effects (allocator growth, first-touch);
    # the steady-state per-video cost is the median of the remaining
    # per-video diffs
    diffs = _run_reference(basics, model, args, 2 + n_meas, make_item)
    steady = diffs[1:]
    ms = 1000.0 * float(np.median(steady))
    print(json.dumps({
        "model": arch, "ms_per_video": round(ms, 1),
        "per_video_ms": [round(1000.0 * float(d), 1) for d in diffs],
        "n_videos_measured": len(steady),
        "host_cpus": os.cpu_count(),
        "note": ("reference tta_standard (corpus/basics.py:403-747) run "
                 "unmodified on a full-size torch replica, CPU, real "
                 "operating point"),
    }))


if __name__ == "__main__":
    main()
