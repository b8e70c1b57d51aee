"""Dispatcher-level parity: drive the reference's ACTUAL ``tta_standard``.

``tests/test_reference_loop_parity.py`` imports the reference's hooks
and losses but re-creates the inner loop in the test.  This module goes
one level up (VERDICT round-2 item 4): it imports ``corpus.basics`` from
/root/reference and runs the real ``tta_standard`` function
(basics.py:403-747) end-to-end on the torch oracle models, with only its
environment faked — the two DataLoaders (monkeypatched dataset
factories), CUDA transfers (identity), and heavyweight third-party
imports (stubs).  The source-statistic ``.npy`` files are REAL files
written by our own ``save_stats``, so the reference's None-placeholder
remap (basics.py:480-509) consumes our writer's output directly.

Dispatcher behaviors this covers by construction that the hand replica
could not: the ``.npy`` load + BN1d None splice (:480-509), optimizer
construction (:547-560), hook registration order (:565-587), the
remove/eval/``add_hook_back`` counting protocol (:682-728), and the
mode asserts (:414-423).

Trajectories (per-video loss_reg / loss_consis / loss_ce / top1 and the
returned stream accuracy) are captured by substituting a recording
AverageMeter into the basics namespace, and compared against
``VittaEngine`` on identical weights and per-video tensors.
"""

import sys
import types

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from vitta_tpu.adapt.engine import VittaEngine, flatten_taps
from vitta_tpu.config import swin_ucf101_preset, tanet_ucf101_preset
from vitta_tpu.models.swin import Recognizer3D
from vitta_tpu.models.tanet import TANet
from vitta_tpu.utils.checkpoint import (convert_swin_checkpoint,
                                        convert_tanet_checkpoint, save_stats)
from tests.torch_swin import TorchRecognizer3D
from tests.torch_tanet import TorchTSN, randomize_bn_stats

pytestmark = pytest.mark.slow

N_STREAM = 4
T, HW, K, V = 4, 32, 7, 2


# ---------------------------------------------------------------------------
# import rig: stub the reference's heavyweight deps, de-CUDA torch
# ---------------------------------------------------------------------------
_STUB_SPECS = {
    "decord": {},
    "torchvision": {"models": types.ModuleType("torchvision.models")},
    "torchvision.transforms": {"Compose": object},
    "timm": {},
    "timm.models": {"create_model": lambda *a, **k: None},
    "timm.models.layers": {"DropPath": type("DropPath", (nn.Identity,), {}),
                           "trunc_normal_": lambda *a, **k: None},
    "mmcv": {},
    "mmcv.runner": {"load_checkpoint": lambda *a, **k: None},
    "mmcv.cnn": {"normal_init": lambda *a, **k: None},
    "mmaction": {},
    "mmaction.utils": {"get_root_logger": lambda *a, **k: None},
}


@pytest.fixture(scope="module")
def basics():
    saved = {}
    for name, attrs in _STUB_SPECS.items():
        saved[name] = sys.modules.get(name)
        mod = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(mod, k, v)
        sys.modules[name] = mod
    # wire parent.child attributes for `import a.b as c` forms
    sys.modules["torchvision"].transforms = sys.modules["torchvision.transforms"]
    sys.modules["timm"].models = sys.modules["timm.models"]
    sys.modules["timm.models"].layers = sys.modules["timm.models.layers"]
    sys.modules["mmcv"].runner = sys.modules["mmcv.runner"]
    sys.modules["mmcv"].cnn = sys.modules["mmcv.cnn"]

    orig_cuda = torch.Tensor.cuda
    orig_to = torch.Tensor.to

    def _cpu_cuda(self, *a, **k):
        return self

    def _safe_to(self, *args, **kwargs):
        args = tuple(a for a in args
                     if not (isinstance(a, torch.device) and a.type == "cuda"))
        dev = kwargs.get("device")
        if isinstance(dev, torch.device) and dev.type == "cuda":
            kwargs.pop("device")
        return orig_to(self, *args, **kwargs)

    torch.Tensor.cuda = _cpu_cuda
    torch.Tensor.to = _safe_to
    sys.path.insert(0, "/root/reference")
    try:
        import corpus.basics as b
        yield b
    finally:
        torch.Tensor.cuda = orig_cuda
        torch.Tensor.to = orig_to
        sys.path.remove("/root/reference")
        for name, mod in saved.items():
            if mod is None:
                sys.modules.pop(name, None)
            else:
                sys.modules[name] = mod


class RecordingMeter:
    """Drop-in AverageMeter (utils_.py:171-187) that records every
    update; substituted into the basics namespace so tta_standard's own
    meters expose the per-video trajectory."""

    instances = []

    def __init__(self):
        RecordingMeter.instances.append(self)
        self.records = []
        self.reset()

    def reset(self):
        self.val = self.avg = self.sum = 0.0
        self.count = 0.0

    def update(self, val, n=1):
        val = float(val)
        self.records.append(val)
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / self.count


class _TensorPairs(torch.utils.data.Dataset):
    def __init__(self, items):
        self.items = items

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        return self.items[i]


def _base_args(**over):
    a = types.SimpleNamespace(
        arch="tanet", batch_size=1, workers=0, test_crops=1,
        sample_style="uniform-1", num_clips=1, clip_length=T,
        if_tta_standard="tta_online", momentum_mvg=0.1, n_epoch_adapat=1,
        n_gradient_steps=1, if_sample_tta_aug_views=True,
        n_augmented_views=V, if_pred_consistency=True,
        lambda_feature_reg=1.0, lambda_pred_consis=0.1,
        stat_reg="mean_var", stat_type=["spatiotemp"], reg_type="l1_loss",
        reduce_dim=True, before_norm=False, moving_avg=True,
        chosen_blocks=["layer3", "layer4"], fix_BNS=True,
        update_only_bn_affine=False, lr=5e-5, momentum=0.9,
        weight_decay=5e-4, verbose=False,
    )
    for k, v in over.items():
        setattr(a, k, v)
    return a


def _run_reference_tta_standard(basics, monkeypatch, model, args,
                                tta_items, eval_items, dataset_factory_name):
    monkeypatch.setattr(basics, dataset_factory_name,
                        lambda a, split, dataset_type: _TensorPairs(
                            tta_items if dataset_type == "tta" else eval_items))
    RecordingMeter.instances = []
    monkeypatch.setattr(basics, "AverageMeter", RecordingMeter)
    result = basics.tta_standard(model, nn.CrossEntropyLoss(), args=args,
                                 logger=None, writer=None)
    # creation order in tta_standard: batch_time, losses_ce, losses_reg,
    # losses_consis, top1, top5 (basics.py:466-471)
    meters = RecordingMeter.instances
    assert len(meters) == 6
    return result, {"ce": meters[1].records, "reg": meters[2].records,
                    "consis": meters[3].records, "top1": meters[4].records}


def _run_engine_stream(engine, stream):
    state = engine.init_state()
    rng = jax.random.PRNGKey(0)
    out = {"ce": [], "reg": [], "consis": [], "top1": []}
    for bi, (views, clip, label) in enumerate(stream):
        state, m = engine.adapt_eval_step(
            state, jnp.asarray(views), jnp.asarray(clip), label,
            jax.random.fold_in(rng, bi))
        out["ce"].append(float(m.loss_ce))
        out["reg"].append(float(m.loss_reg))
        out["consis"].append(float(m.loss_consis))
        out["top1"].append(float(m.top1))
    return out


def _assert_traj(got, want):
    for key, rtol in (("reg", 5e-3), ("consis", 5e-3), ("ce", 5e-3)):
        np.testing.assert_allclose(
            got[key], want[key], rtol=rtol, atol=1e-4,
            err_msg=f"{key} trajectory diverged vs reference tta_standard")
    np.testing.assert_array_equal(got["top1"], want["top1"])


# ---------------------------------------------------------------------------
# TANet
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def tanet_rig(tmp_path_factory):
    torch.manual_seed(0)
    tm = TorchTSN(K, T)
    with torch.no_grad():
        randomize_bn_stats(tm)
    tm.eval()
    variables = convert_tanet_checkpoint(tm.state_dict(), K)
    jm = TANet(num_classes=K, clip_length=T, dropout=0.0)
    x_clean = jnp.asarray(np.random.default_rng(7).normal(
        size=(V, T, HW, HW, 3)).astype(np.float32))
    _, aux = jm.apply(variables, x_clean, train=False, mutable=["taps"])
    src = {n: (np.asarray(s.mean), np.asarray(s.var))
           for n, s in flatten_taps(aux["taps"]).items()
           if "g_bn" not in n and "l_bn" not in n}
    # REAL stat files via our writer; the reference's loader at
    # basics.py:480-509 splices None at BN1d positions itself
    d = tmp_path_factory.mktemp("stats")
    mp, vp = str(d / "list_spatiotemp_mean_x.npy"), str(d / "list_spatiotemp_var_x.npy")
    save_stats(mp, vp, src, "tanet", include_bn1d=False)
    rng = np.random.default_rng(3)
    stream = [(rng.normal(size=(V, T, HW, HW, 3)).astype(np.float32) * 0.8,
               rng.normal(size=(1, T, HW, HW, 3)).astype(np.float32) * 0.8,
               np.asarray([0], np.int32))
              for _ in range(N_STREAM)]
    return tm, jm, variables, src, (mp, vp), stream


def _tanet_items(stream):
    """Reference loader item formats: TTA (V*T*3, H, W) so the loop's
    view chain (basics.py:619-621) recovers (V, T, 3, H, W); eval
    (T*3, H, W)."""
    tta, ev = [], []
    for views, clip, label in stream:
        v = np.transpose(views, (0, 1, 4, 2, 3)).reshape(-1, HW, HW)
        c = np.transpose(clip, (0, 1, 4, 2, 3)).reshape(-1, HW, HW)
        tta.append((torch.from_numpy(v.copy()), int(label[0])))
        ev.append((torch.from_numpy(c.copy()), int(label[0])))
    return tta, ev


@pytest.mark.parametrize("mode,n_grad,mvg", [
    ("tta_online", 1, 0.1),      # the live default
    ("tta_standard", 2, 1.0),    # per-sample reset mode
])
def test_tanet_tta_standard_dispatch_parity(basics, monkeypatch, tanet_rig,
                                            mode, n_grad, mvg):
    import copy
    import dataclasses
    tm, jm, variables, src, (mp, vp), stream = tanet_rig
    args = _base_args(if_tta_standard=mode, n_gradient_steps=n_grad,
                      momentum_mvg=mvg,
                      spatiotemp_mean_clean_file=mp,
                      spatiotemp_var_clean_file=vp)
    tta_items, eval_items = _tanet_items(stream)
    result, want = _run_reference_tta_standard(
        basics, monkeypatch, copy.deepcopy(tm), args, tta_items, eval_items,
        "get_dataset_tanet")

    cfg = tanet_ucf101_preset()
    cfg = cfg.replace(
        data=dataclasses.replace(cfg.data, clip_length=T, input_size=HW),
        tta=dataclasses.replace(cfg.tta, if_tta_standard=mode,
                                momentum_mvg=mvg, n_gradient_steps=n_grad))
    engine = VittaEngine(jm, cfg, variables, src, donate=False)
    got = _run_engine_stream(engine, stream)
    _assert_traj(got, want)
    np.testing.assert_allclose(np.mean(got["top1"]), result[0], atol=1e-6)


# ---------------------------------------------------------------------------
# Video Swin (tiny config)
# ---------------------------------------------------------------------------
SW_T, SW_HW, SW_ED = 4, 16, 8
SW_DEPTHS, SW_HEADS = (1, 1), (2, 2)
SW_WIN = (2, 4, 4)


class SwinTupleWrapper(nn.Module):
    """Adapter matching the reference Recognizer3D return contract
    consumed by tta_standard (basics.py:651,708): forward takes
    (B, n_views, 3, T, H, W) and returns (video score, per-view scores)
    (recognizer3d.py:95-115)."""

    def __init__(self, inner):
        super().__init__()
        self.model = inner

    def forward(self, x):
        b, v = x.shape[:2]
        logits = self.model(x.reshape(-1, *x.shape[2:]))
        view_scores = logits.reshape(b, v, -1)
        return view_scores.mean(1), view_scores


def test_swin_tta_standard_dispatch_parity(basics, monkeypatch,
                                           tmp_path_factory):
    import dataclasses
    torch.manual_seed(1)
    tm = SwinTupleWrapper(TorchRecognizer3D(
        K, patch_size=(2, 4, 4), embed_dim=SW_ED, depths=SW_DEPTHS,
        num_heads=SW_HEADS, window_size=SW_WIN))
    tm.eval()
    variables = convert_swin_checkpoint(tm.model.state_dict(), K,
                                        depths=SW_DEPTHS, window_size=SW_WIN)
    jm = Recognizer3D(num_classes=K, patch_size=(2, 4, 4), embed_dim=SW_ED,
                      depths=SW_DEPTHS, num_heads=SW_HEADS,
                      window_size=SW_WIN, drop_path_rate=0.0,
                      head_dropout=0.0)
    x_clean = jnp.asarray(np.random.default_rng(8).normal(
        size=(V, SW_T, SW_HW, SW_HW, 3)).astype(np.float32))
    _, aux = jm.apply(variables, x_clean, train=False, mutable=["taps"])
    src = {n: (np.asarray(s.mean), np.asarray(s.var))
           for n, s in flatten_taps(aux["taps"]).items()}
    d = tmp_path_factory.mktemp("swin_stats")
    mp, vp = str(d / "mean.npy"), str(d / "var.npy")
    save_stats(mp, vp, src, "videoswintransformer", depths=SW_DEPTHS)

    rng = np.random.default_rng(4)
    stream = [(rng.normal(size=(V, SW_T, SW_HW, SW_HW, 3)).astype(np.float32),
               rng.normal(size=(1, SW_T, SW_HW, SW_HW, 3)).astype(np.float32),
               np.asarray([0], np.int32))
              for _ in range(N_STREAM)]
    tta_items, eval_items = [], []
    for views, clip, label in stream:
        tta_items.append((torch.from_numpy(
            np.transpose(views, (0, 4, 1, 2, 3)).copy()), int(label[0])))
        eval_items.append((torch.from_numpy(
            np.transpose(clip, (0, 4, 1, 2, 3)).copy()), int(label[0])))

    # chosen_blocks carry the wrapper's 'model.' prefix transparently
    # (substring match, basics.py:572-573)
    args = _base_args(arch="videoswintransformer",
                      chosen_blocks=["backbone.layers.1", "backbone.norm"],
                      momentum_mvg=0.05, lambda_pred_consis=0.05,
                      spatiotemp_mean_clean_file=mp,
                      spatiotemp_var_clean_file=vp)
    result, want = _run_reference_tta_standard(
        basics, monkeypatch, tm, args, tta_items, eval_items,
        "get_dataset_videoswin")

    cfg = swin_ucf101_preset()
    cfg = cfg.replace(
        data=dataclasses.replace(cfg.data, clip_length=SW_T,
                                 input_size=SW_HW, scale_size=SW_HW),
        tta=dataclasses.replace(
            cfg.tta, chosen_blocks=("backbone.layers.1", "backbone.norm"),
            momentum_mvg=0.05))
    engine = VittaEngine(jm, cfg, variables, src, donate=False)
    got = _run_engine_stream(engine, stream)
    _assert_traj(got, want)
    np.testing.assert_allclose(np.mean(got["top1"]), result[0], atol=1e-6)
