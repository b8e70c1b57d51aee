"""Differential FULL-LOOP parity against the LIVE reference code.

The highest-risk claim of this rebuild is that one jitted
``adapt_eval_step`` reproduces the reference's hook-based adaptation
trajectory (corpus/basics.py:403-747): per video, forward-with-hooks ->
EMA stat update -> L1 regularization + prediction consistency -> SGD
step -> hook removal -> no-grad eval -> hook re-registration.  Forward
parity plus unit-level EMA tests do not compose into loop parity
(optimizer ordering, EMA-on-updated-estimate, view folding, and
eval-after-step can each drift), so this module drives the reference's
OWN hook/loss machinery — ``CombineNormStatsRegHook_onereg``,
``compute_pred_consis``, ``choose_layers`` imported from
/root/reference — in a torch replica of the ``tta_standard`` inner loop
(basics.py:516-728), on the same weights and per-video tensors as
``VittaEngine``, and asserts the per-step (r_feature, consis loss,
post-adaptation eval logits) trajectories agree for both modes
(tta_online / tta_standard) and both architectures (TANet / Swin).

Dropout / DropPath are disabled on both sides: the reference runs them
live during adaptation, but their RNG streams cannot match across
frameworks (the reference is equally nondeterministic run-to-run).
"""

import copy
import sys
import types

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from vitta_tpu.adapt.engine import VittaEngine, flatten_taps
from vitta_tpu.config import tanet_ucf101_preset, swin_ucf101_preset
from vitta_tpu.models.tanet import TANet
from vitta_tpu.models.swin import Recognizer3D
from vitta_tpu.utils.checkpoint import (convert_swin_checkpoint,
                                        convert_tanet_checkpoint,
                                        swin_norm_layers, tanet_norm_layers)
from tests.torch_tanet import TorchTSN, randomize_bn_stats
from tests.torch_swin import TorchRecognizer3D

pytestmark = pytest.mark.slow

N_STREAM = 6          # videos per trajectory
T, HW, K, V = 4, 32, 7, 2
LR = 5e-5


# ---------------------------------------------------------------------------
# reference import rig: stub absent third-party deps, de-CUDA the tensors
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def ref():
    """Import the reference's live hook machinery on CPU-only torch."""
    saved_modules = {}
    for name in ("decord", "torchvision", "torchvision.transforms"):
        saved_modules[name] = sys.modules.get(name)
        mod = types.ModuleType(name)
        if name == "torchvision":
            mod.transforms = types.ModuleType("torchvision.transforms")
        sys.modules[name] = mod
    sys.modules["torchvision.transforms"] = sys.modules["torchvision"].transforms

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
        import utils.norm_stats_utils as nsu
        import utils.pred_consistency_utils as pcu
        import utils.BNS_utils as bnsu
        yield types.SimpleNamespace(
            Hook=nsu.CombineNormStatsRegHook_onereg,
            compute_pred_consis=pcu.compute_pred_consis,
            choose_layers=bnsu.choose_layers,
        )
    finally:
        torch.Tensor.cuda = orig_cuda
        torch.Tensor.to = orig_to
        sys.path.remove("/root/reference")
        for name, mod in saved_modules.items():
            if mod is None:
                sys.modules.pop(name, None)
            else:
                sys.modules[name] = mod


# ---------------------------------------------------------------------------
# the reference inner loop (basics.py:516-728) on a torch model
# ---------------------------------------------------------------------------
class RefLoop:
    """Replica of the live ``tta_standard`` per-video protocol driving
    the reference's own hooks/losses; ``fold_views(model, x)`` must
    return per-view logits (B, V, K)."""

    def __init__(self, ref, model_origin, chosen_layers_fn, stats_in_order,
                 chosen_blocks, mode, momentum_mvg, n_gradient_steps=1,
                 lambda_reg=1.0, lambda_consis=0.1, moving_avg=True,
                 fix_bns=True):
        self.ref = ref
        self.model_origin = model_origin
        self.chosen_layers_fn = chosen_layers_fn
        self.stats_in_order = stats_in_order
        self.chosen_blocks = chosen_blocks
        self.mode = mode
        self.momentum_mvg = momentum_mvg
        self.n_gradient_steps = n_gradient_steps
        self.lambda_reg = lambda_reg
        self.lambda_consis = lambda_consis
        self.moving_avg = moving_avg
        self.fix_bns = fix_bns
        self.model = None

    def _setup(self):
        self.model = copy.deepcopy(self.model_origin)   # basics.py:530
        chosen = self.chosen_layers_fn(self.model)
        self.optimizer = torch.optim.SGD(self.model.parameters(), lr=LR,
                                         momentum=0.9, weight_decay=5e-4)
        self.hooks, self.hooked_layers = [], []
        for (name, layer), stat in zip(chosen, self.stats_in_order):
            if not any(b in name for b in self.chosen_blocks):
                continue                                 # basics.py:573-575
            # moving_avg=True is the live default (opts.py:97) in BOTH
            # modes (tta_standard just pins momentum to 1.0); False is the
            # AverageMeterTensor cumulative path (norm_stats_utils.py:146-151)
            self.hooks.append(self.ref.Hook(
                layer, clip_len=T, spatiotemp_stats_clean_tuple=stat,
                reg_type="l1_loss", moving_avg=self.moving_avg,
                momentum=self.momentum_mvg, stat_type_list=["spatiotemp"],
                reduce_dim=True, before_norm=False,
                if_sample_tta_aug_views=True, n_augmented_views=V))
            self.hooked_layers.append(layer)

    def step(self, views_t, clip_t, fold_views):
        """One video: adapt on views, evaluate clip. Returns
        (loss_reg, loss_consis, eval_logits)."""
        if self.model is None or self.mode == "tta_standard":
            self._setup()                                # basics.py:519-530
        m = self.model
        m.train()
        if self.fix_bns:                                 # fix_BNS, :606-611
            for mod in m.modules():
                if isinstance(mod, (nn.BatchNorm1d, nn.BatchNorm2d,
                                    nn.BatchNorm3d)):
                    mod.eval()
        for _gs in range(self.n_gradient_steps):         # basics.py:633-671
            view_logits = fold_views(m, views_t)         # (1, V, K)
            loss_consis = self.ref.compute_pred_consis(view_logits)
            loss_reg = torch.zeros(())
            for h in self.hooks:
                loss_reg = loss_reg + h.r_feature
            loss = self.lambda_reg * loss_reg + self.lambda_consis * loss_consis
            self.optimizer.zero_grad()
            loss.backward()
            self.optimizer.step()
        for h in self.hooks:                             # basics.py:682-686
            h.close()
        m.eval()
        with torch.no_grad():                            # basics.py:691-716
            eval_logits = fold_views(m, clip_t).mean(1)  # (1, K)
        for h, layer in zip(self.hooks, self.hooked_layers):
            h.add_hook_back(layer)                       # basics.py:721-728
        return (float(loss_reg.detach()), float(loss_consis.detach()),
                eval_logits.numpy())


def _source_stats_from_taps(model, variables, x_clean, drop_bn1d=True):
    """Shared source statistics for both loops, from the JAX taps."""
    _, aux = model.apply(variables, x_clean, train=False, mutable=["taps"])
    src = {}
    for n, s in flatten_taps(aux["taps"]).items():
        if drop_bn1d and ("g_bn" in n or "l_bn" in n):
            continue
        src[n] = (np.asarray(s.mean), np.asarray(s.var))
    return src


def _run_engine_stream(engine, stream, eval_views_shape_arch):
    """Drive VittaEngine over the same stream; returns trajectories."""
    state = engine.init_state()
    rng = jax.random.PRNGKey(0)
    out = []
    for bi, (views, clip, label) in enumerate(stream):
        state, m = engine.adapt_eval_step(
            state, jnp.asarray(views), jnp.asarray(clip), label,
            jax.random.fold_in(rng, bi))
        # eval logits with the post-step params and carried running stats
        # (the tap-free eval apply; under fix_BNS=False the running stats
        # were updated by the adapt forward)
        logits = np.asarray(engine._apply_eval(
            state.params, jnp.asarray(clip), state.batch_stats))
        out.append((float(m.loss_reg), float(m.loss_consis), logits))
    return out


def _assert_trajectories_match(got, want, logits_atol):
    for bi, ((g_reg, g_con, g_log), (w_reg, w_con, w_log)) in enumerate(
            zip(got, want)):
        np.testing.assert_allclose(
            g_reg, w_reg, rtol=5e-3, atol=1e-5,
            err_msg=f"r_feature diverged at stream step {bi}")
        np.testing.assert_allclose(
            g_con, w_con, rtol=5e-3, atol=1e-5,
            err_msg=f"consistency loss diverged at stream step {bi}")
        np.testing.assert_allclose(
            g_log, w_log, rtol=5e-3, atol=logits_atol,
            err_msg=f"post-step eval logits diverged at stream step {bi}")
        assert np.argmax(g_log) == np.argmax(w_log), bi


# ---------------------------------------------------------------------------
# TANet
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def tanet_rig():
    torch.manual_seed(0)
    tm = TorchTSN(K, T)
    with torch.no_grad():
        randomize_bn_stats(tm)
    tm.eval()
    variables = convert_tanet_checkpoint(tm.state_dict(), K)
    jm = TANet(num_classes=K, clip_length=T, dropout=0.0)
    x_clean = jnp.asarray(np.random.default_rng(7).normal(
        size=(V, T, HW, HW, 3)).astype(np.float32))
    src = _source_stats_from_taps(jm, variables, x_clean)
    # reference stat lists in choose_layers order, None at BN1d positions
    # (basics.py:488-498)
    stats_in_order = []
    for name, kind in tanet_norm_layers():
        if kind == "bn2d":
            m, v = src[name]
            stats_in_order.append((m.copy(), v.copy()))
        else:
            stats_in_order.append((None, None))
    rng = np.random.default_rng(3)
    stream = [(rng.normal(size=(V, T, HW, HW, 3)).astype(np.float32) * 0.8,
               rng.normal(size=(1, T, HW, HW, 3)).astype(np.float32) * 0.8,
               np.asarray([0], np.int32))
              for _ in range(N_STREAM)]
    return tm, jm, variables, src, stats_in_order, stream


def _tanet_fold(m, x_np):
    """(B*V, T, H, W, 3) numpy -> per-view torch logits (1, B*V, K)."""
    xt = torch.from_numpy(np.transpose(x_np, (0, 1, 4, 2, 3)))
    return m(xt).reshape(1, -1, K)


def _tanet_chosen_layers(ref):
    return lambda model: ref.choose_layers(
        model, [nn.BatchNorm1d, nn.BatchNorm2d, nn.BatchNorm3d])


@pytest.mark.parametrize("mode,n_grad,mvg,moving_avg", [
    ("tta_online", 1, 0.1, True),     # the live default config
    ("tta_standard", 2, 1.0, True),   # per-sample reset mode
    ("tta_online", 1, 0.1, False),    # AverageMeterTensor path
])
def test_tanet_loop_parity(ref, tanet_rig, mode, n_grad, mvg, moving_avg):
    tm, jm, variables, src, stats_in_order, stream = tanet_rig
    import dataclasses
    cfg = tanet_ucf101_preset()
    cfg = cfg.replace(
        data=dataclasses.replace(cfg.data, clip_length=T, input_size=HW),
        tta=dataclasses.replace(cfg.tta, if_tta_standard=mode,
                                momentum_mvg=mvg, n_gradient_steps=n_grad,
                                moving_avg=moving_avg),
    )

    ref_loop = RefLoop(ref, tm, _tanet_chosen_layers(ref), stats_in_order,
                       ("layer3", "layer4"), mode, mvg,
                       n_gradient_steps=n_grad, moving_avg=moving_avg)
    want = [ref_loop.step(views, clip, _tanet_fold)
            for views, clip, _ in stream]

    engine = VittaEngine(jm, cfg, variables, src, donate=False)
    got = _run_engine_stream(engine, stream, "tanet")
    _assert_trajectories_match(got, want, logits_atol=2e-3)


def test_tanet_loop_parity_fix_bns_false(ref, tanet_rig):
    """fix_BNS=False (BN stays in train mode, running stats update during
    the adapt forward — the path skipped at basics.py:607-611).

    Free-running trajectories diverge measurably here NOT from semantics
    but from fp32 conditioning: train-mode BN on a random-weight net
    amplifies ~1e-5 parameter noise into ~1e-2 logit noise within one
    forward (verified by param syncing below).  So this case checks the
    semantics step-synced: (1) step-0 losses/logits match free-running,
    (2) the post-step parameters AND updated BN running stats match
    torch's, (3) a second step launched from torch's exact post-step
    state reproduces torch's step-1 losses."""
    import dataclasses
    from vitta_tpu.utils.checkpoint import convert_tanet_checkpoint

    tm, jm, variables, src, stats_in_order, stream = tanet_rig
    cfg = tanet_ucf101_preset()
    cfg = cfg.replace(
        data=dataclasses.replace(cfg.data, clip_length=T, input_size=HW),
        tta=dataclasses.replace(cfg.tta, fix_BNS=False),
    )
    ref_loop = RefLoop(ref, tm, _tanet_chosen_layers(ref), stats_in_order,
                       ("layer3", "layer4"), "tta_online", 0.1, fix_bns=False)
    w0 = ref_loop.step(stream[0][0], stream[0][1], _tanet_fold)
    # deep-copy: the converter's arrays share memory with the torch
    # tensors, which the next step's SGD mutates in place
    post0 = jax.tree_util.tree_map(
        np.array, convert_tanet_checkpoint(ref_loop.model.state_dict(), K))
    w1 = ref_loop.step(stream[1][0], stream[1][1], _tanet_fold)

    engine = VittaEngine(jm, cfg, variables, src, donate=False)
    state = engine.init_state()
    rng = jax.random.PRNGKey(0)
    state, m0 = engine.adapt_eval_step(
        state, jnp.asarray(stream[0][0]), jnp.asarray(stream[0][1]),
        stream[0][2], rng)
    # (1) step-0 trajectory point
    np.testing.assert_allclose(float(m0.loss_reg), w0[0], rtol=5e-3)
    np.testing.assert_allclose(float(m0.loss_consis), w0[1], rtol=5e-3)
    logits0 = np.asarray(engine._apply_eval(
        state.params, jnp.asarray(stream[0][1]), state.batch_stats))
    np.testing.assert_allclose(logits0, w0[2], rtol=5e-3, atol=2e-3)
    # (2) post-step params and RUNNING STATS equal torch's
    for ours, theirs, what in ((state.params, post0["params"], "params"),
                               (state.batch_stats, post0["batch_stats"],
                                "batch_stats")):
        diffs = jax.tree_util.tree_map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))), ours, theirs)
        worst = max(jax.tree_util.tree_leaves(diffs))
        assert worst < 2e-4, f"{what} diverged: max abs {worst}"
    # (3) step-1 semantics from torch's exact post-step state
    synced = state._replace(params=post0["params"],
                            batch_stats=post0["batch_stats"])
    _, m1 = engine.adapt_eval_step(
        synced, jnp.asarray(stream[1][0]), jnp.asarray(stream[1][1]),
        stream[1][2], jax.random.fold_in(rng, 1))
    np.testing.assert_allclose(float(m1.loss_reg), w1[0], rtol=5e-3)
    np.testing.assert_allclose(float(m1.loss_consis), w1[1], rtol=5e-3)


# ---------------------------------------------------------------------------
# Video Swin (tiny config)
# ---------------------------------------------------------------------------
SW_T, SW_HW, SW_ED = 4, 16, 8
SW_DEPTHS, SW_HEADS = (1, 1), (2, 2)
SW_WIN = (2, 4, 4)


@pytest.fixture(scope="module")
def swin_rig():
    torch.manual_seed(1)
    tm = TorchRecognizer3D(K, patch_size=(2, 4, 4), embed_dim=SW_ED,
                           depths=SW_DEPTHS, num_heads=SW_HEADS,
                           window_size=SW_WIN)
    tm.eval()
    variables = convert_swin_checkpoint(tm.state_dict(), K, depths=SW_DEPTHS,
                                        window_size=SW_WIN)
    jm = Recognizer3D(num_classes=K, patch_size=(2, 4, 4), embed_dim=SW_ED,
                      depths=SW_DEPTHS, num_heads=SW_HEADS,
                      window_size=SW_WIN, drop_path_rate=0.0,
                      head_dropout=0.0)
    x_clean = jnp.asarray(np.random.default_rng(8).normal(
        size=(V, SW_T, SW_HW, SW_HW, 3)).astype(np.float32))
    src = _source_stats_from_taps(jm, variables, x_clean, drop_bn1d=False)
    # choose_layers order for LayerNorm, patch-embed norm dropped
    # (basics.py:541-544); the remaining order equals swin_norm_layers
    names = [n for n, _ in swin_norm_layers(depths=SW_DEPTHS)]
    stats_in_order = [(src[n][0].copy(), src[n][1].copy()) for n in names]
    rng = np.random.default_rng(4)
    stream = [(rng.normal(size=(V, SW_T, SW_HW, SW_HW, 3)).astype(np.float32),
               rng.normal(size=(1, SW_T, SW_HW, SW_HW, 3)).astype(np.float32),
               np.asarray([0], np.int32))
              for _ in range(N_STREAM)]
    return tm, jm, variables, src, stats_in_order, stream


def _swin_fold(m, x_np):
    xt = torch.from_numpy(np.transpose(x_np, (0, 4, 1, 2, 3)))  # (V,3,T,H,W)
    return m(xt).reshape(1, -1, K)


def test_swin_loop_parity(ref, swin_rig):
    tm, jm, variables, src, stats_in_order, stream = swin_rig
    import dataclasses
    cfg = swin_ucf101_preset()
    cfg = cfg.replace(
        data=dataclasses.replace(cfg.data, clip_length=SW_T,
                                 input_size=SW_HW, scale_size=SW_HW),
        tta=dataclasses.replace(
            cfg.tta, chosen_blocks=("backbone.layers.1", "backbone.norm"),
            momentum_mvg=0.05),
    )

    def chosen_layers(model):
        return ref.choose_layers(model, [nn.LayerNorm])[1:]  # basics.py:541-544

    ref_loop = RefLoop(ref, tm, chosen_layers, stats_in_order,
                       ("backbone.layers.1", "backbone.norm"),
                       "tta_online", 0.05, lambda_consis=0.05)
    want = [ref_loop.step(views, clip, _swin_fold)
            for views, clip, _ in stream]

    engine = VittaEngine(jm, cfg, variables, src, donate=False)
    got = _run_engine_stream(engine, stream, "swin")
    _assert_trajectories_match(got, want, logits_atol=2e-3)
