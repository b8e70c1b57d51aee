"""bf16 accuracy-gate pre-clearance: fp32-vs-bf16 adaptation divergence.

No datasets or trained checkpoints exist in this environment, so the
final bf16 promotion gate (a real-data accuracy A/B, BASELINE.md) can't
run here.  This harness pre-clears everything that CAN be measured: the
same long synthetic corruption stream (uint8 wire format — identical
bytes into both runs) adapted by the full-size engine twice, compute
dtype fp32 vs bf16, from identical fp32 master weights and realistic
source-stat files, comparing the two *trajectories*:

* per-video eval prediction agreement (argmax over classes),
* regularization / consistency / CE loss deltas along the stream
  (tracks compounding EMA + weight drift, the mechanism by which bf16
  could change accuracy),
* final adapted parameter and EMA drift (relative L2),
* final top-1 delta.

Flag configurations (e.g. VITTA_BF16_MOMENTUM=1) inherit from the
environment so newly defaulted-on perf flags are gated by the same run.

Usage:  python benchmarks/bf16_gate.py [tanet|swin|both] [n_videos]
Prints one JSON line per arch.  Runs on the TPU (full-size models).
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys

import numpy as np

T = int(os.environ.get("GATE_T", "16"))
HW = int(os.environ.get("GATE_HW", "224"))
K = int(os.environ.get("GATE_K", "101"))
V = 2


def _build(arch: str, dtype: str, variables=None, src=None):
    import jax
    import jax.numpy as jnp
    from vitta_tpu.adapt.engine import VittaEngine, flatten_taps
    from vitta_tpu.config import swin_ucf101_preset, tanet_ucf101_preset

    if arch == "tanet":
        from vitta_tpu.models.tanet import TANet
        cfg = tanet_ucf101_preset()
        model = TANet(num_classes=K, clip_length=T, dtype=dtype)
    else:
        from vitta_tpu.models.swin import Recognizer3D
        cfg = swin_ucf101_preset()
        model = Recognizer3D(num_classes=K, drop_path_rate=0.0, dtype=dtype)
    cfg = cfg.replace(
        data=dataclasses.replace(cfg.data, clip_length=T),
        model=dataclasses.replace(cfg.model, compute_dtype=dtype))
    if variables is None:
        # masters always initialized in fp32 — BOTH dtype runs start
        # from these exact weights (storage is fp32 either way; init
        # math must not differ between the runs)
        rng = jax.random.PRNGKey(0)
        x0 = jnp.zeros((V, T, HW, HW, 3), jnp.float32)
        init_model = type(model)(**{**_model_kwargs(arch), "dtype": "float32"})
        init_fn = jax.jit(lambda r, x: init_model.init(
            {"params": r, "dropout": r}, x, train=False))
        variables = init_fn(rng, x0)
        variables = {"params": variables["params"],
                     "batch_stats": variables.get("batch_stats", {})}
        tapped = jax.jit(lambda v, x: init_model.apply(
            v, x, train=False, mutable=["taps"]))
        _, aux = tapped(variables, jax.random.normal(
            jax.random.PRNGKey(7), (V, T, HW, HW, 3)) * 0.5)
        drop = ("g_bn", "l_bn") if arch == "tanet" else ()
        src = {n: (np.asarray(s.mean, np.float32),
                   np.asarray(s.var, np.float32))
               for n, s in flatten_taps(aux["taps"]).items()
               if not any(d in n for d in drop)}
    # donate=False: the fp32 master `variables` are reused to build the
    # second engine — their buffers must survive the first run
    return (VittaEngine(model, cfg, variables, src, donate=False),
            cfg, variables, src)


def _model_kwargs(arch):
    if arch == "tanet":
        return {"num_classes": K, "clip_length": T}
    return {"num_classes": K, "drop_path_rate": 0.0}


def _stream_item(i):
    """Deterministic uint8 paired views/clip for video i — the wire
    format both runs consume byte-identically."""
    rng = np.random.default_rng(10_000 + i)
    views = rng.integers(0, 256, (V, T, HW, HW, 3), dtype=np.uint8)
    clip = rng.integers(0, 256, (1, T, HW, HW, 3), dtype=np.uint8)
    label = np.asarray([i % K], np.int32)
    return views, clip, label


def _run_stream(engine, n):
    import jax
    state = engine.init_state()
    rng = jax.random.PRNGKey(3)
    preds, reg, consis, ce, top1 = [], [], [], [], []
    for i in range(n):
        views, clip, label = _stream_item(i)
        state, m = engine.adapt_eval_step(state, views, clip, label,
                                          jax.random.fold_in(rng, i))
        preds.append(int(m.pred[0]))
        reg.append(float(m.loss_reg))
        consis.append(float(m.loss_consis))
        ce.append(float(m.loss_ce))
        top1.append(float(m.top1))
    return state, dict(preds=np.asarray(preds), reg=np.asarray(reg),
                       consis=np.asarray(consis), ce=np.asarray(ce),
                       top1=float(np.mean(top1)))


def _rel_l2(a, b):
    import jax
    num = den = 0.0
    for la, lb in zip(jax.tree_util.tree_leaves(a),
                      jax.tree_util.tree_leaves(b)):
        la = np.asarray(la, np.float64)
        lb = np.asarray(lb, np.float64)
        num += float(np.sum((la - lb) ** 2))
        den += float(np.sum(la ** 2))
    return float(np.sqrt(num / max(den, 1e-30)))


def gate(arch: str, n: int) -> dict:
    eng32, _, variables, src = _build(arch, "float32")
    s32, t32 = _run_stream(eng32, n)
    del eng32
    import gc
    gc.collect()
    eng16, _, _, _ = _build(arch, "bfloat16", variables, src)
    s16, t16 = _run_stream(eng16, n)

    agree = float(np.mean(t32["preds"] == t16["preds"]))
    out = {
        "arch": arch, "n_videos": n,
        "pred_agreement": round(agree, 4),
        "top1_fp32": round(t32["top1"], 3),
        "top1_bf16": round(t16["top1"], 3),
        "reg_loss_max_absdiff": round(float(
            np.max(np.abs(t32["reg"] - t16["reg"]))), 5),
        "reg_loss_final_reldiff": round(float(
            abs(t32["reg"][-1] - t16["reg"][-1])
            / max(abs(t32["reg"][-1]), 1e-9)), 5),
        "consis_loss_max_absdiff": round(float(
            np.max(np.abs(t32["consis"] - t16["consis"]))), 5),
        "params_rel_l2_drift": _rel_l2(s32.params, s16.params),
        "ema_rel_l2_drift": _rel_l2(s32.ema, s16.ema),
        "env_flags": {k: v for k, v in os.environ.items()
                      if k.startswith("VITTA_")},
    }
    print(json.dumps(out), flush=True)
    return out


def main():
    from vitta_tpu.cli.opts import enable_compile_cache
    enable_compile_cache()
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 120
    for arch in (("tanet", "swin") if which == "both" else (which,)):
        gate(arch, n)


if __name__ == "__main__":
    main()
