"""Per-baseline TPU latency at the reference's baseline operating point.

The reference defines the six baselines' accuracies as a primary
configuration (corpus/main_eval.py:100-227) but never times them; this
records the rebuild column: per-batch device latency of each baseline's
jitted step(s) on one chip, at the source-only drivers' operating point
(batch 32 videos x 1 clip x 16 frames @ 224, TANet —
sourceonly_tanet_ucf101_corr.py:26-33).  DUA is timed per *video* (its
unit is a 16-augment batch per video, dua.py:21-95).

Host-side pieces (SHOT's clustering, T3A's support-set bookkeeping) are
numpy on the host by design and excluded — the measured unit is the
device step the chip repeats over the stream.

Inputs are pre-staged device-resident f32 pools (the honest device
metric on a tunneled backend; see bench.py).

Every timed loop is SERIAL-CHAINED: a scalar computed from each step's
output is folded into the next step's input, so consecutive dispatches
carry a true data dependency.  Free-running identical dispatches of a
stateless forward measured 0.78 ms/batch here — 3.4x the chip's bf16
FLOP peak, physically impossible on one device: the tunnel's backing
pool overlaps independent executions.  bench.py is immune (its step
chains the carried TTAState); this harness has to build the chain by
hand.  The fold perturbs one (small) input leaf by ``0 * token`` —
negligible cost, and far smaller than the inflation it removes.

Usage: PYTHONPATH=$PYTHONPATH:. python benchmarks/baseline_bench.py [out.jsonl]
  env: BENCH_DTYPE=float32|bfloat16 (default float32 — the parity config)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

BATCH = 8          # videos per batch; the reference uses 32 at fp32 on a
                   # 16 GB V100 — 8 keeps the f32 activations of the
                   # (B*T, 224, 224, x) ResNet stack inside one v5e's HBM
                   # headroom alongside params+opt state; ms/video is the
                   # comparable unit either way
N_WARMUP, N_STEPS = 3, 16
T, HW, K = 16, 224, 101


def _time(fn, *args):
    """Serial-chained timing of ``fn(*args)`` whose output is a pytree.

    Wraps ``fn`` in a jitted step that (a) perturbs the first array
    argument by ``0 * token`` where ``token`` is a scalar reduced from
    the previous output, and (b) returns the new token with the output —
    so step N+1's input buffer depends on step N's result and no two
    steps can overlap, on this device or across a pool."""
    import jax
    import jax.numpy as jnp

    def _first_inexact(flat):
        for i, leaf in enumerate(flat):
            if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype,
                                                         jnp.inexact):
                return i
        raise ValueError("no inexact leaf to chain through")

    def step(tok, *a):
        flat, treedef = jax.tree_util.tree_flatten(a)
        i = _first_inexact(flat)
        flat[i] = flat[i] + (0.0 * tok).astype(flat[i].dtype)
        out = fn(*jax.tree_util.tree_unflatten(treedef, flat))
        # one output leaf is enough: executions complete atomically, so
        # any output buffer gates the next dispatch
        oflat = jax.tree_util.tree_leaves(out)
        token = jnp.mean(oflat[_first_inexact(oflat)].astype(jnp.float32))
        return token, out

    step = jax.jit(step)
    tok = jnp.float32(0.0)
    out = None
    for _ in range(N_WARMUP):
        tok, out = step(tok, *args)
    # end with a VALUE fetch, not block_until_ready: on the tunneled
    # backend block_until_ready on a small output returns before the
    # chain has executed (probed: 0.94 ms/step "blocked" vs 33.9 with a
    # fetch for the same chained forward); fetching the token's value
    # cannot be satisfied without running the whole chain
    float(tok)
    t0 = time.perf_counter()
    for _ in range(N_STEPS):
        tok, out = step(tok, *args)
    float(tok)
    return 1000.0 * (time.perf_counter() - t0) / N_STEPS


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from vitta_tpu.baselines import setup_baseline
    from vitta_tpu.config import tanet_ucf101_preset
    from vitta_tpu.models.tanet import TANet

    dtype = os.environ.get("BENCH_DTYPE", "float32")
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/dev/stdout"

    cfg = tanet_ucf101_preset()
    import dataclasses
    cfg = cfg.replace(data=dataclasses.replace(
        cfg.data, clip_length=T, batch_size=BATCH, sample_style="uniform-1",
        test_crops=1))
    model = TANet(num_classes=K, clip_length=T, dtype=dtype)
    rng = jax.random.PRNGKey(0)
    x0 = jnp.zeros((1, T, HW, HW, 3), jnp.float32)
    init_fn = jax.jit(lambda r, x: model.init(
        {"params": r, "dropout": r}, x, train=False))
    variables = init_fn(rng, x0)
    variables = {"params": variables["params"],
                 "batch_stats": variables["batch_stats"]}

    gen = np.random.default_rng(0)
    batch = jnp.asarray(gen.normal(size=(BATCH, T, HW, HW, 3))
                        .astype(np.float32))
    dua_views = jnp.asarray(gen.normal(size=(16, T, HW, HW, 3))
                            .astype(np.float32))

    rows = []

    def record(name, unit_ms, unit, per_video_ms, note=""):
        row = {"baseline": name, "dtype": dtype, "ms": round(unit_ms, 2),
               "unit": unit, "ms_per_video": round(per_video_ms, 3),
               "batch": BATCH, "note": note}
        rows.append(row)
        print(json.dumps(row), flush=True)

    # source: plain eval forward (setup_baseline.py:47-52)
    b = setup_baseline("source", model, cfg, variables)
    ms = _time(b._fwd, variables, batch)
    record("source", ms, "ms/batch", ms / BATCH)

    # NORM: train-mode BN forward with running-stat updates (norm.py:4-49)
    b = setup_baseline("norm", model, cfg, variables)
    ms = _time(b._fwd, variables, batch)
    record("norm", ms, "ms/batch", ms / BATCH,
           "adaptation pass == eval pass (batch-stat BN)")

    # TENT: entropy-min adapt step (Adam on norm affine) + eval forward
    b = setup_baseline("tent", model, cfg, variables)
    opt_state = b.tx.init(variables["params"])
    ms_adapt = _time(lambda p, s, o, x: b._adapt(p, s, o, x)[0],
                     variables["params"], variables["batch_stats"],
                     opt_state, batch)
    ms_eval = _time(b._fwd, variables, batch)
    record("tent", ms_adapt + ms_eval, "ms/batch (adapt+eval)",
           (ms_adapt + ms_eval) / BATCH,
           f"adapt {ms_adapt:.1f} + eval {ms_eval:.1f}")

    # SHOT: feature extraction + CE/ent/div adapt step (clustering is
    # host numpy, excluded)
    b = setup_baseline("shot", model, cfg, variables)
    feats = b._feat(variables, batch)
    ms_feat = _time(b._feat, variables, batch)
    pseudo = jnp.zeros((feats.shape[0] // b.n_eval_views,), jnp.int32)
    opt_state = b.tx.init(variables["params"])
    step_rng = jax.random.PRNGKey(1)
    ms_adapt = _time(lambda p, s, o, x, y, r: b._adapt(p, s, o, x, y, r)[0],
                     variables["params"], variables["batch_stats"],
                     opt_state, batch, pseudo, step_rng)
    record("shot", ms_feat + ms_adapt, "ms/batch (feat+adapt)",
           (ms_feat + ms_adapt) / BATCH,
           f"feat {ms_feat:.1f} + adapt {ms_adapt:.1f}; "
           "host clustering excluded")

    # DUA: per-video 16-augment no-grad BN-update forward (dua.py:21-95)
    b = setup_baseline("dua", model, cfg, variables)
    ms = _time(b._update, variables, dua_views)
    record("dua", ms, "ms/video (16-augment update)", ms,
           "per-video re-evals excluded (reference evaluates the full "
           "test set after each video — O(n^2) by design)")

    # T3A: feature forward + prototype classify (support-set filtering is
    # host-side)
    b = setup_baseline("t3a", model, cfg, variables, filter_k=20)
    feats = b._feat(variables, batch)
    ms_feat = _time(b._feat, variables, batch)
    ms_cls = _time(b._cls, variables, feats)
    record("t3a", ms_feat + ms_cls, "ms/batch (feat+classify)",
           (ms_feat + ms_cls) / BATCH,
           f"feat {ms_feat:.1f} + cls {ms_cls:.1f}")

    if out_path != "/dev/stdout":
        with open(out_path, "a") as f:
            for row in rows:
                f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
