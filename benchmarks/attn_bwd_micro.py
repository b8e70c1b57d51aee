"""Ablation microbenchmark of the packed window-attention backward.

The round-5 Swin-B bf16 trace puts the packed attention backward at
11.55 ms/step — ~2.2x the hd=32 structural matmul ceiling
(benchmarks/PERF.md speed-of-light section).  This bench times the
REAL `_packed_attn_bwd` on each stage's shapes, then bench-local
variants of the same kernel with one piece removed at a time, to
attribute the over-ceiling cost before touching the production kernel:

  full        the production kernel (imported, not copied)
  no_dbias    dl never accumulated into the revisited dbias block
  no_exp      softmax recompute replaced by the raw logits (wrong math,
              same matmul count, no exp / no (N,N) f32 normalize chain)
  mm_only     the five matmuls with minimal glue (floor proxy)
  pipe        same math as full, program order software-pipelined over
              heads: head h+1's independent logits/dp matmuls are issued
              between head h's VPU softmax/dl chain so the MXU is never
              idle behind the VPU (slope run showed full ~= mm_only +
              the whole VPU chain, i.e. zero overlap)

Timing is SLOPE-based on top of the serial-chain rule
(benchmarks/PERF.md "Methodology"): one jitted step runs K chained
kernel invocations (token folded into g between them), timed at K=2
and K=10; per-invocation cost = (t10 - t2) / 8.  The first run of this
bench timed one invocation per dispatch and measured a flat ~2.3 ms
floor across stages whose FLOPs differ 8x — the axon tunnel's
per-launch round trip, not kernel time.  The slope cancels it.

Usage: PYTHONPATH=$PYTHONPATH:. python benchmarks/attn_bwd_micro.py [out.jsonl]
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

# Swin-B @ (2 views x 16 frames, 224^2), window (8, 7, 7): per-stage
# packed-attention shapes (b_ windows, N tokens, nh heads, C channels)
# and the block count that multiplies each into the step total.
STAGES = [
    ("stage0", 128, 392, 4, 128, 2),
    ("stage1", 32, 392, 8, 256, 2),
    ("stage2", 8, 392, 16, 512, 18),
    ("stage3", 2, 392, 32, 1024, 2),
]
N_WARMUP, N_STEPS = 3, 12
K_LO, K_HI = 2, 10


def _bench(fn, args, chain_idx):
    """Slope timing: a jitted step runs K chained invocations (token
    from each output folded into the next call's ``chain_idx`` arg);
    per-invocation ms = (t(K_HI) - t(K_LO)) / (K_HI - K_LO).  Value-
    fetch terminated; the K=const dispatch/glue cost cancels in the
    difference."""
    import jax
    import jax.numpy as jnp

    def make_step(k):
        def step(tok, *a):
            for _ in range(k):
                b = list(a)
                b[chain_idx] = (b[chain_idx]
                                + (0.0 * tok).astype(b[chain_idx].dtype))
                out = fn(*b)
                leaf = out[0] if isinstance(out, (tuple, list)) else out
                tok = jnp.mean(leaf[0].astype(jnp.float32))
            return tok
        return jax.jit(step)

    per_call = {}
    for k in (K_LO, K_HI):
        step = make_step(k)
        tok = jnp.float32(0.0)
        for _ in range(N_WARMUP):
            tok = step(tok, *args)
        float(tok)
        t0 = time.perf_counter()
        for _ in range(N_STEPS):
            tok = step(tok, *args)
        float(tok)
        per_call[k] = 1000.0 * (time.perf_counter() - t0) / N_STEPS
    return (per_call[K_HI] - per_call[K_LO]) / (K_HI - K_LO)


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from vitta_tpu.ops import pallas_attention as A

    out_path = sys.argv[1] if len(sys.argv) > 1 else "/dev/stdout"
    rows = []

    def variant_kernel(mode, *, scale, nh, hd):
        """Bench-local copy of the packed bwd head loop with one piece
        ablated (mirrors pallas_attention._heads_bwd)."""

        def kern(qkv_ref, bias_ref, ms_ref, g_ref, dqkv_ref, dbias_ref):
            b = pl.program_id(0)

            @pl.when(b == 0)
            def _():
                dbias_ref[...] = jnp.zeros_like(dbias_ref)

            blk = qkv_ref[0]
            ms = ms_ref[0]
            g = g_ref[0]

            if mode == "pipe":
                def mm_pair(h):
                    q, k, v = A._head_slices(blk, h, nh, hd)
                    gh = g[:, h * hd:(h + 1) * hd]
                    l = A._packed_logits(q, k, bias_ref[h], None, scale)
                    dp = jax.lax.dot_general(
                        gh, v, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    return q, k, gh, l, dp

                cur = mm_pair(0)
                dqs, dks, dvs = [], [], []
                for h in range(nh):
                    q, k, gh, l, dp = cur
                    e = jnp.exp(l - ms[:, 2 * h:2 * h + 1])
                    if h + 1 < nh:
                        # issue the NEXT head's two independent matmuls
                        # between this head's VPU chain ops
                        cur = mm_pair(h + 1)
                    s = ms[:, 2 * h + 1:2 * h + 2]
                    inv = 1.0 / s
                    gs = (gh.astype(jnp.float32) * inv).astype(blk.dtype)
                    dv = jax.lax.dot_general(
                        e.astype(blk.dtype), gs, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    rs = jnp.sum(dp * e, axis=-1, keepdims=True) * inv
                    dl = e * (dp - rs) * inv
                    dbias_ref[h] += dl
                    dlc = dl.astype(blk.dtype)
                    dq = jax.lax.dot_general(
                        dlc, k, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32) * scale
                    dk = jax.lax.dot_general(
                        dlc, q, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32) * scale
                    dqs.append(dq.astype(dqkv_ref.dtype))
                    dks.append(dk.astype(dqkv_ref.dtype))
                    dvs.append(dv.astype(dqkv_ref.dtype))
                dqkv_ref[0] = jnp.concatenate(dqs + dks + dvs, axis=1)
                return

            dqs, dks, dvs = [], [], []
            for h in range(nh):
                q, k, v = A._head_slices(blk, h, nh, hd)
                gh = g[:, h * hd:(h + 1) * hd]
                l = A._packed_logits(q, k, bias_ref[h], None, scale)
                if mode == "no_exp":
                    e = l  # wrong math, same matmul count
                else:
                    e = jnp.exp(l - ms[:, 2 * h:2 * h + 1])
                s = ms[:, 2 * h + 1:2 * h + 2]
                inv = 1.0 / s
                gs = (gh.astype(jnp.float32) * inv).astype(blk.dtype)
                dv = jax.lax.dot_general(
                    e.astype(blk.dtype), gs, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                dp = jax.lax.dot_general(
                    gh, v, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                if mode == "mm_only":
                    dl = dp
                else:
                    rs = jnp.sum(dp * e, axis=-1, keepdims=True) * inv
                    dl = e * (dp - rs) * inv
                if mode not in ("no_dbias", "mm_only"):
                    dbias_ref[h] += dl
                dlc = dl.astype(blk.dtype)
                dq = jax.lax.dot_general(
                    dlc, k, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32) * scale
                dk = jax.lax.dot_general(
                    dlc, q, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32) * scale
                dqs.append(dq.astype(dqkv_ref.dtype))
                dks.append(dk.astype(dqkv_ref.dtype))
                dvs.append(dv.astype(dqkv_ref.dtype))
            dqkv_ref[0] = jnp.concatenate(dqs + dks + dvs, axis=1)

        return kern

    def run_variant(mode, b_, n, nh, c):
        hd = c // nh
        c3 = 3 * c
        scale = hd ** -0.5
        gen = np.random.default_rng(0)
        qkv = jnp.asarray(gen.normal(size=(b_, n, c3)).astype(np.float32)
                          ).astype(jnp.bfloat16)
        bias = jnp.asarray(gen.normal(size=(nh, n, n)).astype(np.float32))
        g = jnp.asarray(gen.normal(size=(b_, n, c)).astype(np.float32)
                        ).astype(jnp.bfloat16)
        # forward for the saved row max/sum
        _, ms = A._packed_attn_fwd(qkv, bias, None, scale, nh, save_ms=True)

        if mode == "full":
            fn = functools.partial(A._packed_attn_bwd, scale=scale, nh=nh)
            return _bench(lambda qkv, bias, ms, g:
                          fn(qkv, bias, None, ms, g),
                          (qkv, bias, ms, g), 3)

        kern = variant_kernel(mode, scale=scale, nh=nh, hd=hd)
        qkv_spec = pl.BlockSpec((1, n, c3), lambda b: (b, 0, 0),
                                memory_space=pltpu.VMEM)
        bias_spec = pl.BlockSpec((nh, n, n), lambda b: (0, 0, 0),
                                 memory_space=pltpu.VMEM)
        ms_spec = pl.BlockSpec((1, n, 2 * nh), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM)
        g_spec = pl.BlockSpec((1, n, c), lambda b: (b, 0, 0),
                              memory_space=pltpu.VMEM)

        def call(qkv, bias, ms, g):
            return pl.pallas_call(
                kern,
                grid=(b_,),
                in_specs=[qkv_spec, bias_spec, ms_spec, g_spec],
                out_specs=[qkv_spec, bias_spec],
                out_shape=[jax.ShapeDtypeStruct((b_, n, c3), qkv.dtype),
                           jax.ShapeDtypeStruct((nh, n, n), jnp.float32)],
                compiler_params=A._VMEM_PARAMS,
            )(qkv, bias, ms, g)

        return _bench(call, (qkv, bias, ms, g), 3)

    stages = STAGES
    if os.environ.get("ATTN_MICRO_STAGES"):
        keep = set(os.environ["ATTN_MICRO_STAGES"].split(","))
        stages = [s for s in STAGES if s[0] in keep]
    reps = int(os.environ.get("ATTN_MICRO_REPS", "1"))
    for name, b_, n, nh, c, blocks in stages:
        row = {"stage": name, "b_": b_, "n": n, "nh": nh, "c": c,
               "blocks": blocks}
        modes = (os.environ.get("ATTN_MICRO_MODES", "").split(",")
                 if os.environ.get("ATTN_MICRO_MODES")
                 else ["full", "no_dbias", "no_exp", "mm_only", "pipe"])
        # interleave mode repetitions (A, B, A, B, ...) so slow machine-
        # state drift hits every mode equally; report the median
        samples = {m: [] for m in modes}
        for _ in range(reps):
            for mode in modes:
                try:
                    samples[mode].append(run_variant(mode, b_, n, nh, c))
                except Exception as e:
                    samples[mode].append(
                        f"error: {str(e).splitlines()[0][:120]}")
        for mode in modes:
            vals = [v for v in samples[mode] if isinstance(v, float)]
            if not vals:
                row[mode] = samples[mode][0]
                continue
            row[mode] = round(float(np.median(vals)), 3)
            if reps > 1:
                row[mode + "_all"] = [round(v, 3) for v in vals]
        print(json.dumps(row), flush=True)
        rows.append(row)

    if out_path != "/dev/stdout":
        with open(out_path, "a") as f:
            for row in rows:
                f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
