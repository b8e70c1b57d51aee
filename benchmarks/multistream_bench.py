"""Gate measurement for per-chip multi-stream batching.

The parallel sweep can vmap several corruption streams per chip
(``--streams_per_chip``; vitta_tpu/parallel/streams.py + cli/drivers.py).
Whether that wins depends on how efficiently XLA lowers the vmapped
step's *batched per-stream weights* (convolutions become grouped convs
with per-stream filters).  This script measures, on ONE chip, the
vmapped step time for S in {1, 2, 3} streams.

Decision rule (VERDICT round 2 item 6): packing 2 streams/chip is worth
enabling when step(S=2) <= 1.33 x step(S=1) — i.e. per-chip throughput
> 1.5x — because it turns the 12-corruption sweep's 8+4 chip-pass split
(2.0 single-step units of wall time) into one 6-chip pass at 2/chip
(<= 1.33 units).

Usage: PYTHONPATH=$PYTHONPATH:. python benchmarks/multistream_bench.py
  env: BENCH_MODEL=tanet|swin, BENCH_DTYPE=float32|bfloat16
"""

import dataclasses
import json
import os
import sys
import time

import numpy as np

BENCH_MODEL = os.environ.get("BENCH_MODEL", "tanet")
BENCH_DTYPE = os.environ.get("BENCH_DTYPE", "bfloat16")
N_WARMUP, N_STEPS = 4, 24
STREAM_COUNTS = (1, 2, 3)


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import bench as bench_mod

    T, HW, K, V = 16, 101, 2, 2
    bench_mod.BENCH_DTYPE = BENCH_DTYPE
    build = bench_mod._build_swin if BENCH_MODEL == "swin" else \
        bench_mod._build_tanet
    engine, cfg = build(16, 224, 101, 2, BENCH_DTYPE)
    T, HW, K, V = 16, 224, 101, 2

    rng = jax.random.PRNGKey(0)
    gen = np.random.default_rng(0)
    results = {}
    infeasible = {}
    for s in STREAM_COUNTS:
        step = jax.jit(jax.vmap(engine._adapt_eval_impl))
        state0 = engine.init_state()
        state = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x[None], (s,) + x.shape), state0)
        views = jnp.asarray(gen.normal(size=(s, V, T, HW, HW, 3))
                            .astype(np.float32))
        clips = jnp.asarray(gen.normal(size=(s, 1, T, HW, HW, 3))
                            .astype(np.float32))
        labels = jnp.zeros((s, 1), jnp.int32)
        keys = jax.random.split(rng, s)
        try:
            for i in range(N_WARMUP):
                state, m = step(state, views, clips, labels, keys)
            float(jnp.sum(m.loss_reg))  # VALUE fetch: scalar block_until_ready can return early through the tunnel (see baselines bench probe)
            t0 = time.perf_counter()
            for i in range(N_STEPS):
                state, m = step(state, views, clips, labels, keys)
            float(jnp.sum(m.loss_reg))  # VALUE fetch (ditto)
        except Exception as e:  # compile-time VMEM overflow etc. — an
            # infeasible packing is a bench RESULT, not a bench crash
            # (observed: Swin-B bf16 S=2, the vmapped batched-weight
            # LN-MLP backward exceeds VMEM 144.6M/128M — batching
            # double-buffers weight windows beyond the unbatched tile
            # model)
            msg = str(e).split("\n")[0][:200]
            infeasible[s] = msg
            print(f"S={s}: INFEASIBLE — {msg}")
            continue
        ms = 1000.0 * (time.perf_counter() - t0) / N_STEPS
        results[s] = ms
        print(f"S={s}: {ms:.1f} ms/step  "
              f"({ms / s:.1f} ms/stream, "
              f"{results[1] * s / ms:.2f}x throughput vs {s} sequential)"
              if 1 in results else f"S={s}: {ms:.1f} ms/step")

    gate = results.get(2, 1e9) <= 1.33 * results.get(1, 0)
    print(json.dumps({
        "model": BENCH_MODEL, "dtype": BENCH_DTYPE,
        "ms_per_step": {str(k): round(v, 2) for k, v in results.items()},
        "infeasible": infeasible,
        "pack2_recommended": bool(gate),
    }))


if __name__ == "__main__":
    main()
