#!/usr/bin/env python
"""End-to-end stream throughput: pre-decoded frames + native transforms +
prefetch + jitted adapt+eval, videos/sec (the pipeline the canonical
bench.py isolates to the device step).

NB on tunneled-TPU dev environments (axon): per-call dispatch/transfer
latency over the tunnel (~130 ms/video H2D measured vs ~1 ms on a real
PCIe-attached host) dominates this number — treat it as a pipeline
correctness exercise there, and use bench.py (device-side step latency)
as the hardware metric.

  PYTHONPATH=. python benchmarks/stream_bench.py [n_videos] [dtype]
"""

import dataclasses
import json
import sys
import time

import numpy as np


def main(n_videos: int = 16, dtype: str = "float32"):
    import jax
    import jax.numpy as jnp
    from vitta_tpu.adapt.engine import VittaEngine, flatten_taps
    from vitta_tpu.adapt.loops import tta_stream
    from vitta_tpu.config import tanet_ucf101_preset
    from vitta_tpu.data.dataset import PairedTTADataset
    from vitta_tpu.data.pipeline import Prefetcher
    from vitta_tpu.data.records import VideoRecord
    from vitta_tpu.data.video_reader import SyntheticVideoSource
    from vitta_tpu.models.tanet import TANet

    T, HW, K, V = 16, 224, 101, 2
    cfg = tanet_ucf101_preset()
    cfg = cfg.replace(data=dataclasses.replace(cfg.data, clip_length=T))
    model = TANet(num_classes=K, clip_length=T, dtype=dtype)
    rng = jax.random.PRNGKey(0)
    x0 = jnp.zeros((V, T, HW, HW, 3), jnp.float32)
    init_fn = jax.jit(lambda r, x: model.init(
        {"params": r, "dropout": r}, x, train=False))
    variables = init_fn(rng, x0)
    variables = {"params": variables["params"],
                 "batch_stats": variables["batch_stats"]}
    _, aux = jax.jit(lambda v, x: model.apply(
        v, x, train=False, mutable=["taps"]))(variables, x0 + 0.1)
    src = {n: (np.asarray(s.mean), np.asarray(s.var))
           for n, s in flatten_taps(aux["taps"]).items()
           if "g_bn" not in n and "l_bn" not in n}
    engine = VittaEngine(model, cfg, variables, src)

    # pre-decode synthetic videos to mmap'd .npy: the benchmark measures
    # transforms + prefetch + H2D + device step (decode is decord's job in
    # production and the synthetic generator's trig loops are artificial)
    import os
    import tempfile
    from vitta_tpu.data.video_reader import NpyVideoSource
    tmp = tempfile.mkdtemp(prefix="vitta_bench_")
    gen = SyntheticVideoSource(height=240, width=320, frames_per_video=120)
    records = [VideoRecord(f"v{i}", 100 + i, i % K) for i in range(n_videos)]
    for r in records:
        np.save(os.path.join(tmp, f"{r.path}.npy"),
                gen.get_batch(r.path, np.arange(r.num_frames)))
    vsrc = NpyVideoSource(tmp)
    paired = PairedTTADataset(cfg, vsrc, records, emit_uint8=True)

    # warm up compile + pipeline
    state = engine.init_state()
    v0, c0, l0 = paired[0]
    state, m = engine.adapt_eval_step(state, jnp.asarray(v0), jnp.asarray(c0),
                                      jnp.asarray(l0), rng)
    jax.block_until_ready(m.loss_reg)

    t0 = time.perf_counter()
    result, state, meters = tta_stream(
        engine, Prefetcher(paired, prefetch=3, device_put=True),
        seed=0, state=state)
    elapsed = time.perf_counter() - t0
    print(json.dumps({
        "metric": "tanet_stream_end_to_end",
        "value": round(n_videos / elapsed, 3),
        "unit": "videos/sec",
        "dtype": dtype,
        "note": "pre-decoded frames; incl. transforms+H2D+adapt on 1 host core",
    }))


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    d = sys.argv[2] if len(sys.argv) > 2 else "float32"
    main(n, d)
