"""Benchmark: per-video ViTTA adaptation latency on one TPU chip.

Operating point = the reference's live configuration
(utils/opts.py:89,96,99,108-109; corpus/basics.py:403-747): batch of 1
video, 2 augmented views x 16 frames, hooks on layer3/layer4 BNs (resp.
Swin layers.2/3 + norm), 1 SGD step, then inference on a deterministic
clip.  The measured unit is one full adapt+eval step — what the
reference times in its ``batch_time`` meter (basics.py:715-716).

Modes (env vars; the default prints the driver's headline metric):
  BENCH_MODEL=tanet|swin      architecture (default tanet)
  BENCH_DTYPE=float32|bfloat16  compute dtype (default float32)
  BENCH_E2E=1                 include host pipeline: synthetic decode +
                              crop/normalize via the C++ kernels + H2D,
                              prefetch-overlapped (uint8 on the wire,
                              normalize fused into the jitted step)
  BENCH_PROFILE=<dir>         capture a jax.profiler trace of the timed
                              loop into <dir>

The headline numbers are **measured**: ms/video, the step's analytic
FLOP count (unoptimized-HLO cost analysis of a kernel-free CPU twin of
the same step — benchmarks/flops_twin.py; the compiled executable's
analysis cannot see inside Pallas custom calls), achieved TFLOP/s, and
the fraction of the chip's bf16 peak (roofline).  ``vs_baseline`` is kept for the driver but
is an ESTIMATE: the reference repo publishes no numbers (BASELINE.md)
and this environment has no GPU to measure it on; the constant below is
a documented guess at the reference's per-video latency on its
single-GPU setup (~470 GFLOPs/step at typical fp32 utilization plus
per-layer Python hook overhead).
"""

import dataclasses
import json
import os
import time

import numpy as np

ASSUMED_REFERENCE_MS_PER_VIDEO = 250.0  # est. reference (single V100-class GPU)
ASSUMED_REFERENCE_SWIN_MS_PER_VIDEO = 400.0  # Swin-B step is ~2.3x TANet FLOPs
PEAK_BF16_TFLOPS = 197.0  # TPU v5e per-chip bf16 peak (public spec)

N_WARMUP = 5
N_VIDEOS = 64   # tunnel dispatch adds +-1-4 ms of noise; average it down
BENCH_MODEL = os.environ.get("BENCH_MODEL", "tanet")
BENCH_DTYPE = os.environ.get("BENCH_DTYPE", "float32")
BENCH_E2E = os.environ.get("BENCH_E2E", "") == "1"
BENCH_PROFILE = os.environ.get("BENCH_PROFILE", "")
# BENCH_UINT8=1: device-resident *uint8* input pools (the production live
# TTA wire format — normalize fuses into the step; required to exercise
# VITTA_PATCHIFY's pre-normalize unfold on the real input dtype)
BENCH_UINT8 = os.environ.get("BENCH_UINT8", "") == "1"


def _build_tanet(T, HW, K, V):
    import jax
    import jax.numpy as jnp
    from vitta_tpu.adapt.engine import VittaEngine, flatten_taps
    from vitta_tpu.config import tanet_ucf101_preset
    from vitta_tpu.models.tanet import TANet

    cfg = tanet_ucf101_preset()
    cfg = cfg.replace(data=dataclasses.replace(cfg.data, clip_length=T))
    model = TANet(num_classes=K, clip_length=T, dtype=BENCH_DTYPE)
    rng = jax.random.PRNGKey(0)
    x0 = jnp.zeros((V, T, HW, HW, 3), jnp.float32)
    # jit everything incl. init: eager per-op dispatch is pathologically
    # slow on tunneled TPU backends
    init_fn = jax.jit(lambda r, x: model.init(
        {"params": r, "dropout": r}, x, train=False))
    variables = init_fn(rng, x0)
    variables = {"params": variables["params"],
                 "batch_stats": variables["batch_stats"]}
    tapped_fwd = jax.jit(lambda v, x: model.apply(
        v, x, train=False, mutable=["taps"]))
    _, aux = tapped_fwd(variables, x0 + 0.1)
    src = {n: (np.asarray(s.mean), np.asarray(s.var))
           for n, s in flatten_taps(aux["taps"]).items()
           if "g_bn" not in n and "l_bn" not in n}
    return VittaEngine(model, cfg, variables, src), cfg


def _build_swin(T, HW, K, V):
    import jax
    import jax.numpy as jnp
    from vitta_tpu.adapt.engine import VittaEngine, flatten_taps
    from vitta_tpu.config import swin_ucf101_preset
    from vitta_tpu.models.swin import Recognizer3D

    cfg = swin_ucf101_preset()
    cfg = cfg.replace(data=dataclasses.replace(cfg.data, clip_length=T))
    # full Swin-B (embed 128, depths 2,2,18,2) at the reference operating
    # point (tta_swin_ucf101.py:27-40)
    model = Recognizer3D(num_classes=K, drop_path_rate=0.0,
                         dtype=BENCH_DTYPE)
    rng = jax.random.PRNGKey(0)
    x0 = jnp.zeros((V, T, HW, HW, 3),
                   jnp.bfloat16 if BENCH_DTYPE == "bfloat16" else jnp.float32)
    init_fn = jax.jit(lambda r, x: model.init(
        {"params": r, "dropout": r}, x, train=False))
    variables = init_fn(rng, x0)
    variables = {"params": variables["params"], "batch_stats": {}}
    tapped_fwd = jax.jit(lambda v, x: model.apply(
        v, x, train=False, mutable=["taps"]))
    _, aux = tapped_fwd(variables, x0 + 0.1)
    src = {n: (np.asarray(s.mean, np.float32), np.asarray(s.var, np.float32))
           for n, s in flatten_taps(aux["taps"]).items()}
    return VittaEngine(model, cfg, variables, src), cfg


class _SyntheticPaired:
    """Host-side work per video: synthetic uint8 'decoded' frames +
    the real sampler/crop path, emitting uint8 (normalize fuses into the
    jitted step, engine.py _maybe_normalize)."""

    def __init__(self, cfg, n, V, T, HW, arch):
        from vitta_tpu.data.dataset import PairedTTADataset, dataset_cls_for
        from vitta_tpu.data.records import VideoRecord
        from vitta_tpu.data.video_reader import SyntheticVideoSource

        records = [VideoRecord(f"v{i}", 96, i % 7) for i in range(n)]
        src = SyntheticVideoSource(height=HW + 32, width=HW + 48)
        self.ds = PairedTTADataset(cfg, src, records,
                                   dataset_cls=dataset_cls_for(arch),
                                   emit_uint8=True)

    def __len__(self):
        return len(self.ds)

    def __getitem__(self, i):
        return self.ds[i]


def main():
    import jax
    import jax.numpy as jnp
    from vitta_tpu.cli.opts import enable_compile_cache
    enable_compile_cache()

    T, K, V = 16, 101, 2
    HW = 224
    if BENCH_MODEL == "swin":
        engine, cfg = _build_swin(T, HW, K, V)
        metric = "swin_ucf101c_tta_adapt_eval_latency"
        assumed = ASSUMED_REFERENCE_SWIN_MS_PER_VIDEO
    else:
        engine, cfg = _build_tanet(T, HW, K, V)
        metric = "tanet_ucf101c_tta_adapt_eval_latency"
        assumed = ASSUMED_REFERENCE_MS_PER_VIDEO

    rng = jax.random.PRNGKey(0)
    state = engine.init_state()

    if BENCH_E2E:
        from vitta_tpu.data.pipeline import Prefetcher
        metric += "_e2e"
        data = _SyntheticPaired(cfg, N_WARMUP + N_VIDEOS, V, T, HW, BENCH_MODEL)
        it = iter(Prefetcher(data, prefetch=4, device_put=True,
                             n_workers=max(2, cfg.data.num_workers)))
        for i in range(N_WARMUP):
            views, clip, label = next(it)
            state, m = engine.adapt_eval_step(state, views, clip, label,
                                              jax.random.fold_in(rng, i))
        jax.block_until_ready(m.loss_reg)
        start = time.perf_counter()
        n_done = 0
        for views, clip, label in it:
            state, m = engine.adapt_eval_step(
                state, views, clip, label,
                jax.random.fold_in(rng, 100 + n_done))
            n_done += 1
        jax.block_until_ready(m.loss_reg)
        elapsed = time.perf_counter() - start
        ms_per_video = 1000.0 * elapsed / n_done
    else:
        # pre-staged device-resident inputs: the honest device metric on a
        # tunneled backend (H2D over the tunnel has ~100 ms/call latency
        # that a real host-attached TPU does not pay)
        gen = np.random.default_rng(0)
        n_distinct = 4
        if BENCH_UINT8:
            views_pool = [jnp.asarray(gen.integers(
                0, 256, size=(V, T, HW, HW, 3), dtype=np.uint8))
                for _ in range(n_distinct)]
            clips_pool = [jnp.asarray(gen.integers(
                0, 256, size=(1, T, HW, HW, 3), dtype=np.uint8))
                for _ in range(n_distinct)]
        else:
            views_pool = [jnp.asarray(gen.normal(size=(V, T, HW, HW, 3))
                                      .astype(np.float32))
                          for _ in range(n_distinct)]
            clips_pool = [jnp.asarray(gen.normal(size=(1, T, HW, HW, 3))
                                      .astype(np.float32))
                          for _ in range(n_distinct)]
        labels = jnp.zeros((1,), jnp.int32)

        for i in range(N_WARMUP):
            state, m = engine.adapt_eval_step(
                state, views_pool[i % n_distinct], clips_pool[i % n_distinct],
                labels, jax.random.fold_in(rng, i))
        jax.block_until_ready(m.loss_reg)

        ctx = None
        if BENCH_PROFILE:
            ctx = jax.profiler.trace(BENCH_PROFILE)
            ctx.__enter__()
        start = time.perf_counter()
        for i in range(N_VIDEOS):
            state, m = engine.adapt_eval_step(
                state, views_pool[i % n_distinct], clips_pool[i % n_distinct],
                labels, jax.random.fold_in(rng, 100 + i))
        jax.block_until_ready(m.loss_reg)
        elapsed = time.perf_counter() - start
        if ctx is not None:
            ctx.__exit__(None, None, None)
        ms_per_video = 1000.0 * elapsed / N_VIDEOS

    # measured efficiency: the step's analytic FLOPs divided by the
    # measured time, against the chip's bf16 peak.  The count comes from
    # a CPU-backend twin of the same step (benchmarks/flops_twin.py,
    # subprocess: the in-process backend is pinned to the TPU plugin):
    # unoptimized-HLO cost analysis of the identical math with the
    # kernel auto-gates off.  Neither the tunneled TPU's client (no HLO
    # analysis implemented) nor the compiled executable's analysis
    # (cannot see inside Pallas custom calls) can produce this number.
    step_tflop = None
    try:
        import subprocess
        import sys
        twin = subprocess.run(
            [sys.executable,
             os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "benchmarks", "flops_twin.py"),
             BENCH_MODEL, BENCH_DTYPE],
            capture_output=True, text=True, timeout=900, check=True)
        step_tflop = json.loads(twin.stdout.strip().splitlines()[-1]
                                )["flops"] / 1e12
    except Exception as e:  # diagnostic only — the timing result stands
        import sys
        print(f"flop accounting failed: {type(e).__name__}: {e}",
              file=sys.stderr)

    out = {
        "metric": metric,
        "value": round(ms_per_video, 3),
        "unit": "ms/video",
        # labeled estimate — no published/measurable reference number
        # exists in this environment (see module docstring)
        "vs_baseline": round(assumed / ms_per_video, 3),
    }
    if step_tflop:
        achieved = step_tflop / (ms_per_video / 1000.0)
        out["step_tflop"] = round(step_tflop, 4)
        out["achieved_tflops"] = round(achieved, 2)
        out["pct_bf16_roofline"] = round(100.0 * achieved / PEAK_BF16_TFLOPS, 2)
        out["vs_baseline_is_estimate"] = True
    print(json.dumps(out))


if __name__ == "__main__":
    main()
