"""Benchmark: per-video ViTTA adaptation latency on one TPU chip.

Operating point = the reference's live configuration
(utils/opts.py:89,96,99,108-109; corpus/basics.py:403-747): batch of 1
video, 2 augmented views x 16 frames, hooks on layer3/layer4 BNs (resp.
Swin layers.2/3 + norm), 1 SGD step, then inference on a deterministic
clip.  The measured unit is one full adapt+eval step — what the
reference times in its ``batch_time`` meter (basics.py:715-716).

Default (no env vars): measures ALL FOUR production configurations —
(tanet|swin) x (fp32|bf16) — printing one JSON line per configuration
as it completes, headline (tanet fp32, the accuracy-parity config)
first, and a final combined line that repeats the headline fields with
an ``all`` array so a single-line parser sees every row too.

Single-config mode (used by benchmarks/flag_sweep.py for flag
isolation):
  BENCH_MODEL=tanet|swin      architecture
  BENCH_DTYPE=float32|bfloat16  compute dtype
Other knobs:
  BENCH_E2E=1                 include host pipeline: synthetic decode +
                              crop/normalize via the C++ kernels + H2D,
                              prefetch-overlapped (uint8 on the wire,
                              normalize fused into the jitted step)
  BENCH_UINT8=1               device-resident *uint8* input pools (the
                              production live-TTA wire format)
  BENCH_PROFILE=<dir>         capture a jax.profiler trace of the timed
                              loop into <dir>
  BENCH_REF_CPU=1             additionally time the reference's own
                              ``tta_standard`` per-video step on this
                              host's CPU (torch; needs /root/reference)
                              as a measured anchor next to the estimate

The headline numbers are **measured**: ms/video, the step's analytic
FLOP count (unoptimized-HLO cost analysis of a kernel-free CPU twin of
the same step — benchmarks/flops_twin.py; the compiled executable's
analysis cannot see inside Pallas custom calls), achieved TFLOP/s, and
the fraction of the chip's bf16 peak (roofline).  ``vs_baseline`` is
kept for the driver but is an ESTIMATE: the reference repo publishes no
numbers (BASELINE.md) and this environment has no GPU to measure it on;
the constant below is a documented guess at the reference's per-video
latency on its single-GPU setup (~470 GFLOPs/step at typical fp32
utilization plus per-layer Python hook overhead).  The measured CPU
anchor (``reference_cpu_ms_measured``, cached in
benchmarks/ref_cpu_anchor.json once BENCH_REF_CPU=1 has run) is the
reference's own loop timed at the real operating point on this host.
"""

import dataclasses
import gc
import json
import os
import time

import numpy as np

ASSUMED_REFERENCE_MS_PER_VIDEO = 250.0  # est. reference (single V100-class GPU)
ASSUMED_REFERENCE_SWIN_MS_PER_VIDEO = 400.0  # Swin-B step is ~2.3x TANet FLOPs
PEAK_BF16_TFLOPS = 197.0  # TPU v5e per-chip bf16 peak (public spec)

N_WARMUP = int(os.environ.get("BENCH_N_WARMUP", "5"))
# tunnel dispatch adds +-1-4 ms of noise; average it down
N_VIDEOS = int(os.environ.get("BENCH_N_VIDEOS", "64"))
BENCH_MODEL = os.environ.get("BENCH_MODEL", "")
BENCH_DTYPE = os.environ.get("BENCH_DTYPE", "")
BENCH_E2E = os.environ.get("BENCH_E2E", "") == "1"
BENCH_PROFILE = os.environ.get("BENCH_PROFILE", "")
# BENCH_UINT8=1: device-resident *uint8* input pools (the production live
# TTA wire format — normalize fuses into the step; required to exercise
# VITTA_PATCHIFY's pre-normalize unfold on the real input dtype)
BENCH_UINT8 = os.environ.get("BENCH_UINT8", "") == "1"
BENCH_REF_CPU = os.environ.get("BENCH_REF_CPU", "") == "1"

_ANCHOR_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "benchmarks", "ref_cpu_anchor.json")


def _build_tanet(T, HW, K, V, dtype):
    import jax
    import jax.numpy as jnp
    from vitta_tpu.adapt.engine import VittaEngine, flatten_taps
    from vitta_tpu.config import tanet_ucf101_preset
    from vitta_tpu.models.tanet import TANet

    cfg = tanet_ucf101_preset()
    cfg = cfg.replace(data=dataclasses.replace(cfg.data, clip_length=T))
    model = TANet(num_classes=K, clip_length=T, dtype=dtype)
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


def _build_swin(T, HW, K, V, dtype):
    import jax
    import jax.numpy as jnp
    from vitta_tpu.adapt.engine import VittaEngine, flatten_taps
    from vitta_tpu.config import swin_ucf101_preset
    from vitta_tpu.models.swin import Recognizer3D

    cfg = swin_ucf101_preset()
    cfg = cfg.replace(data=dataclasses.replace(cfg.data, clip_length=T))
    # full Swin-B (embed 128, depths 2,2,18,2) at the reference operating
    # point (tta_swin_ucf101.py:27-40)
    model = Recognizer3D(num_classes=K, drop_path_rate=0.0, dtype=dtype)
    rng = jax.random.PRNGKey(0)
    x0 = jnp.zeros((V, T, HW, HW, 3),
                   jnp.bfloat16 if dtype == "bfloat16" else jnp.float32)
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


def _flops_twin(model_name, dtype):
    """Analytic step FLOPs from a kernel-free CPU twin (subprocess: the
    in-process backend is pinned to the TPU plugin).  Cached per config
    — the twin's HLO is deterministic, and the CPU lowering is minutes
    of work we should pay once, not once per flag configuration."""
    cache_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "benchmarks", "flops_cache.json")
    key = f"{model_name}_{dtype}"
    cache = {}
    try:
        with open(cache_path) as f:
            cache = json.load(f)
    except (OSError, ValueError):
        pass
    if key in cache:
        return cache[key] / 1e12
    import subprocess
    import sys
    twin = subprocess.run(
        [sys.executable,
         os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "benchmarks", "flops_twin.py"),
         model_name, dtype],
        capture_output=True, text=True, timeout=1800, check=True)
    flops = json.loads(twin.stdout.strip().splitlines()[-1])["flops"]
    cache[key] = flops
    try:
        with open(cache_path, "w") as f:
            json.dump(cache, f, indent=1)
    except OSError:
        pass
    return flops / 1e12


def run_config(model_name: str, dtype: str) -> dict:
    """Measure one (arch, dtype) configuration; returns the result row."""
    import jax
    import jax.numpy as jnp

    T, K, V = 16, 101, 2
    HW = 224
    if model_name == "swin":
        engine, cfg = _build_swin(T, HW, K, V, dtype)
        metric = "swin_ucf101c_tta_adapt_eval_latency"
        assumed = ASSUMED_REFERENCE_SWIN_MS_PER_VIDEO
    else:
        engine, cfg = _build_tanet(T, HW, K, V, dtype)
        metric = "tanet_ucf101c_tta_adapt_eval_latency"
        assumed = ASSUMED_REFERENCE_MS_PER_VIDEO
    if dtype == "bfloat16":
        metric += "_bf16"

    rng = jax.random.PRNGKey(0)
    state = engine.init_state()

    if BENCH_E2E:
        from vitta_tpu.data.pipeline import Prefetcher
        metric += "_e2e"
        data = _SyntheticPaired(cfg, N_WARMUP + N_VIDEOS, V, T, HW, model_name)
        it = iter(Prefetcher(data, prefetch=4, device_put=True,
                             n_workers=max(2, cfg.data.num_workers)))
        for i in range(N_WARMUP):
            views, clip, label = next(it)
            state, m = engine.adapt_eval_step(state, views, clip, label,
                                              jax.random.fold_in(rng, i))
        float(jnp.sum(m.loss_reg))  # VALUE fetch: scalar block_until_ready can return early through the tunnel (see baselines bench probe)
        start = time.perf_counter()
        n_done = 0
        for views, clip, label in it:
            state, m = engine.adapt_eval_step(
                state, views, clip, label,
                jax.random.fold_in(rng, 100 + n_done))
            n_done += 1
        float(jnp.sum(m.loss_reg))  # VALUE fetch: scalar block_until_ready can return early through the tunnel (see baselines bench probe)
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
        float(jnp.sum(m.loss_reg))  # VALUE fetch: scalar block_until_ready can return early through the tunnel (see baselines bench probe)

        ctx = None
        if BENCH_PROFILE:
            ctx = jax.profiler.trace(BENCH_PROFILE)
            ctx.__enter__()
        start = time.perf_counter()
        for i in range(N_VIDEOS):
            state, m = engine.adapt_eval_step(
                state, views_pool[i % n_distinct], clips_pool[i % n_distinct],
                labels, jax.random.fold_in(rng, 100 + i))
        float(jnp.sum(m.loss_reg))  # VALUE fetch: scalar block_until_ready can return early through the tunnel (see baselines bench probe)
        elapsed = time.perf_counter() - start
        if ctx is not None:
            ctx.__exit__(None, None, None)
        ms_per_video = 1000.0 * elapsed / N_VIDEOS

    out = {
        "metric": metric,
        "value": round(ms_per_video, 3),
        "unit": "ms/video",
        # labeled estimate — no published/measurable reference number
        # exists in this environment (see module docstring)
        "vs_baseline": round(assumed / ms_per_video, 3),
    }
    # measured efficiency: the step's analytic FLOPs divided by the
    # measured time, against the chip's bf16 peak.  The count comes from
    # a CPU-backend twin of the same step (benchmarks/flops_twin.py):
    # unoptimized-HLO cost analysis of the identical math with the
    # kernel auto-gates off.  Neither the tunneled TPU's client (no HLO
    # analysis implemented) nor the compiled executable's analysis
    # (cannot see inside Pallas custom calls) can produce this number.
    try:
        step_tflop = _flops_twin(model_name, dtype)
    except Exception as e:  # diagnostic only — the timing result stands
        import sys
        print(f"flop accounting failed: {type(e).__name__}: {e}",
              file=sys.stderr)
        step_tflop = None
    if step_tflop:
        achieved = step_tflop / (ms_per_video / 1000.0)
        out["step_tflop"] = round(step_tflop, 4)
        out["achieved_tflops"] = round(achieved, 2)
        out["pct_bf16_roofline"] = round(100.0 * achieved / PEAK_BF16_TFLOPS, 2)
        out["vs_baseline_is_estimate"] = True
    anchor = _ref_cpu_anchor(model_name)
    if anchor:
        out["reference_cpu_ms_measured"] = anchor
    return out


def _ref_cpu_anchor(model_name: str):
    """Measured per-video latency of the reference's own ``tta_standard``
    step (torch, this host's CPU, real operating point) — a second,
    *measured* anchor next to the GPU estimate.  Produced by
    ``BENCH_REF_CPU=1 python bench.py`` (runs the reference loop via the
    dispatch-parity rig, benchmarks/ref_cpu_bench.py) and cached in
    benchmarks/ref_cpu_anchor.json; reads the cache otherwise."""
    try:
        with open(_ANCHOR_PATH) as f:
            cached = json.load(f)
    except (OSError, ValueError):
        cached = {}
    if not BENCH_REF_CPU:
        return cached.get(model_name)
    if model_name in cached:
        return cached[model_name]
    import subprocess
    import sys
    try:
        proc = subprocess.run(
            [sys.executable,
             os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "benchmarks", "ref_cpu_bench.py"), model_name],
            capture_output=True, text=True, timeout=7200, check=True)
        rec = json.loads(proc.stdout.strip().splitlines()[-1])
    except Exception as e:
        print(f"reference CPU anchor failed: {type(e).__name__}: {e}",
              file=__import__("sys").stderr)
        return None
    cached[model_name] = rec["ms_per_video"]
    try:
        with open(_ANCHOR_PATH, "w") as f:
            json.dump(cached, f, indent=1)
    except OSError:
        pass
    return cached[model_name]


def main():
    from vitta_tpu.cli.opts import enable_compile_cache
    enable_compile_cache()

    if BENCH_MODEL or BENCH_DTYPE:
        # single-config mode (flag sweeps, profiling)
        row = run_config(BENCH_MODEL or "tanet", BENCH_DTYPE or "float32")
        print(json.dumps(row), flush=True)
        return

    # default: all four production configurations, headline first
    configs = [("tanet", "float32"), ("tanet", "bfloat16"),
               ("swin", "bfloat16"), ("swin", "float32")]
    rows = []
    for model_name, dtype in configs:
        try:
            row = run_config(model_name, dtype)
        except Exception as e:
            row = {"metric": f"{model_name}_{dtype}_FAILED",
                   "error": f"{type(e).__name__}: {e}"}
        rows.append(row)
        print(json.dumps(row), flush=True)
        gc.collect()
    # combined line: headline fields + every row, for single-line parsers
    combined = dict(rows[0])
    combined["all"] = rows
    print(json.dumps(combined), flush=True)


if __name__ == "__main__":
    main()
