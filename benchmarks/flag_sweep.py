"""Sequentially measure bench.py under perf-flag configurations.

Each configuration runs in a fresh subprocess (the flags are read at
trace time, so a new process per config guarantees a clean trace) and
appends one JSON line to the output file.  Used to burn down the
"pending a TPU measurement window" list in benchmarks/PERF.md: every
flag-gated perf variant gets measured in isolation against the
committed stack before being flipped default-on.

Usage:  python benchmarks/flag_sweep.py [out.jsonl] < configs come from
CONFIGS below; edit there, not via argv, so the run is reproducible
from the file alone.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

# (name, env) — env is merged over os.environ for the child process.
CONFIGS = [
    # the committed default stack (proj-fused attention, LN->MLP
    # prologue, half param twin): the control every flag row compares to
    ("swin_bf16_base", {
        "BENCH_MODEL": "swin", "BENCH_DTYPE": "bfloat16"}),
    # escape hatches OFF the committed defaults — each must measure
    # WORSE than base or the default flips
    ("swin_bf16_no_proj_fusion", {
        "BENCH_MODEL": "swin", "BENCH_DTYPE": "bfloat16",
        "VITTA_ATTN_NO_PROJ": "1"}),
    ("swin_bf16_no_half_twin", {
        "BENCH_MODEL": "swin", "BENCH_DTYPE": "bfloat16",
        "VITTA_NO_HALF_TWIN": "1"}),
    # default-off candidates, each in isolation over base
    ("swin_bf16_attn_ln", {
        "BENCH_MODEL": "swin", "BENCH_DTYPE": "bfloat16",
        "VITTA_ATTN_LN": "1"}),
    ("swin_bf16_window_resident", {
        "BENCH_MODEL": "swin", "BENCH_DTYPE": "bfloat16",
        "VITTA_WINDOW_RESIDENT": "1"}),
    ("swin_bf16_uint8_base", {
        "BENCH_MODEL": "swin", "BENCH_DTYPE": "bfloat16",
        "BENCH_UINT8": "1"}),
    ("swin_bf16_uint8_patchify", {
        "BENCH_MODEL": "swin", "BENCH_DTYPE": "bfloat16",
        "BENCH_UINT8": "1", "VITTA_PATCHIFY": "1"}),
    ("swin_bf16_bf16_momentum", {
        "BENCH_MODEL": "swin", "BENCH_DTYPE": "bfloat16",
        "VITTA_BF16_MOMENTUM": "1"}),
]

# Round-4 second pass: combinations of the winners from the isolated
# sweep above (window_resident −2.0 ms, attn_ln −1.2, no_proj −1.3;
# attn_ln routes to the LN+proj-fused kernel, so it composes with
# window_resident but supersedes no_proj).
COMBO_CONFIGS = [
    ("swin_bf16_wr_noproj", {
        "BENCH_MODEL": "swin", "BENCH_DTYPE": "bfloat16",
        "VITTA_WINDOW_RESIDENT": "1", "VITTA_ATTN_NO_PROJ": "1"}),
    ("swin_bf16_wr_attnln", {
        "BENCH_MODEL": "swin", "BENCH_DTYPE": "bfloat16",
        "VITTA_WINDOW_RESIDENT": "1", "VITTA_ATTN_LN": "1"}),
    ("swin_bf16_wr_attnln_uint8", {
        "BENCH_MODEL": "swin", "BENCH_DTYPE": "bfloat16",
        "VITTA_WINDOW_RESIDENT": "1", "VITTA_ATTN_LN": "1",
        "BENCH_UINT8": "1"}),
]


# Round-5 pass: trace-driven candidates from the Swin bf16 speed-of-light
# analysis (benchmarks/PERF.md round-5 section) — the in-model
# pattern-proof patchify (kills the patch-embed conv + its pathological
# input relayout, ~3.9 ms pool) and the compact Toeplitz bias (kills the
# bias expansion/collapse kernels + the dense (nh,N,N) HBM round trips,
# ~3 ms pool; also re-fits stage-4 f32 onto the packed kernel) — each in
# isolation, combined, on the uint8 production wire, and at fp32.
R5_CONFIGS = [
    ("swin_bf16_base_r5", {
        "BENCH_MODEL": "swin", "BENCH_DTYPE": "bfloat16"}),
    ("swin_bf16_patchify_v2", {
        "BENCH_MODEL": "swin", "BENCH_DTYPE": "bfloat16",
        "VITTA_PATCHIFY_V2": "1"}),
    # measured 56.38 vs 45.88: global compact bias REJECTED (the
    # in-kernel assembly re-runs per window); it survives as the
    # automatic stage-4-f32 overflow route (prefer_compact_bias)
    ("swin_bf16_compact_bias", {
        "BENCH_MODEL": "swin", "BENCH_DTYPE": "bfloat16",
        "VITTA_COMPACT_BIAS": "1"}),
    ("swin_bf16_v2_uint8", {
        "BENCH_MODEL": "swin", "BENCH_DTYPE": "bfloat16",
        "VITTA_PATCHIFY_V2": "1", "BENCH_UINT8": "1"}),
    # fp32 (the accuracy-parity configuration; round-4 defaults were
    # validated on bf16 only — VERDICT r4 item 4).  The r5 rows also
    # exercise the automatic stage-4 compact-bias packed route.
    ("swin_fp32_base_r5", {
        "BENCH_MODEL": "swin", "BENCH_DTYPE": "float32"}),
    ("swin_fp32_v2", {
        "BENCH_MODEL": "swin", "BENCH_DTYPE": "float32",
        "VITTA_PATCHIFY_V2": "1"}),
    ("tanet_fp32_base_r5", {
        "BENCH_MODEL": "tanet", "BENCH_DTYPE": "float32"}),
    ("tanet_bf16_base_r5", {
        "BENCH_MODEL": "tanet", "BENCH_DTYPE": "bfloat16"}),
]


# Round-5b pass: the software-pipelined attention head loop
# (VITTA_ATTN_PIPE, ops/dispatch.py) — motivated by the slope-timed
# backward ablation (results/attn_bwd_micro_r5.jsonl: sequential order
# measured matmuls + the whole VPU chain additively; the reorder won
# -29%/-27% on stages 0/1).  Controls re-run alongside so drift can't
# fake a win.
R5B_CONFIGS = [
    ("swin_bf16_ctl_r5b", {
        "BENCH_MODEL": "swin", "BENCH_DTYPE": "bfloat16",
        "VITTA_ATTN_PIPE": "0"}),
    ("swin_bf16_attn_pipe", {
        "BENCH_MODEL": "swin", "BENCH_DTYPE": "bfloat16",
        "VITTA_ATTN_PIPE": "1"}),
    ("swin_fp32_ctl_r5b", {
        "BENCH_MODEL": "swin", "BENCH_DTYPE": "float32",
        "VITTA_ATTN_PIPE": "0"}),
    ("swin_fp32_attn_pipe", {
        "BENCH_MODEL": "swin", "BENCH_DTYPE": "float32",
        "VITTA_ATTN_PIPE": "1"}),
]


# Round-5c pass: the software-pipelined LN-MLP kernels (VITTA_MLP_PIPE
# — same additive-VPU motivation as r5b), alone and composed with the
# attention pipe, at both dtypes.
R5C_CONFIGS = [
    ("swin_bf16_mlp_pipe", {
        "BENCH_MODEL": "swin", "BENCH_DTYPE": "bfloat16",
        "VITTA_ATTN_PIPE": "0", "VITTA_MLP_PIPE": "1"}),
    ("swin_bf16_both_pipe", {
        "BENCH_MODEL": "swin", "BENCH_DTYPE": "bfloat16",
        "VITTA_ATTN_PIPE": "1", "VITTA_MLP_PIPE": "1"}),
    ("swin_fp32_both_pipe", {
        "BENCH_MODEL": "swin", "BENCH_DTYPE": "float32",
        "VITTA_ATTN_PIPE": "1", "VITTA_MLP_PIPE": "1"}),
]


def run_one(name: str, env_overrides: dict, out_path: str,
            timeout_s: int = 5400) -> dict:
    env = dict(os.environ)
    env.update(env_overrides)
    t0 = time.time()
    try:
        proc = subprocess.run(
            [sys.executable, "bench.py"], env=env, timeout=timeout_s,
            capture_output=True, text=True)
        rc, tail = proc.returncode, proc.stdout.strip().splitlines()
    except subprocess.TimeoutExpired:
        rc, tail = -9, ["TIMEOUT"]
    rec = {"name": name, "env": env_overrides, "rc": rc,
           "wall_s": round(time.time() - t0, 1)}
    parsed = None
    for line in reversed(tail):
        try:
            parsed = json.loads(line)
            break
        except (json.JSONDecodeError, ValueError):
            continue
    rec["result"] = parsed
    if parsed is None:
        rec["tail"] = tail[-3:]
        rec["stderr_tail"] = (proc.stderr.strip().splitlines()[-15:]
                              if rc != -9 else ["TIMEOUT"])
    with open(out_path, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)
    return rec


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/flag_sweep.jsonl"
    configs = CONFIGS
    if "--combos" in sys.argv:
        configs = COMBO_CONFIGS
    elif "--r5" in sys.argv:
        configs = R5_CONFIGS
    elif "--r5b" in sys.argv:
        configs = R5B_CONFIGS
    elif "--r5c" in sys.argv:
        configs = R5C_CONFIGS
    only = [a for a in sys.argv[2:] if not a.startswith("-")]
    if only:
        configs = [(n, e) for n, e in configs if n in only]
    for name, env in configs:
        run_one(name, env, out_path)


if __name__ == "__main__":
    main()
