"""Parse a jax.profiler perfetto trace: per-op on-device time.

Usage: python benchmarks/analyze_trace.py <profile_dir> [n_steps]

Collect a trace with ``BENCH_PROFILE=<profile_dir> python bench.py``
(the bench loop wraps its steps in ``jax.profiler.trace``), then point
this script at the directory.  It finds the newest ``*trace.json.gz``,
sums XLA op durations on the TPU device track ("XLA Ops" threads),
groups by fusion class and by ``tf_op``, and prints the top lines plus
the total divided by ``n_steps`` — the trace-backed ms/step used
throughout ``benchmarks/PERF.md``.

Through the dev tunnel, tracing adds ~16 s/step of upload overhead:
keep profiled loops short (the 64-step bench profile run is ~17 min);
the *device-side* durations recorded in the trace remain accurate.
"""
import collections
import glob
import gzip
import json
import re
import sys

d = sys.argv[1]
n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 64
paths = sorted(glob.glob(d + "/**/*trace.json.gz", recursive=True))
assert paths, f"no perfetto trace under {d}"
with gzip.open(paths[-1], "rt") as f:
    data = json.load(f)

events = data["traceEvents"] if isinstance(data, dict) else data

# map pid/tid -> names
pid_name, tid_name = {}, {}
for e in events:
    if e.get("ph") == "M":
        if e.get("name") == "process_name":
            pid_name[e["pid"]] = e["args"]["name"]
        elif e.get("name") == "thread_name":
            tid_name[(e["pid"], e["tid"])] = e["args"]["name"]

dev_pids = {p for p, n in pid_name.items()
            if "TPU" in n and "pjrt" not in n.lower()}
op_tids = {k for k, n in tid_name.items() if "XLA Ops" in n}

tot = 0.0
by_op = collections.Counter()
by_cat = collections.Counter()
cnt = collections.Counter()
for e in events:
    if e.get("ph") != "X":
        continue
    if e["pid"] not in dev_pids or (e["pid"], e["tid"]) not in op_tids:
        continue
    dur = e.get("dur", 0) / 1e3  # us -> ms
    tot += dur
    name = e.get("name", "?")
    args = e.get("args", {})
    op = args.get("tf_op") or args.get("long_name") or name
    by_op[op] += dur
    cnt[op] += 1
    # category: fusion kind / op class
    base = re.sub(r"[.\d]+$", "", name)
    by_cat[base] += dur

print(f"trace: {paths[-1]}")
print(f"total on-device: {tot:.1f} ms over {n_steps} steps "
      f"=> {tot / n_steps:.2f} ms/step")
print("\n== top op classes ==")
for k, v in by_cat.most_common(25):
    print(f"{v / n_steps:8.3f} ms/step  {k}")
print("\n== top named ops ==")
for k, v in by_op.most_common(40):
    print(f"{v / n_steps:8.3f} ms/step  x{cnt[k] // max(n_steps,1):4d}  {k[:130]}")
