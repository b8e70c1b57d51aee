"""Subprocess worker for the 2-process ``run_parallel_sweep`` test.

Usage: python tests/_mp_sweep_worker.py <pid> <nproc> <port> <result_dir>
           <out_prefix> <phase>

Each process exposes 2 virtual CPU devices; after
``initialize_distributed`` the global mesh has 4 and the CLI driver's
parallel sweep (cli/drivers.py:run_parallel_sweep) runs with this
process addressing only its half of the stream axis — group splitting,
sweep state, and mid-stream checkpointing all under real multi-process
execution.

``phase``:
  kill    — stream_ckpt_every=1 and the process self-terminates right
            after the first mid-stream checkpoint commits (simulated
            preemption; exit code 3 tells the parent it was deliberate)
  resume  — same config plus --resume: restores the mid-stream state
            and finishes the sweep, writing the final per-corruption
            accuracies to <out_prefix>.<pid>
  plain   — uninterrupted run (no kill, no resume)
"""

import dataclasses
import json
import os
import sys


CORRUPTIONS = ["gauss", "contrast", "motion", "zoom"]
N_VIDEOS = 3


def build_cfg(result_dir: str, resume: bool):
    from vitta_tpu.cli.opts import get_opts

    argv = ["--clip_length", "2", "--input_size", "32", "--scale_size", "40",
            "--result_dir", result_dir, "--video_source", "synthetic",
            "--stat_reg", "BNS", "--n_parallel_streams", "4",
            "--stream_ckpt_every", "1"]
    if resume:
        argv.append("--resume")
    _, cfg = get_opts(argv)
    return cfg.replace(model=dataclasses.replace(cfg.model, num_classes=4))


def run_sweep(result_dir: str, resume: bool):
    from vitta_tpu.cli.drivers import run_parallel_sweep
    from vitta_tpu.data.records import VideoRecord

    cfg = build_cfg(result_dir, resume)
    records = [VideoRecord(f"v{i}", 40 + i, i % 4) for i in range(N_VIDEOS)]
    return run_parallel_sweep(cfg, CORRUPTIONS, source_kind="synthetic",
                              records=records)


def main():
    pid, nproc, port, result_dir, out, phase = (
        int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4],
        sys.argv[5], sys.argv[6])
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import jax

    jax.config.update("jax_platforms", "cpu")
    cache = os.environ.get("VITTA_JAX_CACHE",
                           os.path.expanduser("~/.cache/vitta_jax_cache"))
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from vitta_tpu.parallel.mesh import initialize_distributed

    n = initialize_distributed(f"localhost:{port}", nproc, pid)
    assert n == 2 * nproc, f"expected {2 * nproc} global devices, got {n}"

    if phase == "kill":
        # die right after the first mid-stream checkpoint COMMITS (the
        # primary's latest.json marker is written inside save()) — the
        # preemption the checkpoint protocol exists for
        from vitta_tpu.adapt import stream_ckpt

        real_save = stream_ckpt.StreamCheckpointer.save

        def save_then_die(self, state, next_bi, meters):
            real_save(self, state, next_bi, meters)
            # quiesce before dying: process 0 is also the jax.distributed
            # coordinator, so exiting the instant save() returns can kill
            # the coordination service while the OTHER worker is still
            # inside its save/step collectives — its GetKeyValue then
            # times out and it exits 1, not 3 (observed).  A real
            # preemption (SIGTERM broadcast) stops all hosts together;
            # the barrier models that.
            from vitta_tpu.parallel.mesh import coordination_barrier
            coordination_barrier("test-preempt")
            print(f"worker {pid}: simulated preemption after ckpt "
                  f"next_bi={next_bi}", flush=True)
            sys.stdout.flush()
            os._exit(3)

        stream_ckpt.StreamCheckpointer.save = save_then_die
        run_sweep(result_dir, resume=False)
        raise AssertionError("kill phase finished the sweep — the "
                             "checkpoint hook never fired")

    results = run_sweep(result_dir, resume=(phase == "resume"))
    with open(f"{out}.{pid}", "w") as f:
        json.dump(results, f)
    print(f"worker {pid}: results={results}", flush=True)


if __name__ == "__main__":
    main()
