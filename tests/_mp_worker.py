"""Subprocess worker for the 2-process jax.distributed test.

Usage: python tests/_mp_worker.py <pid> <nproc> <port> <out_prefix>

Each process exposes 2 virtual CPU devices; after
``initialize_distributed`` the global mesh has 4, and the stream-parallel
engine runs with this process addressing only its half of the stream
axis — the real multi-host execution mode of parallel/streams.py.
"""

import json
import os
import sys


def main():
    pid, nproc, port, out = (int(sys.argv[1]), int(sys.argv[2]),
                             sys.argv[3], sys.argv[4])
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
    assert len(jax.local_devices()) == 2

    import _mp_common

    accs = _mp_common.run_streams(n_mesh_devices=n)
    with open(f"{out}.{pid}", "w") as f:
        json.dump(accs, f)
    print(f"worker {pid}: accs={accs}", flush=True)


if __name__ == "__main__":
    main()
