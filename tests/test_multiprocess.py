"""Multi-host execution of the stream-parallel engine, validated with a
2-process CPU ``jax.distributed`` harness (gloo collectives): 4 streams
over a 4-device global mesh where each process addresses 2 devices, fed
via per-shard callbacks and read back through the replicating metric
gather — the exact code paths a real multi-host TPU run uses
(parallel/mesh.py:initialize_distributed, parallel/streams.py).

The per-stream accuracies must agree across both processes AND with a
single-process run of the same mesh size (deterministic CPU backend).
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # engine compiles in 3 processes (~4 min)

_PORT = "29471"


def test_two_process_stream_parallel(tmp_path):
    import jax

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices for the single-process ref")

    # single-process reference on this process's 8-device pool
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import _mp_common

    ref = _mp_common.run_streams(n_mesh_devices=4)

    # two workers, 2 local devices each -> the same 4-device global mesh
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)        # workers pin their own device count
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = env.get("PYTHONPATH", "") + os.pathsep + repo
    out = str(tmp_path / "accs")
    worker = os.path.join(repo, "tests", "_mp_worker.py")
    procs = [subprocess.Popen(
        [sys.executable, worker, str(pid), "2", _PORT, out],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for pid in range(2)]
    outs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(stdout)
        assert p.returncode == 0, f"worker failed:\n{stdout[-4000:]}"

    acc0 = json.load(open(out + ".0"))
    acc1 = json.load(open(out + ".1"))
    # both processes observe identical fully-gathered metrics
    np.testing.assert_allclose(acc0, acc1, rtol=0, atol=0)
    # and the 2-process run reproduces the single-process trajectory
    np.testing.assert_allclose(acc0, ref, rtol=1e-6, atol=1e-6)
