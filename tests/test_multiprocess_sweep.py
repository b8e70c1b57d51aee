"""The CLI parallel-sweep driver end-to-end under 2 processes with a
mid-run kill + resume.

``tests/test_multiprocess.py`` covers the streams layer
(``run_parallel_streams``) via ``_mp_common``; this test drives the full
driver path — ``cli/drivers.py:run_parallel_sweep`` — the way a
preempted pod job would hit it:

1. 2-process run with ``--stream_ckpt_every 1``; both workers
   self-terminate right after the first mid-stream checkpoint commits
   (simulated preemption, exit code 3);
2. 2-process ``--resume`` run in the same result_dir: restores the
   sharded mid-stream state through the group-hash checkpoint directory
   (manifest-pinned) and finishes the sweep;
3. the resumed final per-corruption accuracies must agree across both
   processes AND with an uninterrupted single-process run of the same
   sweep (deterministic CPU backend, RNG folds keyed by absolute video
   index).
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # driver compiles in 5 processes (~5 min)

_PORT = "29481"


def _launch(phase, result_dir, out, repo):
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)        # workers pin their own device count
    env["PYTHONPATH"] = env.get("PYTHONPATH", "") + os.pathsep + repo
    worker = os.path.join(repo, "tests", "_mp_sweep_worker.py")
    return [subprocess.Popen(
        [sys.executable, worker, str(pid), "2", _PORT, result_dir, out,
         phase],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for pid in range(2)]


def _drain(procs, expect_rc):
    outs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(stdout)
        assert p.returncode == expect_rc, \
            f"worker rc={p.returncode} (want {expect_rc}):\n{stdout[-4000:]}"
    return outs


def test_parallel_sweep_two_process_kill_resume(tmp_path):
    import jax

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices for the single-process ref")

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(repo, "tests"))
    import _mp_sweep_worker as W

    # uninterrupted single-process reference on this process's device pool
    ref_dir = str(tmp_path / "ref")
    os.makedirs(ref_dir, exist_ok=True)
    ref = W.run_sweep(ref_dir, resume=False)

    # phase 1: both workers die right after the first checkpoint commits
    result_dir = str(tmp_path / "sweep")
    os.makedirs(result_dir, exist_ok=True)
    out = str(tmp_path / "accs")
    _drain(_launch("kill", result_dir, out, repo), expect_rc=3)
    # the preemption left a committed mid-stream checkpoint behind
    ckpt_dirs = [d for d in os.listdir(result_dir)
                 if d.startswith("stream_ckpt_group_")]
    assert len(ckpt_dirs) == 1, ckpt_dirs
    latest = os.path.join(result_dir, ckpt_dirs[0], "latest.json")
    assert os.path.exists(latest)
    assert json.load(open(latest))["next_bi"] == 1

    # phase 2: --resume restores mid-stream and finishes
    _drain(_launch("resume", result_dir, out, repo), expect_rc=0)

    r0 = json.load(open(out + ".0"))
    r1 = json.load(open(out + ".1"))
    assert r0 == r1, "processes disagree on the gathered sweep results"
    assert set(r0) == set(W.CORRUPTIONS) | {"mean"}
    for c in W.CORRUPTIONS + ["mean"]:
        np.testing.assert_allclose(r0[c], ref[c], rtol=1e-6, atol=1e-6,
                                   err_msg=f"corruption {c}")
    # the completed group cleared its checkpoint directory
    assert not os.path.exists(os.path.join(result_dir, ckpt_dirs[0]))
