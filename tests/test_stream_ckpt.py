"""Mid-stream TTA state checkpointing (adapt/stream_ckpt.py): a killed
stream resumed from the last checkpoint reproduces the uninterrupted
trajectory exactly (same final state, same accuracy row)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vitta_tpu.adapt.engine import VittaEngine, flatten_taps
from vitta_tpu.adapt.loops import tta_stream
from vitta_tpu.adapt.stream_ckpt import StreamCheckpointer
from vitta_tpu.config import tanet_ucf101_preset
from vitta_tpu.models.tanet import TANet

pytestmark = pytest.mark.slow  # adapt-step XLA compile

T, HW, K, V = 2, 32, 5, 2
N_VIDEOS = 6
KILL_AT = 4      # videos completed before the simulated kill
EVERY = 2        # checkpoint cadence


@pytest.fixture(scope="module")
def engine():
    cfg = tanet_ucf101_preset()
    cfg = cfg.replace(
        data=dataclasses.replace(cfg.data, clip_length=T, input_size=HW,
                                 scale_size=HW),
        model=dataclasses.replace(cfg.model, num_classes=K),
    )
    model = TANet(num_classes=K, clip_length=T)
    rng = jax.random.PRNGKey(0)
    x0 = jnp.zeros((V, T, HW, HW, 3), jnp.float32)
    variables = model.init({"params": rng, "dropout": rng}, x0, train=False)
    variables = {"params": variables["params"],
                 "batch_stats": variables["batch_stats"]}
    clean = jax.random.normal(jax.random.PRNGKey(1), (V, T, HW, HW, 3))
    _, aux = model.apply(variables, clean, train=False, mutable=["taps"])
    src = {n: (np.asarray(s.mean), np.asarray(s.var))
           for n, s in flatten_taps(aux["taps"]).items()
           if "g_bn" not in n and "l_bn" not in n}
    return VittaEngine(model, cfg, variables, src, donate=False)


class _Stream:
    """Deterministic per-index synthetic paired stream."""

    def __init__(self, n, start=0):
        self.n, self.start = n, start

    def __len__(self):
        return self.n - self.start

    def __iter__(self):
        for i in range(self.start, self.n):
            rng = np.random.default_rng(1000 + i)
            yield (jnp.asarray(rng.normal(size=(V, T, HW, HW, 3))
                               .astype(np.float32)),
                   jnp.asarray(rng.normal(size=(1, T, HW, HW, 3))
                               .astype(np.float32)),
                   jnp.asarray([i % K]))


def _leaves_allclose(a, b, atol=0.0):
    fa = jax.tree_util.tree_leaves(a)
    fb = jax.tree_util.tree_leaves(b)
    assert len(fa) == len(fb)
    for la, lb in zip(fa, fb):
        np.testing.assert_allclose(np.asarray(la, np.float32),
                                   np.asarray(lb, np.float32), atol=atol,
                                   rtol=0)


def test_kill_resume_reproduces_trajectory(engine, tmp_path):
    # uninterrupted reference trajectory
    want_row, want_state, _ = tta_stream(engine, _Stream(N_VIDEOS), seed=3)

    # interrupted run: process KILL_AT videos with checkpointing, drop
    # everything in memory (the "kill"), then resume from disk
    ckpt_run = StreamCheckpointer(str(tmp_path / "ck"), every=EVERY)
    tta_stream(engine, _Stream(KILL_AT), seed=3,
               checkpointer=_NoClear(ckpt_run))

    got = StreamCheckpointer(str(tmp_path / "ck"),
                             every=EVERY).restore(engine.init_state())
    assert got is not None
    state0, start, meters = got
    assert start == KILL_AT  # saved at the checkpoint cadence boundary
    row, state, _ = tta_stream(engine, _Stream(N_VIDEOS, start=start),
                               seed=3, state=state0, start_index=start,
                               meter_state=meters)
    assert row == pytest.approx(want_row)
    _leaves_allclose(state.params, want_state.params)
    _leaves_allclose(state.ema, want_state.ema)
    _leaves_allclose(state.opt_state, want_state.opt_state)


class _NoClear:
    """Checkpointer view whose completion-clear is suppressed — the
    simulated kill happens before the stream 'completes', but tta_stream
    runs to the end of its (truncated) iterator and would clear."""

    def __init__(self, inner):
        self._inner = inner
        self.every = inner.every

    def save(self, *a, **k):
        return self._inner.save(*a, **k)

    def clear(self):
        pass


class _IdxStream:
    """Indexable per-stream synthetic dataset (parallel sweep protocol);
    optionally raises at a fixed index to simulate a mid-group kill
    while keeping ``len`` (and so the RNG folds) at the full length."""

    def __init__(self, n, stream_id, die_at=None):
        self.n, self.sid, self.die_at = n, stream_id, die_at

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        if self.die_at is not None and i >= self.die_at:
            raise RuntimeError("simulated preemption")
        rng = np.random.default_rng(5000 + 100 * self.sid + i)
        return (rng.normal(size=(V, T, HW, HW, 3)).astype(np.float32),
                rng.normal(size=(1, T, HW, HW, 3)).astype(np.float32),
                np.asarray([i % K], np.int32))


def test_parallel_group_kill_resume(engine, tmp_path):
    """A preempted 2-stream parallel group resumed from the checkpoint
    reproduces the uninterrupted per-stream accuracies and state."""
    from vitta_tpu.parallel.mesh import make_mesh
    from vitta_tpu.parallel.streams import run_parallel_streams

    S = 2
    assert len(jax.devices()) >= S
    mesh = make_mesh(S, ("stream",))
    full = [_IdxStream(N_VIDEOS, s) for s in range(S)]
    want_accs, want_state = run_parallel_streams(engine, mesh, full, seed=3)

    ckpt = StreamCheckpointer(str(tmp_path / "pg"), every=EVERY)
    dying = [_IdxStream(N_VIDEOS, s, die_at=KILL_AT) for s in range(S)]
    with pytest.raises(RuntimeError, match="simulated preemption"):
        run_parallel_streams(engine, mesh, dying, seed=3, checkpointer=ckpt)

    # fresh checkpointer object: nothing carried in memory across the kill
    ckpt2 = StreamCheckpointer(str(tmp_path / "pg"), every=EVERY)
    accs, state = run_parallel_streams(engine, mesh, full, seed=3,
                                       checkpointer=ckpt2)
    assert accs == pytest.approx(want_accs)
    _leaves_allclose(state.params, want_state.params)
    _leaves_allclose(state.ema, want_state.ema)
    # group completion clears the checkpoint
    assert ckpt2.restore(template=None) is None


def test_manifest_mismatch_errors_loudly(tmp_path):
    """The sweep keys checkpoint directories by a short hash of the
    group's corruption list (cli/drivers.py); the full list is pinned in
    a manifest so a different group composition can never silently
    restore a mismatched state."""
    d = str(tmp_path / "mf")
    StreamCheckpointer(d, every=1, manifest={"corruptions": ["gauss", "rain"]})
    # same manifest reopens fine
    StreamCheckpointer(d, every=1, manifest={"corruptions": ["gauss", "rain"]})
    with pytest.raises(RuntimeError, match="different stream group"):
        StreamCheckpointer(d, every=1, manifest={"corruptions": ["gauss"]})
    # manifest-less open (legacy path) is unaffected
    StreamCheckpointer(d, every=1)


def test_checkpointer_clear_and_missing(tmp_path):
    ckpt = StreamCheckpointer(str(tmp_path / "c2"), every=1)
    assert ckpt.restore(template={}) is None
    ckpt.save({"x": np.arange(3, dtype=np.float32)}, 5,
              {"top1": (200.0, 4), "top5": (400.0, 4)})
    got = ckpt.restore({"x": np.zeros(3, np.float32)})
    assert got is not None
    state, nxt, meters = got
    assert nxt == 5 and meters["top1"] == (200.0, 4)
    np.testing.assert_array_equal(state["x"], np.arange(3, dtype=np.float32))
    ckpt.clear()
    assert ckpt.restore(template={}) is None
