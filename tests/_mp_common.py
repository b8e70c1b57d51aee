"""Shared fixture for the multi-process (2-process CPU jax.distributed)
stream-parallel test: both the in-parent single-process reference and the
subprocess workers build the identical tiny TANet engine and synthetic
stream datasets, so their per-stream accuracies must agree exactly.
"""

import dataclasses

import numpy as np

T, HW, K, V = 2, 24, 4, 2
S = 4           # corruption streams
N_VIDEOS = 2


class ArrayStreamDataset:
    """Minimal paired dataset: per index returns (views, eval_clip, label)."""

    def __init__(self, stream_idx: int):
        rng = np.random.default_rng(100 + stream_idx)
        self.views = rng.normal(size=(N_VIDEOS, V, T, HW, HW, 3)) \
            .astype(np.float32)
        self.clips = rng.normal(size=(N_VIDEOS, 1, T, HW, HW, 3)) \
            .astype(np.float32)
        self.labels = (rng.integers(0, K, size=(N_VIDEOS, 1))
                       .astype(np.int32))

    def __len__(self):
        return N_VIDEOS

    def __getitem__(self, i):
        return self.views[i], self.clips[i], self.labels[i]


def build_engine():
    import jax
    import jax.numpy as jnp

    from vitta_tpu.adapt.engine import VittaEngine, flatten_taps
    from vitta_tpu.config import tanet_ucf101_preset
    from vitta_tpu.models.tanet import TANet

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
    _, aux = model.apply(variables, x0 + 0.2, train=False, mutable=["taps"])
    src = {n: (np.asarray(s.mean), np.asarray(s.var))
           for n, s in flatten_taps(aux["taps"]).items()
           if "g_bn" not in n and "l_bn" not in n}
    return VittaEngine(model, cfg, variables, src, donate=False)


def run_streams(n_mesh_devices: int):
    from vitta_tpu.parallel.mesh import make_mesh
    from vitta_tpu.parallel.streams import run_parallel_streams

    engine = build_engine()
    datasets = [ArrayStreamDataset(i) for i in range(S)]
    mesh = make_mesh(n_mesh_devices, ("stream",))
    accs, _state = run_parallel_streams(engine, mesh, datasets, seed=0)
    return accs
