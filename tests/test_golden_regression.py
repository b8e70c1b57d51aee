"""Seeded end-to-end golden regression: a fixed tiny configuration must
produce bit-stable metrics run-to-run (catches silent semantic changes
in samplers, transforms, engine, or optimizer ordering).

Values are asserted self-consistently (two runs identical) rather than
against hard-coded constants, since XLA minor versions may legitimately
reorder float reductions.
"""

import dataclasses
import numpy as np
import jax

from vitta_tpu.adapt.engine import VittaEngine, flatten_taps
from vitta_tpu.adapt.loops import tta_stream
from vitta_tpu.config import tanet_ucf101_preset
from vitta_tpu.data.dataset import PairedTTADataset
from vitta_tpu.data.records import VideoRecord
from vitta_tpu.data.video_reader import SyntheticVideoSource
from vitta_tpu.models.tanet import TANet
import pytest

pytestmark = pytest.mark.slow  # two seeded end-to-end runs (~35 s)

T, HW, K, V = 2, 32, 5, 2


def _run_once():
    import jax.numpy as jnp
    cfg = tanet_ucf101_preset()
    cfg = cfg.replace(
        data=dataclasses.replace(cfg.data, clip_length=T, input_size=HW,
                                 scale_size=40),
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
    vsrc = SyntheticVideoSource(height=48, width=64, frames_per_video=60)
    records = [VideoRecord(f"g{i}", 45 + 4 * i, i % K) for i in range(3)]
    paired = PairedTTADataset(cfg, vsrc, records, seed=11)
    engine = VittaEngine(model, cfg, variables, src, donate=False)
    result, state, meters = tta_stream(engine, [paired[i] for i in range(3)],
                                       seed=13)
    return (result[0], meters["loss_reg"].avg, meters["loss_consis"].avg,
            float(np.asarray(state.ema[engine.tap_names[0]].mean).sum()))


def test_seeded_run_is_reproducible():
    a = _run_once()
    b = _run_once()
    np.testing.assert_allclose(a, b, rtol=0, atol=0)
    assert 0.0 <= a[0] <= 100.0 and a[1] > 0
