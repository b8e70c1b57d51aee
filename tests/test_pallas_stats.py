"""Pallas fused BN+ReLU+stats kernel vs the jnp reference path
(interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vitta_tpu.ops.pallas_stats import fused_bn_relu_stats
from vitta_tpu.ops.stats import channel_stats


@pytest.mark.parametrize("r,c,relu", [(512, 128, True), (96, 256, False)])
def test_fused_matches_reference(r, c, relu):
    rng = np.random.default_rng(0)
    x = rng.normal(size=(r, c)).astype(np.float32)
    scale = rng.uniform(0.5, 1.5, c).astype(np.float32)
    bias = rng.normal(size=c).astype(np.float32)
    mean = rng.normal(size=c).astype(np.float32) * 0.1
    var = rng.uniform(0.5, 2.0, c).astype(np.float32)

    y, stats = fused_bn_relu_stats(
        jnp.asarray(x), jnp.asarray(scale), jnp.asarray(bias),
        jnp.asarray(mean), jnp.asarray(var), relu=relu, interpret=True)

    want_y = (x - mean) * (scale / np.sqrt(var + 1e-5)) + bias
    if relu:
        want_y = np.maximum(want_y, 0.0)
    np.testing.assert_allclose(np.asarray(y), want_y, rtol=1e-5, atol=1e-5)

    ref = channel_stats(jnp.asarray(want_y))
    np.testing.assert_allclose(np.asarray(stats.mean), np.asarray(ref.mean),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(stats.var), np.asarray(ref.var),
                               rtol=1e-4, atol=1e-5)
