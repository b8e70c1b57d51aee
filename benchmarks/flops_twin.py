"""Count the adapt+eval step's FLOPs on the CPU backend.

Run as a subprocess by bench.py: the tunneled TPU plugin implements no
client-side HLO cost analysis (``Lowered.cost_analysis()`` returns
None) and the compiled analysis cannot see inside Pallas custom calls.
Here the same step is *traced* (never compiled or run) on the CPU
backend, where the kernel auto-gates pick the identical-math jnp
fallbacks, and XLA's HLO cost analysis counts the whole model.

Zero device work: parameter/tap shapes come from ``jax.eval_shape`` and
the engine is built over zero-filled arrays.

Usage: python benchmarks/flops_twin.py <tanet|swin> <float32|bfloat16>
Prints one JSON line: {"flops": <float>}.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def _zeros_like_tree(shapes):
    return jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), shapes)


def build(model_name: str, dtype: str):
    import dataclasses

    from vitta_tpu.adapt.engine import VittaEngine, flatten_taps

    T, K, V, HW = 16, 101, 2, 224
    if model_name == "swin":
        from vitta_tpu.config import swin_ucf101_preset
        from vitta_tpu.models.swin import Recognizer3D
        cfg = swin_ucf101_preset()
        model = Recognizer3D(num_classes=K, drop_path_rate=0.0, dtype=dtype)
        x_dtype = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
    else:
        from vitta_tpu.config import tanet_ucf101_preset
        from vitta_tpu.models.tanet import TANet
        cfg = tanet_ucf101_preset()
        model = TANet(num_classes=K, clip_length=T, dtype=dtype)
        x_dtype = jnp.float32
    cfg = cfg.replace(data=dataclasses.replace(cfg.data, clip_length=T))

    x0 = jax.ShapeDtypeStruct((V, T, HW, HW, 3), x_dtype)
    rng = jax.random.PRNGKey(0)
    var_shapes = jax.eval_shape(
        lambda r, x: model.init({"params": r, "dropout": r}, x, train=False),
        rng, x0)
    variables = _zeros_like_tree(var_shapes)
    variables = {"params": variables["params"],
                 "batch_stats": variables.get("batch_stats", {})}
    tap_shapes = jax.eval_shape(
        lambda v, x: model.apply(v, x, train=False, mutable=["taps"]),
        variables, x0)[1]["taps"]
    if model_name == "swin":
        src = {n: (np.zeros(s.mean.shape, np.float32),
                   np.zeros(s.var.shape, np.float32))
               for n, s in flatten_taps(tap_shapes).items()}
    else:
        src = {n: (np.zeros(s.mean.shape, s.mean.dtype),
                   np.zeros(s.var.shape, s.var.dtype))
               for n, s in flatten_taps(tap_shapes).items()
               if "g_bn" not in n and "l_bn" not in n}
    return VittaEngine(model, cfg, variables, src, donate=False), (V, T, HW)


def main():
    model_name = sys.argv[1] if len(sys.argv) > 1 else "tanet"
    dtype = sys.argv[2] if len(sys.argv) > 2 else "float32"
    engine, (V, T, HW) = build(model_name, dtype)
    state = engine.init_state()
    views = jnp.zeros((V, T, HW, HW, 3), jnp.float32)
    clip = jnp.zeros((1, T, HW, HW, 3), jnp.float32)
    labels = jnp.zeros((1,), jnp.int32)
    lowered = engine._adapt_eval.lower(state, views, clip, labels,
                                       jax.random.PRNGKey(0))
    cost = lowered.cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    print(json.dumps({"flops": float((cost or {}).get("flops", 0.0))}))


if __name__ == "__main__":
    main()
