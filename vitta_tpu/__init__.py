"""vitta_tpu — TPU-native video test-time adaptation framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of ViTTA
(CVPR 2023, arXiv:2211.15393; reference implementation wlin-at/ViTTA):
online test-time adaptation of video action-recognition models under
distribution shift, by aligning online feature-statistic estimates with
precomputed source statistics plus a multi-view prediction-consistency
loss.

Design stance (vs. the reference's mutable-hook-on-mutable-module design,
cf. reference utils/norm_stats_utils.py, corpus/basics.py:403-747):

* Models are pure functions returning ``(logits, taps)`` where ``taps`` is
  a dict of per-norm-layer channel statistics — the functional replacement
  for ``register_forward_hook``.
* One adaptation step (forward-with-taps -> stat alignment + consistency
  loss -> grads -> optimizer update -> EMA update) compiles into a single
  jitted function whose carried state is ``(params, opt_state, ema)``.
* "Remove hooks for inference" is simply a second jitted eval function
  without taps; "re-initialize the model per sample" is reusing the
  immutable initial pytree.
* Corruption streams parallelize over a ``jax.sharding.Mesh``: per-stream
  model state carries a leading stream axis sharded across devices.
"""

__version__ = "0.1.0"

from vitta_tpu.config import (  # noqa: F401
    DataConfig,
    ModelConfig,
    OptimConfig,
    TTAConfig,
    VittaConfig,
)
