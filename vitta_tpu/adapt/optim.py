"""Optimizers for the adaptation step.

Replicates corpus/basics.py:547-560:

* default: SGD over *all* parameters, lr 5e-5, momentum 0.9, weight
  decay 5e-4 (torch ordering: d = g + wd*p; v = mu*v + d; p -= lr*v);
* ``update_only_bn_affine``: Adam(lr, betas=(0.9, 0.999), wd=0) over the
  gamma/beta of norm layers only (utils/BNS_utils.py:262-288).

Plus the partial-BN subtlety of TSN.train() (tanet.py:182-198): with
``partial_bn`` enabled the torch model sets ``requires_grad=False`` on
the weight/bias of every BatchNorm2d except the first — so under the
default SGD those affine parameters are *not* updated.  Here that is an
optax mask (``tanet_trainable_mask``).
"""

from __future__ import annotations

import jax
import jax.flatten_util
import optax

from vitta_tpu.config import OptimConfig

# BN2d modules inside bottlenecks; TAM's g_bn/l_bn are BatchNorm1d and NOT
# frozen by the torch partial-BN override (it matches nn.BatchNorm2d only).
_BN2D_NAMES = ("bn1", "bn2", "bn3", "downsample_bn")


def _path_names(path) -> list:
    return [p.key for p in path if hasattr(p, "key")]


def tanet_trainable_mask(params) -> "jax.tree_util.PyTreeDef":
    """True = trainable. Freezes BatchNorm2d scale/bias except the stem
    ``base_model.bn1`` (the first BN2d, tanet.py:189-198)."""

    def mask_fn(path, _leaf):
        names = _path_names(path)
        if len(names) >= 2 and names[-2] in _BN2D_NAMES and names[-1] in ("scale", "bias"):
            # inside TAM, bn modules are g_bn/l_bn -> not matched here
            is_stem = names[:2] == ["base_model", "bn1"] and len(names) == 3
            return is_stem
        if len(names) == 3 and names[0] == "base_model" and names[1] == "bn1":
            return True  # stem bn (path base_model/bn1/scale)
        return True

    return jax.tree_util.tree_map_with_path(mask_fn, params)


def norm_affine_mask(params, norm_module_names=("bn1", "bn2", "bn3",
                                                "downsample_bn", "g_bn", "l_bn",
                                                "norm", "norm1", "norm2")) -> "jax.tree_util.PyTreeDef":
    """True for gamma/beta of norm layers (collect_bn_params,
    BNS_utils.py:278-288)."""

    def mask_fn(path, _leaf):
        names = _path_names(path)
        return (len(names) >= 2 and names[-2] in norm_module_names
                and names[-1] in ("scale", "bias"))

    return jax.tree_util.tree_map_with_path(mask_fn, params)


def _with_frozen(inner: optax.GradientTransformation,
                 trainable_mask) -> optax.GradientTransformation:
    """Apply ``inner`` to trainable leaves, zero updates elsewhere
    (optax.masked alone would pass frozen grads through unchanged)."""
    labels = jax.tree_util.tree_map(
        lambda t: "train" if t else "freeze", trainable_mask)
    return optax.multi_transform(
        {"train": inner, "freeze": optax.set_to_zero()}, labels)


def fused_sgd_mask(params, arch: str, partial_bn: bool):
    """0/1 float mask tree for the fused SGD step (None = all trainable).
    Multiplying the final update by the mask gives identical parameter
    trajectories to the multi_transform form — frozen leaves never move,
    mirroring torch's requires_grad=False."""
    if arch == "tanet" and partial_bn:
        mask_tree = tanet_trainable_mask(params)
        return jax.tree_util.tree_map(
            lambda m: jax.numpy.float32(float(m)), mask_tree)
    return None


def half_momentum_enabled() -> bool:
    """Carry the SGD momentum buffer in bfloat16 (VITTA_BF16_MOMENTUM=1):
    halves the optimizer's HBM traffic over the ~88 M-param Swin tree
    (~0.7 GB/step -> ~0.35) at the cost of one bf16 rounding of v per
    step.  Update arithmetic stays f32 (v upcast, p -= lr*v2 in f32);
    params remain f32 masters.  Off by default pending a TPU measurement
    and the drift evidence in tests/test_optim_half_momentum.py."""
    import os
    return bool(os.environ.get("VITTA_BF16_MOMENTUM"))


def fused_sgd_step(cfg: OptimConfig, params, momentum, grads, mask=None):
    """torch-style SGD(momentum, weight_decay) as one fused update per
    leaf (d = g + wd*p; v = mu*v + d; p -= lr*v — basics.py:547-560).

    The optax chain (add_decayed_weights -> trace -> scale -> apply,
    optionally multi_transform-masked) issues ~5 tiny device ops per
    parameter leaf; at ~330 leaves that is thousands of sub-microsecond
    kernels per adaptation step.  Hand-fusing the arithmetic halves the
    op count; XLA fuses each leaf's chain into one kernel."""
    wd, mu, lr = cfg.weight_decay, cfg.momentum, cfg.lr

    def upd(p, v, g, m=None):
        v2 = mu * v.astype(jax.numpy.float32) \
            + g.astype(jax.numpy.float32) + wd * p
        step = lr * v2 if m is None else (lr * m) * v2
        return p - step, v2.astype(v.dtype)

    if mask is None:
        pairs = jax.tree_util.tree_map(upd, params, momentum, grads)
    else:
        pairs = jax.tree_util.tree_map(upd, params, momentum, grads, mask)
    is_pair = lambda x: isinstance(x, tuple)
    p2 = jax.tree_util.tree_map(lambda t: t[0], pairs, is_leaf=is_pair)
    v2 = jax.tree_util.tree_map(lambda t: t[1], pairs, is_leaf=is_pair)
    return p2, v2


def build_optimizer(cfg: OptimConfig, params, arch: str = "tanet",
                    partial_bn: bool = True) -> optax.GradientTransformation:
    if cfg.update_only_bn_affine:
        inner = optax.adam(cfg.lr, b1=cfg.adam_b1, b2=cfg.adam_b2)
        return _with_frozen(inner, norm_affine_mask(params))
    # torch-style SGD(momentum, weight_decay) over all trainable params
    inner = optax.chain(
        optax.add_decayed_weights(cfg.weight_decay),
        optax.trace(decay=cfg.momentum, nesterov=False),
        optax.scale(-cfg.lr),
    )
    if arch == "tanet" and partial_bn:
        return _with_frozen(inner, tanet_trainable_mask(params))
    return inner
