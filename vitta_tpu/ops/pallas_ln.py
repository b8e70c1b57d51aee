"""Pallas TPU kernel: fused LayerNorm (forward + backward).

Swin-B runs ~50 LayerNorms per forward over (B, T, H, W, C) tensors
(models/layers.py:LayerNorm); XLA lowers the channel (lane-axis)
mean/E[x^2] reductions and the normalize separately, profiled at
~45 GB/s effective — 17x off HBM bandwidth — for ~10+ ms/step on the
adaptation step (round-3 trace: convert_reduce + multiply fusions).

One grid step here loads a (rows, C) block once, computes the one-pass
f32 row statistics in VMEM, and writes the normalized output — one
read + one write of the activation, which is the bandwidth floor.
Backward recomputes the row statistics from x (cheaper than
materializing mu/rstd residuals at odd lane widths), emits dx, and
accumulates dgamma/dbeta across the sequential TPU grid in a revisited
(1, C) output block (same pattern as the attention kernel's dbias).

The row-block size is the largest power-of-two divisor of R (capped at
1024); real Swin-B token counts all carry a 2^7+ factor.  Off-TPU (or
for degenerate row counts) callers use the plain jnp path in
models/layers.py — identical math.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _row_block(r: int, cap: int = 1024) -> int:
    b = 1
    while b < cap and r % (2 * b) == 0:
        b *= 2
    return b


def _stats(xf, eps):
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    msq = jnp.mean(xf * xf, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(msq - mu * mu + eps)
    return mu, rstd


def _fwd_kernel(x_ref, g_ref, b_ref, y_ref, *, eps):
    xf = x_ref[...].astype(jnp.float32)
    mu, rstd = _stats(xf, eps)
    y = (xf - mu) * rstd * g_ref[0].astype(jnp.float32) + \
        b_ref[0].astype(jnp.float32)
    y_ref[...] = y.astype(y_ref.dtype)


def _bwd_kernel(x_ref, g_ref, dy_ref, dx_ref, dg_ref, db_ref, *, eps):
    i = pl.program_id(0)
    xf = x_ref[...].astype(jnp.float32)
    mu, rstd = _stats(xf, eps)
    xh = (xf - mu) * rstd
    dyf = dy_ref[...].astype(jnp.float32)

    @pl.when(i == 0)
    def _():
        dg_ref[...] = jnp.zeros_like(dg_ref)
        db_ref[...] = jnp.zeros_like(db_ref)

    dg_ref[0] += jnp.sum(dyf * xh, axis=0)
    db_ref[0] += jnp.sum(dyf, axis=0)

    wg = dyf * g_ref[0].astype(jnp.float32)
    dx = rstd * (wg - jnp.mean(wg, axis=-1, keepdims=True)
                 - xh * jnp.mean(wg * xh, axis=-1, keepdims=True))
    dx_ref[...] = dx.astype(dx_ref.dtype)


def _vec_spec(c):
    return pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM)


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def _ln_fwd(x2, g, b, eps, interpret=False):
    r, c = x2.shape
    br = _row_block(r)
    blk = pl.BlockSpec((br, c), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, eps=eps),
        grid=(r // br,),
        in_specs=[blk, _vec_spec(c), _vec_spec(c)],
        out_specs=blk,
        out_shape=jax.ShapeDtypeStruct((r, c), x2.dtype),
        interpret=interpret,
    )(x2, g.reshape(1, c), b.reshape(1, c))


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def _ln_bwd(x2, g, dy2, eps, interpret=False):
    r, c = x2.shape
    br = _row_block(r)
    blk = pl.BlockSpec((br, c), lambda i: (i, 0), memory_space=pltpu.VMEM)
    dx, dg, db = pl.pallas_call(
        functools.partial(_bwd_kernel, eps=eps),
        grid=(r // br,),
        in_specs=[blk, _vec_spec(c), blk],
        out_specs=[blk, _vec_spec(c), _vec_spec(c)],
        out_shape=[
            jax.ShapeDtypeStruct((r, c), x2.dtype),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ],
        interpret=interpret,
    )(x2, g.reshape(1, c), dy2)
    return dx, dg.reshape(c), db.reshape(c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def layer_norm_pallas(x2, g, b, eps, interpret=False):
    """y = LayerNorm(x2) * g + b over the last axis; x2 is (R, C)."""
    return _ln_fwd(x2, g, b, eps, interpret=interpret)


def _ln_vjp_fwd(x2, g, b, eps, interpret):
    return _ln_fwd(x2, g, b, eps, interpret=interpret), (x2, g)


def _ln_vjp_bwd(eps, interpret, res, dy2):
    x2, g = res
    dx, dg, db = _ln_bwd(x2, g, dy2, eps, interpret=interpret)
    return dx, dg.astype(g.dtype), db.astype(g.dtype)


layer_norm_pallas.defvjp(_ln_vjp_fwd, _ln_vjp_bwd)


def ln_rows_supported(r: int) -> bool:
    """Pallas path requires a sublane-aligned power-of-two row block."""
    return r % 8 == 0
