"""Pallas TPU kernel: fused TAM dynamic temporal convolution (fwd + bwd).

The TAM applies, per (sample, channel), a dynamic depthwise temporal
conv to attention-scaled features (reference
models/tanet_models/temporal_module.py:43-65):

    y[t] = attn[t] * x[t];   out[t] = sum_k K[k] * y[t+k-1]   (K=3, zero pad)

The jnp formulation (models/tam.py) lowers to ~29 XLA ops per TAM in
the backward pass — pad/slice transposes, broadcast multiplies and three
full-tensor reductions with awkward 5D layouts; profiling the adaptation
step put TAM at ~4 ms of the 29 ms step (14%) despite negligible FLOPs.
This kernel does the whole thing in one pass each way:

* forward: one grid step per (n, t) reads the three neighbor frames,
  multiplies by precomputed per-lane rows, writes out — 3 reads + 1
  write, zero intermediate HBM tensors;
* backward: one grid step per (n, t) reads g[t-1], g[t], g[t+1], x[t]
  and emits dx[t], the per-(t, lane) attention cotangent, and
  accumulates the (3, lane) kernel cotangent in the revisited output
  block across t.

Layout trick: (N, T, H, W, C) is viewed as (N, T, H, W*C).  For the
ResNet-50 TAM sites W*C == 3584 == 28*128 at every stage (56*64, 28*128,
14*256, 7*512) so lanes are exactly full; attn (N,T,C) and kernel
(N,C,3) broadcast to per-lane rows outside the kernel (tiny tensors),
and their cotangents fold back through the broadcast transpose (sum
over W) by ordinary autodiff outside the custom_vjp.

Falls back to the jnp reference when shapes don't qualify or when not
running on TPU (CPU tests use interpret mode explicitly).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

KSIZE = 3  # reference TAM kernel size (temporal_module.py:27)


# ---------------------------------------------------------------------------
# jnp reference (identical math; also the CPU/odd-shape fallback)

def tam_dynamic_conv_reference(x, attn, kernel):
    """x (N,T,H,W,C), attn (N,T,C), kernel (N,C,K) -> (N,T,H,W,C)."""
    n, t, h, w, c = x.shape
    y = x * attn[:, :, None, None, :].astype(x.dtype)
    pad = KSIZE // 2
    yp = jnp.pad(y, ((0, 0), (pad, pad), (0, 0), (0, 0), (0, 0)))
    out = jnp.zeros_like(y)
    for k in range(KSIZE):
        wk = kernel[:, None, None, None, :, k].astype(x.dtype)
        out = out + wk * yp[:, k:k + t]
    return out


def _rows(attn, kernel, w):
    """Broadcast attn/kernel to per-lane rows of the (W*C) flat view."""
    n, t, c = attn.shape
    a_row = jnp.broadcast_to(attn[:, :, None, :], (n, t, w, c))
    a_row = a_row.reshape(n, t, w * c)
    k_rows = jnp.broadcast_to(
        jnp.transpose(kernel, (0, 2, 1))[:, :, None, :], (n, KSIZE, w, c))
    k_rows = k_rows.reshape(n, KSIZE, w * c)
    return a_row, k_rows


# ---------------------------------------------------------------------------
# kernels on the flat (N, T, H, L) view

def _fwd_kernel(xm, x0, xp, am, a0, ap, kr, o_ref):
    t = pl.program_id(1)
    nt = pl.num_programs(1)
    f32 = jnp.float32
    k0 = kr[0, 0, 0, :].astype(f32)
    k1 = kr[0, 1, 0, :].astype(f32)
    k2 = kr[0, 2, 0, :].astype(f32)
    acc = (k1 * a0[0, 0, 0, :].astype(f32)) * x0[0, 0].astype(f32)
    mm = jnp.where(t > 0, 1.0, 0.0).astype(f32)        # zero-pad at t-1 < 0
    acc += (mm * k0 * am[0, 0, 0, :].astype(f32)) * xm[0, 0].astype(f32)
    mp = jnp.where(t + 1 < nt, 1.0, 0.0).astype(f32)   # zero-pad at t+1 >= T
    acc += (mp * k2 * ap[0, 0, 0, :].astype(f32)) * xp[0, 0].astype(f32)
    o_ref[0, 0] = acc.astype(o_ref.dtype)


def _bwd_kernel(gm, g0, gp, x0, a0, kr, dx_ref, da_ref, dk_ref):
    t = pl.program_id(1)
    nt = pl.num_programs(1)
    hh = pl.program_id(2)
    f32 = jnp.float32
    k0 = kr[0, 0, 0, :].astype(f32)
    k1 = kr[0, 1, 0, :].astype(f32)
    k2 = kr[0, 2, 0, :].astype(f32)
    g0f = g0[0, 0].astype(f32)
    mm = jnp.where(t > 0, 1.0, 0.0).astype(f32)
    mp = jnp.where(t + 1 < nt, 1.0, 0.0).astype(f32)
    gmf = gm[0, 0].astype(f32) * mm
    gpf = gp[0, 0].astype(f32) * mp
    # dy[s] = K0*g[s+1] + K1*g[s] + K2*g[s-1]
    dy = k0 * gpf + k1 * g0f + k2 * gmf
    x0f = x0[0, 0].astype(f32)
    a0f = a0[0, 0, 0, :].astype(f32)
    dx_ref[0, 0] = (dy * a0f).astype(dx_ref.dtype)

    # da/dk output blocks are revisited on consecutive grid steps (the
    # h-block axis is innermost; dk additionally across t) — init on the
    # first visit, accumulate after.
    @pl.when(hh == 0)
    def _():
        da_ref[0, 0, 0, :] = jnp.zeros_like(da_ref)[0, 0, 0]

    da_ref[0, 0, 0, :] += jnp.sum(dy * x0f, axis=0)
    # dK[k] = sum_s g[s-k+1] * y[s],  y = a*x
    y0 = x0f * a0f

    @pl.when(jnp.logical_and(t == 0, hh == 0))
    def _():
        dk_ref[0, :, :, :] = jnp.zeros_like(dk_ref)[0]

    dk_ref[0, 0, 0, :] += jnp.sum(gpf * y0, axis=0)
    dk_ref[0, 1, 0, :] += jnp.sum(g0f * y0, axis=0)
    dk_ref[0, 2, 0, :] += jnp.sum(gmf * y0, axis=0)


def _frame_specs(t_total):
    """Index maps for the t-1 / t / t+1 frames of a (N,T,H,L) tensor,
    h-tiled.  Out-of-range neighbors are clamped — their contribution is
    masked to zero inside the kernels."""
    def m_prev(n, t, h): return (n, jnp.maximum(t - 1, 0), h, 0)
    def m_curr(n, t, h): return (n, t, h, 0)
    def m_next(n, t, h): return (n, jnp.minimum(t + 1, t_total - 1), h, 0)
    return m_prev, m_curr, m_next


def _h_tile(h: int) -> int:
    """H-block size: bounds per-step VMEM at the wide pre-stride TAM
    sites (H=56, L=7168 overflows VMEM untiled in fp32); blocks must be
    8-divisible or the full dimension."""
    return 8 if (h % 8 == 0 and h > 8) else h


@functools.partial(jax.jit, static_argnames=("interpret",))
def _pallas_fwd(x2, a_row, k_rows, interpret=False):
    n, t, h, L = x2.shape
    hb = _h_tile(h)
    m_prev, m_curr, m_next = _frame_specs(t)
    frame = lambda im: pl.BlockSpec((1, 1, hb, L), im, memory_space=pltpu.VMEM)
    # rows carry a singleton sublane axis: (N, T, 1, L) / (N, K, 1, L) so
    # blocks satisfy the (8, 128)-tiling rule with full-size trailing dims
    row = lambda im: pl.BlockSpec(
        (1, 1, 1, L), lambda nn, tt, hh: im(nn, tt, hh)[:2] + (0, 0),
        memory_space=pltpu.VMEM)
    a4 = a_row[:, :, None, :]
    k4 = k_rows[:, :, None, :]
    return pl.pallas_call(
        _fwd_kernel,
        grid=(n, t, h // hb),
        in_specs=[frame(m_prev), frame(m_curr), frame(m_next),
                  row(m_prev), row(m_curr), row(m_next),
                  pl.BlockSpec((1, KSIZE, 1, L),
                               lambda nn, tt, hh: (nn, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1, hb, L), m_curr,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, t, h, L), x2.dtype),
        interpret=interpret,
    )(x2, x2, x2, a4, a4, a4, k4)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _pallas_bwd(g2, x2, a_row, k_rows, interpret=False):
    n, t, h, L = x2.shape
    hb = _h_tile(h)
    m_prev, m_curr, m_next = _frame_specs(t)
    frame = lambda im: pl.BlockSpec((1, 1, hb, L), im, memory_space=pltpu.VMEM)
    dx, da4, dk4 = pl.pallas_call(
        _bwd_kernel,
        grid=(n, t, h // hb),
        in_specs=[frame(m_prev), frame(m_curr), frame(m_next),
                  frame(m_curr),
                  pl.BlockSpec((1, 1, 1, L),
                               lambda nn, tt, hh: (nn, tt, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, KSIZE, 1, L),
                               lambda nn, tt, hh: (nn, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((1, 1, hb, L), m_curr, memory_space=pltpu.VMEM),
            # revisited across the (innermost) h-block axis
            pl.BlockSpec((1, 1, 1, L), lambda nn, tt, hh: (nn, tt, 0, 0),
                         memory_space=pltpu.VMEM),
            # revisited across t and h: accumulates the kernel cotangent
            pl.BlockSpec((1, KSIZE, 1, L),
                         lambda nn, tt, hh: (nn, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, t, h, L), x2.dtype),
            jax.ShapeDtypeStruct((n, t, 1, L), jnp.float32),
            jax.ShapeDtypeStruct((n, KSIZE, 1, L), jnp.float32),
        ],
        interpret=interpret,
    )(g2, g2, g2, x2, a_row[:, :, None, :], k_rows[:, :, None, :])
    return dx, da4[:, :, 0, :], dk4[:, :, 0, :]


# ---------------------------------------------------------------------------
# custom-vjp wrapper on the flat view

@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _tam_flat(x2, a_row, k_rows, interpret=False):
    return _pallas_fwd(x2, a_row, k_rows, interpret=interpret)


def _tam_flat_fwd(x2, a_row, k_rows, interpret):
    return _pallas_fwd(x2, a_row, k_rows, interpret=interpret), \
        (x2, a_row, k_rows)


def _tam_flat_bwd(interpret, res, g2):
    x2, a_row, k_rows = res
    dx, da, dk = _pallas_bwd(g2, x2, a_row, k_rows, interpret=interpret)
    return dx, da.astype(a_row.dtype), dk.astype(k_rows.dtype)


_tam_flat.defvjp(_tam_flat_fwd, _tam_flat_bwd)


# ---------------------------------------------------------------------------
# public entry

def shapes_qualify(x_shape: Tuple[int, ...]) -> bool:
    """Lane-alignment requirement: the flattened (W*C) axis must fill
    128-lane registers (true at every ResNet-50 TAM site)."""
    if len(x_shape) != 5:
        return False
    _, _, _, w, c = x_shape
    return (w * c) % 128 == 0


def tam_dynamic_conv(x, attn, kernel, *, use_pallas: bool = None,
                     interpret: bool = False):
    """Fused y = dynconv_t(attn * x). x (N,T,H,W,C), attn (N,T,C) in
    [0,1], kernel (N,C,K=3) softmax weights -> (N,T,H,W,C).

    use_pallas=None auto-selects: the Pallas path on TPU for qualifying
    shapes, the jnp reference elsewhere (both differentiable, same math).
    """
    if kernel.shape[-1] != KSIZE or not shapes_qualify(x.shape):
        return tam_dynamic_conv_reference(x, attn, kernel)
    if use_pallas is None:
        # Measured on v5e (adapt+eval step, 2x16x224 views): the kernel
        # saves ~1 ms/step at fp32 (28.8 -> 27.8 on-device) but LOSES
        # ~0.7 ms at bf16 (14.9 -> 15.6) — the custom call pins row-major
        # layouts, and the transposes XLA inserts around it outweigh the
        # fused math once activations are half-width.  Auto mode
        # therefore picks Pallas only for fp32 on TPU.
        use_pallas = (jax.default_backend() == "tpu"
                      and x.dtype == jnp.float32)
    if not (use_pallas or interpret):
        return tam_dynamic_conv_reference(x, attn, kernel)
    n, t, h, w, c = x.shape
    a_row, k_rows = _rows(attn.astype(jnp.float32),
                          kernel.astype(jnp.float32), w)
    out2 = _tam_flat(x.reshape(n, t, h, w * c), a_row, k_rows, interpret)
    return out2.reshape(n, t, h, w, c)
