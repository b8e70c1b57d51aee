"""Pallas TPU kernel: fused window attention for Video Swin.

The Swin window is small (N = 8*7*7 = 392 tokens), so the reference
attention (swin_transformer.py:138-169) materializes (B_windows, heads,
N, N) float32 logit/softmax tensors in HBM — profiled at ~60% of the
whole Swin-B adaptation step once the bias gather was fixed: per stage-1
block that tensor is 128x4x392x392 f32 = 315 MB written and re-read
several times, forward and backward.

Because one (window, head) attention problem fits entirely in VMEM
(q/k/v 392x32, logits 392x392 f32 = 614 KB), no online/flash softmax is
needed: one grid step = one full attention problem, logits live only in
registers/VMEM, and HBM sees just q/k/v/out (+ the per-head bias, which
stays resident across the window axis of the grid).

Backward is a second kernel per (head, window): recompute the softmax
in VMEM, emit dq/dk/dv and accumulate the bias cotangent across windows
in the revisited output block (the bias table gradient then flows
through the factored one-hot einsums outside — see
models/swin.py:relative_position_bias).  The shift mask is a constant
(no gradient).

Layouts: tensors are carried head-major (nh, B_, N, hd) so each block's
trailing dims are (N, hd) with hd == the full minor dimension (Mosaic's
block rule), and the per-head bias block (1, N, N) is revisited across
the inner window axis of the (head, window) grid — one DMA per head.

Falls back to the jnp einsum path off-TPU or for clamped windows (the
engine's shapes are static, so selection happens at trace time).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def attention_reference(q, k, v, bias, mask, scale):
    """jnp reference == the unfused model math (swin_transformer.py:138-169).

    q, k, v: (B_, N, nh, hd); bias (nh, N, N) f32; mask (nW, N, N) f32
    or None; returns (B_, N, nh, hd) in q.dtype."""
    b_, n, nh, hd = q.shape
    attn = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k,
                      preferred_element_type=jnp.float32)
    attn = attn + bias[None].astype(jnp.float32)
    if mask is not None:
        nw = mask.shape[0]
        attn = attn.reshape(b_ // nw, nw, nh, n, n) + mask[None, :, None]
        attn = attn.reshape(b_, nh, n, n)
    attn = jax.nn.softmax(attn, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", attn, v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def _logits(qb, kb, bias_b, mask_b, scale):
    """(N, N) f32 attention logits for one (head, window) problem."""
    qf = qb[0, 0].astype(jnp.float32) * scale
    kf = kb[0, 0].astype(jnp.float32)
    l = jax.lax.dot_general(qf, kf, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    l = l + bias_b[0].astype(jnp.float32)
    if mask_b is not None:
        l = l + mask_b[0].astype(jnp.float32)
    return l


def _softmax(l):
    m = jnp.max(l, axis=-1, keepdims=True)
    e = jnp.exp(l - m)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def _fwd_kernel(qb, kb, vb, bias_b, mask_b, o_ref, *, scale):
    p = _softmax(_logits(qb, kb, bias_b, mask_b, scale))
    vf = vb[0, 0].astype(jnp.float32)
    out = jax.lax.dot_general(p, vf, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    o_ref[0, 0] = out.astype(o_ref.dtype)


def _bwd_kernel(qb, kb, vb, bias_b, mask_b, gb,
                dq_ref, dk_ref, dv_ref, dbias_ref, *, scale):
    b = pl.program_id(1)
    p = _softmax(_logits(qb, kb, bias_b, mask_b, scale))        # (N, N) f32
    gf = gb[0, 0].astype(jnp.float32)                           # (N, hd)
    vf = vb[0, 0].astype(jnp.float32)
    # dv = p^T @ g
    dv = jax.lax.dot_general(p, gf, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    # dp = g @ v^T ; dlogits = p * (dp - rowsum(dp * p))
    dp = jax.lax.dot_general(gf, vf, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dl = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    qf = qb[0, 0].astype(jnp.float32)
    kf = kb[0, 0].astype(jnp.float32)
    dq = jax.lax.dot_general(dl, kf, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32) * scale
    dk = jax.lax.dot_general(dl, qf, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32) * scale
    dq_ref[0, 0] = dq.astype(dq_ref.dtype)
    dk_ref[0, 0] = dk.astype(dk_ref.dtype)
    dv_ref[0, 0] = dv.astype(dv_ref.dtype)

    # bias cotangent: sum of dlogits over the (inner) window axis —
    # revisited output block, init on first window
    @pl.when(b == 0)
    def _():
        dbias_ref[0] = jnp.zeros_like(dbias_ref)[0]

    dbias_ref[0] += dl


def _specs(nh, b_, n, hd, nw, with_mask):
    qkv = pl.BlockSpec((1, 1, n, hd), lambda h, b: (h, b, 0, 0),
                       memory_space=pltpu.VMEM)
    bias = pl.BlockSpec((1, n, n), lambda h, b: (h, 0, 0),
                        memory_space=pltpu.VMEM)
    ins = [qkv, qkv, qkv, bias]
    if with_mask:
        ins.append(pl.BlockSpec((1, n, n), lambda h, b: (b % nw, 0, 0),
                                memory_space=pltpu.VMEM))
    return ins, qkv, bias


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def _pallas_attn_fwd(q3, k3, v3, bias, mask, scale, interpret=False):
    nh, b_, n, hd = q3.shape
    with_mask = mask is not None
    nw = mask.shape[0] if with_mask else 1
    ins, qkv, _ = _specs(nh, b_, n, hd, nw, with_mask)
    kern = functools.partial(_fwd_kernel, scale=scale) if with_mask else \
        functools.partial(lambda qb, kb, vb, bb, o, **kw:
                          _fwd_kernel(qb, kb, vb, bb, None, o, **kw),
                          scale=scale)
    args = (q3, k3, v3, bias) + ((mask,) if with_mask else ())
    return pl.pallas_call(
        kern,
        grid=(nh, b_),
        in_specs=ins,
        out_specs=qkv,
        out_shape=jax.ShapeDtypeStruct((nh, b_, n, hd), q3.dtype),
        interpret=interpret,
    )(*args)


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def _pallas_attn_bwd(q3, k3, v3, bias, mask, g3, scale, interpret=False):
    nh, b_, n, hd = q3.shape
    with_mask = mask is not None
    nw = mask.shape[0] if with_mask else 1
    ins, qkv, bias_spec = _specs(nh, b_, n, hd, nw, with_mask)
    ins = ins + [qkv]   # g3
    if with_mask:
        kern = functools.partial(_bwd_kernel, scale=scale)
    else:
        kern = functools.partial(
            lambda qb, kb, vb, bb, gb, dq, dk, dv, db, **kw:
            _bwd_kernel(qb, kb, vb, bb, None, gb, dq, dk, dv, db, **kw),
            scale=scale)
    args = (q3, k3, v3, bias) + ((mask,) if with_mask else ()) + (g3,)
    return pl.pallas_call(
        kern,
        grid=(nh, b_),
        in_specs=ins,
        out_specs=[qkv, qkv, qkv, bias_spec],
        out_shape=[
            jax.ShapeDtypeStruct((nh, b_, n, hd), q3.dtype),
            jax.ShapeDtypeStruct((nh, b_, n, hd), q3.dtype),
            jax.ShapeDtypeStruct((nh, b_, n, hd), q3.dtype),
            jax.ShapeDtypeStruct((nh, n, n), jnp.float32),
        ],
        interpret=interpret,
    )(*args)


# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _fused_attn(q3, k3, v3, bias, mask, scale, interpret=False):
    return _pallas_attn_fwd(q3, k3, v3, bias, mask, scale,
                            interpret=interpret)


def _fused_attn_fwd(q3, k3, v3, bias, mask, scale, interpret):
    out = _pallas_attn_fwd(q3, k3, v3, bias, mask, scale, interpret=interpret)
    return out, (q3, k3, v3, bias, mask)


def _fused_attn_bwd(scale, interpret, res, g3):
    q3, k3, v3, bias, mask = res
    dq, dk, dv, dbias = _pallas_attn_bwd(q3, k3, v3, bias, mask, g3, scale,
                                         interpret=interpret)
    dmask = None if mask is None else jnp.zeros_like(mask)
    return dq, dk, dv, dbias.astype(bias.dtype), dmask


_fused_attn.defvjp(_fused_attn_fwd, _fused_attn_bwd)


def fused_window_attention(q, k, v, bias, mask, scale, *,
                           use_pallas: bool = None, interpret: bool = False):
    """Fused softmax(q k^T * scale + bias [+ mask]) v for Swin windows.

    q, k, v: (B_, N, nh, hd); bias (nh, N, N) f32; mask (nW, N, N) f32
    or None.  Auto mode uses the Pallas kernel on TPU; the jnp einsum
    path (identical math) elsewhere.
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if not (use_pallas or interpret):
        return attention_reference(q, k, v, bias, mask, scale)
    to3 = lambda t: jnp.transpose(t, (2, 0, 1, 3))    # -> (nh, B_, N, hd)
    # the shift mask holds only 0/-100 (compute_shift_mask) — exact in
    # bf16, and the mask block is re-DMA'd every grid step (its window
    # index cycles), so half-width halves that traffic
    out3 = _fused_attn(to3(q), to3(k), to3(v), bias,
                       None if mask is None else mask.astype(jnp.bfloat16),
                       float(scale), interpret)
    return jnp.transpose(out3, (1, 2, 0, 3))          # -> (B_, N, nh, hd)
