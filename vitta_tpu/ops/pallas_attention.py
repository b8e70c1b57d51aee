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
    """(N, N) f32 attention logits for one (head, window) problem.

    The dot keeps its operands in the *carried* dtype (one MXU pass with
    f32 accumulation in bf16 mode — upcasting first forces a multi-pass
    f32 MXU matmul) and applies `scale` to the f32 logits instead of to
    q (identical math, no pre-dot rounding)."""
    l = jax.lax.dot_general(qb[0, 0], kb[0, 0], (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    l = l * scale + bias_b[0].astype(jnp.float32)
    if mask_b is not None:
        l = l + mask_b[0].astype(jnp.float32)
    return l


def _softmax_parts(l):
    """Unnormalized softmax numerator (f32) and row sums: the divide is
    folded into the (N, hd)-shaped consumer instead of the (N, N) p."""
    m = jnp.max(l, axis=-1, keepdims=True)
    e = jnp.exp(l - m)
    return e, jnp.sum(e, axis=-1, keepdims=True)


def _fwd_kernel(qb, kb, vb, bias_b, mask_b, o_ref, *, scale):
    e, s = _softmax_parts(_logits(qb, kb, bias_b, mask_b, scale))
    out = jax.lax.dot_general(e.astype(qb.dtype), vb[0, 0],
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    o_ref[0, 0] = (out / s).astype(o_ref.dtype)


def _bwd_kernel(qb, kb, vb, bias_b, mask_b, gb,
                dq_ref, dk_ref, dv_ref, dbias_ref, *, scale):
    b = pl.program_id(1)
    e, s = _softmax_parts(_logits(qb, kb, bias_b, mask_b, scale))
    # fold 1/s into the (N, hd)/(N, 1) consumers like the forward does —
    # p = e/s would be an (N, N) f32 divide on the VPU:
    #   dv = p^T g          = e^T (g * inv)
    #   rowsum(dp * p)      = rowsum(dp * e) * inv
    #   dl = p * (dp - rs)  = e * (dp - rs) * inv
    inv = 1.0 / s                                               # (N, 1)
    gs = (gb[0, 0].astype(jnp.float32) * inv).astype(qb.dtype)
    dv = jax.lax.dot_general(e.astype(qb.dtype), gs,
                             (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(gb[0, 0], vb[0, 0], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    rs = jnp.sum(dp * e, axis=-1, keepdims=True) * inv
    dl = e * (dp - rs) * inv
    dlc = dl.astype(qb.dtype)
    dq = jax.lax.dot_general(dlc, kb[0, 0], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32) * scale
    dk = jax.lax.dot_general(dlc, qb[0, 0], (((0,), (0,)), ((), ())),
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
        from vitta_tpu.ops.dispatch import pallas_enabled
        use_pallas = pallas_enabled()
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


# ---------------------------------------------------------------------------
# Packed single-pass kernel: all heads per window grid step.
#
# The head-major layout the (head, window) kernel above consumes costs a
# transpose chain around every attention (the (B_, N, 3, nh, hd) reshape
# + per-tensor transposes profiled ~8 ms/step on Swin-B).  This variant
# reads the qkv projection PACKED as it leaves the matmul — (B_, N, 3C)
# with lanes ordered (3, nh, hd) — slices each head statically in VMEM,
# and assembles the output directly in the natural (B_, N, C) layout, so
# XLA sees no layout change on either side of the kernel.  The bias
# block (nh, N, N) is revisited across the whole window grid: one DMA
# per pallas_call instead of one per head.
# ---------------------------------------------------------------------------

# all-head residency: bias (nh, N, N) f32 + double-buffered qkv/out
# blocks exceed the default 16 MB scoped-VMEM limit at stage 3 (nh=32)
_VMEM_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _proj_bwd_vmem_bytes(n, c, nh, itemsize, with_mask, with_ln=False):
    """Estimated scoped-VMEM stack of the projection-fused backward
    kernel (the step's largest kernel).  Major resident terms only,
    scaled by a fudge factor calibrated against Mosaic's own accounting:
    Swin-B stage 4 (n=392, c=1024, nh=32, bf16) measures 104.09 MB and
    this returns 104 MB."""
    b = 2 * nh * n * n * 4               # bias input + f32 dbias accumulator
    b += c * 3 * c * (itemsize + 4)      # qkv W + f32 dW accumulator
    b += c * c * (itemsize + 4)          # proj W + f32 dWp accumulator
    b += 8 * n * c * itemsize            # x/g/o_att/dx blocks, double-buffered
    if with_mask:
        b += 2 * n * n * 2               # bf16 mask block, double-buffered
    b += 2 * n * 3 * c * 4               # qh / dqkv f32 intermediates
    b += n * 3 * c * itemsize            # recomputed qkv at compute dtype
    b += 2 * n * c * 4                   # g_att / pre-cast dx f32 temps
    b += 6 * n * n * 4                   # per-head softmax-recompute scratch
    if with_ln:
        b += n * c * (2 * itemsize + 4)  # y residual blocks + f32 x
    return int(b * 1.15)


def proj_fusion_fits(n, c, nh, itemsize, with_mask, with_ln=False,
                     budget=96 * 1024 * 1024):
    """Whether the projection-fused attention backward fits scoped VMEM.

    Swin-B's last stage (2 windows, C=1024, 32 heads) does not: its f32
    dW/dbias accumulators alone are ~32 MB and the measured stack is
    104 MB vs the 100 MB limit.  Fusion buys almost nothing there anyway
    (the whole qkv tensor is ~5 MB of HBM traffic at B_=2), so oversized
    shapes route to the packed kernel with XLA projections instead."""
    return _proj_bwd_vmem_bytes(n, c, nh, itemsize, with_mask,
                                with_ln) <= budget


def _packed_bwd_vmem_bytes(n, c, nh, itemsize, with_mask,
                           bias_elems=None):
    """Estimated scoped-VMEM stack of the packed backward kernel (all
    heads resident per window grid step).  Calibrated against Mosaic's
    accounting at Swin-B stage 4 (n=392, c=1024, nh=32): f32 measures
    117.67 MB on-chip (the round-4 bf16-gate run) and must be rejected;
    bf16 ran the whole round-4 flag sweep under the 100 MB limit and
    must keep fitting.  ``bias_elems`` overrides the per-bias-buffer
    element count for the compact Toeplitz form (nh*A*hw² instead of
    nh*N²); the assembled per-head dense bias then lives as one extra
    (N, N) f32 value in scratch."""
    if bias_elems is None:
        bias_elems = nh * n * n
    b = 2 * bias_elems * 4               # bias const block, double-buffered
    b += bias_elems * 4                  # f32 dbias revisited accumulator
    if bias_elems != nh * n * n:
        b += n * n * 4                   # in-VMEM assembled per-head bias
    # qkv/dqkv/g/ms tile blocks, double-buffered, at compute dtype
    b += 2 * n * (3 * c + 3 * c + c + 2 * nh) * itemsize
    b += 3 * n * c * 4                   # per-head dq/dk/dv pieces pre-concat
    b += 4 * n * n * 4                   # live l/e/dp recompute scratch
    if with_mask:
        b += 2 * n * n * 2               # bf16 mask block, double-buffered
    return int(b * 1.15)


def packed_fits(n, c, nh, itemsize, with_mask, bias_elems=None,
                budget=96 * 1024 * 1024) -> bool:
    """Whether the packed (all-heads-per-step) backward fits scoped
    VMEM.  Swin-B stage 4 in f32 does not with the dense bias
    (117.67 MB measured); such shapes route to the per-(head, window)
    kernel, whose per-step residency is a single head's slices (< 10 MB
    there).  The compact Toeplitz bias shrinks the two largest terms
    ~4x, which brings stage-4 f32 back under budget."""
    return _packed_bwd_vmem_bytes(n, c, nh, itemsize, with_mask,
                                  bias_elems) <= budget


def prefer_compact_bias(n, c, nh, itemsize, with_mask,
                        window: "tuple") -> bool:
    """Whether the attention call should carry the COMPACT Toeplitz bias.

    The compact form pays a per-(window, head) in-VMEM Toeplitz assembly
    inside the kernels, which the round-5 sweep measured as a flat
    REGRESSION where the dense-bias packed kernel fits (Swin-B bf16
    45.9 -> 56.4 ms/video: the standalone expansion kernel assembled
    once per block-pass; the in-kernel form re-assembles per window).
    It wins only where the dense bias's VMEM footprint would otherwise
    overflow the packed backward and force the far slower
    per-(head, window) fallback — Swin-B stage 4 in f32 (2 windows, so
    the assembly overhead is also at its smallest there).  This router
    returns True exactly for that case: dense overflows, compact fits."""
    wd, wh, ww = window
    if n != wd * wh * ww:
        return False                      # clamped window: jnp path
    compact_elems = nh * (2 * wd - 1) * (wh * ww) ** 2
    return (not packed_fits(n, c, nh, itemsize, with_mask)
            and packed_fits(n, c, nh, itemsize, with_mask, compact_elems))


def _head_slices(blk, h, nh, hd):
    c = nh * hd
    q = blk[:, h * hd:(h + 1) * hd]
    k = blk[:, c + h * hd:c + (h + 1) * hd]
    v = blk[:, 2 * c + h * hd:2 * c + (h + 1) * hd]
    return q, k, v


def _packed_logits(q, k, bias_h, mask_b, scale):
    l = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    l = l * scale + bias_h.astype(jnp.float32)
    if mask_b is not None:
        l = l + mask_b[0].astype(jnp.float32)
    return l


def _bias_head(bias_ref, h, wd):
    """Per-head dense (N, N) bias from the bias ref — either stored
    dense (nh, N, N), or COMPACT Toeplitz (nh, A, hw, hw) slices
    (ops/pallas_bias.py:compact_bias) assembled here in VMEM: the (hw,
    hw) block of the bias at block-row d1 / block-col d2 is slice
    d1-d2+wd-1.  Keeping the compact form on the wire removes the dense
    (nh, N, N) HBM round trip per (block, pass) — ~0.5 GB/step on
    Swin-B — and the standalone expansion/collapse kernels."""
    if len(bias_ref.shape) == 3:          # dense (nh, N, N)
        return bias_ref[h]
    rows = []
    for d1 in range(wd):
        rows.append(jnp.concatenate(
            [bias_ref[h, d1 - d2 + wd - 1] for d2 in range(wd)], axis=1))
    return jnp.concatenate(rows, axis=0)


def _dbias_accum(dbias_ref, h, wd, dl):
    """Accumulate the (N, N) bias cotangent ``dl`` into the dbias ref —
    dense add, or the Toeplitz collapse (mirror of _bias_head) when the
    ref is compact."""
    if len(dbias_ref.shape) == 3:
        dbias_ref[h] += dl
        return
    hw = dbias_ref.shape[-1]
    for a in range(2 * wd - 1):
        acc = None
        for d1 in range(wd):
            d2 = d1 - (a - wd + 1)
            if not 0 <= d2 < wd:
                continue
            blk = dl[d1 * hw:(d1 + 1) * hw, d2 * hw:(d2 + 1) * hw]
            acc = blk if acc is None else acc + blk
        dbias_ref[h, a] += acc


def _heads_fwd(blk, bias_ref, mask_ref, out_dtype, want_ms, *, scale, nh,
               hd, wd=None):
    """All-heads attention on a packed (N, 3C) qkv block in VMEM.
    Returns (concat output (N, C) in out_dtype, concat row max/sum
    (N, 2nh) f32 or None).

    Under ``VITTA_ATTN_PIPE`` the head loop is software-pipelined: head
    h+1's logits matmul (MXU) is issued in the middle of head h's VPU
    max/exp/sum chain, so the two units overlap instead of alternating
    idle — identical math, different program order (the slope-timed
    ablation in benchmarks/results/attn_bwd_micro_r5.jsonl measured the
    sequential order as matmuls + the WHOLE VPU chain, additive)."""
    from vitta_tpu.ops.dispatch import attn_pipe_enabled
    pipe = attn_pipe_enabled()

    def _logits_h(h):
        q, k, v = _head_slices(blk, h, nh, hd)
        return v, _packed_logits(q, k, _bias_head(bias_ref, h, wd),
                                 mask_ref, scale)

    outs, ms = [], []
    cur = _logits_h(0) if pipe else None
    for h in range(nh):
        if pipe:
            v, l = cur
        else:
            v, l = _logits_h(h)
        m = jnp.max(l, axis=-1, keepdims=True)
        e = jnp.exp(l - m)
        if pipe and h + 1 < nh:
            # next head's independent MXU work, issued mid-VPU-chain
            cur = _logits_h(h + 1)
        s = jnp.sum(e, axis=-1, keepdims=True)
        oh = jax.lax.dot_general(e.astype(blk.dtype), v,
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        outs.append((oh / s).astype(out_dtype))
        if want_ms:
            ms.extend([m, s])
    # ms: softmax row max+sum per head — the backward skips both
    # cross-lane (N, N) reductions by re-reading these
    return (jnp.concatenate(outs, axis=1),
            jnp.concatenate(ms, axis=1) if want_ms else None)


def _packed_fwd_kernel(qkv_ref, bias_ref, mask_ref, o_ref, ms_ref=None,
                       *, scale, nh, hd, wd=None):
    o, ms = _heads_fwd(qkv_ref[0], bias_ref, mask_ref, o_ref.dtype,
                       ms_ref is not None, scale=scale, nh=nh, hd=hd, wd=wd)
    o_ref[0] = o
    if ms_ref is not None:
        ms_ref[0] = ms


def _heads_bwd(blk, bias_ref, mask_ref, ms, g, dbias_ref, out_dtype,
               *, scale, nh, hd, wd=None):
    """Per-head backward on a packed (N, 3C) block; accumulates the bias
    cotangent in dbias_ref and returns dqkv (N, 3C) in ``out_dtype``.

    Under ``VITTA_ATTN_PIPE`` the loop is software-pipelined (see
    _heads_fwd): head h+1's two independent matmuls — the logits
    recompute and dp = g v^T — are issued between head h's VPU
    softmax/dl chain ops.  Identical math, reordered program only."""
    from vitta_tpu.ops.dispatch import attn_pipe_enabled
    pipe = attn_pipe_enabled()

    def _dp(gh, v):
        return jax.lax.dot_general(gh, v, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    def _mm_h(h):
        q, k, v = _head_slices(blk, h, nh, hd)
        gh = g[:, h * hd:(h + 1) * hd]
        # softmax numerator from the forward-saved row max/sum: the
        # logits matmul is re-done (MXU), but both cross-lane (N, N)
        # reductions are skipped
        l = _packed_logits(q, k, _bias_head(bias_ref, h, wd), mask_ref,
                           scale)
        # dp issued here (with the other independent MXU work) only in
        # pipe mode; the sequential path keeps its original position
        return q, k, v, gh, l, _dp(gh, v) if pipe else None

    dqs, dks, dvs = [], [], []
    cur = _mm_h(0) if pipe else None
    for h in range(nh):
        q, k, v, gh, l, dp = cur if pipe else _mm_h(h)
        e = jnp.exp(l - ms[:, 2 * h:2 * h + 1])
        if pipe and h + 1 < nh:
            # next head's independent MXU work, issued mid-VPU-chain
            cur = _mm_h(h + 1)
        s = ms[:, 2 * h + 1:2 * h + 2]
        # 1/s folded into the narrow consumers (see _bwd_kernel): no
        # (N, N) f32 divide, one broadcast multiply chain instead
        inv = 1.0 / s                                  # (N, 1) f32
        gs = (gh.astype(jnp.float32) * inv).astype(blk.dtype)
        dv = jax.lax.dot_general(e.astype(blk.dtype), gs,
                                 (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        if dp is None:
            dp = _dp(gh, v)
        rs = jnp.sum(dp * e, axis=-1, keepdims=True) * inv
        dl = e * (dp - rs) * inv
        _dbias_accum(dbias_ref, h, wd, dl)
        dlc = dl.astype(blk.dtype)
        dq = jax.lax.dot_general(dlc, k, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32) * scale
        dk = jax.lax.dot_general(dlc, q, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32) * scale
        dqs.append(dq.astype(out_dtype))
        dks.append(dk.astype(out_dtype))
        dvs.append(dv.astype(out_dtype))
    return jnp.concatenate(dqs + dks + dvs, axis=1)


def _packed_bwd_kernel(qkv_ref, bias_ref, mask_ref, ms_ref, g_ref,
                       dqkv_ref, dbias_ref, *, scale, nh, hd, wd=None):
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _():
        dbias_ref[...] = jnp.zeros_like(dbias_ref)

    dqkv_ref[0] = _heads_bwd(qkv_ref[0], bias_ref, mask_ref, ms_ref[0],
                             g_ref[0], dbias_ref, dqkv_ref.dtype,
                             scale=scale, nh=nh, hd=hd, wd=wd)


def _bias_spec(bias_shape):
    """Full-tensor constant-index block spec for the bias — dense
    (nh, N, N) or compact (nh, A, hw, hw)."""
    if len(bias_shape) == 3:
        return pl.BlockSpec(tuple(bias_shape), lambda b: (0, 0, 0),
                            memory_space=pltpu.VMEM)
    return pl.BlockSpec(tuple(bias_shape), lambda b: (0, 0, 0, 0),
                        memory_space=pltpu.VMEM)


def _packed_specs(n, c3, bias_shape, nw, with_mask):
    # one window per grid step; batching several windows per step was
    # measured SLOWER (48.1 vs 46.9 ms/video with up to 32 unrolled
    # (window, head) problems per step — the larger revisited working
    # set defeats Mosaic's double-buffering)
    qkv = pl.BlockSpec((1, n, c3), lambda b: (b, 0, 0),
                       memory_space=pltpu.VMEM)
    ins = [qkv, _bias_spec(bias_shape)]
    if with_mask:
        ins.append(pl.BlockSpec((1, n, n), lambda b: (b % nw, 0, 0),
                                memory_space=pltpu.VMEM))
    return ins, qkv


@functools.partial(jax.jit,
                   static_argnames=("scale", "nh", "save_ms", "interpret"))
def _packed_attn_fwd(qkv, bias, mask, scale, nh, save_ms=False,
                     interpret=False):
    b_, n, c3 = qkv.shape
    hd = c3 // 3 // nh
    wd = (bias.shape[1] + 1) // 2 if bias.ndim == 4 else None
    with_mask = mask is not None
    nw = mask.shape[0] if with_mask else 1
    ins, qkv_spec = _packed_specs(n, c3, bias.shape, nw, with_mask)
    if with_mask:
        kern = functools.partial(_packed_fwd_kernel, scale=scale, nh=nh,
                                 hd=hd, wd=wd)
    elif save_ms:
        kern = functools.partial(
            lambda qr, br, o, msr, **kw:
            _packed_fwd_kernel(qr, br, None, o, msr, **kw),
            scale=scale, nh=nh, hd=hd, wd=wd)
    else:
        kern = functools.partial(
            lambda qr, br, o, **kw: _packed_fwd_kernel(qr, br, None, o, **kw),
            scale=scale, nh=nh, hd=hd, wd=wd)
    args = (qkv, bias) + ((mask,) if with_mask else ())
    out_spec = pl.BlockSpec((1, n, c3 // 3), lambda b: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    out_specs = [out_spec]
    out_shapes = [jax.ShapeDtypeStruct((b_, n, c3 // 3), qkv.dtype)]
    if save_ms:
        out_specs.append(pl.BlockSpec((1, n, 2 * nh), lambda b: (b, 0, 0),
                                      memory_space=pltpu.VMEM))
        out_shapes.append(jax.ShapeDtypeStruct((b_, n, 2 * nh), jnp.float32))
    res = pl.pallas_call(
        kern,
        grid=(b_,),
        in_specs=ins,
        out_specs=out_specs,
        out_shape=out_shapes,
        compiler_params=_VMEM_PARAMS,
        interpret=interpret,
    )(*args)
    return res if save_ms else res[0]


@functools.partial(jax.jit, static_argnames=("scale", "nh", "interpret"))
def _packed_attn_bwd(qkv, bias, mask, ms, g, scale, nh, interpret=False):
    b_, n, c3 = qkv.shape
    hd = c3 // 3 // nh
    wd = (bias.shape[1] + 1) // 2 if bias.ndim == 4 else None
    with_mask = mask is not None
    nw = mask.shape[0] if with_mask else 1
    ins, qkv_spec = _packed_specs(n, c3, bias.shape, nw, with_mask)
    g_spec = pl.BlockSpec((1, n, c3 // 3), lambda b: (b, 0, 0),
                          memory_space=pltpu.VMEM)
    ms_spec = pl.BlockSpec((1, n, 2 * nh), lambda b: (b, 0, 0),
                           memory_space=pltpu.VMEM)
    ins = ins + [ms_spec, g_spec]
    if with_mask:
        kern = functools.partial(_packed_bwd_kernel, scale=scale, nh=nh,
                                 hd=hd, wd=wd)
    else:
        kern = functools.partial(
            lambda qr, br, msr, gr, dq, db, **kw:
            _packed_bwd_kernel(qr, br, None, msr, gr, dq, db, **kw),
            scale=scale, nh=nh, hd=hd, wd=wd)
    args = (qkv, bias) + ((mask,) if with_mask else ()) + (ms, g)
    return pl.pallas_call(
        kern,
        grid=(b_,),
        in_specs=ins,
        out_specs=[qkv_spec, _bias_spec(bias.shape)],
        out_shape=[
            jax.ShapeDtypeStruct((b_, n, c3), qkv.dtype),
            jax.ShapeDtypeStruct(tuple(bias.shape), jnp.float32),
        ],
        compiler_params=_VMEM_PARAMS,
        interpret=interpret,
    )(*args)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _packed_attn(qkv, bias, mask, scale, nh, interpret=False):
    return _packed_attn_fwd(qkv, bias, mask, scale, nh, interpret=interpret)


def _packed_attn_vjp_fwd(qkv, bias, mask, scale, nh, interpret):
    out, ms = _packed_attn_fwd(qkv, bias, mask, scale, nh, save_ms=True,
                               interpret=interpret)
    return out, (qkv, bias, mask, ms)


def _packed_attn_vjp_bwd(scale, nh, interpret, res, g):
    qkv, bias, mask, ms = res
    dqkv, dbias = _packed_attn_bwd(qkv, bias, mask, ms, g, scale, nh,
                                   interpret=interpret)
    dmask = None if mask is None else jnp.zeros_like(mask)
    return dqkv, dbias.astype(bias.dtype), dmask


_packed_attn.defvjp(_packed_attn_vjp_fwd, _packed_attn_vjp_bwd)


def fused_window_attention_packed(qkv, bias, mask, scale, nh, *,
                                  use_pallas: bool = None,
                                  interpret: bool = False):
    """Fused window attention on PACKED qkv.

    qkv: (B_, N, 3C) with lanes ordered (3, nh, hd) — the raw qkv
    projection output; bias is either the dense (nh, N, N) f32 bias or
    its COMPACT Toeplitz form (nh, A, hw, hw)
    (ops/pallas_bias.py:compact_bias) — the Pallas kernels consume the
    compact form natively (per-head assembly in VMEM; dense never
    touches HBM); mask (nW, N, N) f32 or None.  Returns (B_, N, C) —
    the natural input layout of the output projection.  Auto mode uses
    the Pallas kernel on TPU; elsewhere the jnp einsum path on the
    unpacked tensors (identical math).
    """
    b_, n, c3 = qkv.shape
    c = c3 // 3
    hd = c // nh
    compact = bias.ndim == 4
    if use_pallas is None:
        from vitta_tpu.ops.dispatch import pallas_enabled
        use_pallas = pallas_enabled()
    if not (use_pallas or interpret):
        if compact:
            from vitta_tpu.ops.pallas_bias import assemble_dense
            bias = assemble_dense(bias, (bias.shape[1] + 1) // 2,
                                  use_pallas=False)
        q5 = qkv.reshape(b_, n, 3, nh, hd)
        out = attention_reference(q5[:, :, 0], q5[:, :, 1], q5[:, :, 2],
                                  bias, mask, scale)
        return out.reshape(b_, n, c)
    bias_elems = bias.size if compact else None
    if use_pallas and not interpret and not packed_fits(
            n, c, nh, qkv.dtype.itemsize, mask is not None, bias_elems):
        # scoped-VMEM overflow route: the per-(head, window) kernel
        # keeps only one head's slices resident per grid step — it pays
        # the unpack transpose chain, but only on shapes the packed
        # kernel cannot compile at all.  (With the compact bias this
        # route is no longer taken for any Swin-B shape: stage-4 f32,
        # the one dense-bias overflow, fits compactly.)
        if compact:
            from vitta_tpu.ops.pallas_bias import assemble_dense
            bias = assemble_dense(bias, (bias.shape[1] + 1) // 2,
                                  use_pallas=True)
        q5 = qkv.reshape(b_, n, 3, nh, hd)
        out = fused_window_attention(q5[:, :, 0], q5[:, :, 1], q5[:, :, 2],
                                     bias, mask, scale, use_pallas=True)
        return out.reshape(b_, n, c)
    return _packed_attn(qkv, bias,
                        None if mask is None else mask.astype(jnp.bfloat16),
                        float(scale), nh, interpret)


# ---------------------------------------------------------------------------
# Projection-fused kernel: qkv = x @ W + b computed in the attention
# kernel's prologue (weights resident in VMEM across the window grid).
#
# With the projection outside, every block pays a full HBM round trip of
# the (B_, N, 3C) qkv tensor forward (Dense writes it, the kernel reads
# it) and again backward (dqkv written by the kernel, re-read by the
# Dense VJP, qkv residual re-read for dW) — ~3x the traffic of the
# (B_, N, C) input itself.  Here HBM sees only x, the output, and the
# (N, 3C)-sized per-window cotangent never leaves VMEM: the backward
# recomputes qkv (one MXU matmul), forms dqkv per head, then emits
# dx = dqkv W^T and accumulates dW = x^T dqkv / db = colsum(dqkv) in
# f32 in revisited output blocks (same pattern as ops/pallas_mlp.py dW).
# ---------------------------------------------------------------------------


def _proj_fwd_kernel(x_ref, w_ref, b_ref, wp_ref, bp_ref, bias_ref,
                     mask_ref, o_ref, res_ref=None, ms_ref=None,
                     *, scale, nh, hd):
    x = x_ref[0]                                       # (N, C)
    qh = jax.lax.dot_general(x, w_ref[...], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    # match flax Dense at the compute dtype: bf16 matmul result (f32
    # accumulation, rounded) + bf16 bias add
    blk = qh.astype(x.dtype) + b_ref[0]
    o_att, ms = _heads_fwd(blk, bias_ref, mask_ref, x.dtype,
                           ms_ref is not None, scale=scale, nh=nh, hd=hd)
    out = jax.lax.dot_general(o_att, wp_ref[...], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    o_ref[0] = out.astype(o_ref.dtype) + bp_ref[0]
    if res_ref is not None:
        # per-head attention output — the epilogue's dWp needs it; saving
        # one copy replaces the fwd-read + bwd-read the unfused proj
        # Dense paid on the same tensor
        res_ref[0] = o_att
    if ms_ref is not None:
        ms_ref[0] = ms


def _proj_bwd_kernel(x_ref, w_ref, b_ref, wp_ref, bias_ref, mask_ref,
                     res_ref, ms_ref, g_ref,
                     dx_ref, dw_ref, db_ref, dwp_ref, dbp_ref, dbias_ref,
                     *, scale, nh, hd):
    bidx = pl.program_id(0)
    x = x_ref[0]
    g = g_ref[0]                                       # (N, C) = d(out)
    o_att = res_ref[0]

    @pl.when(bidx == 0)
    def _():
        dbias_ref[...] = jnp.zeros_like(dbias_ref)
        dw_ref[...] = jnp.zeros_like(dw_ref)
        db_ref[...] = jnp.zeros_like(db_ref)
        dwp_ref[...] = jnp.zeros_like(dwp_ref)
        dbp_ref[...] = jnp.zeros_like(dbp_ref)

    # output-projection epilogue backward
    dwp_ref[...] += jax.lax.dot_general(o_att, g, (((0,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)
    dbp_ref[...] += jnp.sum(g.astype(jnp.float32), axis=0, keepdims=True)
    g_att = jax.lax.dot_general(g, wp_ref[...], (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32
                                ).astype(x.dtype)

    qh = jax.lax.dot_general(x, w_ref[...], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    blk = qh.astype(x.dtype) + b_ref[0]
    dqkv = _heads_bwd(blk, bias_ref, mask_ref, ms_ref[0], g_att,
                      dbias_ref, x.dtype, scale=scale, nh=nh, hd=hd)
    dx = jax.lax.dot_general(dqkv, w_ref[...], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dx_ref[0] = dx.astype(dx_ref.dtype)
    dw_ref[...] += jax.lax.dot_general(x, dqkv, (((0,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32)
    db_ref[...] += jnp.sum(dqkv.astype(jnp.float32), axis=0, keepdims=True)


def _proj_specs(n, c, nh, nw, with_mask):
    x_spec = pl.BlockSpec((1, n, c), lambda b: (b, 0, 0),
                          memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((c, 3 * c), lambda b: (0, 0),
                          memory_space=pltpu.VMEM)
    b_spec = pl.BlockSpec((1, 3 * c), lambda b: (0, 0),
                          memory_space=pltpu.VMEM)
    wp_spec = pl.BlockSpec((c, c), lambda b: (0, 0),
                           memory_space=pltpu.VMEM)
    bp_spec = pl.BlockSpec((1, c), lambda b: (0, 0),
                           memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((nh, n, n), lambda b: (0, 0, 0),
                             memory_space=pltpu.VMEM)
    ins = [x_spec, w_spec, b_spec, wp_spec, bp_spec, bias_spec]
    if with_mask:
        ins.append(pl.BlockSpec((1, n, n), lambda b: (b % nw, 0, 0),
                                memory_space=pltpu.VMEM))
    return ins, x_spec, w_spec, b_spec, wp_spec, bp_spec, bias_spec


@functools.partial(jax.jit,
                   static_argnames=("scale", "nh", "save_res", "interpret"))
def _proj_attn_fwd(x, w, b2d, wp, bp2d, bias, mask, scale, nh,
                   save_res=False, interpret=False):
    b_, n, c = x.shape
    hd = c // nh
    with_mask = mask is not None
    nw = mask.shape[0] if with_mask else 1
    ins = _proj_specs(n, c, nh, nw, with_mask)[0]
    if with_mask:
        kern = functools.partial(_proj_fwd_kernel, scale=scale, nh=nh, hd=hd)
    elif save_res:
        kern = functools.partial(
            lambda xr, wr, br, wpr, bpr, bb, o, rr, msr, **kw:
            _proj_fwd_kernel(xr, wr, br, wpr, bpr, bb, None, o, rr, msr,
                             **kw),
            scale=scale, nh=nh, hd=hd)
    else:
        kern = functools.partial(
            lambda xr, wr, br, wpr, bpr, bb, o, **kw:
            _proj_fwd_kernel(xr, wr, br, wpr, bpr, bb, None, o, **kw),
            scale=scale, nh=nh, hd=hd)
    args = (x, w, b2d, wp, bp2d, bias) + ((mask,) if with_mask else ())
    x_spec = ins[0]
    out_specs = [x_spec]
    out_shapes = [jax.ShapeDtypeStruct((b_, n, c), x.dtype)]
    if save_res:
        out_specs += [x_spec,
                      pl.BlockSpec((1, n, 2 * nh), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM)]
        out_shapes += [jax.ShapeDtypeStruct((b_, n, c), x.dtype),
                       jax.ShapeDtypeStruct((b_, n, 2 * nh), jnp.float32)]
    res = pl.pallas_call(
        kern,
        grid=(b_,),
        in_specs=ins,
        out_specs=out_specs,
        out_shape=out_shapes,
        compiler_params=_VMEM_PARAMS,
        interpret=interpret,
    )(*args)
    return res if save_res else res[0]


@functools.partial(jax.jit, static_argnames=("scale", "nh", "interpret"))
def _proj_attn_bwd(x, w, b2d, wp, bias, mask, o_att, ms, g, scale, nh,
                   interpret=False):
    b_, n, c = x.shape
    hd = c // nh
    with_mask = mask is not None
    nw = mask.shape[0] if with_mask else 1
    (_, x_spec, w_spec, b_spec, wp_spec, bp_spec,
     bias_spec) = _proj_specs(n, c, nh, nw, with_mask)
    ins = [x_spec, w_spec, b_spec, wp_spec, bias_spec]
    if with_mask:
        ins.append(pl.BlockSpec((1, n, n), lambda b: (b % nw, 0, 0),
                                memory_space=pltpu.VMEM))
    ins += [x_spec,                                   # o_att residual
            pl.BlockSpec((1, n, 2 * nh), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            x_spec]                                   # g
    if with_mask:
        kern = functools.partial(_proj_bwd_kernel, scale=scale, nh=nh, hd=hd)
    else:
        kern = functools.partial(
            lambda xr, wr, br, wpr, bb, rr, msr, gr,
            dx, dw, db, dwp, dbp, dbias, **kw:
            _proj_bwd_kernel(xr, wr, br, wpr, bb, None, rr, msr, gr,
                             dx, dw, db, dwp, dbp, dbias, **kw),
            scale=scale, nh=nh, hd=hd)
    args = (x, w, b2d, wp, bias) + ((mask,) if with_mask else ()) \
        + (o_att, ms, g)
    return pl.pallas_call(
        kern,
        grid=(b_,),
        in_specs=ins,
        out_specs=[x_spec, w_spec, b_spec, wp_spec, bp_spec, bias_spec],
        out_shape=[
            jax.ShapeDtypeStruct((b_, n, c), x.dtype),
            jax.ShapeDtypeStruct((c, 3 * c), jnp.float32),
            jax.ShapeDtypeStruct((1, 3 * c), jnp.float32),
            jax.ShapeDtypeStruct((c, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((nh, n, n), jnp.float32),
        ],
        compiler_params=_VMEM_PARAMS,
        interpret=interpret,
    )(*args)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def _proj_attn(x, w, b2d, wp, bp2d, bias, mask, scale, nh, interpret=False):
    return _proj_attn_fwd(x, w, b2d, wp, bp2d, bias, mask, scale, nh,
                          interpret=interpret)


def _proj_attn_vjp_fwd(x, w, b2d, wp, bp2d, bias, mask, scale, nh,
                       interpret):
    out, o_att, ms = _proj_attn_fwd(x, w, b2d, wp, bp2d, bias, mask, scale,
                                    nh, save_res=True, interpret=interpret)
    return out, (x, w, b2d, wp, bias, mask, o_att, ms)


def _proj_attn_vjp_bwd(scale, nh, interpret, res, g):
    x, w, b2d, wp, bias, mask, o_att, ms = res
    dx, dw, db, dwp, dbp, dbias = _proj_attn_bwd(
        x, w, b2d, wp, bias, mask, o_att, ms, g, scale, nh,
        interpret=interpret)
    dmask = None if mask is None else jnp.zeros_like(mask)
    return (dx, dw.astype(w.dtype), db.astype(b2d.dtype),
            dwp.astype(wp.dtype), dbp.astype(wp.dtype),
            dbias.astype(bias.dtype), dmask)


_proj_attn.defvjp(_proj_attn_vjp_fwd, _proj_attn_vjp_bwd)


# ---------------------------------------------------------------------------
# LayerNorm-prologue variant: norm1 -> qkv -> attention -> proj, ONE kernel.
#
# The pre-attention LayerNorm's output y is consumed only by the qkv
# projection (and the ViTTA output-side stat tap), so — exactly like the
# norm2->MLP prologue fusion (ops/pallas_mlp.py:_lnmlp_*) — computing it
# in the attention kernel's prologue removes the standalone per-block LN
# kernel and one (M, C) HBM read.  y is still emitted (the tap needs it,
# and its cotangent from the stat-regularization loss re-enters the
# fused backward as gy); mean/rstd are recomputed in backward from x.
# ---------------------------------------------------------------------------


def _ln_block(xf, gam, bet, eps):
    """One-pass f32 LayerNorm of a (N, C) block: returns (xh, rstd, y_f32)
    — same formulation as ops/pallas_ln.py / models/layers.py."""
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    msq = jnp.mean(xf * xf, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(msq - mu * mu + eps)
    xh = (xf - mu) * rstd
    return xh, rstd, xh * gam + bet


def _proj_ln_fwd_kernel(x_ref, gam_ref, bet_ref, w_ref, b_ref, wp_ref,
                        bp_ref, bias_ref, mask_ref, o_ref, y_ref,
                        res_ref=None, ms_ref=None, *, scale, nh, hd, eps):
    _, _, yf = _ln_block(x_ref[0].astype(jnp.float32),
                         gam_ref[0].astype(jnp.float32),
                         bet_ref[0].astype(jnp.float32), eps)
    yc = yf.astype(x_ref.dtype)
    y_ref[0] = yc
    qh = jax.lax.dot_general(yc, w_ref[...], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    blk = qh.astype(yc.dtype) + b_ref[0]
    o_att, ms = _heads_fwd(blk, bias_ref, mask_ref, yc.dtype,
                           ms_ref is not None, scale=scale, nh=nh, hd=hd)
    out = jax.lax.dot_general(o_att, wp_ref[...], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    o_ref[0] = out.astype(o_ref.dtype) + bp_ref[0]
    if res_ref is not None:
        res_ref[0] = o_att
    if ms_ref is not None:
        ms_ref[0] = ms


def _proj_ln_bwd_kernel(x_ref, gam_ref, bet_ref, w_ref, b_ref, wp_ref,
                        bias_ref, mask_ref, res_ref, ms_ref, g_ref, gy_ref,
                        dx_ref, dgam_ref, dbet_ref, dw_ref, db_ref,
                        dwp_ref, dbp_ref, dbias_ref,
                        *, scale, nh, hd, eps):
    bidx = pl.program_id(0)
    gam = gam_ref[0].astype(jnp.float32)
    xh, rstd, yf = _ln_block(x_ref[0].astype(jnp.float32), gam,
                             bet_ref[0].astype(jnp.float32), eps)
    yc = yf.astype(x_ref.dtype)
    g = g_ref[0]
    o_att = res_ref[0]

    @pl.when(bidx == 0)
    def _():
        dbias_ref[...] = jnp.zeros_like(dbias_ref)
        dw_ref[...] = jnp.zeros_like(dw_ref)
        db_ref[...] = jnp.zeros_like(db_ref)
        dwp_ref[...] = jnp.zeros_like(dwp_ref)
        dbp_ref[...] = jnp.zeros_like(dbp_ref)
        dgam_ref[...] = jnp.zeros_like(dgam_ref)
        dbet_ref[...] = jnp.zeros_like(dbet_ref)

    # output-projection epilogue backward (same as _proj_bwd_kernel)
    dwp_ref[...] += jax.lax.dot_general(o_att, g, (((0,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)
    dbp_ref[...] += jnp.sum(g.astype(jnp.float32), axis=0, keepdims=True)
    g_att = jax.lax.dot_general(g, wp_ref[...], (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32
                                ).astype(yc.dtype)

    qh = jax.lax.dot_general(yc, w_ref[...], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    blk = qh.astype(yc.dtype) + b_ref[0]
    dqkv = _heads_bwd(blk, bias_ref, mask_ref, ms_ref[0], g_att,
                      dbias_ref, yc.dtype, scale=scale, nh=nh, hd=hd)
    dy = jax.lax.dot_general(dqkv, w_ref[...], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dy += gy_ref[0].astype(jnp.float32)     # stat-tap cotangent on y
    dw_ref[...] += jax.lax.dot_general(yc, dqkv, (((0,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32)
    db_ref[...] += jnp.sum(dqkv.astype(jnp.float32), axis=0, keepdims=True)

    # LayerNorm backward (formulation of ops/pallas_mlp.py:_lnmlp_bwd_kernel)
    dgam_ref[...] += jnp.sum(dy * xh, axis=0, keepdims=True)
    dbet_ref[...] += jnp.sum(dy, axis=0, keepdims=True)
    wg = dy * gam
    dx = rstd * (wg - jnp.mean(wg, axis=-1, keepdims=True)
                 - xh * jnp.mean(wg * xh, axis=-1, keepdims=True))
    dx_ref[0] = dx.astype(dx_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "scale", "nh",
                                             "save_res", "interpret"))
def _proj_ln_attn_fwd(x, gam2d, bet2d, w, b2d, wp, bp2d, bias, mask, eps,
                      scale, nh, save_res=False, interpret=False):
    b_, n, c = x.shape
    hd = c // nh
    with_mask = mask is not None
    nw = mask.shape[0] if with_mask else 1
    ins = _proj_specs(n, c, nh, nw, with_mask)[0]
    ln_spec = pl.BlockSpec((1, c), lambda b: (0, 0), memory_space=pltpu.VMEM)
    ins = ins[:1] + [ln_spec, ln_spec] + ins[1:]
    kw = dict(scale=scale, nh=nh, hd=hd, eps=eps)
    if with_mask:
        kern = functools.partial(_proj_ln_fwd_kernel, **kw)
    elif save_res:
        kern = functools.partial(
            lambda xr, gr, btr, wr, br, wpr, bpr, bb, o, y, rr, msr, **k:
            _proj_ln_fwd_kernel(xr, gr, btr, wr, br, wpr, bpr, bb, None,
                                o, y, rr, msr, **k), **kw)
    else:
        kern = functools.partial(
            lambda xr, gr, btr, wr, br, wpr, bpr, bb, o, y, **k:
            _proj_ln_fwd_kernel(xr, gr, btr, wr, br, wpr, bpr, bb, None,
                                o, y, **k), **kw)
    args = (x, gam2d, bet2d, w, b2d, wp, bp2d, bias) \
        + ((mask,) if with_mask else ())
    x_spec = ins[0]
    out_specs = [x_spec, x_spec]
    out_shapes = [jax.ShapeDtypeStruct((b_, n, c), x.dtype),
                  jax.ShapeDtypeStruct((b_, n, c), x.dtype)]
    if save_res:
        out_specs += [x_spec,
                      pl.BlockSpec((1, n, 2 * nh), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM)]
        out_shapes += [jax.ShapeDtypeStruct((b_, n, c), x.dtype),
                       jax.ShapeDtypeStruct((b_, n, 2 * nh), jnp.float32)]
    return pl.pallas_call(
        kern,
        grid=(b_,),
        in_specs=ins,
        out_specs=out_specs,
        out_shape=out_shapes,
        compiler_params=_VMEM_PARAMS,
        interpret=interpret,
    )(*args)


@functools.partial(jax.jit, static_argnames=("eps", "scale", "nh",
                                             "interpret"))
def _proj_ln_attn_bwd(x, gam2d, bet2d, w, b2d, wp, bias, mask, o_att, ms,
                      g, gy, eps, scale, nh, interpret=False):
    b_, n, c = x.shape
    hd = c // nh
    with_mask = mask is not None
    nw = mask.shape[0] if with_mask else 1
    (_, x_spec, w_spec, b_spec, wp_spec, bp_spec,
     bias_spec) = _proj_specs(n, c, nh, nw, with_mask)
    ln_spec = pl.BlockSpec((1, c), lambda b: (0, 0), memory_space=pltpu.VMEM)
    ms_spec = pl.BlockSpec((1, n, 2 * nh), lambda b: (b, 0, 0),
                           memory_space=pltpu.VMEM)
    ins = [x_spec, ln_spec, ln_spec, w_spec, b_spec, wp_spec, bias_spec]
    if with_mask:
        ins.append(pl.BlockSpec((1, n, n), lambda b: (b % nw, 0, 0),
                                memory_space=pltpu.VMEM))
    ins += [x_spec, ms_spec, x_spec, x_spec]   # o_att, ms, g, gy
    kw = dict(scale=scale, nh=nh, hd=hd, eps=eps)
    if with_mask:
        kern = functools.partial(_proj_ln_bwd_kernel, **kw)
    else:
        kern = functools.partial(
            lambda xr, gr, btr, wr, br, wpr, bb, rr, msr, gg, gyr,
            dx, dgam, dbet, dw, db, dwp, dbp, dbias, **k:
            _proj_ln_bwd_kernel(xr, gr, btr, wr, br, wpr, bb, None, rr,
                                msr, gg, gyr, dx, dgam, dbet, dw, db,
                                dwp, dbp, dbias, **k), **kw)
    args = (x, gam2d, bet2d, w, b2d, wp, bias) \
        + ((mask,) if with_mask else ()) + (o_att, ms, g, gy)
    return pl.pallas_call(
        kern,
        grid=(b_,),
        in_specs=ins,
        out_specs=[x_spec, ln_spec, ln_spec, w_spec, b_spec, wp_spec,
                   bp_spec, bias_spec],
        out_shape=[
            jax.ShapeDtypeStruct((b_, n, c), x.dtype),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((c, 3 * c), jnp.float32),
            jax.ShapeDtypeStruct((1, 3 * c), jnp.float32),
            jax.ShapeDtypeStruct((c, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((nh, n, n), jnp.float32),
        ],
        compiler_params=_VMEM_PARAMS,
        interpret=interpret,
    )(*args)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11, 12))
def _proj_ln_attn(x, gam2d, bet2d, w, b2d, wp, bp2d, bias, mask, eps,
                  scale, nh, interpret=False):
    out, y = _proj_ln_attn_fwd(x, gam2d, bet2d, w, b2d, wp, bp2d, bias,
                               mask, eps, scale, nh, interpret=interpret)
    return out, y


def _proj_ln_attn_vjp_fwd(x, gam2d, bet2d, w, b2d, wp, bp2d, bias, mask,
                          eps, scale, nh, interpret):
    out, y, o_att, ms = _proj_ln_attn_fwd(
        x, gam2d, bet2d, w, b2d, wp, bp2d, bias, mask, eps, scale, nh,
        save_res=True, interpret=interpret)
    return (out, y), (x, gam2d, bet2d, w, b2d, wp, bias, mask, o_att, ms)


def _proj_ln_attn_vjp_bwd(eps, scale, nh, interpret, res, cot):
    g, gy = cot
    x, gam2d, bet2d, w, b2d, wp, bias, mask, o_att, ms = res
    dx, dgam, dbet, dw, db, dwp, dbp, dbias = _proj_ln_attn_bwd(
        x, gam2d, bet2d, w, b2d, wp, bias, mask, o_att, ms, g, gy,
        eps, scale, nh, interpret=interpret)
    dmask = None if mask is None else jnp.zeros_like(mask)
    return (dx, dgam.astype(gam2d.dtype), dbet.astype(bet2d.dtype),
            dw.astype(w.dtype), db.astype(b2d.dtype),
            dwp.astype(wp.dtype), dbp.astype(wp.dtype),
            dbias.astype(bias.dtype), dmask)


_proj_ln_attn.defvjp(_proj_ln_attn_vjp_fwd, _proj_ln_attn_vjp_bwd)


def ln_reference(x, gamma, beta, eps):
    """layers.py's one-pass f32 LayerNorm (the unfused norm1 math)."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    msq = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    yf = (xf - mu) * jax.lax.rsqrt(msq - jnp.square(mu) + eps) \
        * gamma.astype(jnp.float32) + beta.astype(jnp.float32)
    return yf.astype(x.dtype)


def fused_window_attention_ln_proj(x, gamma, beta, eps, w, b, wp, bp, bias,
                                   mask, scale, nh, dtype=jnp.float32, *,
                                   use_pallas: bool = None,
                                   interpret: bool = False):
    """LayerNorm + qkv projection + window attention + output projection
    in one kernel.  x: (B_, N, C) PRE-norm windows; gamma/beta stay f32
    (LayerNorm params); returns (out, y) with y = the LayerNorm output
    (the ViTTA output-side stat tap consumes it, and its cotangent
    re-enters the fused backward).  Off-TPU / clamped windows fall back
    to the unfused composition (identical math)."""
    if use_pallas is None:
        from vitta_tpu.ops.dispatch import pallas_enabled
        use_pallas = pallas_enabled()
    xc, wc, bc, wpc, bpc = (t.astype(dtype) for t in (x, w, b, wp, bp))
    if not (use_pallas or interpret):
        y = ln_reference(xc, gamma, beta, eps)
        qkv = jnp.dot(y, wc) + bc
        out = fused_window_attention_packed(qkv, bias, mask, scale, nh,
                                            use_pallas=False)
        return jnp.dot(out, wpc) + bpc, y
    b_, n, c = x.shape
    if use_pallas and not interpret and not proj_fusion_fits(
            n, c, nh, xc.dtype.itemsize, mask is not None, with_ln=True):
        # scoped-VMEM overflow route (Swin-B stage 4): XLA LN +
        # projections around the packed kernel (see proj_fusion_fits)
        y = ln_reference(xc, gamma, beta, eps)
        qkv = jnp.dot(y, wc) + bc
        out = fused_window_attention_packed(qkv, bias, mask, scale, nh,
                                            use_pallas=True)
        return jnp.dot(out, wpc) + bpc, y
    if bias.ndim == 4:
        from vitta_tpu.ops.pallas_bias import assemble_dense
        bias = assemble_dense(bias, (bias.shape[1] + 1) // 2,
                              use_pallas=use_pallas, interpret=interpret)
    return _proj_ln_attn(xc, gamma.reshape(1, -1), beta.reshape(1, -1),
                         wc, bc.reshape(1, -1), wpc, bpc.reshape(1, -1),
                         bias,
                         None if mask is None else mask.astype(jnp.bfloat16),
                         float(eps), float(scale), nh, interpret)


def fused_window_attention_proj(x, w, b, wp, bp, bias, mask, scale, nh,
                                dtype=jnp.float32, *,
                                use_pallas: bool = None,
                                interpret: bool = False):
    """qkv projection + window attention + output projection, one kernel.

    x: (B_, N, C); w (C, 3C) / b (3C,) and wp (C, C) / bp (C,) — the qkv
    and proj Dense parameters at storage dtype (cast to the compute
    ``dtype`` here, matching flax's promote_dtype, so cotangents flow
    back exactly as for nn.Dense); bias (nh, N, N) f32; mask (nW, N, N)
    f32 or None.  Returns (B_, N, C).  Off-TPU / clamped windows fall
    back to the explicit Dense/packed-reference composition (identical
    math)."""
    if use_pallas is None:
        from vitta_tpu.ops.dispatch import pallas_enabled
        use_pallas = pallas_enabled()
    xc, wc, bc, wpc, bpc = (t.astype(dtype) for t in (x, w, b, wp, bp))
    if not (use_pallas or interpret):
        qkv = jnp.dot(xc, wc) + bc
        out = fused_window_attention_packed(qkv, bias, mask, scale, nh,
                                            use_pallas=False)
        return jnp.dot(out, wpc) + bpc
    b_, n, c = x.shape
    from vitta_tpu.ops.dispatch import attn_proj_fused_enabled
    if use_pallas and not interpret and (
            not attn_proj_fused_enabled()
            or not proj_fusion_fits(n, c, nh, xc.dtype.itemsize,
                                    mask is not None)):
        # XLA qkv/proj matmuls + the packed kernel: the measured default
        # (round-4 sweep: packed beats proj-fused by 1.3-1.8 ms/video —
        # dispatch.py:attn_proj_fused_enabled) and the route for shapes
        # whose fused backward would overflow scoped VMEM (Swin-B
        # stage 4; see proj_fusion_fits)
        qkv = jnp.dot(xc, wc) + bc
        out = fused_window_attention_packed(qkv, bias, mask, scale, nh,
                                            use_pallas=True,
                                            interpret=interpret)
        return jnp.dot(out, wpc) + bpc
    if bias.ndim == 4:
        # the proj-fused kernel family stays dense-bias (default-off
        # routes); expand on-chip
        from vitta_tpu.ops.pallas_bias import assemble_dense
        bias = assemble_dense(bias, (bias.shape[1] + 1) // 2,
                              use_pallas=use_pallas, interpret=interpret)
    return _proj_attn(xc, wc, bc.reshape(1, -1), wpc, bpc.reshape(1, -1),
                      bias,
                      None if mask is None else mask.astype(jnp.bfloat16),
                      float(scale), nh, interpret)
