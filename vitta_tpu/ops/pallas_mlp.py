"""Pallas TPU kernel: fused Swin MLP (fc1 -> exact GELU -> fc2).

The reference MLP (swin_transformer.py:48-65) is two Linears around an
exact (erf) GELU.  Left to XLA, the block costs ~17.7 ms of the 54 ms
Swin-B adaptation step (round-3 trace) at a uniform ~20% MFU:

* the (M, 4C) fc1 output round-trips HBM between the two matmuls, three
  times per adaptation step (fwd x2 views + eval);
* the exact-erf GELU is evaluated inside the matmul fusions — and then
  *again* in the backward, where XLA additionally saves a u8 predicate
  tensor for the erf select;
* the backward runs four more (M, 4C)-wide fusions, each re-reading the
  saved activations.

This kernel runs the whole block per token tile in VMEM: the fc1 output
``h`` never reaches HBM.  The training forward additionally writes the
two tensors the backward actually needs — ``a = gelu(h)`` and
``s = gelu'(h)`` — so the backward is four MXU matmuls and one
elementwise multiply, with **no transcendentals at all** (the erf/exp
live only in the one forward pass).  Weight/bias gradients accumulate
in f32 VMEM across the sequential token grid (revisited output blocks,
same pattern as pallas_attention.py's bias cotangent).

The eval forward (not under grad) writes only the output tile: the
custom-VJP primal is the no-residual variant, so inference pays zero
extra bandwidth.

Falls back to the exact flax-Dense math off-TPU (models/swin.py:Mlp
carried the params; the tree layout — mlp/fc{1,2}/{kernel,bias} — is
unchanged).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SQRT_HALF = 0.7071067811865476
_INV_SQRT_2PI = 0.3989422804014327

# weight blocks + (tile, 4C) f32 intermediates + f32 dW accumulators —
# stage 3 (C=1024) peaks around 70 MB with the tile cap below
_VMEM_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _erf(x):
    """erf from exp: Mosaic has no erf primitive.  Rational erfc
    approximation (Numerical Recipes 6.2), |abs err| <= 4e-7 in f32 — below
    every tolerance in this model's parity suites and far below bf16
    resolution (the production compute dtype)."""
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.5 * ax)
    poly = -1.26551223 + t * (1.00002368 + t * (0.37409196 + t * (
        0.09678418 + t * (-0.18628806 + t * (0.27886807 + t * (
            -1.13520398 + t * (1.48851587 + t * (-0.82215223 +
                                                 t * 0.17087277))))))))
    erfc = t * jnp.exp(-ax * ax + poly)
    return jnp.where(x >= 0, 1.0 - erfc, erfc - 1.0)


def _gelu_parts(h):
    """Exact GELU value and derivative on f32 ``h``.

    a = h * Phi(h);  s = Phi(h) + h * phi(h)   (Phi/phi: std normal
    CDF/PDF) — the same math autodiff derives for jax.nn.gelu
    (approximate=False), evaluated once while ``h`` is VMEM-resident.
    """
    phi = 0.5 * (1.0 + _erf(h * _SQRT_HALF))
    a = h * phi
    s = phi + h * jnp.exp(-0.5 * h * h) * _INV_SQRT_2PI
    return a, s


def _row_cap(c: int, f: int, itemsize: int,
             n_ctiles: int, n_ftiles: int, n_waccum: int) -> int:
    """Max token rows per grid step under the scoped-VMEM budget.

    The stack of one grid step is modeled as a fixed part plus a
    per-token-row part, calibrated against two measured on-chip
    overflows of the LN-MLP backward at Swin-B stage 4 (C=1024,
    F=4096): bf16 @ mt=392 allocated 101.93 MB, and f32 @ mt=112
    allocated 106.70 MB (the round-4 bf16-gate run).  The bf16 number
    decomposes exactly as double-buffered weight const blocks
    (2 x 2 x C*F*2 = 33.6M) + single-buffered f32 dW accumulators
    (2 x C*F*4 = 33.6M) + double-buffered IO tiles — so the weight
    blocks are counted TWICE (Pallas double-buffers const blocks like
    any other), and ``n_waccum`` counts the revisited f32 C*F output
    accumulators (2 for the backwards, 0 for the forwards, which have
    none).  The per-row part keeps a 1.2 safety factor for Mosaic's
    vector temporaries.
    """
    budget = 88 * 1024 * 1024   # headroom under _VMEM_PARAMS's 100 MB
    fixed = 4 * c * f * itemsize + n_waccum * c * f * 4
    row = int((2 * (n_ctiles * c + n_ftiles * f) * itemsize
               + (2 * f + 6 * c) * 4) * 1.2)
    return (budget - fixed) // row if budget > fixed else 0


def mlp_fusion_fits(m: int, c: int, f: int, itemsize: int,
                    with_ln: bool = False) -> bool:
    """True when the VMEM-worst variant (the backward kernel) has a
    usable row tile — at Swin-B stage 4 in f32 the weight blocks plus
    dW accumulators alone exceed the scoped budget (measured 106.70M
    vs the 100M limit), so the whole op must take the unfused path."""
    return _row_cap(c, f, itemsize, 5 if with_ln else 3, 2, 2) >= 8


def _tile_rows(m: int, c: int, f: int, itemsize: int,
               n_ctiles: int, n_ftiles: int, n_waccum: int) -> int:
    """Largest divisor of ``m`` whose VMEM stack estimate fits (see
    _row_cap).  Token counts here (B*D*H*W) are rich in small factors,
    so a divisor near the cap always exists."""
    cap = max(1, _row_cap(c, f, itemsize, n_ctiles, n_ftiles, n_waccum))
    # legacy cap: (tile, F) f32 intermediates ~<= 8 MB
    cap = max(1, min(2048, cap, (1 << 21) // max(f, 1)))
    if m <= cap:
        return m
    # Mosaic block rule: a non-full second-to-last block dim must be a
    # multiple of 8 sublanes
    best = None
    for t in range(cap - cap % 8, 0, -8):
        if m % t == 0:
            best = t
            break
    if best is None:   # no 8-multiple divisor under the cap: fall back
        best = 1       # to the largest plain divisor (full-dim blocks
        for t in range(min(cap, m), 0, -1):   # are exempt when t == m)
            if m % t == 0:
                best = t
                break
    return best


def _fwd_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref,
                a_ref=None, s_ref=None):
    h = jax.lax.dot_general(x_ref[...], w1_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    h += b1_ref[...].astype(jnp.float32)
    a, s = _gelu_parts(h)
    ac = a.astype(x_ref.dtype)
    o = jax.lax.dot_general(ac, w2_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o += b2_ref[...].astype(jnp.float32)
    o_ref[...] = o.astype(o_ref.dtype)
    if a_ref is not None:
        a_ref[...] = ac
        s_ref[...] = s.astype(s_ref.dtype)


def _bwd_kernel(x_ref, a_ref, s_ref, g_ref, w1_ref, w2_ref,
                dx_ref, dw1_ref, dw2_ref, db1_ref, db2_ref):
    i = pl.program_id(0)
    g = g_ref[...]                                            # (Mt, C)
    # da = g @ W2^T ; dh = da * gelu'(h)
    da = jax.lax.dot_general(g, w2_ref[...], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dh = da * s_ref[...].astype(jnp.float32)
    dhc = dh.astype(g.dtype)
    dx = jax.lax.dot_general(dhc, w1_ref[...], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dx_ref[...] = dx.astype(dx_ref.dtype)
    dw1 = jax.lax.dot_general(x_ref[...], dhc, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dw2 = jax.lax.dot_general(a_ref[...], g, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    db1 = jnp.sum(dh, axis=0, keepdims=True)
    db2 = jnp.sum(g.astype(jnp.float32), axis=0, keepdims=True)

    @pl.when(i == 0)
    def _():
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)

    dw1_ref[...] += dw1
    dw2_ref[...] += dw2
    db1_ref[...] += db1
    db2_ref[...] += db2


def _const_spec(shape):
    return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                        memory_space=pltpu.VMEM)


@functools.partial(jax.jit, static_argnames=("save_residuals", "interpret"))
def _pallas_mlp_fwd(x2, w1, b1, w2, b2, save_residuals, interpret=False):
    m, c = x2.shape
    f = w1.shape[1]
    mt = _tile_rows(m, c, f, x2.dtype.itemsize, 2, 2, 0)
    tile = pl.BlockSpec((mt, c), lambda i: (i, 0), memory_space=pltpu.VMEM)
    ftile = pl.BlockSpec((mt, f), lambda i: (i, 0), memory_space=pltpu.VMEM)
    ins = [tile, _const_spec((c, f)), _const_spec((1, f)),
           _const_spec((f, c)), _const_spec((1, c))]
    outs = [tile]
    out_shapes = [jax.ShapeDtypeStruct((m, c), x2.dtype)]
    if save_residuals:
        outs += [ftile, ftile]
        out_shapes += [jax.ShapeDtypeStruct((m, f), x2.dtype),
                       jax.ShapeDtypeStruct((m, f), x2.dtype)]
        kern = _fwd_kernel
    else:
        kern = functools.partial(_fwd_kernel, a_ref=None, s_ref=None)
    res = pl.pallas_call(
        kern,
        grid=(m // mt,),
        in_specs=ins,
        out_specs=outs if save_residuals else outs[0],
        out_shape=out_shapes if save_residuals else out_shapes[0],
        compiler_params=_VMEM_PARAMS,
        interpret=interpret,
    )(x2, w1, b1.reshape(1, f), w2, b2.reshape(1, c))
    return res if save_residuals else (res,)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _pallas_mlp_bwd(x2, a, s, g, w1, w2, interpret=False):
    m, c = x2.shape
    f = w1.shape[1]
    mt = _tile_rows(m, c, f, x2.dtype.itemsize, 3, 2, 2)
    tile = pl.BlockSpec((mt, c), lambda i: (i, 0), memory_space=pltpu.VMEM)
    ftile = pl.BlockSpec((mt, f), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _bwd_kernel,
        grid=(m // mt,),
        in_specs=[tile, ftile, ftile, tile,
                  _const_spec((c, f)), _const_spec((f, c))],
        out_specs=[tile, _const_spec((c, f)), _const_spec((f, c)),
                   _const_spec((1, f)), _const_spec((1, c))],
        out_shape=[
            jax.ShapeDtypeStruct((m, c), x2.dtype),
            jax.ShapeDtypeStruct((c, f), jnp.float32),
            jax.ShapeDtypeStruct((f, c), jnp.float32),
            jax.ShapeDtypeStruct((1, f), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ],
        compiler_params=_VMEM_PARAMS,
        interpret=interpret,
    )(x2, a, s, g, w1, w2)


# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _fused_mlp(x2, w1, b1, w2, b2, interpret=False):
    # primal (not under grad == the eval forward): no residual outputs
    (o,) = _pallas_mlp_fwd(x2, w1, b1, w2, b2, False, interpret=interpret)
    return o


def _fused_mlp_vjp_fwd(x2, w1, b1, w2, b2, interpret):
    o, a, s = _pallas_mlp_fwd(x2, w1, b1, w2, b2, True, interpret=interpret)
    return o, (x2, w1, w2, a, s)


def _fused_mlp_vjp_bwd(interpret, res, g):
    x2, w1, w2, a, s = res
    dx, dw1, dw2, db1, db2 = _pallas_mlp_bwd(x2, a, s, g, w1, w2,
                                             interpret=interpret)
    return (dx, dw1.astype(w1.dtype), db1[0].astype(w1.dtype),
            dw2.astype(w2.dtype), db2[0].astype(w2.dtype))


_fused_mlp.defvjp(_fused_mlp_vjp_fwd, _fused_mlp_vjp_bwd)


def mlp_reference(x, w1, b1, w2, b2):
    """The unfused math == flax Dense/gelu/Dense at the carried dtype
    (swin_transformer.py:48-65)."""
    h = jnp.dot(x, w1) + b1
    a = jax.nn.gelu(h, approximate=False)
    return jnp.dot(a, w2) + b2


# ---------------------------------------------------------------------------
# LayerNorm-prologue variant: norm2 -> fc1 -> GELU -> fc2 in ONE kernel.
#
# The pre-MLP LayerNorm's output y is consumed only by fc1 (and the
# ViTTA output-side stat tap), so computing it in the MLP kernel's
# scratch removes a full (M, C) HBM round-trip plus ~48 separate LN
# kernel launches per step.  y is still emitted (the tap needs it, and
# its cotangent from the stat-regularization loss re-enters the fused
# backward as dy), mean/rstd are recomputed in backward from x exactly
# like ops/pallas_ln.py.
# ---------------------------------------------------------------------------


def _ln_rows(x_ref, g_ref, b_ref, eps):
    xf = x_ref[...].astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    msq = jnp.mean(xf * xf, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(msq - mu * mu + eps)
    xh = (xf - mu) * rstd
    return xh, rstd, xh * g_ref[...].astype(jnp.float32) + \
        b_ref[...].astype(jnp.float32)


def _lnmlp_fwd_kernel(x_ref, g_ref, bt_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                      o_ref, y_ref, a_ref=None, s_ref=None, *, eps):
    _, _, yf = _ln_rows(x_ref, g_ref, bt_ref, eps)
    yc = yf.astype(y_ref.dtype)
    y_ref[...] = yc
    h = jax.lax.dot_general(yc, w1_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    h += b1_ref[...].astype(jnp.float32)
    a, s = _gelu_parts(h)
    ac = a.astype(x_ref.dtype)
    o = jax.lax.dot_general(ac, w2_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o += b2_ref[...].astype(jnp.float32)
    o_ref[...] = o.astype(o_ref.dtype)
    if a_ref is not None:
        a_ref[...] = ac
        s_ref[...] = s.astype(s_ref.dtype)


def _lnmlp_bwd_kernel(x_ref, y_ref, a_ref, s_ref, go_ref, gy_ref,
                      g_ref, w1_ref, w2_ref,
                      dx_ref, dg_ref, dbt_ref, dw1_ref, dw2_ref,
                      db1_ref, db2_ref, *, eps):
    i = pl.program_id(0)
    go = go_ref[...]                                          # (Mt, C)
    da = jax.lax.dot_general(go, w2_ref[...], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dh = da * s_ref[...].astype(jnp.float32)
    dhc = dh.astype(go.dtype)
    dy = jax.lax.dot_general(dhc, w1_ref[...], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dy += gy_ref[...].astype(jnp.float32)   # stat-tap cotangent on y
    dw1 = jax.lax.dot_general(y_ref[...], dhc, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dw2 = jax.lax.dot_general(a_ref[...], go, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    db1 = jnp.sum(dh, axis=0, keepdims=True)
    db2 = jnp.sum(go.astype(jnp.float32), axis=0, keepdims=True)

    # LayerNorm backward (same formulation as ops/pallas_ln.py:_bwd_kernel)
    xf = x_ref[...].astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    msq = jnp.mean(xf * xf, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(msq - mu * mu + eps)
    xh = (xf - mu) * rstd
    dg = jnp.sum(dy * xh, axis=0, keepdims=True)
    dbt = jnp.sum(dy, axis=0, keepdims=True)
    wg = dy * g_ref[...].astype(jnp.float32)
    dx = rstd * (wg - jnp.mean(wg, axis=-1, keepdims=True)
                 - xh * jnp.mean(wg * xh, axis=-1, keepdims=True))
    dx_ref[...] = dx.astype(dx_ref.dtype)

    @pl.when(i == 0)
    def _():
        dg_ref[...] = jnp.zeros_like(dg_ref)
        dbt_ref[...] = jnp.zeros_like(dbt_ref)
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)

    dg_ref[...] += dg
    dbt_ref[...] += dbt
    dw1_ref[...] += dw1
    dw2_ref[...] += dw2
    db1_ref[...] += db1
    db2_ref[...] += db2


def _pipe_half(mt: int):
    """First-half row count for the pipelined kernels, or None when the
    tile is too small to split.  Both halves must keep the 8-sublane
    multiple, so the split point is the 8-aligned floor of mt/2 — the
    halves may be uneven (e.g. mt=392 -> 192+200, the Swin-B stage-3
    backward tile), which is fine: every split op is per-row."""
    from vitta_tpu.ops.dispatch import mlp_pipe_enabled
    if not mlp_pipe_enabled():
        return None
    if mt % 8 != 0 or mt < 64:
        return None
    return (mt // 16) * 8


def _lnmlp_fwd_kernel_pipe(x_ref, g_ref, bt_ref, w1_ref, b1_ref, w2_ref,
                           b2_ref, o_ref, y_ref, a_ref=None, s_ref=None,
                           *, eps, half):
    """Software-pipelined _lnmlp_fwd_kernel: the row tile is processed
    as two halves with phases interleaved so half B's VPU work (LN,
    GELU) overlaps half A's MXU matmuls.  Every op is per-row, so the
    math is unchanged (backends may re-block the split-M matmuls:
    ulp-level reassociation only — tested)."""
    g_ = g_ref[...].astype(jnp.float32)
    bt = bt_ref[...].astype(jnp.float32)
    w1 = w1_ref[...]
    b1 = b1_ref[...].astype(jnp.float32)
    w2 = w2_ref[...]
    b2 = b2_ref[...].astype(jnp.float32)

    def ln(xp):
        xf = xp.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        msq = jnp.mean(xf * xf, axis=-1, keepdims=True)
        rstd = jax.lax.rsqrt(msq - mu * mu + eps)
        return ((xf - mu) * rstd * g_ + bt).astype(y_ref.dtype)

    def fc1(yc):
        return jax.lax.dot_general(yc, w1, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32) + b1

    def fc2(ac):
        return jax.lax.dot_general(ac, w2, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32) + b2

    x = x_ref[...]
    # program order interleaves the halves: each MXU matmul is issued
    # with the OTHER half's VPU chain pending, so the units overlap
    yA = ln(x[:half])                     # VPU
    hA = fc1(yA)                          # MXU
    yB = ln(x[half:])                     # VPU (overlaps hA)
    hB = fc1(yB)                          # MXU
    aA, sA = _gelu_parts(hA)              # VPU (overlaps hB)
    acA = aA.astype(x_ref.dtype)
    oA = fc2(acA)                         # MXU
    aB, sB = _gelu_parts(hB)              # VPU (overlaps oA)
    acB = aB.astype(x_ref.dtype)
    oB = fc2(acB)                         # MXU
    y_ref[...] = jnp.concatenate([yA, yB], axis=0)
    o_ref[...] = jnp.concatenate([oA.astype(o_ref.dtype),
                                  oB.astype(o_ref.dtype)], axis=0)
    if a_ref is not None:
        a_ref[...] = jnp.concatenate([acA, acB], axis=0)
        s_ref[...] = jnp.concatenate([sA.astype(s_ref.dtype),
                                      sB.astype(s_ref.dtype)], axis=0)


def _lnmlp_bwd_kernel_pipe(x_ref, y_ref, a_ref, s_ref, go_ref, gy_ref,
                           g_ref, w1_ref, w2_ref,
                           dx_ref, dg_ref, dbt_ref, dw1_ref, dw2_ref,
                           db1_ref, db2_ref, *, eps, half):
    """Software-pipelined _lnmlp_bwd_kernel.  The per-row chains (da,
    dh, dy, LayerNorm backward, dx) are computed per half with phases
    interleaved; the weight/bias-gradient reductions then run over the
    reconstituted full-tile tensors, so each reduction keeps the
    sequential kernel's accumulation order (residual difference is
    ulp-level matmul re-blocking only — tested)."""
    i = pl.program_id(0)
    w1 = w1_ref[...]
    w2 = w2_ref[...]
    gf = g_ref[...].astype(jnp.float32)
    go = go_ref[...]
    s = s_ref[...]
    gy = gy_ref[...]
    x = x_ref[...]

    def da_of(gop):
        return jax.lax.dot_general(gop, w2, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    def dy_of(dhcp, gyp):
        return jax.lax.dot_general(dhcp, w1, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32
                                   ) + gyp.astype(jnp.float32)

    def ln_bwd(xp, dyp):
        xf = xp.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        msq = jnp.mean(xf * xf, axis=-1, keepdims=True)
        rstd = jax.lax.rsqrt(msq - mu * mu + eps)
        xh = (xf - mu) * rstd
        wg = dyp * gf
        dx = rstd * (wg - jnp.mean(wg, axis=-1, keepdims=True)
                     - xh * jnp.mean(wg * xh, axis=-1, keepdims=True))
        return xh, dx

    # interleaved per-half chains (MXU issues against the other half's
    # pending VPU work)
    daA = da_of(go[:half])                             # MXU
    dhA = daA * s[:half].astype(jnp.float32)           # VPU
    daB = da_of(go[half:])                             # MXU (overlaps dhA)
    dhcA = dhA.astype(go.dtype)
    dyA = dy_of(dhcA, gy[:half])                       # MXU
    dhB = daB * s[half:].astype(jnp.float32)           # VPU (overlaps dyA)
    dhcB = dhB.astype(go.dtype)
    dyB = dy_of(dhcB, gy[half:])                       # MXU
    xhA, dxA = ln_bwd(x[:half], dyA)                   # VPU (overlaps dyB)
    # full-tile reductions, issued while half B's LN backward runs
    dh = jnp.concatenate([dhA, dhB], axis=0)
    dhc = jnp.concatenate([dhcA, dhcB], axis=0)
    dw1 = jax.lax.dot_general(y_ref[...], dhc, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)    # MXU
    xhB, dxB = ln_bwd(x[half:], dyB)                   # VPU (overlaps dw1)
    dw2 = jax.lax.dot_general(a_ref[...], go, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)    # MXU
    dy = jnp.concatenate([dyA, dyB], axis=0)
    xh = jnp.concatenate([xhA, xhB], axis=0)
    dg = jnp.sum(dy * xh, axis=0, keepdims=True)
    dbt = jnp.sum(dy, axis=0, keepdims=True)
    db1 = jnp.sum(dh, axis=0, keepdims=True)
    db2 = jnp.sum(go.astype(jnp.float32), axis=0, keepdims=True)
    dx_ref[...] = jnp.concatenate([dxA, dxB], axis=0).astype(dx_ref.dtype)

    @pl.when(i == 0)
    def _():
        dg_ref[...] = jnp.zeros_like(dg_ref)
        dbt_ref[...] = jnp.zeros_like(dbt_ref)
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)

    dg_ref[...] += dg
    dbt_ref[...] += dbt
    dw1_ref[...] += dw1
    dw2_ref[...] += dw2
    db1_ref[...] += db1
    db2_ref[...] += db2


@functools.partial(jax.jit,
                   static_argnames=("eps", "save_residuals", "interpret"))
def _pallas_lnmlp_fwd(x2, g, bt, w1, b1, w2, b2, eps, save_residuals,
                      interpret=False):
    m, c = x2.shape
    f = w1.shape[1]
    mt = _tile_rows(m, c, f, x2.dtype.itemsize, 3, 2, 0)
    tile = pl.BlockSpec((mt, c), lambda i: (i, 0), memory_space=pltpu.VMEM)
    ftile = pl.BlockSpec((mt, f), lambda i: (i, 0), memory_space=pltpu.VMEM)
    ins = [tile, _const_spec((1, c)), _const_spec((1, c)),
           _const_spec((c, f)), _const_spec((1, f)),
           _const_spec((f, c)), _const_spec((1, c))]
    outs = [tile, tile]
    out_shapes = [jax.ShapeDtypeStruct((m, c), x2.dtype),
                  jax.ShapeDtypeStruct((m, c), x2.dtype)]
    half = _pipe_half(mt)
    fwd_kern = (functools.partial(_lnmlp_fwd_kernel_pipe, half=half)
                if half else _lnmlp_fwd_kernel)
    if save_residuals:
        outs += [ftile, ftile]
        out_shapes += [jax.ShapeDtypeStruct((m, f), x2.dtype),
                       jax.ShapeDtypeStruct((m, f), x2.dtype)]
        kern = functools.partial(fwd_kern, eps=eps)
    else:
        kern = functools.partial(fwd_kern, a_ref=None, s_ref=None,
                                 eps=eps)
    return pl.pallas_call(
        kern,
        grid=(m // mt,),
        in_specs=ins,
        out_specs=outs,
        out_shape=out_shapes,
        compiler_params=_VMEM_PARAMS,
        interpret=interpret,
    )(x2, g.reshape(1, c), bt.reshape(1, c), w1, b1.reshape(1, f),
      w2, b2.reshape(1, c))


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def _pallas_lnmlp_bwd(x2, y, a, s, go, gy, g, w1, w2, eps, interpret=False):
    m, c = x2.shape
    f = w1.shape[1]
    mt = _tile_rows(m, c, f, x2.dtype.itemsize, 5, 2, 2)
    tile = pl.BlockSpec((mt, c), lambda i: (i, 0), memory_space=pltpu.VMEM)
    ftile = pl.BlockSpec((mt, f), lambda i: (i, 0), memory_space=pltpu.VMEM)
    half = _pipe_half(mt)
    bwd_kern = (functools.partial(_lnmlp_bwd_kernel_pipe, half=half)
                if half else _lnmlp_bwd_kernel)
    return pl.pallas_call(
        functools.partial(bwd_kern, eps=eps),
        grid=(m // mt,),
        in_specs=[tile, tile, ftile, ftile, tile, tile,
                  _const_spec((1, c)), _const_spec((c, f)),
                  _const_spec((f, c))],
        out_specs=[tile, _const_spec((1, c)), _const_spec((1, c)),
                   _const_spec((c, f)), _const_spec((f, c)),
                   _const_spec((1, f)), _const_spec((1, c))],
        out_shape=[
            jax.ShapeDtypeStruct((m, c), x2.dtype),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((c, f), jnp.float32),
            jax.ShapeDtypeStruct((f, c), jnp.float32),
            jax.ShapeDtypeStruct((1, f), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ],
        compiler_params=_VMEM_PARAMS,
        interpret=interpret,
    )(x2, y, a, s, go, gy, g.reshape(1, c), w1, w2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def _fused_lnmlp(x2, g, bt, w1, b1, w2, b2, eps, interpret=False):
    o, y = _pallas_lnmlp_fwd(x2, g, bt, w1, b1, w2, b2, eps, False,
                             interpret=interpret)
    return o, y


def _fused_lnmlp_vjp_fwd(x2, g, bt, w1, b1, w2, b2, eps, interpret):
    o, y, a, s = _pallas_lnmlp_fwd(x2, g, bt, w1, b1, w2, b2, eps, True,
                                   interpret=interpret)
    return (o, y), (x2, y, a, s, g, w1, w2)


def _fused_lnmlp_vjp_bwd(eps, interpret, res, cot):
    go, gy = cot
    x2, y, a, s, g, w1, w2 = res
    dx, dg, dbt, dw1, dw2, db1, db2 = _pallas_lnmlp_bwd(
        x2, y, a, s, go, gy, g, w1, w2, eps, interpret=interpret)
    return (dx, dg[0].astype(g.dtype), dbt[0].astype(g.dtype),
            dw1.astype(w1.dtype), db1[0].astype(w1.dtype),
            dw2.astype(w2.dtype), db2[0].astype(w2.dtype))


_fused_lnmlp.defvjp(_fused_lnmlp_vjp_fwd, _fused_lnmlp_vjp_bwd)


def lnmlp_reference(x, g, bt, w1, b1, w2, b2, eps):
    """Unfused oracle: layers.py one-pass f32 LayerNorm then the MLP at
    the carried dtype; returns (o, y)."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    msq = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    yf = (xf - mu) * jax.lax.rsqrt(msq - jnp.square(mu) + eps) \
        * g.astype(jnp.float32) + bt.astype(jnp.float32)
    y = yf.astype(x.dtype)
    return mlp_reference(y, w1, b1, w2, b2), y


def fused_ln_mlp(x, g, bt, w1, b1, w2, b2, eps, dtype=jnp.float32, *,
                 use_pallas: bool = None, interpret: bool = False):
    """(LayerNorm -> fc1 -> exact GELU -> fc2)(x) over the trailing
    axis; returns (o, y) with y = the LayerNorm output (the ViTTA
    output-side stat tap consumes it, and its cotangent re-enters the
    fused backward).  gamma/beta stay f32 (LayerNorm params); the MLP
    weights are cast to the compute ``dtype`` here, matching flax."""
    if use_pallas is None:
        from vitta_tpu.ops.dispatch import pallas_enabled
        use_pallas = pallas_enabled()
    xc = x.astype(dtype)
    args = [t.astype(dtype) for t in (w1, b1, w2, b2)]
    c = x.shape[-1]
    if not (use_pallas or interpret) or (
            use_pallas and not interpret
            and not mlp_fusion_fits(x.size // c, c, w1.shape[1],
                                    xc.dtype.itemsize, with_ln=True)):
        # scoped-VMEM overflow route (Swin-B stage 4 in f32: the weight
        # blocks + dW accumulators alone exceed the budget, measured
        # 106.70M vs 100M) — identical math via the unfused composition
        return lnmlp_reference(xc, g, bt, *args, eps)
    lead = x.shape[:-1]
    o, y = _fused_lnmlp(xc.reshape(-1, x.shape[-1]), g, bt, *args,
                        float(eps), interpret)
    return o.reshape(*lead, w2.shape[1]), y.reshape(x.shape)


def fused_mlp(x, w1, b1, w2, b2, dtype=jnp.float32, *,
              use_pallas: bool = None, interpret: bool = False):
    """fc2(gelu_exact(fc1(x))) over the trailing axis of ``x``.

    Params arrive at storage dtype (f32 masters) and are cast to the
    compute ``dtype`` here — matching flax's promote_dtype — so the
    cotangents flow back to f32 through the cast's VJP exactly as they
    do for nn.Dense.
    """
    if use_pallas is None:
        from vitta_tpu.ops.dispatch import pallas_enabled
        use_pallas = pallas_enabled()
    args = [t.astype(dtype) for t in (x, w1, b1, w2, b2)]
    c = x.shape[-1]
    if not (use_pallas or interpret) or (
            use_pallas and not interpret
            and not mlp_fusion_fits(x.size // c, c, w1.shape[1],
                                    args[0].dtype.itemsize)):
        # scoped-VMEM overflow route (see fused_ln_mlp)
        return mlp_reference(*args)
    x, w1, b1, w2, b2 = args
    lead = x.shape[:-1]
    o = _fused_mlp(x.reshape(-1, x.shape[-1]), w1, b1, w2, b2, interpret)
    return o.reshape(*lead, w2.shape[1])
