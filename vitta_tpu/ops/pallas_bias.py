"""Pallas TPU kernel: Swin relative-position-bias expansion.

The factored one-hot einsum form of the bias (models/swin.py:
relative_position_bias, replacing the reference's 153k-row gather,
swin_transformer.py:109-147) leaves XLA with a 7D
(nh, qd, qh, qw, kd, kh, kw) -> (nh, N, N) reorder whose tiled-layout
copies profiled at ~12 ms/step on Swin-B (round-3 trace: 0.34 ms per
(copy, reshape, copy) chain x 36 instances) — the single largest line
in the adaptation step.

Structure that kills it: for a full (wd, wh, ww) window the (N, N)
bias is a block-Toeplitz arrangement of d-axis slices.  With

    V[n, a, hw1, hw2] = table[a, h1-h2+wh-1, w1-w2+ww-1, n]
                        (hw = h*ww + w, a = d-axis displacement)

the (hw x hw) block of the bias at block-row d1, block-col d2 is
exactly ``V[n, d1-d2+wd-1]``.  V is tiny ((nh, 2wd-1, hw, hw)) and is
produced by ONE einsum against a constant combined (h, w)-axis one-hot
(no 6D intermediate to reorder), and the assembly into (nh, N, N) is
pure data movement — done here in a Pallas kernel as an in-VMEM
concatenation (lane-concat the wd Toeplitz picks per block-row,
sublane-concat the block-rows, one aligned full-block store), instead
of XLA's strided-interleave copies through HBM.

Backward is the mirror image: dV[a] = sum over the Toeplitz positions
(d1, d2) with d1-d2+wd-1 == a of the (hw, hw) block of dB — static
value slices in VMEM, one aligned store.  The cotangent then flows
through the (transposed) one-hot einsum back to the table parameter.

Falls back to the pure-einsum expansion off-TPU (identical values: the
one-hot contractions are exact selections in f32).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@functools.lru_cache(maxsize=8)
def _hw_onehot(wh: int, ww: int) -> np.ndarray:
    """(hw, hw, (2wh-1)(2ww-1)) one-hot of the combined (h, w)-axis
    displacement (h1-h2+wh-1)*(2ww-1) + (w1-w2+ww-1)."""
    h1, w1 = np.divmod(np.arange(wh * ww)[:, None], ww)
    h2, w2 = np.divmod(np.arange(wh * ww)[None, :], ww)
    k = (h1 - h2 + wh - 1) * (2 * ww - 1) + (w1 - w2 + ww - 1)
    oh = np.zeros((wh * ww, wh * ww, (2 * wh - 1) * (2 * ww - 1)),
                  np.float32)
    np.put_along_axis(oh, k[..., None], 1.0, axis=2)
    return oh


def _expand_kernel(v_ref, out_ref, *, wd):
    rows = []
    for d1 in range(wd):
        rows.append(jnp.concatenate(
            [v_ref[0, d1 - d2 + wd - 1] for d2 in range(wd)], axis=1))
    out_ref[0] = jnp.concatenate(rows, axis=0)


def _collapse_kernel(db_ref, dv_ref, *, wd, hw):
    db = db_ref[0]                                     # (N, N) value
    for a in range(2 * wd - 1):
        acc = None
        for d1 in range(wd):
            d2 = d1 - (a - wd + 1)
            if not 0 <= d2 < wd:
                continue
            blk = db[d1 * hw:(d1 + 1) * hw, d2 * hw:(d2 + 1) * hw]
            acc = blk if acc is None else acc + blk
        dv_ref[0, a] = acc


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _assemble(v, wd, interpret):
    """(nh, A, hw, hw) Toeplitz slices -> (nh, N, N) bias, N = wd*hw."""
    nh, a_dim, hw, _ = v.shape
    n = wd * hw
    return pl.pallas_call(
        functools.partial(_expand_kernel, wd=wd),
        grid=(nh,),
        in_specs=[pl.BlockSpec((1, a_dim, hw, hw), lambda h: (h, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, n, n), lambda h: (h, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nh, n, n), jnp.float32),
        interpret=interpret,
    )(v)


def _assemble_fwd(v, wd, interpret):
    return _assemble(v, wd, interpret), v.shape


def _assemble_bwd(wd, interpret, v_shape, db):
    nh, a_dim, hw, _ = v_shape
    n = wd * hw
    dv = pl.pallas_call(
        functools.partial(_collapse_kernel, wd=wd, hw=hw),
        grid=(nh,),
        in_specs=[pl.BlockSpec((1, n, n), lambda h: (h, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, a_dim, hw, hw), lambda h: (h, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nh, a_dim, hw, hw), jnp.float32),
        interpret=interpret,
    )(db)
    return (dv,)


_assemble.defvjp(_assemble_fwd, _assemble_bwd)


def compact_bias(t4, window_size):
    """(2wd-1, 2wh-1, 2ww-1, nh) table -> (nh, A, hw, hw) Toeplitz
    slices V (A = 2wd-1, hw = wh*ww; the module docstring's V) — the
    compact form of the relative-position bias, from which the dense
    (nh, N, N) is pure block-Toeplitz data movement.  Backend-agnostic
    (one flat matmul + transposes); exact in f32 at any backend because
    the one-hot contraction is a selection."""
    wd, wh, ww = window_size
    nh = t4.shape[-1]
    a_dim = 2 * wd - 1
    hw = wh * ww
    oh2 = jnp.asarray(_hw_onehot(wh, ww)).reshape(hw * hw, -1)  # (hw², BC)
    # (BC, A·nh) so the contraction is one flat 2D matmul with wide,
    # tile-friendly dims.  The direct "pqk,akn->napq" einsum put the
    # 49-wide q axis on the lanes — ~6x tile padding — and profiled at
    # ~4.4 ms/step across Swin-B's 24 blocks once run at HIGHEST.
    # HIGHEST itself is required: the selection forward is exact at any
    # precision, but the einsum's VJP contracts the (large-magnitude)
    # bias cotangent against the one-hot, and at default TPU precision
    # that rounds the table gradient to bf16.  At ~0.2 GFLOP per block
    # the 6-pass cost is noise in this layout.
    tf2 = jnp.transpose(t4.astype(jnp.float32).reshape(a_dim, -1, nh),
                        (1, 0, 2)).reshape(-1, a_dim * nh)       # (BC, A·nh)
    flat = jax.lax.dot(oh2, tf2,
                       precision=jax.lax.Precision.HIGHEST)      # (hw², A·nh)
    return jnp.transpose(flat.reshape(hw, hw, a_dim, nh), (3, 2, 0, 1))


def assemble_dense(v, wd, use_pallas: bool = None, interpret: bool = False):
    """(nh, A, hw, hw) Toeplitz slices -> dense (nh, N, N) bias.  Pallas
    on TPU (aligned full-block stores, custom VJP); jnp block concat
    elsewhere (identical values; its autodiff VJP is slicing)."""
    if use_pallas is None:
        from vitta_tpu.ops.dispatch import pallas_enabled
        use_pallas = pallas_enabled()
    if use_pallas or interpret:
        return _assemble(v, wd, interpret)
    rows = [jnp.concatenate([v[:, d1 - d2 + wd - 1] for d2 in range(wd)],
                            axis=2) for d1 in range(wd)]
    return jnp.concatenate(rows, axis=1)


def expand_bias_pallas(t4, window_size, *, interpret: bool = False):
    """(2wd-1, 2wh-1, 2ww-1, nh) table -> (nh, N, N) f32 bias,
    N = wd*wh*ww, assembled on-chip in the final tiled layout."""
    return _assemble(compact_bias(t4, window_size), window_size[0],
                     interpret)
