"""Pallas TPU kernel: Swin relative-position-bias expansion.

The factored one-hot einsum form of the bias (models/swin.py:
relative_position_bias, replacing the reference's 153k-row gather,
swin_transformer.py:109-147) leaves XLA with a 7D
(nh, qd, qh, qw, kd, kh, kw) -> (nh, N, N) reorder whose tiled-layout
copies profiled at ~12 ms/step on Swin-B (round-3 trace: 0.34 ms per
(copy, reshape, copy) chain x 36 instances) — the single largest line
in the adaptation step.

Structure that kills it: for a full (wd, wh, ww) window the (N, N)
bias is a block-Toeplitz arrangement of wd-axis slices.  With

    V[n, a, hw1, hw2] = table[a, h1-h2+wh-1, w1-w2+ww-1, n]
                        (hw = h*ww + w, a = d-axis displacement)

the (49 x 49) block of the bias at block-row d1, block-col d2 is
exactly ``V[n, d1-d2+wd-1]``.  V is tiny ((nh, 2wd-1, 49, 49)), cheap
to build with the same one-hot einsums, and the assembly into
(nh, N, N) is pure data movement — so we do it in a Pallas kernel with
aligned full-row stores instead of XLA's strided-interleave copies:

* V is lane-tiled to (nh, A, hw, wd*hw) outside the kernel (a fast
  sequential broadcast-write), so each output block-row d1 is a
  one-hot-weighted sum  sum_a Vt[a] * Odexp[d1, a]  over full
  (hw, wd*hw) registers — no unaligned slicing anywhere.
* The output is written 4D as (nh, wd, hw, wd*hw) — block dims
  (hw, wd*hw) are exact array dims, so every store is aligned — and
  merged to (nh, N, N) by a contiguous row-major reshape.

Backward is the mirror image: dVt[a] = sum_d1 dB4[d1] * Odexp[d1, a];
the cotangent then flows through the (autodiff-handled) tile and
one-hot einsums back to the table parameter.

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
def _odexp(wd: int, hw: int) -> np.ndarray:
    """(wd, A, 1, wd*hw) one-hot: odexp[d1, a, 0, d2*hw + c] = 1 iff
    a == d1 - d2 + wd - 1 (the d-axis displacement index)."""
    a_dim = 2 * wd - 1
    out = np.zeros((wd, a_dim, 1, wd * hw), np.float32)
    for d1 in range(wd):
        for d2 in range(wd):
            out[d1, d1 - d2 + wd - 1, 0, d2 * hw:(d2 + 1) * hw] = 1.0
    return out


def _expand_kernel(vt_ref, od_ref, out_ref, *, wd, a_dim):
    for d1 in range(wd):
        acc = None
        for a in range(a_dim):
            term = vt_ref[0, a] * od_ref[d1, a]        # (hw, wd*hw)
            acc = term if acc is None else acc + term
        out_ref[0, d1] = acc


def _collapse_kernel(db_ref, od_ref, dvt_ref, *, wd, a_dim):
    for a in range(a_dim):
        acc = None
        for d1 in range(wd):
            term = db_ref[0, d1] * od_ref[d1, a]       # (hw, wd*hw)
            acc = term if acc is None else acc + term
        dvt_ref[0, a] = acc


def _run(kern, x, odexp, out_a, *, wd, a_dim, interpret):
    """Shared pallas_call: grid over heads, whole-array blocks."""
    nh, in_a, hw, lanes = x.shape
    xs = pl.BlockSpec((1, in_a, hw, lanes), lambda h: (h, 0, 0, 0),
                      memory_space=pltpu.VMEM)
    od = pl.BlockSpec(odexp.shape, lambda h: (0, 0, 0, 0),
                      memory_space=pltpu.VMEM)
    os = pl.BlockSpec((1, out_a, hw, lanes), lambda h: (h, 0, 0, 0),
                      memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(kern, wd=wd, a_dim=a_dim),
        grid=(nh,),
        in_specs=[xs, od],
        out_specs=os,
        out_shape=jax.ShapeDtypeStruct((nh, out_a, hw, lanes), jnp.float32),
        interpret=interpret,
    )(x, odexp)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _assemble(vt, wd, interpret):
    """(nh, A, hw, wd*hw) lane-tiled V -> (nh, wd, hw, wd*hw) bias."""
    a_dim = 2 * wd - 1
    odexp = jnp.asarray(_odexp(wd, vt.shape[2]))
    return _run(_expand_kernel, vt, odexp, wd, wd=wd, a_dim=a_dim,
                interpret=interpret)


def _assemble_fwd(vt, wd, interpret):
    return _assemble(vt, wd, interpret), None


def _assemble_bwd(wd, interpret, _res, db4):
    a_dim = 2 * wd - 1
    odexp = jnp.asarray(_odexp(wd, db4.shape[2]))
    dvt = _run(_collapse_kernel, db4, odexp, a_dim, wd=wd, a_dim=a_dim,
               interpret=interpret)
    return (dvt,)


_assemble.defvjp(_assemble_fwd, _assemble_bwd)


def expand_bias_pallas(vhw, wd: int, *, interpret: bool = False):
    """(nh, 2wd-1, hw, hw) axis-collapsed table -> (nh, N, N) bias,
    N = wd*hw, assembled on-chip in the final tiled layout."""
    nh, a_dim, hw, _ = vhw.shape
    vt = jnp.tile(vhw, (1, 1, 1, wd))                  # (nh, A, hw, wd*hw)
    b4 = _assemble(vt, wd, interpret)                  # (nh, wd, hw, wd*hw)
    return b4.reshape(nh, wd * hw, wd * hw)
