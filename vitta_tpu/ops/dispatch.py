"""Single switch for the Pallas kernel auto-gates.

Every fused kernel picks Pallas-vs-jnp at trace time via
``pallas_enabled()``; setting ``VITTA_DISABLE_PALLAS=1`` before a trace
forces the pure-jnp paths (identical math).  bench.py uses this to
lower a kernel-free twin of the step for FLOP accounting — XLA's cost
analysis cannot see inside Pallas custom calls, so the fused build
under-reports flops — and it doubles as an operational escape hatch.
"""

from __future__ import annotations

import os

import jax


def pallas_enabled() -> bool:
    if os.environ.get("VITTA_DISABLE_PALLAS"):
        return False
    return jax.default_backend() == "tpu"


def patchify_enabled() -> bool:
    """Patchify Swin's input in the jitted step on the raw (uint8)
    frames before the device-side normalize, turning the patch-embed
    strided Conv3d into a flat matmul (models/swin.py:patchify).  The
    f32 unfold+matmul rewrite was pattern-matched back into a worse conv
    by XLA (round-3 note); the uint8 pre-normalize form is the new
    hypothesis.  OFF until measured on TPU."""
    return bool(os.environ.get("VITTA_PATCHIFY"))


def attn_ln_enabled() -> bool:
    """Fuse the pre-attention LayerNorm (norm1) into the window-attention
    kernel's prologue (ops/pallas_attention.py:_proj_ln_*), mirroring the
    norm2->MLP prologue fusion: kills the standalone per-block LN kernel
    and one (M, C) HBM read.  Perf-variant flag; identical math (tested),
    OFF until measured on TPU."""
    return bool(os.environ.get("VITTA_ATTN_LN"))


def window_resident_enabled() -> bool:
    """Swin blocks keep activations in window layout across a stage
    (models/swin.py:BasicLayer): the window_reverse/roll/roll/partition
    chain between consecutive blocks collapses to one adjacent composed
    relayout XLA can fuse.  Perf-variant flag; identical math (tested),
    but OFF until measured on TPU."""
    return bool(os.environ.get("VITTA_WINDOW_RESIDENT"))
