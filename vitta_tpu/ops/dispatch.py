"""Single switch for the Pallas kernel auto-gates and perf-variant flags.

Every fused kernel picks Pallas-vs-jnp at trace time via
``pallas_enabled()``; setting ``VITTA_DISABLE_PALLAS=1`` before a trace
forces the pure-jnp paths (identical math).  bench.py uses this to
lower a kernel-free twin of the step for FLOP accounting — XLA's cost
analysis cannot see inside Pallas custom calls, so the fused build
under-reports flops — and it doubles as an operational escape hatch.

The perf-variant flags below are all *math-identical* layout/fusion
alternatives (each equivalence-tested).  Their defaults reflect the
round-4/5 TPU flag sweeps (benchmarks/results/flag_sweep_r4{,b}.jsonl,
flag_sweep_r5.jsonl, Swin-B at the reference operating point,
ms/video):

  r4 bf16: base 48.92 | +window_resident 46.94 | +attn_no_proj 47.61
  +attn_ln 47.71 | +patchify(uint8) 50.09 vs 49.01 | +bf16_momentum 51.38
  combos: wr+no_proj 45.80 (BEST) | wr+attn_ln 46.21
  r5 bf16: base 45.88 | +patchify_v2 43.56 (BEST; 43.48 on uint8 wire)
  | +compact_bias 56.38
  r5 fp32: base 53.19 | +patchify_v2 50.96 (BEST)
  r5b bf16: ctl 43.52 | +attn_pipe 41.36 (BEST)
  r5b fp32: ctl 50.84 | +attn_pipe 48.29 (BEST)
  r5c bf16: +mlp_pipe 43.63 | attn+mlp pipe 41.48 (mlp pipe neutral)

so window-resident stages, the *packed* attention kernel (qkv/proj
matmuls left to XLA), the matmul patch embed (patchify_v2) and the
software-pipelined attention head loop (attn_pipe) are default-ON — at
both dtypes — and the proj-fused kernel, LN-prologue fusion, uint8
patchify, forced compact bias, bf16 momentum and the (neutral) LN-MLP
pipe are default-OFF.
Every gate is tri-state: unset -> measured default, "0"/"false"/"off"
-> off, anything else -> on.
"""

from __future__ import annotations

import os

import jax


def flag_enabled(name: str, default: bool) -> bool:
    """Tri-state env gate: unset/empty -> default; 0/false/off -> False;
    anything else -> True."""
    v = os.environ.get(name)
    if v is None or v == "":
        return default
    return v.lower() not in ("0", "false", "off")


def pallas_enabled() -> bool:
    if os.environ.get("VITTA_DISABLE_PALLAS"):
        return False
    return jax.default_backend() == "tpu"


def patchify_enabled() -> bool:
    """Patchify Swin's input in the jitted step on the raw (uint8)
    frames before the device-side normalize, turning the patch-embed
    strided Conv3d into a flat matmul (models/swin.py:patchify).
    REJECTED on measurement: 50.09 vs 49.01 ms/video on the uint8 wire
    (flag_sweep_r4.jsonl) — the f32 unfold was pattern-matched back into
    a worse conv in round 3, and the uint8 form loses ~1.1 ms too.
    Default OFF; kept as a measured-rejected variant."""
    return flag_enabled("VITTA_PATCHIFY", False)


def patchify_v2_enabled() -> bool:
    """In-model patch-embed unfold + flat matmul in a conv-foreign
    element order (models/swin.py:patchify_mm).  Unlike VITTA_PATCHIFY
    (host/engine-side, uint8, conv contraction order — rejected at
    50.09 vs 49.01), the (c, t, h, w) element order blocks XLA's
    unfold->conv rewrite on ANY input dtype, so the strided Conv3d and
    its pathological input relayout (C=3 forced minor into a 128-lane
    tile: 1.3 ms/step of copies + ~2.9 ms of conv kernels in the
    round-5 trace) never materialize.  Default ON: won every round-5
    A/B (flag_sweep_r5.jsonl, ms/video) — bf16 43.56 vs 45.88, bf16 on
    the uint8 wire 43.48, fp32 50.96 vs 53.19.  ``VITTA_PATCHIFY_V2=0``
    restores the Conv3d patch embed."""
    return flag_enabled("VITTA_PATCHIFY_V2", True)


def compact_bias_enabled() -> bool:
    """FORCE the relative-position bias into its compact Toeplitz form
    (nh, A, hw, hw) for every attention call (ops/pallas_bias.py:
    compact_bias, pallas_attention.py:_bias_head).  REJECTED as a global
    default on measurement: 56.38 vs 45.88 ms/video Swin-B bf16
    (flag_sweep_r5.jsonl) — the in-kernel per-head assembly re-runs per
    WINDOW grid step, ~8-16x more often than the standalone expansion
    kernel it replaces.  It still engages AUTOMATICALLY (no flag) for
    the one shape class where it wins: dense-bias VMEM overflow of the
    packed backward (Swin-B stage-4 f32, 2 windows), where the
    alternative is the far slower per-(head, window) fallback —
    pallas_attention.py:prefer_compact_bias."""
    return flag_enabled("VITTA_COMPACT_BIAS", False)


def attn_ln_enabled() -> bool:
    """Fuse the pre-attention LayerNorm (norm1) into the window-attention
    kernel's prologue (ops/pallas_attention.py:_proj_ln_*), mirroring the
    norm2->MLP prologue fusion.  Identical math (tested), but REJECTED on
    measurement: 47.71 alone / 46.21 with window-resident vs the 45.80
    packed-kernel winner (flag_sweep_r4{,b}.jsonl) — it forces the
    proj-fused kernel, which is itself a 1.3 ms regression.  Default
    OFF."""
    return flag_enabled("VITTA_ATTN_LN", False)


def attn_proj_fused_enabled() -> bool:
    """Fuse the qkv/output projections into the window-attention kernel
    (ops/pallas_attention.py:_proj_attn).  Identical math (tested), but
    the round-4 sweep measured the *packed* kernel with XLA matmuls
    FASTER (47.61 vs 48.92 alone; 45.80 vs 46.94 with window-resident):
    XLA overlaps the projection matmuls with the attention custom call
    better than the fused kernel's serial prologue/epilogue.  Default
    OFF (packed); ``VITTA_ATTN_PROJ_FUSED=1`` re-enables, and the legacy
    ``VITTA_ATTN_NO_PROJ=1`` escape hatch still forces it off."""
    if os.environ.get("VITTA_ATTN_NO_PROJ"):
        return False
    return flag_enabled("VITTA_ATTN_PROJ_FUSED", False)


def attn_pipe_enabled() -> bool:
    """Software-pipeline the window-attention kernels' head loop: head
    h+1's independent MXU matmuls (logits, and dp in the backward) are
    issued between head h's VPU softmax/dl chain ops so the two units
    overlap (pallas_attention.py:_heads_fwd/_heads_bwd).  Identical
    math — the same ops in a different program order.  Motivated by the
    slope-timed ablation (benchmarks/results/attn_bwd_micro_r5.jsonl):
    the backward measured full ~= matmuls + the WHOLE VPU chain
    (additive, zero overlap), and the reorder won -29%/-27% on
    stages 0/1.  Default ON — won the end-to-end A/B at both dtypes
    against same-run controls (flag_sweep_r5b.jsonl: Swin-B bf16
    43.52 -> 41.36 ms/video, fp32 50.84 -> 48.29);
    ``VITTA_ATTN_PIPE=0`` restores the sequential head loop."""
    return flag_enabled("VITTA_ATTN_PIPE", True)


def mlp_pipe_enabled() -> bool:
    """Software-pipeline the fused LN-MLP kernels: each row tile is
    processed as two half-tiles with interleaved phases (half B's fc1
    matmul issues while half A's GELU chain runs on the VPU, etc. —
    pallas_mlp.py:_lnmlp_{fwd,bwd}_kernel_pipe).  Every per-row op is
    split row-wise and the weight/bias-gradient reductions still run
    over the reconstituted full tile; results match the sequential
    kernels to ulp level (tested).  Same motivation as
    VITTA_ATTN_PIPE, but measured NEUTRAL end-to-end
    (flag_sweep_r5c.jsonl: Swin-B bf16 43.63 alone vs the 43.52
    control; composed with the attention pipe 41.48 vs 41.36 — both
    within run noise): unlike attention, the LN-MLP grid is long and
    its per-tile VPU share small, so the interleave has little idle
    time to recover.  Default OFF; kept as a measured variant
    (``VITTA_MLP_PIPE=1``)."""
    return flag_enabled("VITTA_MLP_PIPE", False)


def window_resident_enabled() -> bool:
    """Swin blocks keep activations in window layout across a stage
    (models/swin.py:BasicLayer): the window_reverse/roll/roll/partition
    chain between consecutive blocks collapses to one adjacent composed
    relayout XLA can fuse.  Identical math (tested); the best single
    flag of the round-4 sweep (46.94 vs 48.92 ms/video, and present in
    the 45.80 winning combo).  Default ON; ``VITTA_WINDOW_RESIDENT=0``
    restores the per-block spatial path."""
    return flag_enabled("VITTA_WINDOW_RESIDENT", True)
