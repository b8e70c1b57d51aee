"""Video Swin Transformer (Swin-B) — TPU-native implementation.

Re-design of the reference backbone
(models/videoswintransformer_models/swin_transformer.py):

* ``PatchEmbed3D`` Conv3d patchify + LayerNorm (:416-456; this first LN
  is excluded from stat taps, corpus/basics.py:503-505);
* 4 stages of ``SwinTransformerBlock3D`` (:172-274) — windowed 3D
  attention with relative-position bias (:87-169), cyclic shift on odd
  blocks, attention masks for shifted windows (:316-329), stochastic
  depth; ``PatchMerging`` 2x2 spatial between stages (:277-312);
* final LayerNorm over (B, D, H, W, C) (:659-661);
* ``I3DHead`` avg-pool + Dropout(0.5) + Linear (i3d_head.py:25-77);
* ``Recognizer3D`` folds views into batch and returns per-view scores
  (recognizer3d.py:95-115) — view averaging/consistency live in the
  adaptation engine.

TPU notes: everything stays channels-last (B, D, H, W, C); window
partition is reshape/transpose with static shapes; shifted-window masks
and relative-position indices are numpy constants computed at trace
time (the reference lru_caches them per shape, :316-329); attention is
two einsums that XLA maps onto the MXU with N = prod(window) = 392
token tiles.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from vitta_tpu.models.layers import LayerNorm


def _triple(x):
    return tuple(x) if isinstance(x, (tuple, list)) else (x, x, x)


def get_window_size(x_size, window_size, shift_size=None):
    """Clamp window/shift to the input size (swin_transformer.py:25-35)."""
    use_window = list(window_size)
    use_shift = list(shift_size) if shift_size is not None else None
    for i in range(3):
        if x_size[i] <= window_size[i]:
            use_window[i] = x_size[i]
            if use_shift is not None:
                use_shift[i] = 0
    if shift_size is None:
        return tuple(use_window)
    return tuple(use_window), tuple(use_shift)


def window_partition(x, window_size):
    """(B, D, H, W, C) -> (B*nW, wd*wh*ww, C) (swin_transformer.py:38-51)."""
    b, d, h, w, c = x.shape
    wd, wh, ww = window_size
    x = x.reshape(b, d // wd, wd, h // wh, wh, w // ww, ww, c)
    x = jnp.transpose(x, (0, 1, 3, 5, 2, 4, 6, 7))
    return x.reshape(-1, wd * wh * ww, c)


def window_reverse(windows, window_size, b, d, h, w):
    wd, wh, ww = window_size
    c = windows.shape[-1]
    x = windows.reshape(b, d // wd, h // wh, w // ww, wd, wh, ww, c)
    x = jnp.transpose(x, (0, 1, 4, 2, 5, 3, 6, 7))
    return x.reshape(b, d, h, w, c)


@functools.lru_cache(maxsize=32)
def relative_position_index(window_size: Tuple[int, int, int]) -> np.ndarray:
    """(N, N) int32 index into the bias table (swin_transformer.py:109-128)."""
    wd, wh, ww = window_size
    coords = np.stack(np.meshgrid(np.arange(wd), np.arange(wh), np.arange(ww),
                                  indexing="ij"))          # (3, wd, wh, ww)
    flat = coords.reshape(3, -1)
    rel = flat[:, :, None] - flat[:, None, :]               # (3, N, N)
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[..., 0] += wd - 1
    rel[..., 1] += wh - 1
    rel[..., 2] += ww - 1
    rel[..., 0] *= (2 * wh - 1) * (2 * ww - 1)
    rel[..., 1] *= (2 * ww - 1)
    return rel.sum(-1).astype(np.int32)


@functools.lru_cache(maxsize=32)
def _axis_onehot(size: int) -> np.ndarray:
    """(size, size, 2*size-1) one-hot of the per-axis displacement
    q - k + size - 1."""
    oh = np.zeros((size, size, 2 * size - 1), np.float32)
    q = np.arange(size)[:, None]
    k = np.arange(size)[None, :]
    oh[q, k, q - k + size - 1] = 1.0
    return oh


def relative_position_bias(t4, window_size: Tuple[int, int, int],
                           use_pallas: bool = None, interpret: bool = False):
    """(nh, N, N) bias from the (2wd-1, 2wh-1, 2ww-1, nh) table.

    The obvious formulation — ``table[relative_position_index]`` — is a
    153k-row gather whose backward is a scatter-add into 2.5k rows; on
    TPU those serialize (profiled at 10 + 25 ms/step for Swin-B, 30% of
    the whole adaptation step).  The index is a *constant* with
    separable structure (idx = d_t·s_h·s_w + d_h·s_w + d_w,
    swin_transformer.py:109-128), so the lookup factors into three tiny
    constant one-hot contractions — exact, MXU-friendly matmuls whose
    transposes are matmuls too (no scatter anywhere).

    The table param is CARRIED 4D (not the reference's flat (R, nh)):
    reshaping the flat param here forced a layout boundary that cost
    0.24 ms per occurrence x ~90 occurrences/step in relayout+convert
    ops (round-3 trace); with the param already axis-split, XLA assigns
    it the einsum's preferred layout outright.  Stays f32 regardless of
    compute dtype: a bf16 variant was measured SLOWER (108.7 vs 93.5
    ms/video Swin-B bf16) — the packed-pair bf16 layout makes XLA's 7D
    reorder of this product more expensive than the f32 one.

    On TPU only the two small (h, w)-axis contractions run in XLA; the
    d-axis expansion into (nh, N, N) — whose 7D tiled-layout reorder
    profiled at ~12 ms/step — is assembled by a Pallas kernel with
    aligned stores (ops/pallas_bias.py)."""
    wd, wh, ww = window_size
    nh = t4.shape[-1]
    if use_pallas is None:
        from vitta_tpu.ops.dispatch import pallas_enabled
        use_pallas = pallas_enabled()
    if use_pallas or interpret:
        from vitta_tpu.ops.pallas_bias import expand_bias_pallas
        return expand_bias_pallas(t4, (wd, wh, ww), interpret=interpret)
    a = jnp.asarray(_axis_onehot(wd))
    b = jnp.asarray(_axis_onehot(wh))
    c = jnp.asarray(_axis_onehot(ww))
    # HIGHEST keeps the (tiny) one-hot contractions — and, crucially,
    # their VJPs on the large-magnitude bias cotangent — exact f32 on
    # TPU instead of bf16-pass MXU rounding
    hi = jax.lax.Precision.HIGHEST
    x = jnp.einsum("pqa,abch->pqbch", a, t4, precision=hi)
    x = jnp.einsum("rsb,pqbch->pqrsch", b, x, precision=hi)
    # final contraction emits (h, qt,qh,qw, kt,kh,kw) directly
    x = jnp.einsum("tuc,pqrsch->hprtqsu", c, x, precision=hi)
    n = wd * wh * ww
    return x.reshape(nh, n, n)


@functools.lru_cache(maxsize=64)
def compute_shift_mask(dp: int, hp: int, wp: int,
                       window_size: Tuple[int, int, int],
                       shift_size: Tuple[int, int, int]) -> Optional[np.ndarray]:
    """Attention mask (nW, N, N) for shifted windows
    (swin_transformer.py:316-329); None when no shift."""
    if not any(shift_size):
        return None
    wd, wh, ww = window_size
    sd, sh, sw = shift_size
    img = np.zeros((1, dp, hp, wp, 1), np.float32)
    cnt = 0
    # literal replication of the reference slice triples
    # (swin_transformer.py:316-326), including the slice(-0) == empty and
    # slice(0, None) == full-axis quirks when a shift component is zero.
    for d in (slice(-wd), slice(-wd, -sd), slice(-sd, None)):
        for h in (slice(-wh), slice(-wh, -sh), slice(-sh, None)):
            for w in (slice(-ww), slice(-ww, -sw), slice(-sw, None)):
                img[:, d, h, w, :] = cnt
                cnt += 1
    n = wd * wh * ww
    win = img.reshape(1, dp // wd, wd, hp // wh, wh, wp // ww, ww, 1)
    win = win.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(-1, n)
    diff = win[:, None, :] - win[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


class WindowAttention3D(nn.Module):
    """Window MSA with 3D relative position bias
    (swin_transformer.py:87-169)."""

    dim: int
    window_size: Tuple[int, int, int]
    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, ln=None):
        """``ln``, when given, is (scale, bias, eps) of the preceding
        LayerNorm (norm1): the normalize fuses into the kernel prologue
        and the call returns (out, y) with y the LayerNorm output (for
        the output-side stat tap) — mirroring Mlp's fused-LN contract."""
        b_, n, c = x.shape
        nh = self.num_heads
        hd = c // nh
        wd, wh, ww = self.window_size
        # carried 4D (axis-split) — see relative_position_bias; converters
        # reshape the reference's flat (R, nh) tables on load
        table = self.param(
            "rpb_table", nn.initializers.truncated_normal(0.02),
            (2 * wd - 1, 2 * wh - 1, 2 * ww - 1, nh))
        # qkv/proj Dense params only — both projections run inside the
        # fused attention kernel (checkpoint tree layout unchanged)
        wqkv, bqkv = _DenseParams(3 * c, name="qkv")(c)
        wproj, bproj = _DenseParams(c, name="proj")(c)
        full_n = wd * wh * ww
        if n == full_n:
            from vitta_tpu.ops.dispatch import (compact_bias_enabled,
                                                pallas_enabled)
            from vitta_tpu.ops.pallas_attention import prefer_compact_bias
            itemsize = jnp.dtype(self.dtype).itemsize
            # compact Toeplitz form (nh, A, hw, hw): the packed attention
            # kernels assemble the per-head dense bias in VMEM.  Measured
            # a flat regression where the dense packed kernel fits (the
            # per-window re-assembly, flag_sweep_r5.jsonl), so it engages
            # automatically ONLY where dense would overflow scoped VMEM
            # and fall back to the per-(head, window) kernel (Swin-B
            # stage-4 f32); VITTA_COMPACT_BIAS=1 forces it everywhere.
            auto = pallas_enabled() and prefer_compact_bias(
                n, c, nh, itemsize, mask is not None, (wd, wh, ww))
            if compact_bias_enabled() or auto:
                from vitta_tpu.ops.pallas_bias import compact_bias
                bias_hqk = compact_bias(table, (wd, wh, ww))
            else:
                bias_hqk = relative_position_bias(table, (wd, wh, ww))
        else:
            # clamped effective window (input smaller than the window):
            # the first-n positions of the configured flattening are not
            # a sub-box, so keep the reference's sliced-gather form here
            # (tiny inputs only; swin_transformer.py:138-147)
            idx = relative_position_index(tuple(self.window_size))[:n, :n]
            bias_hqk = jnp.transpose(
                table.reshape(-1, nh)[idx.reshape(-1)].reshape(n, n, nh),
                (2, 0, 1))
        # fused qkv-projection + softmax(qk^T + bias [+ mask])v + output
        # projection — both Dense layers run inside the kernel (weights
        # VMEM-resident across the window grid), all heads per window
        # grid step: the (B_, N, 3C) qkv tensor, the f32 (B_, nh, N, N)
        # logits, and the per-head output never reach HBM
        # (ops/pallas_attention.py).  Clamped (tiny-input) windows fall
        # back to the jnp path — Mosaic rejects the degenerate shapes
        # they produce.
        if ln is not None:
            from vitta_tpu.ops.pallas_attention import (
                fused_window_attention_ln_proj)
            scale, bias, eps = ln
            return fused_window_attention_ln_proj(
                x, scale, bias, eps, wqkv, bqkv, wproj, bproj, bias_hqk,
                mask, hd ** -0.5, nh, dtype=self.dtype,
                use_pallas=None if n == full_n else False)
        from vitta_tpu.ops.pallas_attention import fused_window_attention_proj
        return fused_window_attention_proj(
            x, wqkv, bqkv, wproj, bproj, bias_hqk, mask, hd ** -0.5, nh,
            dtype=self.dtype, use_pallas=None if n == full_n else False)


class DropPath(nn.Module):
    """Per-sample stochastic depth (timm DropPath semantics)."""

    rate: float

    @nn.compact
    def __call__(self, x, deterministic: bool = True,
                 samples: Optional[int] = None):
        """``samples`` gives the true sample count when dim 0 folds extra
        axes (window-resident layout: B*nW): the mask is drawn per sample
        and repeated, so stochastic depth still drops whole residual
        branches per *video view*, and the draw consumes the same number
        of random bits as the spatial path (identical trajectories)."""
        if deterministic or self.rate == 0.0:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        s = x.shape[0] if samples is None else samples
        shape = (s,) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        if s != x.shape[0]:
            mask = jnp.repeat(mask, x.shape[0] // s, axis=0)
        return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


class _DenseParams(nn.Module):
    """Owns an nn.Dense-shaped param pair (kernel/bias, same names,
    same init) without running the matmul — the fused MLP kernel
    consumes the raw arrays.  Checkpoint tree layout is unchanged."""

    features: int

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (in_features, self.features))
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,))
        return kernel, bias


class Mlp(nn.Module):
    """fc1 -> exact GELU -> fc2 (swin_transformer.py:48-65), fused into
    one Pallas kernel on TPU: the (tokens, 4C) fc1 output stays in VMEM
    and the backward re-reads saved gelu value/derivative instead of
    re-deriving erf (ops/pallas_mlp.py)."""

    hidden: int
    out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True, ln=None):
        """ln, when given, is (scale, bias, eps) of the preceding
        LayerNorm: the normalize fuses into the kernel prologue and the
        call returns (o, y) with y the LayerNorm output (for the
        output-side stat tap)."""
        w1, b1 = _DenseParams(self.hidden, name="fc1")(x.shape[-1])
        w2, b2 = _DenseParams(self.out, name="fc2")(self.hidden)
        from vitta_tpu.ops.pallas_mlp import fused_ln_mlp, fused_mlp
        if ln is not None:
            scale, bias, eps = ln
            return fused_ln_mlp(x, scale, bias, w1, b1, w2, b2, eps,
                                dtype=self.dtype)
        return fused_mlp(x, w1, b1, w2, b2, dtype=self.dtype)


class SwinBlock3D(nn.Module):
    """SwinTransformerBlock3D (swin_transformer.py:172-274)."""

    dim: int
    num_heads: int
    window_size: Tuple[int, int, int] = (8, 7, 7)
    shift_size: Tuple[int, int, int] = (0, 0, 0)
    mlp_ratio: float = 4.0
    drop_path: float = 0.0
    stat_types: Tuple[str, ...] = ("spatiotemp",)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True,
                 wr: Optional[tuple] = None):
        """Spatial form: ``x`` is (B, D, H, W, C).

        Window-resident form (``wr = (batch, mask_np)``): ``x`` is
        already this block's window layout (B*nW, N, C) — the caller
        (BasicLayer) owns roll/partition, so the block is purely
        token-wise + windowed attention.  Param and tap names are
        identical in both forms."""
        if wr is not None:
            return self._window_resident(x, wr, deterministic)
        b, d, h, w, c = x.shape
        window, shift = get_window_size((d, h, w), tuple(self.window_size),
                                        tuple(self.shift_size))
        shortcut = x
        norm1 = LayerNorm(c, stat_types=self.stat_types, name="norm1")
        attn_mod = WindowAttention3D(c, tuple(self.window_size),
                                     self.num_heads, dtype=self.dtype,
                                     name="attn")

        wd, wh, ww = window
        pad_d = (-d) % wd
        pad_h = (-h) % wh
        pad_w = (-w) % ww
        fuse_ln = self._use_attn_ln() and not (pad_d or pad_h or pad_w)
        if not fuse_ln:
            x = norm1(x)
        x = jnp.pad(x, ((0, 0), (0, pad_d), (0, pad_h), (0, pad_w), (0, 0)))
        dp, hp, wp = d + pad_d, h + pad_h, w + pad_w

        mask_np = compute_shift_mask(dp, hp, wp, window, shift)
        if any(shift):
            x = jnp.roll(x, shift=(-shift[0], -shift[1], -shift[2]),
                         axis=(1, 2, 3))
        windows = window_partition(x, window)
        mask = None if mask_np is None else jnp.asarray(mask_np)
        # the bias table/index are sized by the CONFIGURED window; forward
        # slices [:n,:n] when the effective window is clamped (reference
        # WindowAttention3D keeps full-size buffers, :138-147)
        if fuse_ln:
            # norm1 fuses into the attention kernel's prologue (LN is
            # token-wise, so it commutes with roll/partition; gated off
            # under padding — LN(0-pad) != 0); the module still owns the
            # params and sows both tap sides
            scale, bias = norm1(shortcut, mode="params")
            attn, ln_out = attn_mod(windows, mask,
                                    ln=(scale, bias, norm1.eps))
            norm1(ln_out, mode="sow_output", stat_count=b)
        else:
            attn = attn_mod(windows, mask)
        x = window_reverse(attn, window, b, dp, hp, wp)
        if any(shift):
            x = jnp.roll(x, shift=shift, axis=(1, 2, 3))
        x = x[:, :d, :h, :w]

        x = shortcut + DropPath(self.drop_path, name="drop_path1")(
            x, deterministic)
        return self._mlp_tail(x, deterministic)

    def _use_attn_ln(self) -> bool:
        from vitta_tpu.ops.dispatch import attn_ln_enabled
        # the kernel returns y in window layout: only the token-order-
        # invariant spatiotemp tap may consume it
        return (attn_ln_enabled()
                and tuple(self.stat_types) == ("spatiotemp",))

    def _window_resident(self, xw, wr, deterministic):
        b, mask_np = wr
        c = xw.shape[-1]
        shortcut = xw
        norm1 = LayerNorm(c, stat_types=self.stat_types, name="norm1")
        mask = None if mask_np is None else jnp.asarray(mask_np)
        attn_mod = WindowAttention3D(c, tuple(self.window_size),
                                     self.num_heads, dtype=self.dtype,
                                     name="attn")
        if self._use_attn_ln():
            scale, bias = norm1(xw, mode="params")
            attn, ln_out = attn_mod(xw, mask, ln=(scale, bias, norm1.eps))
            norm1(ln_out, mode="sow_output", stat_count=b)
        else:
            attn = attn_mod(norm1(xw, stat_count=b), mask)
        xw = shortcut + DropPath(self.drop_path, name="drop_path1")(
            attn, deterministic, samples=b)
        return self._mlp_tail(xw, deterministic, stat_count=b)

    def _mlp_tail(self, x, deterministic, stat_count=None):
        c = x.shape[-1]
        samples = x.shape[0] if stat_count is None else stat_count
        norm2 = LayerNorm(c, stat_types=self.stat_types, name="norm2")
        mlp = Mlp(int(c * self.mlp_ratio), c, dtype=self.dtype, name="mlp")
        from vitta_tpu.ops.dispatch import pallas_enabled
        if pallas_enabled() and c % 128 == 0 and (x.size // c) % 8 == 0:
            # norm2 fuses into the MLP kernel's prologue; the module
            # still owns the params and sows both tap sides (input here,
            # output from the kernel-returned y) so tap names are
            # identical to the unfused path
            scale, bias = norm2(x, mode="params")
            y, ln_out = mlp(x, deterministic, ln=(scale, bias, norm2.eps))
            norm2(ln_out, mode="sow_output", stat_count=stat_count)
        else:
            y = mlp(norm2(x, stat_count=stat_count), deterministic)
        return x + DropPath(self.drop_path, name="drop_path2")(
            y, deterministic, samples=samples)


class PatchMerging(nn.Module):
    """2x2 spatial merge (swin_transformer.py:277-312)."""

    dim: int
    stat_types: Tuple[str, ...] = ("spatiotemp",)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, d, h, w, c = x.shape
        x = jnp.pad(x, ((0, 0), (0, 0), (0, h % 2), (0, w % 2), (0, 0)))
        hp, wp = h + h % 2, w + w % 2
        # the reference gathers the four parity phases with strided
        # slices and concatenates (swin_transformer.py:293-299) — whose
        # VJP scatter-adds on TPU.  The same permutation as a
        # reshape/transpose pair keeps fwd and bwd as plain relayouts;
        # channel-block order (j-major, i-minor, then C) matches the
        # reference's [x0|x1|x2|x3] concat exactly.
        x = x.reshape(b, d, hp // 2, 2, wp // 2, 2, c)
        x = jnp.transpose(x, (0, 1, 2, 4, 5, 3, 6))
        x = x.reshape(b, d, hp // 2, wp // 2, 4 * c)
        x = LayerNorm(4 * c, stat_types=self.stat_types, name="norm")(x)
        return nn.Dense(2 * c, use_bias=False, dtype=self.dtype,
                        name="reduction")(x)


def window_relayout(xw, window, dims, from_shift, to_shift):
    """Re-window a (B*nW, N, C) tensor from one cyclic shift to another:
    the window_reverse / un-roll / roll / window_partition chain between
    consecutive Swin blocks, composed into adjacent movement ops (one
    net roll) that XLA can fuse."""
    b, d, h, w = dims
    x = window_reverse(xw, window, b, d, h, w)
    delta = tuple(f - t for f, t in zip(from_shift, to_shift))
    if any(delta):
        x = jnp.roll(x, shift=delta, axis=(1, 2, 3))
    return window_partition(x, window)


class BasicLayer(nn.Module):
    """One Swin stage (swin_transformer.py:332-413)."""

    dim: int
    depth: int
    num_heads: int
    window_size: Tuple[int, int, int]
    drop_paths: Tuple[float, ...]
    downsample: bool
    stat_types: Tuple[str, ...] = ("spatiotemp",)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        shift = tuple(s // 2 for s in self.window_size)
        blocks = [
            SwinBlock3D(
                dim=self.dim,
                num_heads=self.num_heads,
                window_size=self.window_size,
                shift_size=(0, 0, 0) if i % 2 == 0 else shift,
                drop_path=self.drop_paths[i],
                stat_types=self.stat_types,
                dtype=self.dtype,
                name=f"blocks_{i}",
            ) for i in range(self.depth)]
        if self._window_resident_ok(x.shape):
            x = self._forward_window_resident(x, blocks, deterministic)
        else:
            for blk in blocks:
                x = blk(x, deterministic=deterministic)
        if self.downsample:
            x = PatchMerging(self.dim, stat_types=self.stat_types,
                             dtype=self.dtype, name="downsample")(x)
        return x

    def _window_resident_ok(self, shape) -> bool:
        from vitta_tpu.ops.dispatch import window_resident_enabled
        if not window_resident_enabled():
            return False
        # non-spatiotemp taps need the (D, H, W) token structure the
        # window layout scrambles; cossim needs the time axis
        if tuple(self.stat_types) != ("spatiotemp",):
            return False
        _, d, h, w, _ = shape
        window = get_window_size((d, h, w), tuple(self.window_size))
        # padding inside the stage would force a spatial round trip anyway
        return d % window[0] == 0 and h % window[1] == 0 and w % window[2] == 0

    def _forward_window_resident(self, x, blocks, deterministic):
        """Keep activations in window layout across the whole stage: one
        entry partition, one composed relayout per shift change (instead
        of reverse+roll / roll+partition around every block), one exit
        reverse.  All intermediate ops (LN, attention, MLP, residuals,
        spatiotemp taps) are token-order-invariant; DropPath and the tap
        COUNT_LEAF receive the true sample count explicitly."""
        b, d, h, w, c = x.shape
        window, base_shift = get_window_size(
            (d, h, w), tuple(self.window_size),
            tuple(s // 2 for s in self.window_size))
        xw = window_partition(x, window)
        cur = (0, 0, 0)
        for i, blk in enumerate(blocks):
            sh = (0, 0, 0) if i % 2 == 0 else base_shift
            if sh != cur:
                xw = window_relayout(xw, window, (b, d, h, w), cur, sh)
                cur = sh
            mask_np = compute_shift_mask(d, h, w, window, sh)
            xw = blk(xw, deterministic=deterministic, wr=(b, mask_np))
        x = window_reverse(xw, window, b, d, h, w)
        if any(cur):
            x = jnp.roll(x, shift=cur, axis=(1, 2, 3))
        return x


def patchify(x, patch_size):
    """(B, T, H, W, 3) -> (B, T/pd, H/ph, W/pw, pd*ph*pw*3), element order
    (t, h, w, c) — exactly the contraction order of the patch-embed Conv3d
    kernel (kt, kh, kw, in, out), so ``patchified @ kernel.reshape(-1, C)``
    equals the VALID-padding strided conv.

    Works on any dtype; the engine applies it to the *uint8* input before
    the device-side normalize (per-channel constants tile across the
    packed axis), which keeps XLA from pattern-matching the
    unfold-then-matmul back into the slow strided conv — the f32 form of
    this rewrite was measured WORSE (3.4 -> 9.8 ms/step, round 3)."""
    pd, ph, pw = patch_size
    b, t, h, w, c = x.shape
    x = x.reshape(b, t // pd, pd, h // ph, ph, w // pw, pw, c)
    x = jnp.transpose(x, (0, 1, 3, 5, 2, 4, 6, 7))
    return x.reshape(b, t // pd, h // ph, w // pw, pd * ph * pw * c)


def patchify_mm(x, patch_size):
    """Pattern-match-proof unfold: (B, T, H, W, c) ->
    (B, T/pd, H/ph, W/pw, c*pd*ph*pw) in **(c, t, h, w)** element order —
    deliberately NOT the Conv3d contraction order (t, h, w, c), so XLA's
    algebraic simplifier cannot rewrite the unfold+matmul back into the
    strided conv.  That rewrite is what sank the round-3 f32 patchify
    (3.4 -> 9.8 ms/step): the conv form forces the input into a
    channel-minor tiled layout where C=3 occupies a 128-lane tile — the
    round-5 trace shows 1.3 ms/step of that relayout copy plus ~2.9 ms
    of conv kernels, all replaced here by one cheap transpose whose
    destination layout is the 96-wide packed axis.  Pair with
    ``kernel_mm`` on the Conv3d parameters."""
    pd, ph, pw = patch_size
    b, t, h, w, c = x.shape
    x = x.reshape(b, t // pd, pd, h // ph, ph, w // pw, pw, c)
    x = jnp.transpose(x, (0, 1, 3, 5, 7, 2, 4, 6))
    return x.reshape(b, t // pd, h // ph, w // pw, c * pd * ph * pw)


def kernel_mm(kernel):
    """Conv3d kernel (pd, ph, pw, in, out) -> (in*pd*ph*pw, out) rows in
    ``patchify_mm``'s (c, t, h, w) element order."""
    pd, ph, pw, cin, cout = kernel.shape
    return jnp.transpose(kernel, (3, 0, 1, 2, 4)).reshape(
        cin * pd * ph * pw, cout)


class _PatchEmbedParams(nn.Module):
    """Owns the patch-embed Conv3d's kernel/bias (same names, shapes and
    init as nn.Conv) without running the conv — the pre-patchified input
    path consumes them as a flat matmul.  Checkpoint tree unchanged."""

    patch_size: Tuple[int, int, int]
    in_channels: int
    features: int

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (*self.patch_size, self.in_channels, self.features))
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,))
        return kernel, bias


class SwinTransformer3D(nn.Module):
    """Swin-B video backbone (swin_transformer.py:459-661)."""

    patch_size: Tuple[int, int, int] = (2, 4, 4)
    embed_dim: int = 128
    depths: Tuple[int, ...] = (2, 2, 18, 2)
    num_heads: Tuple[int, ...] = (4, 8, 16, 32)
    window_size: Tuple[int, int, int] = (8, 7, 7)
    drop_path_rate: float = 0.2
    stat_types: Tuple[str, ...] = ("spatiotemp",)
    dtype: jnp.dtype = jnp.float32     # compute dtype; params stay f32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        """x: (B, T, H, W, 3) -> (B, D, H', W', num_features).

        A pre-patchified input — (B, D, H', W', pd*ph*pw*3), produced by
        ``patchify`` (the engine does this on the uint8 frames under
        VITTA_PATCHIFY) — is detected by its packed channel count and
        embedded with a flat matmul over the same Conv3d parameters."""
        pd, ph, pw = self.patch_size
        packed = pd * ph * pw * 3
        from vitta_tpu.ops.dispatch import patchify_v2_enabled
        if x.shape[-1] == packed:
            kernel, bias = _PatchEmbedParams(
                tuple(self.patch_size), 3, self.embed_dim,
                name="patch_embed_proj")()
            x = jnp.dot(x.astype(self.dtype),
                        kernel.reshape(packed, self.embed_dim)
                        .astype(self.dtype)) + bias.astype(self.dtype)
        elif (patchify_v2_enabled() and x.shape[1] % pd == 0
              and x.shape[2] % ph == 0 and x.shape[3] % pw == 0):
            # in-model unfold + matmul in a conv-foreign element order
            # (see patchify_mm): the strided Conv3d and its input
            # relayout never materialize
            kernel, bias = _PatchEmbedParams(
                tuple(self.patch_size), 3, self.embed_dim,
                name="patch_embed_proj")()
            xp = patchify_mm(x.astype(self.dtype), tuple(self.patch_size))
            x = (jnp.dot(xp, kernel_mm(kernel).astype(self.dtype))
                 + bias.astype(self.dtype))
        else:
            t, hh, ww_ = x.shape[1:4]
            pad = ((0, 0), (0, (-t) % pd), (0, (-hh) % ph),
                   (0, (-ww_) % pw), (0, 0))
            x = jnp.pad(x.astype(self.dtype), pad)
            x = nn.Conv(self.embed_dim, kernel_size=self.patch_size,
                        strides=self.patch_size, padding="VALID",
                        dtype=self.dtype,
                        name="patch_embed_proj")(x)   # (B, D, H', W', C)
        # the patch-embed LayerNorm is NOT a stat tap (basics.py:503-505)
        x = LayerNorm(self.embed_dim, tap=False, name="patch_embed_norm")(x)

        dpr = np.linspace(0, self.drop_path_rate, sum(self.depths)).tolist()
        i0 = 0
        n_layers = len(self.depths)
        for li, depth in enumerate(self.depths):
            x = BasicLayer(
                dim=self.embed_dim * (2 ** li),
                depth=depth,
                num_heads=self.num_heads[li],
                window_size=self.window_size,
                drop_paths=tuple(dpr[i0:i0 + depth]),
                downsample=(li < n_layers - 1),
                stat_types=self.stat_types,
                dtype=self.dtype,
                name=f"layers_{li}",
            )(x, deterministic=deterministic)
            i0 += depth
        num_features = self.embed_dim * (2 ** (n_layers - 1))
        return LayerNorm(num_features, stat_types=self.stat_types,
                         name="norm")(x)


class I3DHead(nn.Module):
    """AvgPool3d + Dropout(0.5) + Linear (i3d_head.py:25-77)."""

    num_classes: int
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        # pool + classifier in f32 (parity-critical head; matches TANet's
        # f32 new_fc under bf16 compute)
        x = jnp.mean(x.astype(jnp.float32), axis=(1, 2, 3))   # (B, C)
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        return nn.Dense(self.num_classes, name="fc_cls",
                        kernel_init=nn.initializers.normal(0.01))(x)


class Recognizer3D(nn.Module):
    """Backbone + head; views are pre-folded into batch
    (recognizer3d.py:95-115)."""

    num_classes: int
    patch_size: Tuple[int, int, int] = (2, 4, 4)
    window_size: Tuple[int, int, int] = (8, 7, 7)
    embed_dim: int = 128
    depths: Tuple[int, ...] = (2, 2, 18, 2)
    num_heads: Tuple[int, ...] = (4, 8, 16, 32)
    drop_path_rate: float = 0.2
    head_dropout: float = 0.5          # I3DHead dropout (i3d_head.py:30)
    stat_types: Tuple[str, ...] = ("spatiotemp",)
    dtype: str = "float32"             # compute dtype; "bfloat16" for speed

    def setup(self):
        self.backbone = SwinTransformer3D(
            patch_size=self.patch_size, embed_dim=self.embed_dim,
            depths=self.depths, num_heads=self.num_heads,
            window_size=self.window_size, drop_path_rate=self.drop_path_rate,
            stat_types=tuple(self.stat_types), dtype=jnp.dtype(self.dtype))
        self.cls_head = I3DHead(self.num_classes, dropout=self.head_dropout)

    def __call__(self, x, *, train: bool = False,
                 use_running_average: bool = True,
                 update_running_stats: bool = False):
        """x: (B*V, T, H, W, 3) -> per-view logits (B*V, K)."""
        feats = self.backbone(x, deterministic=not train)
        return self.cls_head(feats, deterministic=not train)

    def features(self, x, **kw):
        feats = self.backbone(x, deterministic=True)
        return jnp.mean(feats, axis=(1, 2, 3))
