"""VideoMAE-style ViT for video (secondary model family).

Re-design of reference models/videomae_models/modeling_finetune.py
(timm-registered ``vit_*`` video models reachable via get_model's
'videomae' arch, corpus/basics.py:1480-1488; the reference ships no
driver for it): 3D patch embed (2, 16, 16), joint space-time attention
transformer encoder, mean-pool + fc head.  LayerNorm taps everywhere
except the (absent) patch-embed norm, so ViTTA's LN-statistics
regularization applies as it does to Swin.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from vitta_tpu.models.layers import LayerNorm
from vitta_tpu.models.swin import DropPath, Mlp


class ViTAttention(nn.Module):
    dim: int
    num_heads: int

    @nn.compact
    def __call__(self, x):
        b, n, c = x.shape
        nh = self.num_heads
        hd = c // nh
        qkv = nn.Dense(3 * c, use_bias=True, name="qkv")(x)
        qkv = qkv.reshape(b, n, 3, nh, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        attn = jnp.einsum("bqhd,bkhd->bhqk", q * (hd ** -0.5), k,
                          preferred_element_type=jnp.float32)
        attn = nn.softmax(attn, axis=-1).astype(x.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v,
                         preferred_element_type=jnp.float32).astype(x.dtype)
        return nn.Dense(c, name="proj")(out.reshape(b, n, c))


class ViTBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    drop_path: float = 0.0

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        y = LayerNorm(self.dim, name="norm1")(x)
        y = ViTAttention(self.dim, self.num_heads, name="attn")(y)
        x = x + DropPath(self.drop_path, name="dp1")(y, deterministic)
        y = LayerNorm(self.dim, name="norm2")(x)
        y = Mlp(int(self.dim * self.mlp_ratio), self.dim, name="mlp")(
            y, deterministic)
        return x + DropPath(self.drop_path, name="dp2")(y, deterministic)


def sincos_positions(n: int, dim: int) -> jnp.ndarray:
    """Fixed sin-cos position table (VideoMAE uses non-learned pos)."""
    import numpy as np
    pos = np.arange(n)[:, None]
    omega = 1.0 / (10000 ** (np.arange(dim // 2) / (dim / 2.0)))
    out = pos * omega[None]
    emb = np.concatenate([np.sin(out), np.cos(out)], axis=1)
    return jnp.asarray(emb, jnp.float32)


class VideoMAE(nn.Module):
    """(B, T, H, W, 3) -> (B, K). ViT-B defaults."""

    num_classes: int
    patch_size: Tuple[int, int, int] = (2, 16, 16)
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    drop_path_rate: float = 0.1

    @nn.compact
    def __call__(self, x, *, train: bool = False,
                 use_running_average: bool = True,
                 update_running_stats: bool = False):
        pt, ph, pw = self.patch_size
        x = nn.Conv(self.embed_dim, kernel_size=self.patch_size,
                    strides=self.patch_size, padding="VALID",
                    name="patch_embed")(x)           # (B, t, h, w, C)
        b = x.shape[0]
        n = x.shape[1] * x.shape[2] * x.shape[3]
        x = x.reshape(b, n, self.embed_dim)
        x = x + sincos_positions(n, self.embed_dim)[None]
        import numpy as np
        dpr = np.linspace(0, self.drop_path_rate, self.depth).tolist()
        for i in range(self.depth):
            x = ViTBlock(self.embed_dim, self.num_heads, drop_path=dpr[i],
                         name=f"blocks_{i}")(x, deterministic=not train)
        x = LayerNorm(self.embed_dim, name="norm")(x)
        pooled = jnp.mean(x, axis=1)
        return nn.Dense(self.num_classes,
                        kernel_init=nn.initializers.normal(0.02),
                        name="head")(pooled)
