"""Plain-torch oracle of Video Swin (Recognizer3D) for parity tests.

Independent condensed re-statement of the Video Swin Transformer
architecture (arXiv:2106.13230; mmaction2 layout) with checkpoint-
compatible parameter names (backbone.layers.{i}.blocks.{j}.attn.qkv,
cls_head.fc_cls, ...).  Evaluation-mode only (drop paths inactive).
"""

from functools import reduce
import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


def get_window_size(x_size, window_size, shift_size=None):
    use_w = list(window_size)
    use_s = list(shift_size) if shift_size is not None else None
    for i in range(3):
        if x_size[i] <= window_size[i]:
            use_w[i] = x_size[i]
            if use_s is not None:
                use_s[i] = 0
    if shift_size is None:
        return tuple(use_w)
    return tuple(use_w), tuple(use_s)


def window_partition(x, ws):
    b, d, h, w, c = x.shape
    x = x.view(b, d // ws[0], ws[0], h // ws[1], ws[1], w // ws[2], ws[2], c)
    return x.permute(0, 1, 3, 5, 2, 4, 6, 7).reshape(-1, ws[0] * ws[1] * ws[2], c)


def window_reverse(windows, ws, b, d, h, w):
    x = windows.view(b, d // ws[0], h // ws[1], w // ws[2], ws[0], ws[1], ws[2], -1)
    return x.permute(0, 1, 4, 2, 5, 3, 6, 7).reshape(b, d, h, w, -1)


def compute_mask(dp, hp, wp, ws, ss):
    img = torch.zeros((1, dp, hp, wp, 1))
    cnt = 0
    for d in (slice(-ws[0]), slice(-ws[0], -ss[0]), slice(-ss[0], None)):
        for h in (slice(-ws[1]), slice(-ws[1], -ss[1]), slice(-ss[1], None)):
            for w in (slice(-ws[2]), slice(-ws[2], -ss[2]), slice(-ss[2], None)):
                img[:, d, h, w, :] = cnt
                cnt += 1
    mw = window_partition(img, ws).squeeze(-1)
    attn_mask = mw.unsqueeze(1) - mw.unsqueeze(2)
    return attn_mask.masked_fill(attn_mask != 0, -100.0).masked_fill(attn_mask == 0, 0.0)


class WindowAttention3D(nn.Module):
    def __init__(self, dim, window_size, num_heads):
        super().__init__()
        self.window_size = window_size
        self.num_heads = num_heads
        self.scale = (dim // num_heads) ** -0.5
        wd, wh, ww = window_size
        self.relative_position_bias_table = nn.Parameter(
            torch.zeros((2 * wd - 1) * (2 * wh - 1) * (2 * ww - 1), num_heads))
        coords = torch.stack(torch.meshgrid(
            torch.arange(wd), torch.arange(wh), torch.arange(ww), indexing="ij"))
        flat = torch.flatten(coords, 1)
        rel = flat[:, :, None] - flat[:, None, :]
        rel = rel.permute(1, 2, 0).contiguous()
        rel[..., 0] += wd - 1
        rel[..., 1] += wh - 1
        rel[..., 2] += ww - 1
        rel[..., 0] *= (2 * wh - 1) * (2 * ww - 1)
        rel[..., 1] *= (2 * ww - 1)
        self.register_buffer("relative_position_index", rel.sum(-1))
        self.qkv = nn.Linear(dim, dim * 3, bias=True)
        self.proj = nn.Linear(dim, dim)

    def forward(self, x, mask=None):
        b_, n, c = x.shape
        qkv = self.qkv(x).reshape(b_, n, 3, self.num_heads, c // self.num_heads)
        qkv = qkv.permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q * self.scale) @ k.transpose(-2, -1)
        bias = self.relative_position_bias_table[
            self.relative_position_index[:n, :n].reshape(-1)].reshape(n, n, -1)
        attn = attn + bias.permute(2, 0, 1).unsqueeze(0)
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.view(b_ // nw, nw, self.num_heads, n, n) \
                + mask.unsqueeze(1).unsqueeze(0)
            attn = attn.view(-1, self.num_heads, n, n)
        attn = attn.softmax(dim=-1)
        x = (attn @ v).transpose(1, 2).reshape(b_, n, c)
        return self.proj(x)


class Mlp(nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1 = nn.Linear(dim, hidden)
        self.fc2 = nn.Linear(hidden, dim)

    def forward(self, x):
        return self.fc2(F.gelu(self.fc1(x)))


class SwinBlock(nn.Module):
    def __init__(self, dim, num_heads, window_size, shift_size, mlp_ratio=4.0):
        super().__init__()
        self.window_size = window_size
        self.shift_size = shift_size
        self.norm1 = nn.LayerNorm(dim)
        self.attn = WindowAttention3D(dim, window_size, num_heads)
        self.norm2 = nn.LayerNorm(dim)
        self.mlp = Mlp(dim, int(dim * mlp_ratio))

    def forward(self, x):
        b, d, h, w, c = x.shape
        ws, ss = get_window_size((d, h, w), self.window_size, self.shift_size)
        shortcut = x
        x = self.norm1(x)
        pad = (0, 0, 0, (-w) % ws[2], 0, (-h) % ws[1], 0, (-d) % ws[0])
        x = F.pad(x, pad)
        _, dp, hp, wp, _ = x.shape
        if any(ss):
            x = torch.roll(x, shifts=(-ss[0], -ss[1], -ss[2]), dims=(1, 2, 3))
            mask = compute_mask(dp, hp, wp, ws, ss)
        else:
            mask = None
        win = window_partition(x, ws)
        att = self.attn(win, mask)
        x = window_reverse(att, ws, b, dp, hp, wp)
        if any(ss):
            x = torch.roll(x, shifts=ss, dims=(1, 2, 3))
        x = x[:, :d, :h, :w]
        x = shortcut + x
        return x + self.mlp(self.norm2(x))


class PatchMerging(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.norm = nn.LayerNorm(4 * dim)
        self.reduction = nn.Linear(4 * dim, 2 * dim, bias=False)

    def forward(self, x):
        b, d, h, w, c = x.shape
        x = F.pad(x, (0, 0, 0, w % 2, 0, h % 2))
        x = torch.cat([x[:, :, 0::2, 0::2], x[:, :, 1::2, 0::2],
                       x[:, :, 0::2, 1::2], x[:, :, 1::2, 1::2]], -1)
        return self.reduction(self.norm(x))


class BasicLayer(nn.Module):
    def __init__(self, dim, depth, num_heads, window_size, downsample):
        super().__init__()
        shift = tuple(s // 2 for s in window_size)
        self.blocks = nn.ModuleList([
            SwinBlock(dim, num_heads, window_size,
                      (0, 0, 0) if i % 2 == 0 else shift)
            for i in range(depth)])
        self.downsample = PatchMerging(dim) if downsample else None

    def forward(self, x):
        for blk in self.blocks:
            x = blk(x)
        if self.downsample is not None:
            x = self.downsample(x)
        return x


class PatchEmbed3D(nn.Module):
    def __init__(self, patch_size, embed_dim):
        super().__init__()
        self.patch_size = patch_size
        self.proj = nn.Conv3d(3, embed_dim, kernel_size=patch_size,
                              stride=patch_size)
        self.norm = nn.LayerNorm(embed_dim)
        # forward logic lives in Backbone.forward (proj + norm inline)


class Backbone(nn.Module):
    def __init__(self, patch_size, embed_dim, depths, num_heads, window_size):
        super().__init__()
        self.patch_embed = PatchEmbed3D(patch_size, embed_dim)
        self.layers = nn.ModuleList([
            BasicLayer(embed_dim * 2 ** i, depths[i], num_heads[i],
                       window_size, i < len(depths) - 1)
            for i in range(len(depths))])
        self.num_features = embed_dim * 2 ** (len(depths) - 1)
        self.norm = nn.LayerNorm(self.num_features)

    def forward(self, x):  # (B, 3, T, H, W)
        ps = self.patch_embed.patch_size
        _, _, t, h, w = x.shape
        x = F.pad(x, (0, (-w) % ps[2], 0, (-h) % ps[1], 0, (-t) % ps[0]))
        x = self.patch_embed.proj(x)              # (B, C, D, H', W')
        b, c, d, hh, ww = x.shape
        x = x.flatten(2).transpose(1, 2)
        x = self.patch_embed.norm(x)
        x = x.transpose(1, 2).view(b, c, d, hh, ww)
        x = x.permute(0, 2, 3, 4, 1)              # (B, D, H, W, C)
        for layer in self.layers:
            x = layer(x)
        return self.norm(x)                       # (B, D, H, W, C)


class TorchRecognizer3D(nn.Module):
    def __init__(self, num_classes, patch_size=(2, 4, 4), embed_dim=8,
                 depths=(1, 1, 2, 1), num_heads=(1, 2, 4, 8),
                 window_size=(2, 3, 3)):
        super().__init__()
        self.backbone = Backbone(patch_size, embed_dim, depths, num_heads,
                                 window_size)

        class Head(nn.Module):
            def __init__(self, feats, k):
                super().__init__()
                self.fc_cls = nn.Linear(feats, k)

            def forward(self, x):
                return self.fc_cls(x)

        self.cls_head = Head(self.backbone.num_features, num_classes)

    def forward(self, x):  # (B, 3, T, H, W) -> (B, K)
        feats = self.backbone(x)                  # (B, D, H, W, C)
        pooled = feats.mean((1, 2, 3))
        return self.cls_head(pooled)
