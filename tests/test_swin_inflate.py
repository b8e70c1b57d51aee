"""inflate_swin2d_checkpoint: image-Swin -> Video Swin variables."""

import numpy as np
import jax.numpy as jnp

from vitta_tpu.models.swin import Recognizer3D
from vitta_tpu.utils.checkpoint import inflate_swin2d_checkpoint

K = 4
EMBED = 8
DEPTHS = (1,)
HEADS = (2,)
WINDOW = (2, 3, 3)   # 3D window; 2D table is (2*3-1)*(2*3-1) entries


def _fake_2d_state_dict():
    rng = np.random.default_rng(0)
    sd = {}
    sd["patch_embed.proj.weight"] = rng.normal(size=(EMBED, 3, 4, 4)).astype(np.float32)
    sd["patch_embed.proj.bias"] = np.zeros(EMBED, np.float32)
    sd["patch_embed.norm.weight"] = np.ones(EMBED, np.float32)
    sd["patch_embed.norm.bias"] = np.zeros(EMBED, np.float32)
    b = "layers.0.blocks.0"
    for n in ("norm1", "norm2"):
        sd[f"{b}.{n}.weight"] = np.ones(EMBED, np.float32)
        sd[f"{b}.{n}.bias"] = np.zeros(EMBED, np.float32)
    sd[f"{b}.attn.qkv.weight"] = rng.normal(size=(3 * EMBED, EMBED)).astype(np.float32)
    sd[f"{b}.attn.qkv.bias"] = np.zeros(3 * EMBED, np.float32)
    sd[f"{b}.attn.proj.weight"] = rng.normal(size=(EMBED, EMBED)).astype(np.float32)
    sd[f"{b}.attn.proj.bias"] = np.zeros(EMBED, np.float32)
    # 2D relative-position table: (2wh-1)(2ww-1) x heads
    sd[f"{b}.attn.relative_position_bias_table"] = rng.normal(
        size=(25, HEADS[0])).astype(np.float32)
    sd[f"{b}.attn.relative_position_index"] = np.zeros((9, 9), np.int64)
    sd[f"{b}.mlp.fc1.weight"] = rng.normal(size=(4 * EMBED, EMBED)).astype(np.float32)
    sd[f"{b}.mlp.fc1.bias"] = np.zeros(4 * EMBED, np.float32)
    sd[f"{b}.mlp.fc2.weight"] = rng.normal(size=(EMBED, 4 * EMBED)).astype(np.float32)
    sd[f"{b}.mlp.fc2.bias"] = np.zeros(EMBED, np.float32)
    sd["norm.weight"] = np.ones(EMBED, np.float32)
    sd["norm.bias"] = np.zeros(EMBED, np.float32)
    return sd


def test_inflate_2d_swin_runs_as_video_swin():
    variables = inflate_swin2d_checkpoint(
        _fake_2d_state_dict(), num_classes=K, patch_t=2, window_t=WINDOW[0],
        depths=DEPTHS, window_hw=WINDOW[1:])
    # temporal replication of the patch embed preserves total response
    kern = variables["params"]["backbone"]["patch_embed_proj"]["kernel"]
    assert kern.shape == (2, 4, 4, 3, EMBED)
    np.testing.assert_allclose(np.asarray(kern).sum(0) * 2 / 2,
                               np.asarray(kern[0]) * 2, rtol=1e-6)
    # rpb table tiled (2wd-1)x along the temporal-offset axis, carried 4D
    table = variables["params"]["backbone"]["layers_0"]["blocks_0"]["attn"]["rpb_table"]
    assert table.shape == (2 * WINDOW[0] - 1, 5, 5, HEADS[0])
    np.testing.assert_allclose(np.asarray(table[0]), np.asarray(table[1]))

    model = Recognizer3D(num_classes=K, patch_size=(2, 4, 4),
                         window_size=WINDOW, embed_dim=EMBED, depths=DEPTHS,
                         num_heads=HEADS, drop_path_rate=0.0)
    out = model.apply(variables, jnp.zeros((1, 4, 24, 24, 3), jnp.float32),
                      train=False)
    assert out.shape == (1, K)
