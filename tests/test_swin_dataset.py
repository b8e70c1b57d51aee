"""Swin data pipeline: shapes, normalization scale, shared-crop
semantics, and an end-to-end tiny Swin TTA step through the dispatcher."""

import dataclasses
import numpy as np

from vitta_tpu.config import swin_ucf101_preset
from vitta_tpu.data.dataset import SwinVideoDataset, PairedTTADataset, dataset_cls_for
from vitta_tpu.data.records import VideoRecord
from vitta_tpu.data.video_reader import SyntheticVideoSource
from vitta_tpu.data import transforms
import pytest


T, HW, K, V = 4, 24, 5, 2


def tiny_cfg():
    cfg = swin_ucf101_preset()
    return cfg.replace(
        data=dataclasses.replace(cfg.data, clip_length=T, input_size=HW,
                                 scale_size=32),
        model=dataclasses.replace(
            cfg.model, num_classes=K, embed_dim=8, depths=(1, 1, 2, 1),
            num_heads=(1, 2, 4, 8), window_size=(2, 3, 3), drop_path_rate=0.0),
    )


def records(n=2):
    return [VideoRecord(f"v{i}", 40 + 5 * i, i % K) for i in range(n)]


def test_swin_dataset_shapes_and_scale():
    cfg = tiny_cfg()
    src = SyntheticVideoSource(height=48, width=64, frames_per_video=50)
    tta = SwinVideoDataset(cfg, src, records(), dataset_type="tta")
    s = tta[0]
    assert s.frames.shape == (V, T, HW, HW, 3)
    # 0-255 normalization scale (mmcv imnormalize): values are O(1)
    assert abs(float(np.abs(s.frames).mean())) < 5.0
    ev = SwinVideoDataset(cfg, src, records(), dataset_type="eval")
    e = ev[0]
    assert e.frames.shape == (1, T, HW, HW, 3)
    assert dataset_cls_for("videoswintransformer") is SwinVideoDataset


def test_fused_short_resize_crop_matches_unfused():
    """_resize_short_crop (windowed resample) == short-side resize then
    crop, for both the TTA (random bbox) and eval (center) geometries."""
    from vitta_tpu.data import native
    cfg = tiny_cfg()
    src = SyntheticVideoSource(height=48, width=64, frames_per_video=50)
    ds = SwinVideoDataset(cfg, src, records(), dataset_type="tta")
    frames = src.get_batch("v0", np.arange(8))
    h, w = ds._short_dims(*frames.shape[1:3])
    full = native.resize_bilinear(frames, h, w, antialias=False)
    rng = np.random.default_rng(3)
    for _ in range(4):
        x, y, cw, ch = transforms.random_resized_crop_bbox(h, w, rng)
        fused = ds._resize_short_crop(frames, y, x, ch, cw)
        np.testing.assert_array_equal(fused, full[:, y:y + ch, x:x + cw])
    # identity case: short side already == scale_size -> crop only
    ds32 = SwinVideoDataset(cfg, src, records(), dataset_type="tta")
    f32 = src.get_batch("v0", np.arange(4))[:, :32, :40]
    assert ds32._short_dims(32, 40) == (32, 40)
    out = ds32._resize_short_crop(f32, 2, 3, 24, 24)
    np.testing.assert_array_equal(out, f32[:, 2:26, 3:27])


def test_synthetic_source_frame_cache_is_transparent():
    """Repeated/overlapping get_batch calls hit the LRU frame cache and
    return identical frames to a fresh source."""
    a = SyntheticVideoSource(height=32, width=40)
    first = a.get_batch("vid", np.array([0, 2, 5, 2]))
    again = a.get_batch("vid", np.array([2, 0, 5]))
    np.testing.assert_array_equal(first[1], again[0])
    np.testing.assert_array_equal(first[0], again[1])
    fresh = SyntheticVideoSource(height=32, width=40)
    np.testing.assert_array_equal(
        fresh.get_batch("vid", np.array([0, 2, 5, 2])), first)
    assert len(a._cache) > 0


def test_shared_crop_box_is_one_per_video():
    rng = np.random.default_rng(0)
    boxes = {transforms.random_resized_crop_bbox(100, 120, rng) for _ in range(5)}
    assert len(boxes) > 1  # random across calls
    for x, y, w, h in boxes:
        assert 0 <= x <= 120 - w and 0 <= y <= 100 - h


@pytest.mark.slow  # swin engine compile (~80 s)
def test_swin_end_to_end_tta():
    import jax
    import jax.numpy as jnp
    from vitta_tpu.adapt.engine import VittaEngine, flatten_taps
    from vitta_tpu.adapt.loops import tta_stream
    from vitta_tpu.models.swin import Recognizer3D

    cfg = tiny_cfg()
    m = cfg.model
    model = Recognizer3D(num_classes=K, patch_size=m.patch_size,
                         window_size=m.window_size, embed_dim=m.embed_dim,
                         depths=m.depths, num_heads=m.num_heads,
                         drop_path_rate=0.0)
    rng = jax.random.PRNGKey(0)
    x0 = jnp.zeros((V, T, HW, HW, 3), jnp.float32)
    variables = model.init({"params": rng, "dropout": rng}, x0, train=False)
    variables = {"params": variables["params"]}
    _, aux = model.apply(variables, x0 + 0.1, train=False, mutable=["taps"])
    src_stats = {n: (np.asarray(s.mean), np.asarray(s.var))
                 for n, s in flatten_taps(aux["taps"]).items()}

    vsrc = SyntheticVideoSource(height=48, width=64, frames_per_video=50)
    paired = PairedTTADataset(cfg, vsrc, records(2),
                              dataset_cls=SwinVideoDataset)
    engine = VittaEngine(model, cfg, variables, src_stats, donate=False)
    # reference-style dotted chosen_blocks resolve to underscore tap names
    assert any("layers_3" in n for n in engine.tap_names)
    assert "backbone.norm" in engine.tap_names
    result, state, meters = tta_stream(engine, [paired[i] for i in range(2)])
    assert 0.0 <= result[0] <= 100.0 and int(state.step) == 2
