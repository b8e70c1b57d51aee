"""Data pipeline + end-to-end micro-run on synthetic videos (the
framework's analogue of the reference's --debug smoke mode)."""

import dataclasses
import numpy as np
import jax
import pytest

from vitta_tpu.config import tanet_ucf101_preset
from vitta_tpu.data.dataset import TANetVideoDataset, PairedTTADataset
from vitta_tpu.data.records import VideoRecord, parse_list_file
from vitta_tpu.data.video_reader import SyntheticVideoSource
from vitta_tpu.data.pipeline import Prefetcher
from vitta_tpu.data import transforms
from vitta_tpu.adapt.engine import VittaEngine, flatten_taps
from vitta_tpu.adapt.loops import tta_stream, validate
from vitta_tpu.models.tanet import TANet


T, HW, K, V = 2, 32, 5, 2


def tiny_cfg():
    cfg = tanet_ucf101_preset()
    return cfg.replace(
        data=dataclasses.replace(cfg.data, clip_length=T, input_size=HW,
                                 scale_size=40),
        model=dataclasses.replace(cfg.model, num_classes=K),
    )


def records(n=4):
    return [VideoRecord(f"vid{i}", 50 + 7 * i, i % K) for i in range(n)]


def test_parse_list_file(tmp_path):
    p = tmp_path / "list.txt"
    p.write_text("a/b 120 3\nshort 2 1\nc/d 64 7\n")
    recs = parse_list_file(str(p))
    assert [r.path for r in recs] == ["a/b", "c/d"]  # <3-frame row filtered
    recs = parse_list_file(str(p), filter_short=False)
    assert len(recs) == 3


def test_synthetic_source_deterministic():
    src = SyntheticVideoSource(height=48, width=64, frames_per_video=40)
    a = src.get_batch("vid1", np.array([0, 5, 10]))
    b = src.get_batch("vid1", np.array([0, 5, 10]))
    np.testing.assert_array_equal(a, b)
    assert a.shape == (3, 48, 64, 3) and a.dtype == np.uint8
    assert src.num_frames("vid1") == src.num_frames("vid1")


def test_frame_dir_source(tmp_path):
    from PIL import Image
    from vitta_tpu.data.video_reader import FrameDirVideoSource
    d = tmp_path / "vidA"
    d.mkdir()
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, size=(5, 20, 24, 3), dtype=np.uint8)
    for i, f in enumerate(frames):
        Image.fromarray(f).save(str(d / f"img_{i+1:05d}.png"))
    src = FrameDirVideoSource(str(tmp_path), image_tmpl="img_{:05d}.png")
    assert src.num_frames("vidA") == 5
    got = src.get_batch("vidA", np.array([0, 2, 4]))
    assert got.shape == (3, 20, 24, 3)
    np.testing.assert_array_equal(got, frames[[0, 2, 4]])


def test_transforms_shapes_and_range():
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, size=(T, 48, 64, 3), dtype=np.uint8)
    out = transforms.scale_center_crop(frames, 40, HW)
    assert out.shape == (T, HW, HW, 3)
    views = np.stack([frames, frames])
    cropped = transforms.subgroupwise_multiscale_crop(views, HW, rng)
    assert cropped.shape == (V, T, HW, HW, 3)
    norm = transforms.normalize_clip(out, (0.5, 0.5, 0.5), (0.25, 0.25, 0.25))
    assert norm.dtype == np.float32
    assert abs(float(norm.max())) < 3.0
    crops3 = transforms.full_res_3crop(frames, HW, 40)
    assert crops3.shape == (3, T, HW, HW, 3)


def test_dataset_shapes():
    cfg = tiny_cfg()
    src = SyntheticVideoSource(height=48, width=64, frames_per_video=60)
    ds_tta = TANetVideoDataset(cfg, src, records(), dataset_type="tta")
    s = ds_tta[0]
    assert s.frames.shape == (V, T, HW, HW, 3)
    ds_eval = TANetVideoDataset(cfg, src, records(), dataset_type="eval")
    e = ds_eval[0]
    assert e.frames.shape == (1, T, HW, HW, 3)  # uniform-1, 1 crop
    # 3-crop eval
    cfg3 = cfg.replace(data=dataclasses.replace(cfg.data, test_crops=3))
    e3 = TANetVideoDataset(cfg3, src, records(), dataset_type="eval")[0]
    assert e3.frames.shape == (3, T, HW, HW, 3)


@pytest.mark.slow  # stream compile (~60 s)
def test_end_to_end_tta_stream():
    cfg = tiny_cfg()
    model = TANet(num_classes=K, clip_length=T)
    rng = jax.random.PRNGKey(0)
    x0 = np.zeros((V, T, HW, HW, 3), np.float32)
    variables = model.init({"params": rng, "dropout": rng}, x0, train=False)
    variables = {"params": variables["params"],
                 "batch_stats": variables["batch_stats"]}
    clean = jax.random.normal(jax.random.PRNGKey(1), (V, T, HW, HW, 3))
    _, aux = model.apply(variables, clean, train=False, mutable=["taps"])
    src_stats = {n: (np.asarray(s.mean), np.asarray(s.var))
                 for n, s in flatten_taps(aux["taps"]).items()
                 if "g_bn" not in n and "l_bn" not in n}

    vsrc = SyntheticVideoSource(height=48, width=64, frames_per_video=60)
    paired = PairedTTADataset(cfg, vsrc, records(4))
    engine = VittaEngine(model, cfg, variables, src_stats, donate=False)
    result, state, meters = tta_stream(
        engine, Prefetcher(paired, device_put=False), seed=0)
    assert len(result) == 1
    assert 0.0 <= result[0] <= 100.0
    assert int(state.step) == 4
    assert meters["loss_reg"].avg > 0

    # eval-only loop runs on the same engine
    ds_eval = TANetVideoDataset(cfg, vsrc, records(2), dataset_type="eval")
    top1, top5 = validate(engine, [ds_eval[i] for i in range(2)])
    assert 0.0 <= top1 <= 100.0 and top1 <= top5


def test_paired_fused_decode_matches_two_call():
    """PairedTTADataset's union-decode must be byte-identical to the
    original two-get_batch path, for both dataset families."""
    from vitta_tpu.config import swin_ucf101_preset
    from vitta_tpu.data.dataset import SwinVideoDataset

    src = SyntheticVideoSource(height=48, width=64, frames_per_video=60)
    recs = records(3)
    cfg = tiny_cfg()
    for cls, c in ((TANetVideoDataset, cfg),
                   (SwinVideoDataset, swin_ucf101_preset().replace(
                       data=dataclasses.replace(
                           swin_ucf101_preset().data, clip_length=T,
                           input_size=HW, scale_size=40)))):
        for u8 in (False, True):
            fused = PairedTTADataset(c, src, recs, seed=11, dataset_cls=cls,
                                     emit_uint8=u8, fuse_decode=True)
            plain = PairedTTADataset(c, src, recs, seed=11, dataset_cls=cls,
                                     emit_uint8=u8, fuse_decode=False)
            for i in range(len(recs)):
                fa, fb, fl = fused[i]
                pa, pb, pl = plain[i]
                np.testing.assert_array_equal(fa, pa)
                np.testing.assert_array_equal(fb, pb)
                assert fl == pl
