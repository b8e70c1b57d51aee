"""Native C++ preprocessing vs PIL/numpy oracles: the bilinear resampler
must match PIL BILINEAR (the reference's pixel path) bit-for-bit, or at
worst +-1 LSB from fixed-point rounding."""

import numpy as np
import pytest
from PIL import Image

from vitta_tpu.data import native


@pytest.fixture(scope="module")
def lib_ok():
    if not native.available():
        pytest.skip("native toolchain unavailable")
    return True


@pytest.mark.parametrize("shape,out_size", [
    ((240, 320), (256, 341)),   # upscale (shorter-side 256)
    ((480, 640), (256, 341)),   # downscale with antialias
    ((240, 320), (224, 224)),   # anisotropic
    ((37, 53), (17, 29)),       # odd sizes
])
def test_resize_matches_pil(lib_ok, shape, out_size):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, size=(*shape, 3), dtype=np.uint8)
    want = np.asarray(Image.fromarray(img).resize(
        (out_size[1], out_size[0]), Image.BILINEAR)).astype(np.int16)
    got = native.resize_bilinear(img, *out_size).astype(np.int16)
    diff = np.abs(got - want)
    assert diff.max() <= 1, f"max diff {diff.max()}"
    assert (diff > 0).mean() < 0.01  # essentially bit-exact


def test_crop_and_normalize(lib_ok):
    rng = np.random.default_rng(1)
    frames = rng.integers(0, 256, size=(2, 20, 24, 3), dtype=np.uint8)
    got = native.crop(frames, 3, 4, 10, 12)
    np.testing.assert_array_equal(got, frames[:, 3:13, 4:16])

    mean, std = (0.485, 0.456, 0.406), (0.229, 0.224, 0.225)
    got_n = native.normalize(frames, mean, std, div255=True)
    want = (frames.astype(np.float32) / 255.0 - np.asarray(mean, np.float32)) \
        / np.asarray(std, np.float32)
    np.testing.assert_allclose(got_n, want, rtol=1e-5, atol=1e-6)

    got_s = native.normalize(frames, (123.675, 116.28, 103.53),
                             (58.395, 57.12, 57.375), div255=False)
    want_s = (frames.astype(np.float32) - np.asarray((123.675, 116.28, 103.53), np.float32)) \
        / np.asarray((58.395, 57.12, 57.375), np.float32)
    np.testing.assert_allclose(got_s, want_s, rtol=1e-5, atol=1e-6)


def test_resize_speed_vs_pil(lib_ok):
    """The native path should not be slower than PIL (informational)."""
    import time
    rng = np.random.default_rng(2)
    frames = rng.integers(0, 256, size=(16, 240, 320, 3), dtype=np.uint8)
    t0 = time.perf_counter()
    native.resize_bilinear(frames, 256, 341)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    for f in frames:
        np.asarray(Image.fromarray(f).resize((341, 256), Image.BILINEAR))
    t_pil = time.perf_counter() - t0
    print(f"native {t_native*1e3:.1f} ms vs PIL {t_pil*1e3:.1f} ms")


@pytest.mark.parametrize("shape,out_size,antialias", [
    ((240, 320), (256, 341), True),
    ((480, 640), (256, 341), True),
    ((240, 320), (256, 341), False),   # cv2-mode 2-tap
    ((37, 53), (40, 60), True),        # odd geometry
])
def test_windowed_resize_bit_identical(lib_ok, shape, out_size, antialias):
    """resize_bilinear_window == resize-then-crop, bit for bit (the fused
    eval pipeline must not perturb PIL parity)."""
    rng = np.random.default_rng(7)
    frames = rng.integers(0, 256, size=(3, *shape, 3), dtype=np.uint8)
    oh, ow = out_size
    full = native.resize_bilinear(frames, oh, ow, antialias)
    for (y0, x0, wh, ww) in [((oh - 16) // 2, (ow - 16) // 2, 16, 16),
                             (0, 0, oh, ow), (oh - 8, ow - 8, 8, 8),
                             (1, 2, oh - 3, ow - 5)]:
        win = native.resize_bilinear_window(frames, oh, ow, y0, x0, wh, ww,
                                            antialias)
        np.testing.assert_array_equal(win, full[:, y0:y0 + wh, x0:x0 + ww])


def test_scale_center_crop_fused_matches_unfused(lib_ok):
    from vitta_tpu.data import transforms
    rng = np.random.default_rng(9)
    frames = rng.integers(0, 256, size=(4, 240, 320, 3), dtype=np.uint8)
    got = transforms.scale_center_crop(frames, 64, 56)
    scaled = native.resize_bilinear(frames, 64, 85)
    y = int(round((64 - 56) / 2.0))
    x = int(round((85 - 56) / 2.0))
    np.testing.assert_array_equal(got, scaled[:, y:y + 56, x:x + 56])
