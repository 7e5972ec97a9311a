"""Native C++ decoder: build, exact PIL parity, fallback, threading."""

import io
import os
import time

import numpy as np
import pytest
from PIL import Image

from semantic_segmentation_of_stylegan2_artifacts_tpu import native


@pytest.fixture(scope="module")
def built():
    if not native.available():
        pytest.skip("native decoder could not be built in this environment")
    return True


def _roundtrip(img: Image.Image, fmt: str) -> bytes:
    buf = io.BytesIO()
    img.save(buf, format=fmt)
    return buf.getvalue()


def _rand_rgb(rng, h, w):
    return Image.fromarray(rng.randint(0, 256, (h, w, 3), np.uint8), "RGB")


def test_png_rgb_exact(built):
    rng = np.random.RandomState(0)
    img = _rand_rgb(rng, 37, 53)
    data = _roundtrip(img, "PNG")
    want = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    got = native.decode_image(data=data)
    np.testing.assert_array_equal(got, want)


def test_png_gray_source_exact(built):
    rng = np.random.RandomState(1)
    img = Image.fromarray(rng.randint(0, 256, (40, 40), np.uint8), "L")
    data = _roundtrip(img, "PNG")
    want_l = np.asarray(Image.open(io.BytesIO(data)).convert("L"))
    want_rgb = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    np.testing.assert_array_equal(native.decode_image(data=data, gray=True),
                                  want_l)
    np.testing.assert_array_equal(native.decode_image(data=data), want_rgb)


def test_png_rgb_to_luma_matches_pil(built):
    rng = np.random.RandomState(2)
    img = _rand_rgb(rng, 33, 29)
    data = _roundtrip(img, "PNG")
    want = np.asarray(Image.open(io.BytesIO(data)).convert("L"))
    got = native.decode_image(data=data, gray=True)
    np.testing.assert_array_equal(got, want)


def test_png_rgba_alpha_stripped_like_pil(built):
    rng = np.random.RandomState(3)
    arr = rng.randint(0, 256, (21, 18, 4), np.uint8)
    data = _roundtrip(Image.fromarray(arr, "RGBA"), "PNG")
    want = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    got = native.decode_image(data=data)
    np.testing.assert_array_equal(got, want)


def test_png_palette_exact(built):
    rng = np.random.RandomState(4)
    img = _rand_rgb(rng, 24, 24).quantize(colors=16)  # mode "P"
    data = _roundtrip(img, "PNG")
    want = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    got = native.decode_image(data=data)
    np.testing.assert_array_equal(got, want)


def test_binary_mask_png_exact(built, tmp_path):
    """The pipeline's actual label format: 0/255 grayscale mask files."""
    rng = np.random.RandomState(5)
    mask = (rng.rand(64, 64) > 0.8).astype(np.uint8) * 255
    p = str(tmp_path / "m_mask.png")
    Image.fromarray(mask, "L").save(p)
    got = native.decode_image(path=p, gray=True)
    np.testing.assert_array_equal(got, mask)


def test_jpeg_rgb_exact(built):
    rng = np.random.RandomState(6)
    img = _rand_rgb(rng, 48, 64)
    data = _roundtrip(img, "JPEG")
    want = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    got = native.decode_image(data=data)
    # PIL uses the same libjpeg; tolerate off-by-one from IDCT flags
    assert got.shape == want.shape
    assert np.max(np.abs(got.astype(int) - want.astype(int))) <= 1


def test_corrupt_input_raises(built):
    with pytest.raises(ValueError):
        native.decode_image(data=b"not an image at all")


def test_dataset_loaders_use_native_and_match_pil(built, tmp_path):
    from semantic_segmentation_of_stylegan2_artifacts_tpu.data.dataset import (
        load_gray,
        load_rgb,
    )

    rng = np.random.RandomState(7)
    ip = str(tmp_path / "img.png")
    lp = str(tmp_path / "lbl.png")
    _rand_rgb(rng, 32, 32).save(ip)
    Image.fromarray((rng.rand(32, 32) > 0.5).astype(np.uint8) * 255,
                    "L").save(lp)
    np.testing.assert_array_equal(
        load_rgb(ip), np.asarray(Image.open(ip).convert("RGB")))
    np.testing.assert_array_equal(
        load_gray(lp), np.asarray(Image.open(lp).convert("L")))


def test_threaded_decode_correct(built, tmp_path):
    """Concurrent ctypes calls (GIL released) stay correct."""
    import concurrent.futures as cf

    rng = np.random.RandomState(8)
    paths, wants = [], []
    for i in range(16):
        p = str(tmp_path / f"t{i}.png")
        img = _rand_rgb(rng, 64, 64)
        img.save(p)
        paths.append(p)
        wants.append(np.asarray(Image.open(p).convert("RGB")))
    with cf.ThreadPoolExecutor(8) as pool:
        outs = list(pool.map(lambda p: native.decode_image(path=p), paths))
    for got, want in zip(outs, wants):
        np.testing.assert_array_equal(got, want)


def test_decode_throughput_vs_pil(built, tmp_path):
    """Sanity: native decode is not slower than PIL (records the ratio)."""
    rng = np.random.RandomState(9)
    p = str(tmp_path / "big.png")
    _rand_rgb(rng, 512, 512).save(p)
    n = 20
    t0 = time.time()
    for _ in range(n):
        native.decode_image(path=p)
    t_native = time.time() - t0
    t0 = time.time()
    for _ in range(n):
        np.asarray(Image.open(p).convert("RGB"))
    t_pil = time.time() - t0
    print(f"native {t_native/n*1e3:.2f} ms vs PIL {t_pil/n*1e3:.2f} ms "
          f"per 512px decode")
    assert t_native < t_pil * 1.5  # generous: random PNGs stress zlib
