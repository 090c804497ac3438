"""Native decode library tests: correctness vs the PIL path and batch API.

Skipped when the toolchain/.so is unavailable (the Python fallback is tested
by test_data.py either way)."""

import os

import numpy as np
import pytest
from PIL import Image

from weatherconverter_tpu.data import native


pytestmark = pytest.mark.skipif(not native.available(), reason="libwcdecode.so not available")


@pytest.fixture()
def images(tmp_path):
    rng = np.random.RandomState(0)
    paths = []
    for i, size in enumerate([(40, 64), (64, 40), (33, 57)]):
        arr = rng.randint(0, 255, size + (3,), dtype=np.uint8)
        p = str(tmp_path / f"img{i}.png")
        Image.fromarray(arr).save(p)
        paths.append(p)
    jp = str(tmp_path / "img.jpg")
    Image.fromarray(rng.randint(0, 255, (48, 80, 3), dtype=np.uint8)).save(jp, quality=95)
    paths.append(jp)
    return paths


def test_decode_box_matches_pil_closely(images):
    from weatherconverter_tpu.data.datasets import load_image_resized

    for p in images:
        ours = native.decode_box(p, 32, (32, 57))
        ref = load_image_resized(p, 32, (32, 57))
        assert ours is not None and ours.shape == ref.shape
        # PIL-style triangle filter: only rounding-level deviation remains
        diff = np.abs(ours.astype(np.int32) - ref.astype(np.int32))
        assert diff.max() <= 1, diff.max()


def test_decode_exact_shape_and_jpeg(images):
    out = native.decode_exact(images[-1], (20, 30))
    assert out is not None and out.shape == (20, 30, 3)


def test_batch_decode(images):
    out = native.decode_box_batch(images, 32, (32, 57))
    assert out is not None and out.shape == (len(images), 32, 57, 3)
    for i, p in enumerate(images):
        single = native.decode_box(p, 32, (32, 57))
        np.testing.assert_array_equal(out[i], single)


def test_missing_file_fails_cleanly(tmp_path):
    assert native.decode_box(str(tmp_path / "nope.png"), 32, (32, 32)) is None
    out = native.decode_box_batch([str(tmp_path / "nope.png")], 32, (32, 32))
    assert out is None


def test_loader_uses_batch_fast_path(images, tmp_path):
    from weatherconverter_tpu.data.datasets import DiffusionImageDataset
    from weatherconverter_tpu.data.loader import DataLoader

    root = tmp_path / "tree"
    for i, p in enumerate(images):
        dst = root / "rain" / "train" / f"{i}.png"
        dst.parent.mkdir(parents=True, exist_ok=True)
        Image.open(p).save(dst)
    ds = DiffusionImageDataset(str(root), ("rain",), resize_to=32)
    dl = DataLoader(ds, batch_size=2, shuffle=False)
    batches = list(dl)
    assert len(batches) == 2
    assert batches[0].shape == (2, 32, int(round(32 * 16 / 9)), 3)


def test_fast_dct_decode(images, tmp_path):
    # PNG: fast flag is a no-op, bit-identical
    p_png = images[0]
    np.testing.assert_array_equal(
        native.decode_box(p_png, 32, (32, 57)), native.decode_box(p_png, 32, (32, 57), fast=True)
    )
    # JPEG from a large smooth source: DCT pre-scaling stays close to the
    # full-decode path (it is PIL's draft() trick: decode at the smallest
    # covering M/8 scale, then the same triangle resize)
    yy, xx = np.mgrid[0:512, 0:768].astype(np.float32)
    smooth = np.stack([
        127 + 90 * np.sin(yy / 37.0), 127 + 90 * np.cos(xx / 53.0),
        127 + 90 * np.sin((xx + yy) / 71.0)], -1).astype(np.uint8)
    jp = str(tmp_path / "big.jpg")
    Image.fromarray(smooth).save(jp, quality=92)
    full = native.decode_box(jp, 64, (64, 64)).astype(np.int32)
    fast = native.decode_box(jp, 64, (64, 64), fast=True).astype(np.int32)
    assert np.abs(full - fast).mean() < 2.0
    assert np.abs(full - fast).max() <= 24
    # exact variant too
    fe = native.decode_exact(jp, (64, 96), fast=True)
    assert fe is not None and fe.shape == (64, 96, 3)
    # batch fast path agrees with the single-item fast path
    b = native.decode_box_batch([jp, jp], 64, (64, 64), fast=True)
    np.testing.assert_array_equal(b[0], fast.astype(np.uint8))


def test_png_fast_path_format_matrix(tmp_path):
    """The libdeflate fast-PNG path (wcdecode.cpp decode_png_fast) must be
    bit-identical to PIL's RGB view for every covered 8-bit color type, and
    formats it rejects (interlaced, 16-bit) must come back through the
    libpng fallback with identical pixels. decode_exact at the source size
    is an identity resize (single-tap triangle, weight 1.0), so this
    compares raw decode output."""
    rng = np.random.RandomState(7)
    h, w = 41, 59  # odd sizes exercise filter/stride edges

    def check(img: Image.Image, name: str):
        p = str(tmp_path / name)
        img.save(p)
        got = native.decode_exact(p, (img.height, img.width))
        assert got is not None, name
        ref = np.asarray(Image.open(p).convert("RGB"))
        np.testing.assert_array_equal(got, ref, err_msg=name)

    rgb = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
    gray = rng.randint(0, 256, (h, w), dtype=np.uint8)
    check(Image.fromarray(rgb), "rgb.png")                          # color 2
    check(Image.fromarray(gray, "L"), "gray.png")                   # color 0
    check(Image.fromarray(rgb).convert("P", palette=Image.ADAPTIVE), "pal.png")  # color 3
    rgba = np.concatenate([rgb, gray[..., None]], -1)
    check(Image.fromarray(rgba, "RGBA"), "rgba.png")                # color 6
    la = np.stack([gray, gray[::-1]], -1)
    check(Image.fromarray(la, "LA"), "la.png")                      # color 4

    # smooth gradient picks up Sub/Up/Average/Paeth filters (random data
    # mostly encodes as filter 0); still must be bit-exact
    yy, xx = np.mgrid[0:h, 0:w]
    smooth = np.stack([yy * 3 % 256, xx * 5 % 256, (yy + xx) % 256], -1).astype(np.uint8)
    check(Image.fromarray(smooth), "smooth.png")

    # interlaced: fast path refuses -> libpng fallback, same pixels as the
    # non-interlaced encode of the same array
    pi = str(tmp_path / "interlaced.png")
    Image.fromarray(smooth).save(pi, interlace=True)
    got_i = native.decode_exact(pi, (h, w))
    assert got_i is not None
    np.testing.assert_array_equal(got_i, smooth)

    # 16-bit: fast path refuses -> libpng fallback (strip-16 high byte)
    import struct, zlib
    raw16 = b"".join(
        b"\x00" + np.repeat(smooth[y].astype(">u2") * 257, 1).tobytes()
        for y in range(h)
    )
    def chunk(tag, data):
        c = tag + data
        return struct.pack(">I", len(data)) + c + struct.pack(">I", zlib.crc32(c))
    p16 = tmp_path / "deep.png"
    p16.write_bytes(
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 16, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw16))
        + chunk(b"IEND", b"")
    )
    got16 = native.decode_exact(str(p16), (h, w))
    assert got16 is not None
    np.testing.assert_array_equal(got16, smooth)
