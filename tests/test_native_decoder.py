"""Native C++ TIFF decoder vs PIL on the reference fixtures."""

import glob
import io

import numpy as np
import pytest
from PIL import Image

from colormipsearch_tpu.io import native_decoder

FIXDIR = ("/root/reference/colormipsearch-api/src/test/resources/"
          "colormipsearch/api/imageprocessing")
CDSDIR = ("/root/reference/colormipsearch-api/src/test/resources/"
          "colormipsearch/api/cdsearch")


@pytest.fixture(scope="module", autouse=True)
def require_native():
    if not native_decoder.available():
        pytest.skip("native decoder unavailable (no toolchain)")


def _pil_rgb(data):
    with Image.open(io.BytesIO(data)) as img:
        return np.asarray(img.convert("RGB"))


def all_fixture_tiffs():
    return sorted(glob.glob(f"{FIXDIR}/*.tif") + glob.glob(f"{CDSDIR}/*.tif"))


@pytest.mark.parametrize("path", all_fixture_tiffs(),
                         ids=lambda p: p.rsplit("/", 1)[-1][:40])
def test_decode_matches_pil(path):
    data = open(path, "rb").read()
    arr = native_decoder.decode_tiff(data)
    if arr is None:
        pytest.skip("unsupported fixture variant for the native path")
    ref = _pil_rgb(data)
    if arr.ndim == 2:
        arr = np.repeat(arr[..., None], 3, -1).astype(np.uint8)
    np.testing.assert_array_equal(arr, ref)


def test_row_range_decode():
    path = all_fixture_tiffs()[0]
    data = open(path, "rb").read()
    full = native_decoder.decode_tiff(data)
    if full is None:
        pytest.skip("unsupported fixture")
    part = native_decoder.decode_tiff(data, y0=10, y1=42)
    np.testing.assert_array_equal(part, full[10:42])


def test_packbits_reference_semantics():
    # literal run of 3 + replicate run of 4 + literal 1
    encoded = bytes([2, 1, 2, 3, 0xFD, 9, 0, 7])
    out = np.zeros(8, np.uint8)
    pos = native_decoder.packbits_uncompress(encoded, out)
    assert pos == 8
    np.testing.assert_array_equal(out, [1, 2, 3, 9, 9, 9, 9, 7])
    # partial range [start, end): bytes before start stay untouched; a
    # replicate run that STARTS before `end` is written to completion —
    # the reference's loop only tests `pos < end` per control byte
    # (ImageArrayUtils.packBitsUncompress:228-252), so position 6 is
    # written here even though end == 6
    out2 = np.zeros(8, np.uint8)
    native_decoder.packbits_uncompress(encoded, out2, 0, 3, 6)
    np.testing.assert_array_equal(out2, [0, 0, 0, 9, 9, 9, 9, 0])


def test_batch_decode():
    paths = [p for p in all_fixture_tiffs() if "compressed" not in p]
    blobs, shapes = [], []
    for p in paths:
        d = open(p, "rb").read()
        info = native_decoder.tiff_info(d)
        if info and info[2] == 3 and info[3] == 8:
            blobs.append(d)
            shapes.append(info[:2])
    if len(set(shapes)) != 1 or len(blobs) < 2:
        pytest.skip("need >= 2 same-shape RGB fixtures")
    w, h = shapes[0]
    arena, ok = native_decoder.decode_tiff_batch(
        blobs, width=w, height=h, channels=3)
    assert ok.all()
    for i, d in enumerate(blobs):
        np.testing.assert_array_equal(arena[i], _pil_rgb(d))


def test_read_image_uses_native(tmp_path):
    from colormipsearch_tpu.io.image import read_image

    path = all_fixture_tiffs()[0]
    img = read_image(path)
    ref = _pil_rgb(open(path, "rb").read())
    np.testing.assert_array_equal(img.as_rgb(), ref)
