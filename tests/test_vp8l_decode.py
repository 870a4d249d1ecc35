"""Bit-exact VP8L (lossless) decode tests vs pre-rendered PNG goldens."""

import numpy as np
import pytest

from webp_tpu.container.demux import WebPDecoder

from conftest import load_png


@pytest.mark.parametrize("i", [1, 2, 3, 4, 5])
def test_gallery2_lossless_exact(fixtures, goldens, i):
    data = (fixtures / "gallery2" / f"{i}_webp_ll.webp").read_bytes()
    d = WebPDecoder(data)
    got = d.read_image()
    want = load_png(goldens / "gallery2" / f"{i}_webp_ll.png")
    if want.shape[2] == 4 and got.shape[2] == 3:
        want = want[:, :, :3]
    assert got.shape == want.shape
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize(
    "name",
    [
        "color_index.webp",
        "lossless_indexed_1bit_palette.webp",
        "lossless_indexed_2bit_palette.webp",
        "lossless_indexed_4bit_palette.webp",
    ],
)
def test_regression_palettes_exact(fixtures, goldens, name):
    data = (fixtures / "regression" / name).read_bytes()
    d = WebPDecoder(data)
    got = d.read_image()
    want = load_png(goldens / "regression" / name.replace(".webp", ".png"))
    if want.ndim == 2:
        want = want[:, :, None].repeat(got.shape[2], axis=2)
    if want.shape[2] != got.shape[2]:
        if want.shape[2] == 4 and got.shape[2] == 3:
            want = want[:, :, :3]
        elif want.shape[2] == 3 and got.shape[2] == 4:
            got = got[:, :, :3]
    np.testing.assert_array_equal(got, want)
