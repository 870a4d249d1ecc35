"""Bit-exact VP8 (lossy) decode tests vs dwebp-rendered PNG goldens."""

import numpy as np
import pytest

from webp_tpu.container.demux import WebPDecoder

from conftest import load_png


@pytest.mark.parametrize("i", [1, 2, 3, 4, 5])
def test_gallery1_lossy_exact(fixtures, goldens, i):
    data = (fixtures / "gallery1" / f"{i}.webp").read_bytes()
    got = WebPDecoder(data).read_image()
    want = load_png(goldens / "gallery1" / f"{i}.png")
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("i", [1, 2, 3, 4, 5])
def test_gallery1_nofancy_exact(fixtures, goldens, i):
    data = (fixtures / "gallery1" / f"{i}.webp").read_bytes()
    got = WebPDecoder(data, upsampling="simple").read_image()
    want = load_png(goldens / "gallery1_nofancy" / f"{i}.png")
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("i", [1, 2, 3, 4, 5])
def test_gallery2_alpha_exact(fixtures, goldens, i):
    data = (fixtures / "gallery2" / f"{i}_webp_a.webp").read_bytes()
    got = WebPDecoder(data).read_image()
    want = load_png(goldens / "gallery2" / f"{i}_webp_a.png")
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("name", ["tiny.webp", "dark.webp"])
def test_regression_lossy_exact(fixtures, goldens, name):
    data = (fixtures / "regression" / name).read_bytes()
    got = WebPDecoder(data).read_image()
    want = load_png(goldens / "regression" / name.replace(".webp", ".png"))
    if want.ndim == 3 and want.shape[2] != got.shape[2]:
        if want.shape[2] == 4 and got.shape[2] == 3:
            want = want[:, :, :3]
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("name", ["random_lossless.webp", "random_lossy.webp"])
def test_animated_frames_exact(fixtures, goldens, name):
    data = (fixtures / "animated" / name).read_bytes()
    d = WebPDecoder(data)
    assert d.is_animated()
    stem = name.replace(".webp", "")
    for f in range(d.num_frames):
        got, _duration = d.read_frame()
        want = load_png(goldens / "animated" / f"{stem}-{f + 1}.png")
        if want.shape[2] != got.shape[2]:
            if want.shape[2] == 4 and got.shape[2] == 3:
                want = want[:, :, :3]
        np.testing.assert_array_equal(got, want, err_msg=f"frame {f}")
