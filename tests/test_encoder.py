"""Encoder tests: round-trips validated by our decoder AND by libwebp (PIL),
plus PSNR/size quality floors mirroring the reference CI thresholds
(`/root/reference/tests/lossy_encoder_quality.rs:244-332`)."""

import io

import numpy as np
import pytest
from PIL import Image

import webp_tpu
from webp_tpu import Encoder, WebPDecoder

from conftest import load_png


def psnr(a, b):
    mse = ((a.astype(np.float64) - b.astype(np.float64)) ** 2).mean()
    return 99.0 if mse == 0 else 10 * np.log10(255**2 / mse)


def libwebp_decode(data, mode="RGB"):
    return np.asarray(Image.open(io.BytesIO(data)).convert(mode))


def libwebp_encode(img, **kw):
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "WEBP", **kw)
    return buf.getvalue()


@pytest.fixture(scope="module")
def photo(goldens):
    return load_png(goldens / "gallery1" / "1.png")[:176, :200].copy()


def test_lossy_roundtrip_consistency(photo):
    data = Encoder.new_rgb(photo).with_quality(75).encode()
    ours = WebPDecoder(data).read_image()
    theirs = libwebp_decode(data)
    np.testing.assert_array_equal(ours, theirs)


@pytest.mark.parametrize("q", [10, 50, 75, 90])
def test_lossy_quality_floor(photo, q):
    data = Encoder.new_rgb(photo).with_quality(q).encode()
    dec = libwebp_decode(data)
    p_ours = psnr(photo, dec)

    lw = libwebp_encode(photo, quality=q, method=4)
    p_lw = psnr(photo, libwebp_decode(lw))

    # Reference CI floor: PSNR >= 80% of libwebp, size < 2.1x.
    assert p_ours >= 0.8 * p_lw, (p_ours, p_lw)
    assert len(data) < 2.1 * len(lw), (len(data), len(lw))


def test_lossless_roundtrip_exact(photo):
    rgba = np.dstack([photo, np.full(photo.shape[:2], 200, np.uint8)])
    data = Encoder.new_rgba(rgba).with_lossless().encode()
    ours = WebPDecoder(data).read_image()
    np.testing.assert_array_equal(ours, rgba)
    theirs = libwebp_decode(data, "RGBA")
    np.testing.assert_array_equal(theirs, rgba)


def test_lossy_with_alpha(photo):
    alpha = np.linspace(0, 255, photo.shape[0] * photo.shape[1], dtype=np.uint8).reshape(
        photo.shape[:2]
    )
    rgba = np.dstack([photo, alpha])
    data = Encoder.new_rgba(rgba).with_quality(75).encode()
    d = WebPDecoder(data)
    assert d.has_alpha
    ours = d.read_image()
    theirs = libwebp_decode(data, "RGBA")
    np.testing.assert_array_equal(ours, theirs)
    # Alpha is lossless-coded: must round-trip exactly.
    np.testing.assert_array_equal(ours[:, :, 3], alpha)


def test_grayscale(photo):
    gray = photo[:, :, 1].copy()
    data = Encoder.new_l8(gray).with_quality(80).encode()
    ours = WebPDecoder(data).read_image()
    theirs = libwebp_decode(data)
    np.testing.assert_array_equal(ours, theirs)
    # L8 stores gray as full-range luma which the YUV->RGB matrix stretches
    # (same behavior as the reference's convert_image_y), so the bound is loose.
    assert psnr(gray, ours[:, :, 0]) > 20


def test_metadata_chunks(photo):
    icc = b"fake-icc-profile-data"
    exif = b"fake-exif"
    xmp = b"<xmp/>"
    data = (
        Encoder.new_rgb(photo[:64, :64])
        .with_quality(75)
        .with_icc_profile(icc)
        .with_exif_metadata(exif)
        .with_xmp_metadata(xmp)
        .encode()
    )
    d = WebPDecoder(data)
    assert d.icc_profile() == icc
    assert d.exif_metadata() == exif
    assert d.xmp_metadata() == xmp
    # Still decodable by libwebp.
    libwebp_decode(data)


def test_convenience_functions(photo):
    small = photo[:32, :32]
    data = webp_tpu.encode_rgb(small, 75)
    img, w, h = webp_tpu.decode_rgb(data)
    assert (w, h) == (32, 32)
    data = webp_tpu.encode_lossless_rgba(np.dstack([small, np.full((32, 32), 255, np.uint8)]))
    img, _, _ = webp_tpu.decode_rgba(data)
    np.testing.assert_array_equal(img[:, :, :3], small)


def test_decode_libwebp_encodes(photo):
    """Our decoder handles libwebp-produced bitstreams at various settings."""
    for kw in [dict(quality=40, method=2), dict(quality=85, method=6), dict(lossless=True)]:
        data = libwebp_encode(photo, **kw)
        ours = WebPDecoder(data).read_image()
        theirs = libwebp_decode(data)
        np.testing.assert_array_equal(ours[:, :, :3], theirs[:, :, :3], err_msg=str(kw))


@pytest.mark.parametrize("n", [2, 8])
def test_multi_partition_encode(photo, n):
    from webp_tpu.encode.vp8 import Vp8Encoder

    small = photo[:96, :112]
    vp8 = Vp8Encoder(75, 4, num_partitions=n).encode(small)
    chunk = b"VP8 " + len(vp8).to_bytes(4, "little") + vp8 + (b"\x00" if len(vp8) & 1 else b"")
    data = b"RIFF" + (4 + len(chunk)).to_bytes(4, "little") + b"WEBP" + chunk
    ours = WebPDecoder(data).read_image()
    theirs = libwebp_decode(data)
    np.testing.assert_array_equal(ours, theirs)


@pytest.mark.slow
def test_target_size(photo):
    """target_size bisects quality to the largest full file that fits
    (wired beyond the reference, which accepts but ignores it)."""
    img = photo[:176, :208, :3].copy()
    for tgt in (4000, 9000):
        data = Encoder.new_rgb(img).with_target_size(tgt).encode()
        assert len(data) <= tgt
        assert len(data) > tgt * 0.5  # actually uses the budget
        WebPDecoder(data).read_image()


def test_near_lossless(photo):
    """near_lossless pre-quantization: bounded per-channel error and real
    size savings at the stronger levels (1-bit quantization can tie or
    slightly lose on noisy photographic crops; 2+ bits must win)."""
    img = np.dstack([photo[:120, :160, :3], np.full((120, 160), 255, np.uint8)])
    exact = Encoder.new_rgba(img).with_lossless(True).encode()
    sizes = {}
    for q, maxdiff in ((80, 1), (60, 2), (40, 4)):
        data = Encoder.new_rgba(img).with_lossless(True).with_near_lossless(q).encode()
        dec = WebPDecoder(data).read_image()
        assert np.abs(dec.astype(int) - img.astype(int)).max() <= maxdiff
        sizes[q] = len(data)
    assert sizes[60] < len(exact), (sizes, len(exact))
    assert sizes[40] < sizes[60], sizes


def test_alpha_quality(photo):
    """alpha_quality < 100 pre-quantizes the alpha plane (bounded error,
    smaller ALPH chunks); 100 stays exact. Wired beyond the reference."""
    from webp_tpu import EncoderConfig

    h, w = 96, 128
    yy = np.mgrid[:h, :w][0]
    rng = np.random.RandomState(0)
    alpha = np.clip(yy * 2 + rng.randint(-3, 4, (h, w)), 0, 255).astype(np.uint8)
    rgba = np.dstack([photo[:h, :w, :3], alpha])

    exact = Encoder.new_rgba(rgba).encode()
    d = WebPDecoder(exact).read_image()
    np.testing.assert_array_equal(d[:, :, 3], alpha)

    cfg = EncoderConfig()
    cfg.alpha_quality = 40
    low = Encoder.new_rgba(rgba).with_config(cfg).encode()
    d = WebPDecoder(low).read_image()
    assert np.abs(d[:, :, 3].astype(int) - alpha.astype(int)).max() <= 4
    assert len(low) < len(exact)


@pytest.mark.slow
def test_mixed_geometry_batch_encode(photo):
    """Mixed-geometry batch encode groups by (h, w) — and, regression: a
    second geometry must not trip over trace-bound module constants."""
    from webp_tpu.encode.vp8 import (
        encode_frames_lossy_batch,
        encode_frames_lossy_batch_mixed,
    )

    imgs = [
        np.ascontiguousarray(photo[:64, :96, :3]),
        np.ascontiguousarray(photo[:96, :64, :3]),
        np.ascontiguousarray(photo[:64, :96, :3]),
    ]
    got = encode_frames_lossy_batch_mixed(imgs, 75, 3)
    for i, im in enumerate(imgs):
        assert got[i] == encode_frames_lossy_batch([im], 75, 3)[0], i
