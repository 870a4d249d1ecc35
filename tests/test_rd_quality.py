"""Rate-distortion quality harness (reference tests/codec_benchmark.rs /
lossy_encoder_quality.rs model).

In-suite: equal-size PSNR and DSSIM floors vs libwebp (via PIL) on one
image across Q30-Q90. Set WEBP_TPU_RD_SWEEP=1 for the full multi-image
multi-quality sweep report (PSNR + DSSIM).
"""

import io
import os

import numpy as np
import pytest
from PIL import Image

from webp_tpu import Encoder
from webp_tpu.metrics import dssim, ms_ssim, psnr

from conftest import load_png


def rd_point_ours(img, q):
    data = Encoder.new_rgb(img).with_quality(q).with_method(4).encode()
    dec = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    return len(data), psnr(img, dec), dssim(img, dec), ms_ssim(img, dec)


def rd_point_libwebp(img, q):
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "WEBP", quality=q, method=4)
    dec = np.asarray(Image.open(io.BytesIO(buf.getvalue())).convert("RGB"))
    return len(buf.getvalue()), psnr(img, dec), dssim(img, dec), ms_ssim(img, dec)


def interp_at_size(points, size, idx):
    points = sorted(p for p in points)
    for p0, p1 in zip(points, points[1:]):
        if p0[0] <= size <= p1[0] and p1[0] > p0[0]:
            f = (size - p0[0]) / (p1[0] - p0[0])
            return p0[idx] + (p1[idx] - p0[idx]) * f
    return None


QUALITIES = [30, 55, 80, 90]


@pytest.fixture(scope="module")
def rd_points(goldens):
    img = load_png(goldens / "gallery1" / "1.png")[:256, :320].copy()
    ours = [rd_point_ours(img, q) for q in QUALITIES]
    theirs = [rd_point_libwebp(img, q) for q in QUALITIES]
    return ours, theirs


def test_equal_size_psnr_floor(rd_points):
    ours, theirs = rd_points
    deltas = []
    for s, p, _d, _m in theirs:
        p_ours = interp_at_size(ours, s, 1)
        if p_ours is not None:
            deltas.append(p_ours - p)
    assert deltas, "no overlapping rate range"
    # Floor: reference-family parity. The reference itself is 0.3-0.9 dB
    # behind libwebp at equal size above Q75 and ~4.5% larger at Q75
    # (SURVEY §6 / its FILE_SIZE_INVESTIGATION). Round-4 level after
    # per-segment loop-filter strengths + chroma quant deltas (NOTES r4):
    # mean -0.07 over these qualities on this fixture (round 3: -0.37,
    # round 2: -0.78); the residual gap concentrates at Q90+.  These are
    # regression guardrails at today's level — libwebp's CI floor for the
    # reference is far looser (PSNR >= 80%).
    assert np.mean(deltas) > -0.15, deltas
    assert min(deltas) > -0.6, deltas


def test_equal_size_dssim_ratio(rd_points):
    """DSSIM at equal size must stay within 2x of libwebp (the reference
    gates at 3x: tests/lossy_encoder_quality.rs:161-380)."""
    ours, theirs = rd_points
    ratios = []
    for s, _, d, _m in theirs:
        d_ours = interp_at_size(ours, s, 2)
        if d_ours is not None and d > 0:
            ratios.append(d_ours / d)
    assert ratios, "no overlapping rate range"
    assert max(ratios) < 2.1, ratios


def test_equal_size_ms_ssim_floor(rd_points):
    """MS-SSIM (Wang 2003 weights, webp_tpu.metrics) at equal size vs
    libwebp; both codecs scored with the same implementation."""
    ours, theirs = rd_points
    deltas = []
    for s, _p, _d, m in theirs:
        m_ours = interp_at_size(ours, s, 3)
        if m_ours is not None:
            deltas.append(m_ours - m)
    assert deltas, "no overlapping rate range"
    assert np.mean(deltas) > -0.004, deltas


@pytest.mark.slow
def test_sharp_yuv_improves_high_q(goldens):
    """Sharp-YUV (least-squares chroma vs the fancy upsampler) must beat the
    plain 2x2-average conversion on decoded-RGB PSNR at high quality for
    marginal size cost. The reference accepts sharp_yuv but never wires it."""
    img = load_png(goldens / "gallery1" / "1.png")[:256, :320].copy()
    for q, min_gain in ((80, 0.15), (90, 0.5)):
        std = Encoder.new_rgb(img).with_quality(q).with_method(4).encode()
        shp = (
            Encoder.new_rgb(img).with_quality(q).with_method(4)
            .with_sharp_yuv().encode()
        )
        ds = np.asarray(Image.open(io.BytesIO(std)).convert("RGB"))
        dh = np.asarray(Image.open(io.BytesIO(shp)).convert("RGB"))
        gain = psnr(img, dh) - psnr(img, ds)
        assert gain > min_gain, (q, gain)
        # marginal size cost (1.03: the SNS-direction fix shrank the std
        # encode ~1%, which widened this ratio without changing sharp-YUV)
        assert len(shp) < len(std) * 1.03, (q, len(shp), len(std))


def test_sharp_yuv_odd_dims(goldens):
    """Odd-dimension edge handling in the sharp converter round-trips."""
    img = load_png(goldens / "gallery1" / "1.png")[:63, :101].copy()
    data = Encoder.new_rgb(img).with_quality(85).with_sharp_yuv().encode()
    dec = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    assert psnr(img, dec) > 30


@pytest.mark.skipif(not os.environ.get("WEBP_TPU_RD_SWEEP"), reason="opt-in sweep")
def test_full_rd_sweep(goldens):
    rows = []
    for name in ("1", "2", "4", "5"):
        img = load_png(goldens / "gallery1" / f"{name}.png")
        ours = [rd_point_ours(img, q) for q in QUALITIES]
        theirs = [rd_point_libwebp(img, q) for q in QUALITIES]
        for s, p, d, _m in theirs:
            p_ours = interp_at_size(ours, s, 1)
            d_ours = interp_at_size(ours, s, 2)
            if p_ours is not None:
                rows.append((name, s, p, p_ours, p_ours - p, d, d_ours))
    print("\nimage size libwebp ours dpsnr dssim_lib dssim_ours")
    for r in rows:
        print(
            f"{r[0]:>5} {r[1]:>8} {r[2]:7.2f} {r[3]:7.2f} {r[4]:+6.2f}"
            f" {r[5]:.5f} {r[6]:.5f}"
        )
    print("mean delta:", round(np.mean([r[4] for r in rows]), 3))
