"""Rate-distortion quality harness (reference tests/codec_benchmark.rs model).

The in-suite test enforces an equal-size PSNR floor vs libwebp on one image;
set WEBP_TPU_RD_SWEEP=1 for the full multi-image multi-quality sweep report.
"""

import io
import os

import numpy as np
import pytest
from PIL import Image

from webp_tpu import Encoder

from conftest import load_png


def psnr(a, b):
    mse = ((a.astype(np.float64) - b.astype(np.float64)) ** 2).mean()
    return 99.0 if mse == 0 else 10 * np.log10(255**2 / mse)


def rd_point_ours(img, q):
    data = Encoder.new_rgb(img).with_quality(q).with_method(4).encode()
    dec = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    return len(data), psnr(img, dec)


def rd_point_libwebp(img, q):
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "WEBP", quality=q, method=4)
    dec = np.asarray(Image.open(io.BytesIO(buf.getvalue())).convert("RGB"))
    return len(buf.getvalue()), psnr(img, dec)


def interp_at_size(points, size):
    points = sorted(points)
    for (s0, p0), (s1, p1) in zip(points, points[1:]):
        if s0 <= size <= s1 and s1 > s0:
            return p0 + (p1 - p0) * (size - s0) / (s1 - s0)
    return None


QUALITIES = [30, 55, 80]


def test_equal_size_psnr_floor(goldens):
    img = load_png(goldens / "gallery1" / "1.png")[:256, :320].copy()
    ours = [rd_point_ours(img, q) for q in QUALITIES]
    theirs = [rd_point_libwebp(img, q) for q in QUALITIES]

    deltas = []
    for s, p in theirs:
        p_ours = interp_at_size(ours, s)
        if p_ours is not None:
            deltas.append(p_ours - p)
    assert deltas, "no overlapping rate range"
    # Floor: reference-family parity. The reference itself is 0.3-0.9 dB
    # behind libwebp at equal size above Q75 (SURVEY §6 / its own
    # FILE_SIZE_INVESTIGATION), at/ahead below Q75; we match that shape.
    # (Its CI floor is far looser still: PSNR >= 80% of libwebp.)
    assert np.mean(deltas) > -1.0, deltas


@pytest.mark.skipif(not os.environ.get("WEBP_TPU_RD_SWEEP"), reason="opt-in sweep")
def test_full_rd_sweep(goldens):
    rows = []
    for name in ("1", "2", "4", "5"):
        img = load_png(goldens / "gallery1" / f"{name}.png")
        ours = [rd_point_ours(img, q) for q in QUALITIES]
        theirs = [rd_point_libwebp(img, q) for q in QUALITIES]
        for s, p in theirs:
            p_ours = interp_at_size(ours, s)
            if p_ours is not None:
                rows.append((name, s, p, p_ours, p_ours - p))
    print("\nimage size libwebp ours delta")
    for r in rows:
        print(f"{r[0]:>5} {r[1]:>8} {r[2]:7.2f} {r[3]:7.2f} {r[4]:+6.2f}")
    print("mean delta:", round(np.mean([r[4] for r in rows]), 3))
