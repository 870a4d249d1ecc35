"""External-corpus rate-distortion sweep (VERDICT r2 missing #3).

Model: the reference's Kodak/CLIC harnesses (`tests/codec_benchmark.rs:11,
222-382`, `tests/clic_benchmark.rs:13,159`): sweep qualities over a corpus
directory, interpolate to equal file size, and report PSNR / MS-SSIM deltas
vs libwebp plus timing.  Opt-in like the reference's `#[ignore]` tests:

    WEBP_TPU_CORPUS_DIR=/path/to/kodak python -m pytest tests/test_corpus_rd.py -s

The directory holds .png images (Kodak and CLIC layouts are both flat PNG
dirs).  WEBP_TPU_CORPUS_LIMIT caps image count; WEBP_TPU_CORPUS_QS
overrides the quality grid ("20,35,50,...").

Both codecs' outputs are scored with the same metrics implemented in
webp_tpu.metrics, so the comparison is apples-to-apples (see metrics.py on
why SSIMULACRA2's unit-exact scores are not reproducible offline).
"""

import io
import os
import time
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

from webp_tpu import Encoder
from webp_tpu.metrics import ms_ssim, psnr

CORPUS = os.environ.get("WEBP_TPU_CORPUS_DIR")
QS = [int(q) for q in os.environ.get(
    "WEBP_TPU_CORPUS_QS", "20,35,50,65,75,85,95").split(",")]


def _points_ours(img, qs):
    pts = []
    for q in qs:
        t0 = time.time()
        data = Encoder.new_rgb(img).with_quality(q).with_method(4).encode()
        dt = time.time() - t0
        dec = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
        pts.append((len(data), psnr(img, dec), ms_ssim(img, dec), dt))
    return pts


def _points_libwebp(img, qs):
    pts = []
    for q in qs:
        buf = io.BytesIO()
        t0 = time.time()
        Image.fromarray(img).save(buf, "WEBP", quality=q, method=4)
        dt = time.time() - t0
        dec = np.asarray(Image.open(io.BytesIO(buf.getvalue())).convert("RGB"))
        pts.append((len(buf.getvalue()), psnr(img, dec), ms_ssim(img, dec), dt))
    return pts


def _interp(points, size, idx):
    points = sorted(points)
    for p0, p1 in zip(points, points[1:]):
        if p0[0] <= size <= p1[0] and p1[0] > p0[0]:
            f = (size - p0[0]) / (p1[0] - p0[0])
            return p0[idx] + (p1[idx] - p0[idx]) * f
    return None


@pytest.mark.skipif(not CORPUS, reason="set WEBP_TPU_CORPUS_DIR for the sweep")
def test_corpus_equal_size_sweep():
    root = Path(CORPUS)
    paths = sorted(root.glob("*.png")) + sorted(root.glob("*.PNG"))
    limit = int(os.environ.get("WEBP_TPU_CORPUS_LIMIT", "0"))
    if limit:
        paths = paths[:limit]
    assert paths, f"no .png images under {root}"

    rows = []
    t_ours = t_lib = 0.0
    mpix = 0.0
    for path in paths:
        img = np.asarray(Image.open(path).convert("RGB"))
        mpix += img.shape[0] * img.shape[1] / 1e6
        ours = _points_ours(img, QS)
        theirs = _points_libwebp(img, QS)
        t_ours += sum(p[3] for p in ours)
        t_lib += sum(p[3] for p in theirs)
        for q, (s, p, m, _) in zip(QS, theirs):
            p_o = _interp(ours, s, 1)
            m_o = _interp(ours, s, 2)
            if p_o is not None:
                rows.append((path.name, q, s, p, p_o - p, m, m_o - m))

    print("\nimage            q     size  psnr_lib dpsnr   msssim_lib dmsssim")
    for name, q, s, p, dp, m, dm in rows:
        print(f"{name:<16} {q:>3} {s:>8} {p:8.2f} {dp:+6.2f}   {m:.5f} {dm:+.5f}")
    dpsnrs = [r[4] for r in rows]
    dms = [r[6] for r in rows]
    by_q = {}
    for r in rows:
        by_q.setdefault(r[1], []).append(r[4])
    print("\nper-quality mean dPSNR:",
          {q: round(float(np.mean(v)), 3) for q, v in sorted(by_q.items())})
    print(f"overall mean dPSNR {np.mean(dpsnrs):+.3f} dB, "
          f"mean dMS-SSIM {np.mean(dms):+.5f} over {len(rows)} points")
    print(f"encode throughput: ours {mpix * len(QS) / t_ours:.2f} MPix/s, "
          f"libwebp {mpix * len(QS) / t_lib:.2f} MPix/s (single host proc)")
    assert len(rows) >= len(paths), "rate ranges barely overlap"
