"""Device segment analysis (ops/analysis2) bit-parity with the host pass.

Segment maps feed emitted bitstreams, so the device twin must reproduce
encode/analysis.py:analyze_image EXACTLY — alphas and uv_alpha both.
"""

import numpy as np
import pytest

from conftest import load_png
from webp_tpu.encode.analysis import analyze_image
from webp_tpu.ops.analysis2 import analyze_alphas_batch
from webp_tpu.ops.yuv import rgb_to_yuv420


def _planes(img):
    h, w = (img.shape[0] // 16) * 16, (img.shape[1] // 16) * 16
    return rgb_to_yuv420(img[:h, :w]), w // 16, h // 16


def test_alphas_match_host_on_corpus(goldens):
    planes = []
    geo = None
    for n in (1, 2):
        img = load_png(goldens / "gallery1" / f"{n}.png")[:352, :544, :3]
        (y, u, v), mbw, mbh = _planes(img)
        planes.append((y, u, v))
        geo = (mbw, mbh)
    mbw, mbh = geo
    Y = np.stack([p[0] for p in planes])
    U = np.stack([p[1] for p in planes])
    V = np.stack([p[2] for p in planes])
    fin_d, uv_d = (np.asarray(a) for a in analyze_alphas_batch(Y, U, V, mbw, mbh))
    for i, (y, u, v) in enumerate(planes):
        fin_h, hist_h, uv_h = analyze_image(y, u, v, mbw, mbh)
        assert np.array_equal(fin_d[i], fin_h), f"alphas differ (img {i})"
        assert int(uv_d[i]) == int(uv_h), f"uv_alpha differs (img {i})"
        assert np.array_equal(
            np.bincount(fin_d[i], minlength=256), hist_h
        )


def test_alphas_match_host_random():
    rng = np.random.RandomState(5)
    mbw, mbh = 20, 16
    B = 2
    Y = rng.randint(0, 256, (B, mbh * 16, mbw * 16)).astype(np.uint8)
    U = rng.randint(0, 256, (B, mbh * 8, mbw * 8)).astype(np.uint8)
    V = rng.randint(0, 256, (B, mbh * 8, mbw * 8)).astype(np.uint8)
    fin_d, uv_d = (np.asarray(a) for a in analyze_alphas_batch(Y, U, V, mbw, mbh))
    for i in range(B):
        fin_h, _h, uv_h = analyze_image(Y[i], U[i], V[i], mbw, mbh)
        assert np.array_equal(fin_d[i], fin_h)
        assert int(uv_d[i]) == int(uv_h)


def test_seg_results_device_equals_host(goldens):
    from webp_tpu.encode.vp8 import compute_seg_results

    img = load_png(goldens / "gallery1" / "1.png")[:256, :320, :3]
    (y, u, v), mbw, mbh = _planes(img)
    planes = [(y, u, v)] * 2
    dev = compute_seg_results(planes, 75, mbw, mbh, device=True)
    host = compute_seg_results(planes, 75, mbw, mbh, device=False)
    for d, h in zip(dev, host):
        assert d[0] == h[0] and d[1] == h[1]
        assert np.array_equal(d[2], h[2])
        assert d[4] == h[4]
        for sd, sh in zip(d[3], h[3]):
            assert (sd.quant_index, sd.uv_ac_delta, sd.lf_level) == (
                sh.quant_index, sh.uv_ac_delta, sh.lf_level
            )
