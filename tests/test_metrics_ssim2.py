"""SSIMULACRA2-class metric sanity: ordering, bounds, weight plumbing."""

import io

import numpy as np
import pytest
from PIL import Image

from webp_tpu.metrics import ssimulacra2

FIX = "/root/reference/tests/reference/gallery1/2.png"


def test_ordering_and_identity(tmp_path):
    img = np.asarray(Image.open(FIX).convert("RGB"))[:256, :320]
    assert ssimulacra2(img, img) == pytest.approx(100.0, abs=1e-6)
    scores = []
    for q in (35, 75, 95):
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, "WEBP", quality=q)
        dec = np.asarray(Image.open(buf).convert("RGB"))
        scores.append(ssimulacra2(img, dec))
    assert scores[0] < scores[1] < scores[2] < 100.0
    # custom weights change the scale but identity stays at 100
    w = np.linspace(0.5, 2.0, 108)
    assert ssimulacra2(img, img, weights=w) == pytest.approx(100.0, abs=1e-6)
    np.save(tmp_path / "w.npy", w)  # (env-var path takes a text file; the
    # in-arg form is the API surface tested here)
