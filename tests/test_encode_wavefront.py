"""Device encoder wavefront must make identical decisions to the Python path."""

import numpy as np
import pytest

pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from webp_tpu.common import vp8_tables as T
from webp_tpu.encode import costs as C
from webp_tpu.encode.quant import SegmentParams, quality_to_quant_index
from webp_tpu.encode.vp8 import Vp8Encoder
from webp_tpu.ops.encode_wavefront import EncParams, EncTables, encode_analysis_frame
from webp_tpu.ops.yuv import rgb_to_yuv420

from conftest import load_png


@pytest.mark.parametrize("q", [40, 75])
def test_device_analysis_equals_python(goldens, q):
    src = load_png(goldens / "gallery1" / "1.png")[:96, :112].copy()
    y, u, v = rgb_to_yuv420(src)
    h, w = src.shape[:2]
    mbw, mbh = (w + 15) // 16, (h + 15) // 16

    enc = Vp8Encoder(q, 3)  # method 3: no trellis (device trellis port pending)
    enc.mbw, enc.mbh = mbw, mbh
    enc.width, enc.height = w, h
    enc.ybuf, enc.ubuf, enc.vbuf = y, u, v
    qi = quality_to_quant_index(q)
    enc.quant_index = qi
    enc.seg = SegmentParams(qi)
    enc.probs = T.COEFF_PROBS_DEFAULT.copy()
    enc.level_costs = C.LevelCosts(enc.probs)
    enc.stats = C.ProbaStats()
    enc._setup_segments(qi)
    py = enc._analysis_arrays()

    out = encode_analysis_frame(
        jnp.asarray(y), jnp.asarray(u), jnp.asarray(v),
        EncParams(enc.seg), EncTables.default(), mbw, mbh, 3,
    )
    dev = {k: np.asarray(val) for k, val in out.items()}

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
