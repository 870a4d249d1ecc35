"""Full device decode pipeline must be bit-exact vs the goldens."""

import numpy as np
import pytest

pytest.importorskip("jax")

from webp_tpu.container import chunks as ck
from webp_tpu.container.demux import WebPDecoder
from webp_tpu.decode.device import decode_vp8_frame_device

from conftest import load_png


@pytest.mark.parametrize("name,golden", [
    ("gallery1/1.webp", "gallery1/1.png"),
    ("regression/dark.webp", "regression/dark.png"),
])
def test_device_decode_exact(fixtures, goldens, name, golden):
    data = (fixtures / name).read_bytes()
    d = WebPDecoder(data)
    frame, rgb = decode_vp8_frame_device(d._chunk_bytes(ck.VP8))
    want = load_png(goldens / golden)
    if want.ndim == 3 and want.shape[2] == 4:
        want = want[:, :, :3]
    np.testing.assert_array_equal(rgb, want)
