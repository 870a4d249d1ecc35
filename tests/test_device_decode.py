"""Full device decode pipeline must be bit-exact vs the goldens.

Covers both the per-frame device path and the batched levels fast path
(C++ int16-levels entropy pass + device dequant/IWHT/IDCT/wavefront), over
the full lossy corpus (VERDICT r1 items 1/8: the path the bench runs must be
tested on the same parametrization as the scalar path).
"""

import numpy as np
import pytest

pytest.importorskip("jax")

from webp_tpu.container import chunks as ck
from webp_tpu.container.demux import WebPDecoder
from webp_tpu.decode.device import decode_vp8_frame_device, decode_vp8_batch_device

from conftest import load_png

LOSSY = [
    ("gallery1/1.webp", "gallery1/1.png"),
    ("gallery1/2.webp", "gallery1/2.png"),
    ("gallery1/3.webp", "gallery1/3.png"),
    ("gallery1/4.webp", "gallery1/4.png"),
    ("gallery1/5.webp", "gallery1/5.png"),
    ("regression/dark.webp", "regression/dark.png"),
]


def _want(goldens, golden):
    want = load_png(goldens / golden)
    if want.ndim == 3 and want.shape[2] == 4:
        want = want[:, :, :3]
    return want


@pytest.mark.parametrize("name,golden", LOSSY)
def test_device_decode_exact(fixtures, goldens, name, golden):
    data = (fixtures / name).read_bytes()
    d = WebPDecoder(data)
    frame, rgb = decode_vp8_frame_device(d._chunk_bytes(ck.VP8))
    np.testing.assert_array_equal(rgb, _want(goldens, golden))


@pytest.mark.parametrize("name,golden", LOSSY)
def test_batch_levels_decode_exact(fixtures, goldens, name, golden):
    payload = WebPDecoder((fixtures / name).read_bytes())._chunk_bytes(ck.VP8)
    rgb = decode_vp8_batch_device([payload, payload])
    want = _want(goldens, golden)
    np.testing.assert_array_equal(rgb[0], want)
    np.testing.assert_array_equal(rgb[1], want)


def test_mixed_geometry_batch(goldens, fixtures):
    """Mixed-size payload lists decode through per-geometry buckets and
    come back in input order, equal to per-image decode."""
    from webp_tpu.container import chunks as ck
    from webp_tpu.container.demux import WebPDecoder
    from webp_tpu.decode.device import (
        decode_vp8_batch_device,
        decode_vp8_batch_device_mixed,
    )

    payloads = []
    for name in ("1", "2", "1", "4", "2"):
        data = (fixtures / "gallery1" / f"{name}.webp").read_bytes()
        payloads.append(bytes(WebPDecoder(data)._chunk_bytes(ck.VP8)))
    got = decode_vp8_batch_device_mixed(payloads)
    for i, p in enumerate(payloads):
        want = decode_vp8_batch_device([p])[0]
        assert np.array_equal(got[i], want), i


def test_yuv_delivery_path_matches_rgb(fixtures, goldens):
    """out="yuv" dispatch + native host conversion == out="rgb" dispatch
    (the host-delivery model: half the d2h bytes, bit-exact RGB)."""
    from webp_tpu.decode import device as D

    name, golden = LOSSY[1]
    data = (fixtures / name).read_bytes()
    payload = WebPDecoder(data)._chunk_bytes(ck.VP8)
    w, h = WebPDecoder(data).dimensions()
    mbw, mbh = (w + 15) // 16, (h + 15) // 16
    rgb = np.asarray(D.dispatch_decode_batch([payload] * 2))
    packed = np.asarray(D.dispatch_decode_batch([payload] * 2, out="yuv"))
    rgb2 = D.yuv_packed_to_rgb(packed, mbw, mbh, w, h)
    np.testing.assert_array_equal(rgb, rgb2)
    np.testing.assert_array_equal(rgb[0], _want(goldens, golden))
