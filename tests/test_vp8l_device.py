"""Device VP8L inverse transforms vs the numpy reference implementations.

Random-data equality per transform, then full-corpus equality through the
batched device lossless decode path (decode/vp8l_device pipeline).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from webp_tpu.ops import vp8l_device as dev
from webp_tpu.ops import vp8l_transforms as host


def _rand_px(rng, b, h, w):
    return rng.randint(0, 256, (b, h, w, 4)).astype(np.uint8)


def test_subtract_green_matches():
    rng = np.random.RandomState(0)
    px = _rand_px(rng, 3, 13, 17)
    want = px.copy()
    for b in range(3):
        flat = want[b].reshape(-1)
        host.inverse_subtract_green(flat)
    got = np.asarray(dev.subtract_green(jnp.asarray(px)))
    assert np.array_equal(got, want)


@pytest.mark.parametrize("size_bits", [2, 3, 5])
def test_color_transform_matches(size_bits):
    rng = np.random.RandomState(1)
    b, h, w = 2, 21, 37
    bw = host._subsample(w, size_bits)
    bh = host._subsample(h, size_bits)
    px = _rand_px(rng, b, h, w)
    tf = rng.randint(0, 256, (b, bh, bw, 4)).astype(np.uint8)
    want = px.copy()
    for i in range(b):
        flat = want[i].reshape(-1)
        host.inverse_color_transform(flat, w, h, size_bits, tf[i].reshape(-1))
    got = np.asarray(dev.color_transform(jnp.asarray(px), jnp.asarray(tf), size_bits))
    assert np.array_equal(got, want)


@pytest.mark.parametrize("table_size", [2, 4, 11, 17, 250])
def test_color_indexing_matches(table_size):
    rng = np.random.RandomState(2)
    b, h, w = 2, 9, 29
    if table_size <= 2:
        pw = (w + 7) // 8
    elif table_size <= 4:
        pw = (w + 3) // 4
    elif table_size <= 16:
        pw = (w + 1) // 2
    else:
        pw = w
    px = _rand_px(rng, b, h, pw)
    table = rng.randint(0, 256, (b, table_size * 4)).astype(np.uint8)
    want = []
    for i in range(b):
        want.append(
            host.inverse_color_indexing(
                px[i].reshape(-1).copy(), pw, h, w, table_size, table[i]
            ).reshape(h, w, 4)
        )
    tab_full = np.zeros((b, 256, 4), np.uint8)
    tab_full[:, :table_size] = table.reshape(b, table_size, 4)
    got = np.asarray(
        dev.color_indexing(jnp.asarray(px), jnp.asarray(tab_full), table_size, w)
    )
    assert np.array_equal(got, np.stack(want))


def _corpus_lossless():
    from pathlib import Path

    fx = Path("/root/reference/tests/images")
    files = sorted((fx / "gallery2").glob("*.webp"))
    files += sorted(p for p in (fx / "regression").glob("*.webp"))
    return [p for p in files if p.exists()]


def test_batch_device_decode_matches_scalar_corpus():
    """Full VP8L pipeline: device transforms == scalar decoder, whole corpus."""
    from webp_tpu.container import chunks as ck
    from webp_tpu.container.demux import WebPDecoder
    from webp_tpu.decode.vp8l import decode_lossless
    from webp_tpu.decode.vp8l_device import decode_lossless_batch_device

    checked = 0
    for p in _corpus_lossless():
        wd = WebPDecoder(p.read_bytes())
        try:
            payload = wd._chunk_bytes(ck.VP8L)
        except Exception:
            continue  # animated file
        if payload is None:
            continue  # lossy file
        w, h = wd.dimensions()
        want = decode_lossless(payload, w, h)
        got = decode_lossless_batch_device([payload, payload], w, h)
        assert got.shape == (2, h, w, 4), p.name
        assert np.array_equal(got[0], want), p.name
        assert np.array_equal(got[1], want), p.name
        checked += 1
    assert checked >= 5  # gallery2 lossless photos + palette regressions


@pytest.mark.parametrize(
    "size_bits,h,w",
    [(2, 8, 8), (2, 13, 29), (3, 17, 40), (4, 31, 65), (2, 1, 7), (2, 5, 1)],
)
def test_predictor_matches(size_bits, h, w):
    rng = np.random.RandomState(4)
    b = 2
    bw = host._subsample(w, size_bits)
    bh = host._subsample(h, size_bits)
    px = _rand_px(rng, b, h, w)
    # all 14 modes exercised across blocks
    modes = rng.randint(0, 14, (b, bh, bw)).astype(np.uint8)
    want = px.copy()
    for i in range(b):
        pred_img = np.zeros((bh, bw, 4), np.uint8)
        pred_img[:, :, 1] = modes[i]
        flat = want[i].reshape(-1)
        host.inverse_predictor(flat, w, h, size_bits, pred_img.reshape(-1))
    got = np.asarray(
        dev.inverse_predictor_batch(jnp.asarray(px), jnp.asarray(modes), size_bits)
    )
    assert np.array_equal(got, want)


def test_batch_device_decodes_own_encoder_streams():
    """The device transform path must handle OUR encoder's full toolset
    (LZ77, per-block predictors, cross-color, meta-Huffman, palette)."""
    from pathlib import Path

    from PIL import Image

    from webp_tpu.decode.vp8l_device import decode_lossless_batch_device
    from webp_tpu.encode.vp8l import encode_lossless

    png = Path("/root/reference/tests/reference/gallery2/2_webp_ll.png")
    if not png.exists():
        pytest.skip("corpus unavailable")
    img = np.asarray(Image.open(png).convert("RGBA"))[:160, :192].copy()
    h, w = img.shape[:2]
    data = encode_lossless(img)
    out = decode_lossless_batch_device([data, data], w, h)
    assert np.array_equal(out[0], img) and np.array_equal(out[1], img)

    rng = np.random.RandomState(0)
    pal = rng.randint(0, 256, (9, 4)).astype(np.uint8)
    pimg = pal[rng.randint(0, 9, (40, 56))]
    pout = decode_lossless_batch_device([encode_lossless(pimg)], 56, 40)
    assert np.array_equal(pout[0], pimg)
