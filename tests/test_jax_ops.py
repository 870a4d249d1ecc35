"""Bit-exactness of JAX device kernels vs the numpy reference ops."""

import numpy as np
import pytest

from webp_tpu.ops import transform as ntx
from webp_tpu.ops import yuv as nyuv

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from webp_tpu.ops import jax_ops as jtx  # noqa: E402

rng = np.random.RandomState(42)


def test_idct_exact():
    blocks = rng.randint(-(2**13), 2**13, size=(512, 16)).astype(np.int32)
    np.testing.assert_array_equal(np.asarray(jtx.idct4x4(jnp.asarray(blocks))), ntx.idct4x4(blocks))


def test_iwht_exact():
    blocks = rng.randint(-(2**13), 2**13, size=(256, 16)).astype(np.int32)
    np.testing.assert_array_equal(np.asarray(jtx.iwht4x4(jnp.asarray(blocks))), ntx.iwht4x4(blocks))


def test_dct_exact():
    blocks = rng.randint(-255, 256, size=(512, 16)).astype(np.int32)
    np.testing.assert_array_equal(np.asarray(jtx.dct4x4(jnp.asarray(blocks))), ntx.dct4x4(blocks))


def test_wht_exact():
    blocks = rng.randint(-4000, 4000, size=(256, 16)).astype(np.int32)
    np.testing.assert_array_equal(np.asarray(jtx.wht4x4(jnp.asarray(blocks))), ntx.wht4x4(blocks))


def test_quantize_exact():
    from webp_tpu.encode.quant import SegmentParams

    seg = SegmentParams(60)
    blocks = rng.randint(-30000, 30000, size=(512, 16)).astype(np.int32)
    for mtx in (seg.y1, seg.y2, seg.uv):
        iq = np.empty(16, np.int32)
        iq[:] = mtx.iq[1]
        iq[0] = mtx.iq[0]
        bias = np.empty(16, np.int32)
        bias[:] = mtx.bias[1]
        bias[0] = mtx.bias[0]
        got = np.asarray(jtx.quantize_zz(jnp.asarray(blocks), jnp.asarray(iq), jnp.asarray(bias)))
        c = blocks.astype(np.int64)
        want = np.where(
            c < 0,
            -np.minimum((np.abs(c) * iq + bias) >> 17, 2047),
            np.minimum((np.abs(c) * iq + bias) >> 17, 2047),
        )
        np.testing.assert_array_equal(got, want)


def test_yuv_to_rgb_exact():
    y = rng.randint(0, 256, size=(64, 48), dtype=np.uint8)
    u = rng.randint(0, 256, size=(64, 48), dtype=np.uint8)
    v = rng.randint(0, 256, size=(64, 48), dtype=np.uint8)
    got = np.asarray(jtx.yuv_to_rgb(jnp.asarray(y), jnp.asarray(u), jnp.asarray(v)))
    np.testing.assert_array_equal(got, nyuv.yuv_to_rgb(y, u, v))


@pytest.mark.parametrize("h,w", [(64, 48), (37, 51)])
def test_fancy_conversion_exact(h, w):
    mbh, mbw = (h + 15) // 16, (w + 15) // 16
    y = rng.randint(0, 256, size=(mbh * 16, mbw * 16), dtype=np.uint8)
    u = rng.randint(0, 256, size=(mbh * 8, mbw * 8), dtype=np.uint8)
    v = rng.randint(0, 256, size=(mbh * 8, mbw * 8), dtype=np.uint8)
    got = np.asarray(
        jtx.fancy_yuv420_to_rgb(jnp.asarray(y), jnp.asarray(u), jnp.asarray(v), w, h)
    )
    want = nyuv.fancy_yuv420_to_rgb(y, u, v, w, h)
    np.testing.assert_array_equal(got, want)


def test_rgb_to_yuv420_exact():
    h, w = 64, 48  # multiples of 16: device path assumes pre-padded input
    rgb = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
    gy, gu, gv = (np.asarray(x) for x in jtx.rgb_to_yuv420(jnp.asarray(rgb)))
    wy, wu, wv = nyuv.rgb_to_yuv420(rgb)
    np.testing.assert_array_equal(gy, wy)
    np.testing.assert_array_equal(gu, wu)
    np.testing.assert_array_equal(gv, wv)


def test_rgb_to_yuv420_native_matches_numpy():
    from webp_tpu.io import native

    if not native.available():
        import pytest

        pytest.skip("native library unavailable")
    # Odd sizes exercise the edge-replication and padding paths; RGBA
    # exercises the stride-4 path.
    for h, w, ch in [(64, 48, 3), (37, 51, 3), (1, 1, 3), (16, 17, 4), (33, 32, 4)]:
        rgb = rng.randint(0, 256, size=(h, w, ch), dtype=np.uint8)
        ny, nu, nv = native.rgb_to_yuv420(rgb)
        wy, wu, wv = nyuv.rgb_to_yuv420_numpy(rgb)
        np.testing.assert_array_equal(ny, wy)
        np.testing.assert_array_equal(nu, wu)
        np.testing.assert_array_equal(nv, wv)
