"""Bit-exactness of the JAX wavefront reconstruction vs the scalar decoder."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from webp_tpu.container import chunks as ck
from webp_tpu.container.demux import WebPDecoder
from webp_tpu.decode.vp8 import Vp8Decoder
from webp_tpu.ops.wavefront import reconstruct_frame


@pytest.mark.parametrize("name", ["gallery1/1.webp", "regression/dark.webp"])
def test_wavefront_recon_exact(fixtures, name):
    data = (fixtures / name).read_bytes()
    d = WebPDecoder(data)
    vp8_data = d._chunk_bytes(ck.VP8)

    dec = Vp8Decoder(bytes(vp8_data))
    dec._read_frame_header()
    dec._entropy_pass()
    residuals = dec._transform_pass()
    frame = dec._reconstruct(residuals)

    y, u, v = reconstruct_frame(
        jnp.asarray(residuals),
        jnp.asarray(dec.luma_mode),
        jnp.asarray(dec.bpred),
        jnp.asarray(dec.chroma_mode),
        dec.mbw,
        dec.mbh,
    )
    np.testing.assert_array_equal(np.asarray(y), frame.ybuf)
    np.testing.assert_array_equal(np.asarray(u), frame.ubuf)
    np.testing.assert_array_equal(np.asarray(v), frame.vbuf)
