"""Device-side VP8 decode pipeline: host entropy -> JAX reconstruction,
loop filtering, and RGB conversion on the accelerator.

The host `Vp8Decoder` performs the serial entropy pass (boolean decode of
modes + coefficients); everything after that — batched IDCT, wavefront
prediction/reconstruction, wavefront loop filtering, fancy upsampling and the
YUV->RGB matrix — runs under jit. Bit-exact with the scalar path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..decode.vp8 import Vp8Decoder, VP8Frame
from ..ops import jax_ops
from ..ops.jax_loopfilter import loop_filter_frame
from ..ops.wavefront import reconstruct_frame


@functools.partial(jax.jit, static_argnames=("mbw", "mbh", "simple", "width", "height"))
def _device_decode(
    coeffs,
    has_ac,
    luma_mode,
    bpred,
    chroma_mode,
    level,
    interior,
    hev_t,
    do_sub,
    mbw: int,
    mbh: int,
    simple: bool,
    width: int,
    height: int,
):
    full = jax_ops.idct4x4(coeffs)
    dc = (coeffs[..., 0:1] + 4) >> 3
    residuals = jnp.where(has_ac[..., None], full, jnp.broadcast_to(dc, full.shape))
    y, u, v = reconstruct_frame(residuals, luma_mode, bpred, chroma_mode, mbw, mbh)
    y, u, v = loop_filter_frame(y, u, v, level, interior, hev_t, do_sub, mbw, mbh, simple)
    rgb = jax_ops.fancy_yuv420_to_rgb(y, u, v, width, height)
    return y, u, v, rgb


def decode_vp8_frame_device(data: bytes):
    """Decode a VP8 chunk with the device pipeline; returns (VP8Frame, rgb)."""
    dec = Vp8Decoder(bytes(data))
    dec.parse(allow_native=True)

    level, interior, hev = dec.filter_params_arrays()
    do_sub = (dec.luma_mode == 4) | (~dec.skipped & dec.non_zero_dct)

    y, u, v, rgb = _device_decode(
        jnp.asarray(dec.coeffs),
        jnp.asarray(dec.has_ac),
        jnp.asarray(dec.luma_mode),
        jnp.asarray(dec.bpred),
        jnp.asarray(dec.chroma_mode),
        jnp.asarray(level),
        jnp.asarray(interior),
        jnp.asarray(hev),
        jnp.asarray(do_sub),
        dec.mbw,
        dec.mbh,
        bool(dec.filter_type),
        dec.width,
        dec.height,
    )
    frame = VP8Frame(dec.width, dec.height, np.asarray(y), np.asarray(u), np.asarray(v))
    return frame, np.asarray(rgb)
