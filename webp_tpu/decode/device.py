"""Device-side VP8 decode pipeline: host entropy -> JAX reconstruction,
loop filtering, and RGB conversion on the accelerator.

The host `Vp8Decoder` performs the serial entropy pass (boolean decode of
modes + coefficients); everything after that — batched IDCT, wavefront
prediction/reconstruction, wavefront loop filtering, fancy upsampling and the
YUV->RGB matrix — runs under jit. Bit-exact with the scalar path.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..decode.vp8 import Vp8Decoder, VP8Frame
from ..ops import jax_ops
from ..ops.jax_loopfilter import loop_filter_frame
from ..ops.wavefront import reconstruct_frame

# v2 lane-aligned wavefront backends. "pallas" (default on TPU) runs the
# whole recon+filter wavefront as two Pallas kernels with VMEM-resident
# state; "scan" uses the lax.scan drivers (used on CPU, where Pallas would
# need interpret mode).  WEBP_TPU_DECODE_BACKEND overrides: pallas|scan|v1.
from ..ops.loopfilter2 import loop_filter_frames_v2
from ..ops.wavefront2 import reconstruct_frames_v2


def _decode_backend() -> str:
    env = os.environ.get("WEBP_TPU_DECODE_BACKEND")
    if env:
        return env
    return "pallas" if jax.default_backend() not in ("cpu",) else "scan"


@functools.partial(jax.jit, static_argnames=("mbw", "mbh", "simple", "width", "height", "backend"))
def _device_decode_batch_v2(
    coeffs, has_ac, luma_mode, bpred, chroma_mode, level, interior, hev_t, do_sub,
    mbw: int, mbh: int, simple: bool, width: int, height: int, backend: str,
):
    full = jax_ops.idct4x4(coeffs)
    dc = (coeffs[..., 0:1] + 4) >> 3
    residuals = jnp.where(has_ac[..., None], full, jnp.broadcast_to(dc, full.shape))
    if backend == "pallas":
        from ..ops.pallas.decode_wavefront import decode_planes_pallas

        y, u, v = decode_planes_pallas(
            residuals, luma_mode, bpred, chroma_mode,
            level, interior, hev_t, do_sub, mbw, mbh, simple,
        )
    else:
        y, u, v = reconstruct_frames_v2(residuals, luma_mode, bpred, chroma_mode, mbw, mbh)
        y, u, v = loop_filter_frames_v2(
            y, u, v, level, interior, hev_t, do_sub, mbw, mbh, simple
        )
    rgb = jax_ops.fancy_yuv420_to_rgb(y, u, v, width, height)
    return y, u, v, rgb


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

    backend = _decode_backend()
    args = (
        jnp.asarray(dec.coeffs),
        jnp.asarray(dec.has_ac),
        jnp.asarray(dec.luma_mode),
        jnp.asarray(dec.bpred),
        jnp.asarray(dec.chroma_mode),
        jnp.asarray(level),
        jnp.asarray(interior),
        jnp.asarray(hev),
        jnp.asarray(do_sub),
    )
    if backend == "v1":
        y, u, v, rgb = _device_decode(
            *args, dec.mbw, dec.mbh, bool(dec.filter_type), dec.width, dec.height
        )
    else:
        y, u, v, rgb = _device_decode_batch_v2(
            *[a[None] for a in args],
            dec.mbw, dec.mbh, bool(dec.filter_type), dec.width, dec.height,
            backend,
        )
        y, u, v, rgb = y[0], u[0], v[0], rgb[0]
    frame = VP8Frame(dec.width, dec.height, np.asarray(y), np.asarray(u), np.asarray(v))
    return frame, np.asarray(rgb)


@functools.partial(jax.jit, static_argnames=("mbw", "mbh", "simple", "width", "height"))
def _device_decode_batch(
    coeffs, has_ac, luma_mode, bpred, chroma_mode, level, interior, hev_t, do_sub,
    mbw: int, mbh: int, simple: bool, width: int, height: int,
):
    return jax.vmap(
        lambda c, a, lm, bp, cm, lv, it, hv, ds: _device_decode(
            c, a, lm, bp, cm, lv, it, hv, ds, mbw, mbh, simple, width, height
        )[3]
    )(coeffs, has_ac, luma_mode, bpred, chroma_mode, level, interior, hev_t, do_sub)


def decode_vp8_batch_device(payloads):
    """Decode same-geometry VP8 chunks as one batched device call -> RGB [B,...]."""
    from concurrent.futures import ThreadPoolExecutor

    def parse_one(p):
        d = Vp8Decoder(bytes(p))
        d.parse(allow_native=True)  # C++ releases the GIL -> real parallelism
        return d

    with ThreadPoolExecutor(max_workers=min(8, len(payloads))) as pool:
        decs = list(pool.map(parse_one, payloads))
    d0 = decs[0]
    stack = lambda f: jnp.asarray(np.stack([f(d) for d in decs]))
    params = [d.filter_params_arrays() for d in decs]
    do_sub = [
        (d.luma_mode == 4) | (~d.skipped & d.non_zero_dct) for d in decs
    ]
    backend = _decode_backend()
    args = (
        stack(lambda d: d.coeffs),
        stack(lambda d: d.has_ac),
        stack(lambda d: d.luma_mode),
        stack(lambda d: d.bpred),
        stack(lambda d: d.chroma_mode),
        jnp.asarray(np.stack([p[0] for p in params])),
        jnp.asarray(np.stack([p[1] for p in params])),
        jnp.asarray(np.stack([p[2] for p in params])),
        jnp.asarray(np.stack(do_sub)),
    )
    if backend == "v1":
        rgb = _device_decode_batch(
            *args, d0.mbw, d0.mbh, bool(d0.filter_type), d0.width, d0.height
        )
    else:
        rgb = _device_decode_batch_v2(
            *args, d0.mbw, d0.mbh, bool(d0.filter_type), d0.width, d0.height,
            backend,
        )[3]
    return np.asarray(rgb)
