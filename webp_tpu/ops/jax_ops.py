"""JAX device kernels: exact-integer batched transforms, quantization, YUV
conversion and chroma upsampling.

These are bit-exact mirrors of the numpy reference ops (`transform.py`,
`yuv.py`) — same RFC 6386 / libwebp integer arithmetic, traced once under
`jit` and tiled by XLA onto the VPU/MXU. All math is int32 (the values fit:
IDCT intermediates < 2^24); no floats anywhere on bit-exact paths.

Verified against the numpy implementations by `tests/test_jax_ops.py`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

C1 = 20091
C2 = 35468


def _mul16(a, c):
    """Exact (a * c) >> 16 on int32 lanes without 64-bit.

    Split a = hi*2^12 + lo with lo >= 0; then
    (a*c) >> 16 == (hi*c + ((lo*c) >> 12)) >> 4 exactly
    (floor((A*2^k + B)/2^m) == floor((A + floor(B/2^k))/2^(m-k)) for B >= 0).
    |a| < 2^20 and c < 2^16 keep every intermediate inside int32.
    """
    hi = a >> 12
    lo = a & 0xFFF
    return (hi * c + ((lo * c) >> 12)) >> 4


def idct4x4(blocks: jnp.ndarray) -> jnp.ndarray:
    """Inverse DCT on [..., 16] int32 blocks (RFC 6386 §14.3)."""
    b = blocks.reshape(*blocks.shape[:-1], 4, 4).astype(jnp.int32)
    r0, r1, r2, r3 = b[..., 0, :], b[..., 1, :], b[..., 2, :], b[..., 3, :]
    a1 = r0 + r2
    b1 = r0 - r2
    c1 = _mul16(r1, C2) - (r3 + _mul16(r3, C1))
    d1 = (r1 + _mul16(r1, C1)) + _mul16(r3, C2)
    t = jnp.stack([a1 + d1, b1 + c1, b1 - c1, a1 - d1], axis=-2)
    c0, c1_, c2_, c3 = t[..., 0], t[..., 1], t[..., 2], t[..., 3]
    a1 = c0 + c2_
    b1 = c0 - c2_
    cc = _mul16(c1_, C2) - (c3 + _mul16(c3, C1))
    dd = (c1_ + _mul16(c1_, C1)) + _mul16(c3, C2)
    out = jnp.stack(
        [(a1 + dd + 4) >> 3, (b1 + cc + 4) >> 3, (b1 - cc + 4) >> 3, (a1 - dd + 4) >> 3],
        axis=-1,
    )
    return out.reshape(blocks.shape)


def iwht4x4(blocks: jnp.ndarray) -> jnp.ndarray:
    b = blocks.reshape(*blocks.shape[:-1], 4, 4).astype(jnp.int32)
    r0, r1, r2, r3 = b[..., 0, :], b[..., 1, :], b[..., 2, :], b[..., 3, :]
    t = jnp.stack(
        [(r0 + r3) + (r1 + r2), (r1 - r2) + (r0 - r3), (r0 + r3) - (r1 + r2), (r0 - r3) - (r1 - r2)],
        axis=-2,
    )
    c0, c1_, c2_, c3 = t[..., 0], t[..., 1], t[..., 2], t[..., 3]
    a1 = c0 + c3
    b1 = c1_ + c2_
    c1n = c1_ - c2_
    d1 = c0 - c3
    out = jnp.stack(
        [(a1 + b1 + 3) >> 3, (c1n + d1 + 3) >> 3, (a1 - b1 + 3) >> 3, (d1 - c1n + 3) >> 3],
        axis=-1,
    )
    return out.reshape(blocks.shape)


def dct4x4(blocks: jnp.ndarray) -> jnp.ndarray:
    """Forward DCT, libwebp rounding (encoder path)."""
    blk = blocks.reshape(*blocks.shape[:-1], 4, 4).astype(jnp.int32)
    e0, e1, e2, e3 = blk[..., 0], blk[..., 1], blk[..., 2], blk[..., 3]
    a = (e0 + e3) * 8
    b = (e1 + e2) * 8
    c = (e1 - e2) * 8
    d = (e0 - e3) * 8
    t = jnp.stack(
        [a + b, (c * 2217 + d * 5352 + 14500) >> 12, a - b, (d * 2217 - c * 5352 + 7500) >> 12],
        axis=-1,
    )
    c0, c1_, c2_, c3 = t[..., 0, :], t[..., 1, :], t[..., 2, :], t[..., 3, :]
    a = c0 + c3
    b = c1_ + c2_
    c = c1_ - c2_
    d = c0 - c3
    out = jnp.stack(
        [
            (a + b + 7) >> 4,
            ((c * 2217 + d * 5352 + 12000) >> 16) + (d != 0).astype(jnp.int32),
            (a - b + 7) >> 4,
            (d * 2217 - c * 5352 + 51000) >> 16,
        ],
        axis=-2,
    )
    return out.reshape(blocks.shape)


def wht4x4(blocks: jnp.ndarray) -> jnp.ndarray:
    b = blocks.reshape(*blocks.shape[:-1], 4, 4).astype(jnp.int32)
    e0, e1, e2, e3 = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    t = jnp.stack(
        [(e0 + e3) + (e1 + e2), (e1 - e2) + (e0 - e3), (e0 + e3) - (e1 + e2), (e0 - e3) - (e1 - e2)],
        axis=-1,
    )
    c0, c1_, c2_, c3 = t[..., 0, :], t[..., 1, :], t[..., 2, :], t[..., 3, :]
    a2 = (c0 + c3) + (c1_ + c2_)
    b2 = (c1_ - c2_) + (c0 - c3)
    c2n = (c0 + c3) - (c1_ + c2_)
    d2 = (c0 - c3) - (c1_ - c2_)

    def half(v):
        return jnp.where(v >= 0, (v + (v > 0).astype(jnp.int32)) // 2, -((-v) // 2))

    out = jnp.stack([half(a2), half(b2), half(c2n), half(d2)], axis=-2)
    return out.reshape(blocks.shape)


def quantize_zz(blocks_zz: jnp.ndarray, iq: jnp.ndarray, bias: jnp.ndarray) -> jnp.ndarray:
    """Biased quantization of zigzag-ordered coeffs [..., 16] (QFIX=17)."""
    c = blocks_zz.astype(jnp.int32)
    a = jnp.abs(c)
    # a < 2^16 and iq <= 2^15 (and for Y2, a < 2^15.1 with iq <= 2^14), so the
    # product stays inside int32.
    level = jnp.minimum((a * iq.astype(jnp.int32) + bias.astype(jnp.int32)) >> 17, 2047)
    return jnp.where(c < 0, -level, level)


# -- YUV <-> RGB -------------------------------------------------------------

def _mulhi(v, coeff):
    return (v.astype(jnp.int32) * coeff) >> 8


def yuv_to_rgb(y: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Per-pixel planes -> RGB [.., 3] uint8 (libwebp fixed-point)."""
    yv = _mulhi(y, 19077)
    r = yv + _mulhi(v, 26149) - 14234
    g = yv - _mulhi(u, 6419) - _mulhi(v, 13320) + 8708
    b = yv + _mulhi(u, 33050) - 17685
    rgb = jnp.stack([r, g, b], axis=-1) >> 6
    return jnp.clip(rgb, 0, 255).astype(jnp.uint8)


def fancy_upsample(c: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """Bilinear 9:3:3:1 chroma upsampling with mirrored edges.

    c: [..., ch, cw] uint8 -> [..., height, width] uint8.

    Gather-free formulation: the "far" chroma sample of an output pixel is
    the previous chroma column/row for even outputs and the next one for odd
    outputs (mirrored at edges), so four shifted copies + 2x2 repeats + a
    parity select cover all cases — pure pads/slices/repeats, no gathers
    (TPU gathers dominated this stage's cost otherwise).
    """
    ci = c.astype(jnp.int32)

    def shl(a, ax):  # a[j] = in[max(j-1, 0)]
        lead = a[(Ellipsis,) + ((slice(0, 1),) if ax == -1 else (slice(0, 1), slice(None)))]
        body = a[(Ellipsis,) + ((slice(0, -1),) if ax == -1 else (slice(0, -1), slice(None)))]
        return jnp.concatenate([lead, body], axis=ax)

    def shr(a, ax):  # a[j] = in[min(j+1, n-1)]
        tail = a[(Ellipsis,) + ((slice(-1, None),) if ax == -1 else (slice(-1, None), slice(None)))]
        body = a[(Ellipsis,) + ((slice(1, None),) if ax == -1 else (slice(1, None), slice(None)))]
        return jnp.concatenate([body, tail], axis=ax)

    def up2(a):
        return jnp.repeat(jnp.repeat(a, 2, axis=-2), 2, axis=-1)

    col_odd = (jnp.arange(2 * c.shape[-1]) & 1) == 1
    row_odd = ((jnp.arange(2 * c.shape[-2]) & 1) == 1)[:, None]

    def pick_col(a):  # far-column variant of a
        return jnp.where(col_odd, up2(shr(a, -1)), up2(shl(a, -1)))

    main = up2(ci)
    sec_col = pick_col(ci)
    sec_row = jnp.where(row_odd, up2(shr(ci, -2)), up2(shl(ci, -2)))
    tert = jnp.where(row_odd, pick_col(shr(ci, -2)), pick_col(shl(ci, -2)))
    out = (9 * main + 3 * sec_col + 3 * sec_row + tert + 8) >> 4
    return out[..., :height, :width].astype(jnp.uint8)


def fancy_yuv420_to_rgb(ybuf, ubuf, vbuf, width: int, height: int):
    """Full decode-side color conversion on device."""
    y = ybuf[..., :height, :width]
    ch = (height + 1) // 2
    cw = (width + 1) // 2
    u = fancy_upsample(ubuf[..., :ch, :cw], height, width)
    v = fancy_upsample(vbuf[..., :ch, :cw], height, width)
    return yuv_to_rgb(y, u, v)


def rgb_to_yuv420(rgb: jnp.ndarray):
    """Encoder-side RGB->YUV420 for whole-MB-padded [..., H, W, 3] input.

    H and W must already be multiples of 16 (pad on host or with jnp.pad).
    """
    r = rgb[..., 0].astype(jnp.int32)
    g = rgb[..., 1].astype(jnp.int32)
    b = rgb[..., 2].astype(jnp.int32)
    YUV_FIX = 16
    YUV_HALF = 1 << (YUV_FIX - 1)
    y = (16839 * r + 33059 * g + 6420 * b + YUV_HALF + (16 << YUV_FIX)) >> YUV_FIX
    u_raw = -9719 * r - 19081 * g + 28800 * b + (128 << YUV_FIX)
    v_raw = 28800 * r - 24116 * g - 4684 * b + (128 << YUV_FIX)

    def down(p):
        s = (
            p[..., 0::2, 0::2].astype(jnp.int64)
            + p[..., 0::2, 1::2]
            + p[..., 1::2, 0::2]
            + p[..., 1::2, 1::2]
        )
        return ((s + (YUV_HALF << 2)) >> (YUV_FIX + 2)).astype(jnp.uint8)

    return y.astype(jnp.uint8), down(u_raw), down(v_raw)
