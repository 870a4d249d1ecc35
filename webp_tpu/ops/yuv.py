"""YUV420 -> RGB conversion with libwebp fixed-point math and fancy (bilinear)
or simple chroma upsampling, as whole-image numpy gathers.

Parity: `/root/reference/src/decoder/yuv.rs:36-431`. The reference walks row
pairs sharing chroma rows; here the same weights are expressed as a closed-form
per-pixel gather (main/secondary row/col + 9:3:3:1 weights), which is also the
shape of the JAX/Pallas device kernel.
"""

from __future__ import annotations

import numpy as np


def _mulhi(v, coeff):
    return (v.astype(np.int64) * coeff) >> 8


def yuv_to_rgb(y, u, v):
    """Per-pixel planes [h, w] uint8 -> RGB [h, w, 3] uint8."""
    yv = _mulhi(y, 19077)
    r = yv + _mulhi(v, 26149) - 14234
    g = yv - _mulhi(u, 6419) - _mulhi(v, 13320) + 8708
    b = yv + _mulhi(u, 33050) - 17685
    out = np.stack([r, g, b], axis=-1) >> 6
    return np.clip(out, 0, 255).astype(np.uint8)


def _fancy_upsample(c, height, width):
    """Upsample a chroma plane [ch, cw] to [height, width] with 9:3:3:1."""
    ch, cw = c.shape
    r = np.arange(height)
    x = np.arange(width)
    mr = r // 2
    fr = np.clip(np.where(r % 2 == 1, r // 2 + 1, r // 2 - 1), 0, ch - 1)
    mc = x // 2
    fc = np.clip(np.where(x % 2 == 1, x // 2 + 1, x // 2 - 1), 0, cw - 1)

    c32 = c.astype(np.uint16)
    main = c32[mr][:, mc]
    sec_col = c32[mr][:, fc]
    sec_row = c32[fr][:, mc]
    tert = c32[fr][:, fc]
    return ((9 * main.astype(np.uint32) + 3 * sec_col + 3 * sec_row + tert + 8) >> 4).astype(
        np.uint8
    )


def fancy_yuv420_to_rgb(ybuf, ubuf, vbuf, width, height):
    """Decode-side conversion; ybuf is the padded [mbh*16, mbw*16] plane."""
    y = ybuf[:height, :width]
    chroma_h = (height + 1) // 2
    chroma_w = (width + 1) // 2
    u = _fancy_upsample(ubuf[:chroma_h, :chroma_w], height, width)
    v = _fancy_upsample(vbuf[:chroma_h, :chroma_w], height, width)
    return yuv_to_rgb(y, u, v)


def simple_yuv420_to_rgb(ybuf, ubuf, vbuf, width, height):
    y = ybuf[:height, :width]
    rows = (np.arange(height)) // 2
    cols = (np.arange(width)) // 2
    u = ubuf[rows][:, cols]
    v = vbuf[rows][:, cols]
    return yuv_to_rgb(y, u, v)


# -- encoder side: RGB -> YUV420 with macroblock padding --------------------

YUV_FIX = 16
YUV_HALF = 1 << (YUV_FIX - 1)


def rgb_to_yuv420(rgb: np.ndarray):
    """BT.601 fixed-point RGB->YUV420 (libwebp coefficients) with 2x2 chroma
    averaging and edge-replicated padding to whole macroblocks.

    Input [h, w, 3|4] uint8; returns (y [mbh*16, mbw*16], u, v [mbh*8, mbw*8]).
    Parity: `/root/reference/src/decoder/yuv.rs:656-898`.

    Runs the C++ twin when available (bit-exact, ~7x faster on the 2-core
    bench host; tests/test_jax_ops.py enforces equality with this numpy
    form), falling back to numpy.
    """
    if rgb.dtype == np.uint8 and rgb.ndim == 3 and rgb.shape[2] in (3, 4):
        try:
            from ..io import native

            return native.rgb_to_yuv420(rgb)
        except Exception as e:  # pragma: no cover - build/ABI problems
            from ..io.native import warn_once

            warn_once("rgb_to_yuv420", e)
    return rgb_to_yuv420_numpy(rgb)


def rgb_to_yuv420_numpy(rgb: np.ndarray):
    """Numpy reference form of rgb_to_yuv420 (the equality oracle for the
    native and device twins)."""
    h, w = rgb.shape[:2]
    mbw = (w + 15) // 16
    mbh = (h + 15) // 16
    r = rgb[:, :, 0].astype(np.int32)
    g = rgb[:, :, 1].astype(np.int32)
    b = rgb[:, :, 2].astype(np.int32)

    y = ((16839 * r + 33059 * g + 6420 * b + YUV_HALF + (16 << YUV_FIX)) >> YUV_FIX).astype(np.uint8)

    u_raw = -9719 * r - 19081 * g + 28800 * b + (128 << YUV_FIX)
    v_raw = 28800 * r - 24116 * g - 4684 * b + (128 << YUV_FIX)

    # 2x2 average with edge replication for odd dimensions.
    ew = w + (w & 1)
    eh = h + (h & 1)

    def downsample(raw):
        full = np.empty((eh, ew), np.int64)
        full[:h, :w] = raw
        if w & 1:
            full[:h, w] = raw[:, w - 1]
        if h & 1:
            full[h, :] = full[h - 1, :]
        s = full[0::2, 0::2] + full[0::2, 1::2] + full[1::2, 0::2] + full[1::2, 1::2]
        return ((s + (YUV_HALF << 2)) >> (YUV_FIX + 2)).astype(np.uint8)

    u = downsample(u_raw)
    v = downsample(v_raw)

    def pad(plane, ph, pw):
        out = np.empty((ph, pw), np.uint8)
        sh, sw = plane.shape
        out[:sh, :sw] = plane
        if sw < pw:
            out[:sh, sw:] = plane[:, sw - 1 : sw]
        if sh < ph:
            out[sh:, :] = out[sh - 1 : sh, :]
        return out

    return pad(y, mbh * 16, mbw * 16), pad(u, mbh * 8, mbw * 8), pad(v, mbh * 8, mbw * 8)


def _up1d(c, N):
    """1-D (3*main + far) half-to-full upsample along the last axis
    (unnormalized; the 2-D caller divides by 16 after both axes)."""
    n = c.shape[-1]
    out = np.empty((*c.shape[:-1], N), np.float32)
    ne = (N + 1) // 2  # even outputs: far = c[max(k-1, 0)]
    far_e = np.concatenate([c[..., :1], c[..., : ne - 1]], axis=-1)
    out[..., 0::2] = 3.0 * c[..., :ne] + far_e
    no = N // 2  # odd outputs: far = c[min(k+1, n-1)]
    if no:
        far_o = c[..., np.minimum(np.arange(no) + 1, n - 1)]
        out[..., 1::2] = 3.0 * c[..., :no] + far_o
    return out


def _fancy_upsample_f(c, height, width):
    """Float version of the decoder's 9:3:3:1 upsample (for sharp-YUV);
    separable: [3,1] per axis, /16 once."""
    return _up1d(_up1d(c, width).T, height).T / 16.0


def _adj1d(y, c):
    """1-D adjoint of the (3*main + 1*far)/4 half-to-full upsample along the
    last axis: y [..., N] -> [..., c]. The 2-D 9:3:3:1 filter is the outer
    product of this kernel with itself, so the 2-D adjoint applies this per
    axis (slice sums only — no scatters)."""
    N = y.shape[-1]
    ye = y[..., 0::2]
    yo = y[..., 1::2]
    out = np.zeros((*y.shape[:-1], c), np.float32)
    out += 3.0 * ye[..., :c]
    out[..., : yo.shape[-1]] += 3.0 * yo
    out[..., : max(ye.shape[-1] - 1, 0)] += ye[..., 1:]   # far: even i -> k=i/2-1
    out[..., 1:] += yo[..., : c - 1]                      # far: odd i -> k=(i-1)/2+1
    out[..., 0] += ye[..., 0]                             # clip at left edge
    if N % 2 == 0 and N >= 2:
        out[..., c - 1] += yo[..., -1]                    # clip at right edge
    return out


def _fancy_adjoint(res, ch, cw):
    """Adjoint of the 9:3:3:1 upsample: full-res [h, w] -> chroma [ch, cw]."""
    return _adj1d(_adj1d(res, cw).T, ch).T


def _fancy_adjoint_weights(h, w, ch, cw):
    """Per-cell adjoint weight totals (for a normalized Jacobi step)."""
    wgt = _fancy_adjoint(np.ones((h, w)), ch, cw)
    return np.maximum(wgt, 1.0)


def rgb_to_yuv420_sharp(rgb: np.ndarray, iters: int = 4):
    """Sharp-YUV RGB->YUV420: least-squares chroma refinement against the
    decoder's fancy upsampler.

    The decoder reconstructs chroma with the known linear 9:3:3:1 operator F;
    standard 2x2 averaging minimizes nothing in that metric. Starting from
    the averaged planes, Jacobi iterations U += F^T(u_full - F U) / colsum(F)
    pull the upsampled chroma toward the per-pixel BT.601 chroma targets
    (sharper chroma edges, higher decoded-RGB PSNR at the same bitstream
    cost model). Same output contract as rgb_to_yuv420. The reference
    accepts a sharp_yuv flag but never implements it (api.rs:487-671)."""
    h, w = rgb.shape[:2]
    y, u0, v0 = rgb_to_yuv420(rgb)
    r = rgb[:, :, 0].astype(np.int64)
    g = rgb[:, :, 1].astype(np.int64)
    b = rgb[:, :, 2].astype(np.int64)
    u_full = ((-9719 * r - 19081 * g + 28800 * b + (128 << YUV_FIX)) / float(1 << YUV_FIX)).astype(np.float32)
    v_full = ((28800 * r - 24116 * g - 4684 * b + (128 << YUV_FIX)) / float(1 << YUV_FIX)).astype(np.float32)

    ch, cw = (h + 1) // 2, (w + 1) // 2

    wgt = _fancy_adjoint_weights(h, w, ch, cw)

    def refine(c_init, target):
        c = c_init[:ch, :cw].astype(np.float32)
        for _ in range(iters):
            res = target - _fancy_upsample_f(c, h, w)
            c = c + _fancy_adjoint(res, ch, cw) / wgt
        return np.clip(np.round(c), 0, 255).astype(np.uint8)

    u = refine(u0, u_full)
    v = refine(v0, v_full)

    mbw = (w + 15) // 16
    mbh = (h + 15) // 16

    def pad(plane, ph, pw):
        out = np.empty((ph, pw), np.uint8)
        sh, sw = plane.shape
        out[:sh, :sw] = plane
        if sw < pw:
            out[:sh, sw:] = plane[:, sw - 1 : sw]
        if sh < ph:
            out[sh:, :] = out[sh - 1 : sh, :]
        return out

    return y, pad(u, mbh * 8, mbw * 8), pad(v, mbh * 8, mbw * 8)


def gray_to_yuv420(gray: np.ndarray):
    """L8/LA8 path: luma copied directly, chroma flat 127 (yuv.rs:806-847)."""
    h, w = gray.shape[:2]
    mbw = (w + 15) // 16
    mbh = (h + 15) // 16
    y = np.empty((mbh * 16, mbw * 16), np.uint8)
    y[:h, :w] = gray if gray.ndim == 2 else gray[:, :, 0]
    y[:h, w:] = y[:h, w - 1 : w]
    y[h:, :] = y[h - 1 : h, :]
    u = np.full((mbh * 8, mbw * 8), 127, np.uint8)
    return y, u, u.copy()
