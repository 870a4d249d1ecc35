"""Batched VP8L inverse transforms on the device (JAX).

Counterpart of the host reference in ops/vp8l_transforms.py (semantics from
/root/reference/src/decoder/lossless_transform.rs). The host entropy pass
produces the pre-transform pixel tensor; these kernels run the inverse
transforms batched over same-geometry images:

 - subtract-green / color transform / color indexing are embarrassingly
   parallel vector ops.
 - the predictor transform is a 2D recurrence: pixel (x,y) needs the FINAL
   values of its left, top-left, top and top-right neighbors. On the device
   it runs as a lane-aligned "knight move" wavefront: step t computes the
   4-pixel x-group gx = t - 2y for every row y at once (t = gx + 2y), so all
   four neighbors live in the three previous steps (gx-1 at t-1, the row
   above's gx at t-2, gx-1 above at t-3, gx+1 above at t-1) — a 3-deep ring
   of step rows carried through one lax.scan, no dynamic indexing. The 4
   pixels within a group resolve sequentially in-body (the left recurrence),
   which keeps the step count at ceil(w/4) + 2(h-1) instead of w + 2(h-1).

Bit-exactness: all arithmetic is uint8-wraparound adds plus the spec's
avg2 / select / clamp-add-subtract helpers, verified against the numpy
reference on random data and the reference corpus (tests/test_vp8l_device.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_G = 4  # x-group width of the predictor wavefront


def _subsample(size: int, bits: int) -> int:
    return (size + (1 << bits) - 1) >> bits


# ---------------------------------------------------------------------------
# trivially parallel transforms
# ---------------------------------------------------------------------------


def subtract_green(px):
    """[..., 4] uint8 RGBA: add green back into R and B (wrapping)."""
    g = px[..., 1]
    return px.at[..., 0].add(g).at[..., 2].add(g)


def color_transform(px, tf, size_bits: int):
    """Inverse color transform. px [B,h,w,4] uint8, tf [B,bh,bw,4] uint8.

    Per-block deltas (i8(coef) * i8(val)) >> 5 added to R (from G) then to
    B (from G and the new R). Reference: lossless_transform.rs:355-393.
    """
    h, w = px.shape[1:3]
    by = np.arange(h) >> size_bits
    bx = np.arange(w) >> size_bits
    tfx = tf[:, by][:, :, bx].astype(jnp.int8).astype(jnp.int32)  # [B,h,w,4]
    red_to_blue, green_to_blue, green_to_red = tfx[..., 0], tfx[..., 1], tfx[..., 2]

    green = px[..., 1].astype(jnp.int8).astype(jnp.int32)
    red = px[..., 0].astype(jnp.int32) + ((green_to_red * green) >> 5)
    red = red & 0xFF
    blue = px[..., 2].astype(jnp.int32) + ((green_to_blue * green) >> 5)
    blue = blue + ((red_to_blue * red.astype(jnp.int8).astype(jnp.int32)) >> 5)
    return (
        px.at[..., 0].set(red.astype(jnp.uint8))
        .at[..., 2].set((blue & 0xFF).astype(jnp.uint8))
    )


def color_indexing(px, table, table_size: int, final_width: int):
    """Palette expansion. px [B,h,pw,4] (index in green), table [B,256,4].

    Sub-byte packed indices (table_size <= 16) unpack via shifts; indices
    >= table_size decode as transparent black (the table is zero-padded).
    Reference: lossless_transform.rs:402-577.
    """
    B, h, pw = px.shape[:3]
    idx = px[..., 1].astype(jnp.int32)  # [B,h,pw]
    if table_size > 16:
        return jnp.take_along_axis(
            table, idx.reshape(B, -1, 1), axis=1
        ).reshape(B, h, pw, 4)
    w_bits = 3 if table_size <= 2 else (2 if table_size <= 4 else 1)
    px_per_byte = 1 << w_bits
    bits_per_px = 8 >> w_bits
    mask = (1 << bits_per_px) - 1
    x = np.arange(final_width)
    packed_col = x >> w_bits
    shift = jnp.asarray((x & (px_per_byte - 1)) * bits_per_px, jnp.int32)
    sub = (idx[:, :, packed_col] >> shift[None, None, :]) & mask  # [B,h,W]
    return jnp.take_along_axis(
        table, sub.reshape(B, -1, 1), axis=1
    ).reshape(B, h, final_width, 4)


# ---------------------------------------------------------------------------
# predictor transform (wavefront scan)
# ---------------------------------------------------------------------------


def _avg2(a, b):
    a16 = a.astype(jnp.int32)
    b16 = b.astype(jnp.int32)
    return ((a16 + b16) >> 1).astype(jnp.uint8)


def _predict(mode, L, T, TL, TR):
    """All 14 predictor modes, selected per lane. Inputs/output uint8 [..,4]."""
    Li = L.astype(jnp.int32)
    Ti = T.astype(jnp.int32)
    TLi = TL.astype(jnp.int32)
    preds = []
    zero = jnp.zeros_like(L)
    preds.append(zero.at[..., 3].set(255))                      # 0: opaque black
    preds.append(L)                                             # 1
    preds.append(T)                                             # 2
    preds.append(TR)                                            # 3
    preds.append(TL)                                            # 4
    preds.append(_avg2(_avg2(L, TR), T))                        # 5
    preds.append(_avg2(L, TL))                                  # 6
    preds.append(_avg2(L, T))                                   # 7
    preds.append(_avg2(TL, T))                                  # 8
    preds.append(_avg2(T, TR))                                  # 9
    preds.append(_avg2(_avg2(L, TL), _avg2(T, TR)))             # 10
    # 11: select by gradient magnitude
    p = Li + Ti - TLi
    p_left = jnp.abs(p - Li).sum(-1, keepdims=True)
    p_top = jnp.abs(p - Ti).sum(-1, keepdims=True)
    preds.append(jnp.where(p_left < p_top, L, T))               # 11
    preds.append(jnp.clip(Li + Ti - TLi, 0, 255).astype(jnp.uint8))  # 12
    a = (Li + Ti) >> 1
    d = a - TLi
    half = jnp.where(d >= 0, d >> 1, -((-d) >> 1))              # trunc toward 0
    preds.append(jnp.clip(a + half, 0, 255).astype(jnp.uint8))  # 13
    stacked = jnp.stack(preds)                                  # [14, ..., 4]
    sel = jnp.zeros_like(L)
    for m in range(14):
        sel = jnp.where((mode == m)[..., None], stacked[m], sel)
    return sel


@functools.lru_cache(maxsize=32)
def _skew_tables(w: int, h: int):
    """Gather indices for the knight-move skew (group gx = t - 2y)."""
    gw = (w + _G - 1) // _G
    T = gw + 2 * (h - 1)
    t = np.arange(T)[:, None]
    y = np.arange(h)[None, :]
    gx = t - 2 * y                     # [T, h]
    valid = (gx >= 0) & (gx < gw)
    gxc = np.clip(gx, 0, gw - 1)
    return T, gw, gxc.astype(np.int32), valid


def inverse_predictor_batch(px, modes, size_bits: int):
    """Inverse predictor transform. px [B,h,w,4] uint8 (entropy residuals),
    modes [B,bh,bw] uint8 (the predictor image's green channel).

    Returns the reconstructed [B,h,w,4]. Edge semantics per the reference:
    row 0 uses the L predictor (pixel (0,0) adds 0xff alpha), column 0 uses
    the T predictor, the last column's top-right aliases the current row's
    first pixel (lossless_transform.rs:26-76).
    """
    B, h, w = px.shape[:3]
    return _inverse_predictor_jit(px, modes, size_bits, w, h)


@functools.partial(jax.jit, static_argnames=("size_bits", "w", "h"))
def _inverse_predictor_jit(px, modes, size_bits: int, w: int, h: int):
    B = px.shape[0]
    T, gw, gxc, valid = _skew_tables(w, h)
    gxc_j = jnp.asarray(gxc)                                   # [T, h]
    valid_j = jnp.asarray(valid)

    # Pad the image to gw*_G columns and skew both residuals and modes into
    # step-major lanes: res_sk[t, b, y, j] = px[b, y, (t-2y)*G + j].
    pad = gw * _G - w
    pxp = jnp.pad(px, ((0, 0), (0, 0), (0, pad), (0, 0)))
    grp = pxp.reshape(B, h, gw, _G, 4)
    # mode per group: blocks are >= 4 px wide (size_bits >= 2), so a group
    # never straddles a block boundary.
    bx = np.arange(gw) * _G >> size_bits
    by = np.arange(h) >> size_bits
    mode_grid = modes[:, by][:, :, bx]                          # [B, h, gw]

    def skew(a):  # [B, h, gw, ...] -> [T, B, h, ...]
        idx = gxc_j.T.astype(jnp.int32)                         # [h, T]
        ix = idx[None, :, :].reshape(1, h, T, *([1] * (a.ndim - 3)))
        g = jnp.take_along_axis(a, ix, axis=2)                  # [B, h, T, ...]
        return jnp.moveaxis(g, 2, 0)                            # [T, B, h, ...]

    res_sk = skew(grp)                                          # [T,B,h,G,4]
    mode_sk = skew(mode_grid[..., None])[..., 0]                # [T,B,h]

    ty = jnp.arange(h, dtype=jnp.int32)

    def shift_down(a):  # lane y -> value at lane y-1 (row above), row -1 = 0
        return jnp.concatenate([jnp.zeros_like(a[:, :1]), a[:, :-1]], axis=1)

    def step(carry, inp):
        k1, k2, k3, col0 = carry      # [B,h,G,4] x3 rings + [B,h,4] col-0 pixels
        t, res, mode = inp            # res [B,h,G,4], mode [B,h]
        gx = t - 2 * ty               # [h]
        x0 = gx * _G                  # group's first x
        lane_ok = (gx >= 0) & (gx < gw)

        k2u = shift_down(k2)          # row above, same gx
        k3u = shift_down(k3)          # row above, gx-1
        k1u = shift_down(k1)          # row above, gx+1

        out = jnp.zeros_like(res)
        left = k1[:, :, _G - 1]       # final pixel of group gx-1, same row
        for j in range(_G):
            x = x0 + j                # [h]
            Tn = k2u[:, :, j]
            TLn = k3u[:, :, _G - 1] if j == 0 else k2u[:, :, j - 1]
            TRn = k1u[:, :, 0] if j == _G - 1 else k2u[:, :, j + 1]
            # last column's top-right aliases this row's first pixel
            TRn = jnp.where((x == w - 1)[None, :, None], col0, TRn)
            is_row0 = (ty == 0)[None, :]
            is_col0 = (x == 0)[None, :]
            eff_mode = jnp.where(is_row0, 1, jnp.where(is_col0, 2, mode))
            pred = _predict(eff_mode, left, Tn, TLn, TRn)
            # pixel (0,0): opaque-black predictor
            corner = is_row0 & is_col0
            pred = jnp.where(
                corner[..., None],
                jnp.zeros_like(pred).at[..., 3].set(255),
                pred,
            )
            val = res[:, :, j] + pred  # uint8 wrap-add
            ok = (lane_ok & (x >= 0) & (x < w))[None, :, None]
            val = jnp.where(ok, val, 0)
            out = out.at[:, :, j].set(val)
            col0 = jnp.where(((x == 0)[None, :, None]) & ok, val, col0)
            left = val
        return (out, k1, k2, col0), out

    init = (
        jnp.zeros((B, h, _G, 4), jnp.uint8),
        jnp.zeros((B, h, _G, 4), jnp.uint8),
        jnp.zeros((B, h, _G, 4), jnp.uint8),
        jnp.zeros((B, h, 4), jnp.uint8),
    )
    ts = jnp.arange(T, dtype=jnp.int32)
    _, rows = jax.lax.scan(step, init, (ts, res_sk, mode_sk))   # [T,B,h,G,4]

    # Unskew: out[b, y, gx] = rows[gx + 2y, b, y].
    t_idx = jnp.asarray(
        (np.arange(gw)[None, :] + 2 * np.arange(h)[:, None]).astype(np.int32)
    )  # [h, gw]
    moved = jnp.moveaxis(rows, 0, 2)                            # [B, h, T, G, 4]
    gathered = jnp.take_along_axis(
        moved, t_idx[None, :, :, None, None], axis=2
    )                                                           # [B, h, gw, G, 4]
    out = gathered.reshape(B, h, gw * _G, 4)
    return out[:, :, :w]
