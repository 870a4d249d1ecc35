"""Wavefront intra-prediction / reconstruction on device (JAX).

VP8 reconstruction is a raster dependency: MB (x, y) needs reconstructed
pixels from (x-1, y), (x, y-1) and (x+1, y-1). Those dependencies admit the
anti-diagonal schedule t = x + 2y, so the whole frame reconstructs in
mbw + 2*mbh - 1 steps, each step a batched kernel over the diagonal's
macroblocks (and over the image batch dimension via vmap).

All arithmetic matches `webp_tpu.ops.predict` (RFC 6386 §12.2/12.3) exactly in
int32; bit-exactness vs the numpy scalar path is enforced by
`tests/test_wavefront.py`.

State carried across steps:
  ybuf   [mbh*16, mbw*16]  reconstructed luma
  u/vbuf [mbh*8,  mbw*8]   reconstructed chroma
  top_y  [mbw*16 + 4]      bottom row of the newest MB per column (+TR tail)
  left_y [mbh, 17]         per-row left border (corner + 16 right-edge px)
  top_u/v, left_u/v        chroma equivalents
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _avg3(a, b, c):
    return (a + 2 * b + c + 2) >> 2


def _avg2(a, b):
    return (a + b + 1) >> 1


def _clip255(v):
    return jnp.clip(v, 0, 255)


# -- 4x4 B-mode predictors ---------------------------------------------------
# Each takes the [5, 9] int32 patch: row 0 = top border (tl + a0..a7),
# column 0 = left border; returns the predicted 4x4.

def _b_dc(p):
    v = 4 + p[0, 1:5].sum() + p[1:5, 0].sum()
    return jnp.full((4, 4), v >> 3)


def _b_tm(p):
    return _clip255(p[1:5, 0:1] + p[0:1, 1:5] - p[0, 0])


def _b_ve(p):
    e = p[0, 0:6]
    row = _avg3(e[:4], e[1:5], e[2:6])
    return jnp.broadcast_to(row, (4, 4))


def _b_he(p):
    l = p[:, 0]  # tl, l0..l3
    col = jnp.stack(
        [
            _avg3(l[0], l[1], l[2]),
            _avg3(l[1], l[2], l[3]),
            _avg3(l[2], l[3], l[4]),
            _avg3(l[3], l[4], l[4]),
        ]
    )
    return jnp.broadcast_to(col[:, None], (4, 4))


def _b_ld(p):
    a = p[0, 1:9]
    a_ext = jnp.concatenate([a, a[7:8]])
    avgs = _avg3(a_ext[:7], a_ext[1:8], a_ext[2:9])
    return jnp.stack([avgs[i : i + 4] for i in range(4)])


def _edges(p):
    """e0..e8 = left pixels bottom-up, corner, top pixels left-to-right."""
    return jnp.concatenate([p[1:5, 0][::-1], p[0, 0:5]])


def _b_rd(p):
    e = _edges(p)
    avgs = _avg3(e[:7], e[1:8], e[2:9])
    return jnp.stack([avgs[3 - i : 7 - i] for i in range(4)])


def _b_vr(p):
    e = _edges(p)
    a3 = lambda i: _avg3(e[i], e[i + 1], e[i + 2])
    a2 = lambda i: _avg2(e[i], e[i + 1])
    return jnp.stack(
        [
            jnp.stack([a2(4), a2(5), a2(6), a2(7)]),
            jnp.stack([a3(3), a3(4), a3(5), a3(6)]),
            jnp.stack([a3(2), a2(4), a2(5), a2(6)]),
            jnp.stack([a3(1), a3(3), a3(4), a3(5)]),
        ]
    )


def _b_vl(p):
    a = p[0, 1:9]
    a3 = lambda i: _avg3(a[i], a[i + 1], a[i + 2])
    a2 = lambda i: _avg2(a[i], a[i + 1])
    return jnp.stack(
        [
            jnp.stack([a2(0), a2(1), a2(2), a2(3)]),
            jnp.stack([a3(0), a3(1), a3(2), a3(3)]),
            jnp.stack([a2(1), a2(2), a2(3), a3(4)]),
            jnp.stack([a3(1), a3(2), a3(3), a3(5)]),
        ]
    )


def _b_hd(p):
    e = _edges(p)
    a3 = lambda i: _avg3(e[i], e[i + 1], e[i + 2])
    a2 = lambda i: _avg2(e[i], e[i + 1])
    return jnp.stack(
        [
            jnp.stack([a2(3), a3(3), a3(4), a3(5)]),
            jnp.stack([a2(2), a3(2), a2(3), a3(3)]),
            jnp.stack([a2(1), a3(1), a2(2), a3(2)]),
            jnp.stack([a2(0), a3(0), a2(1), a3(1)]),
        ]
    )


def _b_hu(p):
    l = p[1:5, 0]
    a3 = lambda i, j, k: _avg3(l[i], l[j], l[k])
    a2 = lambda i, j: _avg2(l[i], l[j])
    return jnp.stack(
        [
            jnp.stack([a2(0, 1), a3(0, 1, 2), a2(1, 2), a3(1, 2, 3)]),
            jnp.stack([a2(1, 2), a3(1, 2, 3), a2(2, 3), a3(2, 3, 3)]),
            jnp.stack([a2(2, 3), a3(2, 3, 3), l[3], l[3]]),
            jnp.stack([l[3], l[3], l[3], l[3]]),
        ]
    )


_B_PREDICTORS = (_b_dc, _b_tm, _b_ve, _b_he, _b_ld, _b_rd, _b_vr, _b_vl, _b_hd, _b_hu)


def _predict_b_all(patch):
    """All 10 B-mode predictions from a [5, 9] patch -> [10, 4, 4]."""
    return jnp.stack([f(patch) for f in _B_PREDICTORS])


# -- whole-block predictors --------------------------------------------------

def _predict_whole(ws, size, mode, has_above, has_left):
    """DC/V/H/TM prediction of the size x size block from ws borders."""
    top = ws[0, 1 : 1 + size]
    left = ws[1 : 1 + size, 0]
    corner = ws[0, 0]

    shf = (2 if size == 8 else 3) + has_above.astype(jnp.int32) + has_left.astype(jnp.int32)
    total = jnp.where(has_left, left.sum(), 0) + jnp.where(has_above, top.sum(), 0)
    dc = jnp.where(
        has_above | has_left, (total + (1 << (shf - 1) >> 0)) >> shf, 128
    )
    dc_blk = jnp.full((size, size), 1, jnp.int32) * dc
    v_blk = jnp.broadcast_to(top, (size, size))
    h_blk = jnp.broadcast_to(left[:, None], (size, size))
    tm_blk = _clip255(left[:, None] + top[None, :] - corner)
    return jnp.select(
        [mode == 0, mode == 1, mode == 2],
        [dc_blk, v_blk, h_blk],
        tm_blk,
    )


# -- per-MB reconstruction ---------------------------------------------------

def _build_ws_luma(mbx, mby, mbw, top_y, left_row):
    """Assemble the [17, 21] bordered workspace (create_border_luma)."""
    # Top border: 20 px from the padded top_y row (+4 TR tail appended).
    seg = jax.lax.dynamic_slice(top_y, (mbx * 16,), (20,))
    top20 = jnp.where(mby == 0, jnp.full(20, 127, jnp.int32), seg)
    corner = jnp.where(
        mby == 0, 127, jnp.where(mbx == 0, 129, left_row[0])
    )
    left16 = jnp.where(mbx == 0, jnp.full(16, 129, jnp.int32), left_row[1:17])

    ws = jnp.zeros((17, 21), jnp.int32)
    ws = ws.at[0, 1:21].set(top20)
    ws = ws.at[0, 0].set(corner)
    ws = ws.at[1:17, 0].set(left16)
    # TR replication rows for I4 (rows 4/8/12 mirror row 0's TR pixels).
    for r in (4, 8, 12):
        ws = ws.at[r, 17:21].set(top20[16:20])
    return ws


def _build_ws_chroma(mbx, mby, top_c, left_row):
    seg = jax.lax.dynamic_slice(top_c, (mbx * 8,), (8,))
    top8 = jnp.where(mby == 0, jnp.full(8, 127, jnp.int32), seg)
    corner = jnp.where(mby == 0, 127, jnp.where(mbx == 0, 129, left_row[0]))
    left8 = jnp.where(mbx == 0, jnp.full(8, 129, jnp.int32), left_row[1:9])
    ws = jnp.zeros((9, 9), jnp.int32)
    ws = ws.at[0, 1:9].set(top8)
    ws = ws.at[0, 0].set(corner)
    ws = ws.at[1:9, 0].set(left8)
    return ws


def _recon_luma_mb(ws, luma_mode, bpred, res_y, mbx, mby):
    """Reconstruct one luma MB; returns the filled [17, 21] workspace."""
    is_b = luma_mode == 4

    # Whole-MB path: predict then add residue.
    pred16 = _predict_whole(ws, 16, jnp.minimum(luma_mode, 3), mby != 0, mbx != 0)
    res16 = (
        res_y.reshape(4, 4, 4, 4).transpose(0, 2, 1, 3).reshape(16, 16)
    )
    recon16 = _clip255(pred16 + res16)

    # B path: 16 sequential subblocks over the workspace.
    def sub_step(i, ws_b):
        sby = i // 4
        sbx = i % 4
        y0 = sby * 4 + 1
        x0 = sbx * 4 + 1
        patch = jax.lax.dynamic_slice(ws_b, (y0 - 1, x0 - 1), (5, 9))
        pred = _predict_b_one(patch, bpred[i])
        blk = _clip255(pred + res_y[i].reshape(4, 4))
        return jax.lax.dynamic_update_slice(ws_b, blk, (y0, x0))

    ws_b = jax.lax.fori_loop(0, 16, sub_step, ws)

    ws_out = jnp.where(is_b, ws_b[1:17, 1:17], recon16)
    return ws.at[1:17, 1:17].set(ws_out)


def _recon_chroma_mb(ws, mode, res_c, mbx, mby):
    pred = _predict_whole(ws, 8, mode, mby != 0, mbx != 0)
    res8 = res_c.reshape(2, 2, 4, 4).transpose(0, 2, 1, 3).reshape(8, 8)
    return ws.at[1:9, 1:9].set(_clip255(pred + res8))


# -- full-frame scan ---------------------------------------------------------

def diagonal_schedule(mbw: int, mbh: int):
    """Static (T, D) arrays of (x, y) per diagonal step with validity mask."""
    T = mbw + 2 * (mbh - 1)
    D = min(mbh, (mbw + 1) // 2 + 1)
    xs = np.zeros((T, D), np.int32)
    ys = np.zeros((T, D), np.int32)
    valid = np.zeros((T, D), bool)
    for t in range(T):
        lane = 0
        for y in range(mbh):
            x = t - 2 * y
            if 0 <= x < mbw:
                xs[t, lane] = x
                ys[t, lane] = y
                valid[t, lane] = True
                lane += 1
    return jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(valid)


@functools.lru_cache(maxsize=None)
def inverse_schedule(mbw: int, mbh: int):
    """Static (t, lane) of each MB in raster order — lets per-step outputs be
    stacked by the scan and assembled afterwards with one static-index gather
    instead of per-step plane scatters (TPU scatters are slow)."""
    T = mbw + 2 * (mbh - 1)
    t_of = np.zeros(mbw * mbh, np.int32)
    lane_of = np.zeros(mbw * mbh, np.int32)
    for t in range(T):
        lane = 0
        for y in range(mbh):
            x = t - 2 * y
            if 0 <= x < mbw:
                t_of[y * mbw + x] = t
                lane_of[y * mbw + x] = lane
                lane += 1
    # numpy (not jnp): this cache may be populated inside a trace, and cached
    # tracers would leak across jit calls.
    return t_of, lane_of


def assemble_plane(stacked, mbw: int, mbh: int, size: int):
    """[T, D, size, size] per-step MB outputs -> [mbh*size, mbw*size] plane."""
    t_of, lane_of = inverse_schedule(mbw, mbh)
    mbs = stacked[t_of, lane_of]
    return (
        mbs.reshape(mbh, mbw, size, size)
        .transpose(0, 2, 1, 3)
        .reshape(mbh * size, mbw * size)
    )


@functools.partial(jax.jit, static_argnames=("mbw", "mbh"))
def reconstruct_frame(residuals, luma_mode, bpred, chroma_mode, mbw: int, mbh: int):
    """Reconstruct Y/U/V planes from per-MB residuals and modes.

    residuals: [nmb, 24, 16] int32 (IDCT output), block order 16Y+4U+4V.
    Returns (ybuf [mbh*16, mbw*16], ubuf, vbuf [mbh*8, mbw*8]) as uint8.
    """
    xs, ys, valid = diagonal_schedule(mbw, mbh)
    T, D = xs.shape

    state = dict(
        top_y=jnp.full(((mbw * 16) + 4,), 127, jnp.int32),
        top_u=jnp.full((mbw * 8 + 4,), 127, jnp.int32),
        top_v=jnp.full((mbw * 8 + 4,), 127, jnp.int32),
        left_y=jnp.full((mbh, 17), 129, jnp.int32),
        left_u=jnp.full((mbh, 9), 129, jnp.int32),
        left_v=jnp.full((mbh, 9), 129, jnp.int32),
    )

    def mb_kernel(x, y, top_y, top_u, top_v, left_y_row, left_u_row, left_v_row, res, lmode, bp, cmode):
        ws = _build_ws_luma(x, y, mbw, top_y, left_y_row)
        ws = _recon_luma_mb(ws, lmode, bp, res[:16], x, y)
        uws = _build_ws_chroma(x, y, top_u, left_u_row)
        uws = _recon_chroma_mb(uws, cmode, res[16:20], x, y)
        vws = _build_ws_chroma(x, y, top_v, left_v_row)
        vws = _recon_chroma_mb(vws, cmode, res[20:24], x, y)

        new_left_y = jnp.concatenate([ws[0:1, 16], ws[1:17, 16]])
        new_left_u = jnp.concatenate([uws[0:1, 8], uws[1:9, 8]])
        new_left_v = jnp.concatenate([vws[0:1, 8], vws[1:9, 8]])
        return (
            ws[1:17, 1:17],
            uws[1:9, 1:9],
            vws[1:9, 1:9],
            new_left_y,
            new_left_u,
            new_left_v,
        )

    def step(state, inputs):
        x, y, ok = inputs
        idx = y * mbw + x
        res = residuals[idx]
        lmode = luma_mode[idx]
        bp = bpred[idx]
        cmode = chroma_mode[idx]

        out = jax.vmap(
            mb_kernel,
            in_axes=(0, 0, None, None, None, 0, 0, 0, 0, 0, 0, 0),
        )(
            x,
            y,
            state["top_y"],
            state["top_u"],
            state["top_v"],
            state["left_y"][y],
            state["left_u"][y],
            state["left_v"][y],
            res,
            lmode,
            bp,
            cmode,
        )
        yblk, ublk, vblk, nly, nlu, nlv = out

        ox = jnp.where(ok, x, mbw + 10)  # out of bounds -> dropped
        oy = jnp.where(ok, y, mbh + 10)
        r16 = jnp.arange(16)
        r8 = jnp.arange(8)
        state = dict(state)

        # Top borders: bottom row of each reconstructed MB.
        state["top_y"] = state["top_y"].at[
            ox[:, None] * 16 + r16[None, :]
        ].set(yblk[:, 15, :], mode="drop")
        state["top_u"] = state["top_u"].at[ox[:, None] * 8 + r8[None, :]].set(
            ublk[:, 7, :], mode="drop"
        )
        state["top_v"] = state["top_v"].at[ox[:, None] * 8 + r8[None, :]].set(
            vblk[:, 7, :], mode="drop"
        )
        # Replicate last luma pixel into the 4-px TR tail when the last
        # column was just written (create_border_luma edge rule).
        is_last = ok & (x == mbw - 1)
        tail_val = jnp.where(is_last.any(), yblk[jnp.argmax(is_last), 15, 15], state["top_y"][mbw * 16 - 1])
        wrote_last = is_last.any()
        tail = jnp.where(wrote_last, jnp.full(4, tail_val), state["top_y"][mbw * 16 :])
        state["top_y"] = state["top_y"].at[mbw * 16 :].set(tail)

        # Left borders per row.
        state["left_y"] = state["left_y"].at[oy].set(nly, mode="drop")
        state["left_u"] = state["left_u"].at[oy].set(nlu, mode="drop")
        state["left_v"] = state["left_v"].at[oy].set(nlv, mode="drop")
        return state, (yblk, ublk, vblk)

    state, (sy, su, sv) = jax.lax.scan(step, state, (xs, ys, valid))
    return (
        assemble_plane(sy, mbw, mbh, 16).astype(jnp.uint8),
        assemble_plane(su, mbw, mbh, 8).astype(jnp.uint8),
        assemble_plane(sv, mbw, mbh, 8).astype(jnp.uint8),
    )


# -- matrix-form B predictors ------------------------------------------------
# Every 4x4 predictor output is an average with denominator 8 of border
# pixels (avg2 = (4a+4b+4)>>3, avg3 = (2a+4b+2c+4)>>3, DC = (sum+4)>>3,
# copy = 8a>>3, TM = (8l+8a-8tl)>>3 then clip), so all 10 modes evaluate as a
# single [13] x [13, 160] integer matmul + round + shift — MXU/VPU-shaped
# instead of hundreds of scalar stacks. Border vector layout:
#   b = [tl, a0..a7, l0..l3].

def _build_bpred_matrix():
    W = np.zeros((13, 160), np.int32)
    r = np.zeros(160, np.int32)
    TL, A, L = 0, 1, 9

    def out(mode, y, x):
        return mode * 16 + y * 4 + x

    def avg3(o, i, j, k):
        W[i, o] += 2
        W[j, o] += 4
        W[k, o] += 2
        r[o] = 4

    def avg2(o, i, j):
        W[i, o] += 4
        W[j, o] += 4
        r[o] = 4

    def copy(o, i):
        W[i, o] += 8

    # DC
    for y in range(4):
        for x in range(4):
            o = out(0, y, x)
            for i in range(4):
                W[A + i, o] += 1
                W[L + i, o] += 1
            r[o] = 4
    # TM: clip(l + a - tl)
    for y in range(4):
        for x in range(4):
            o = out(1, y, x)
            W[L + y, o] += 8
            W[A + x, o] += 8
            W[TL, o] -= 8
    # VE: avg3 over (tl,a0..a4) sliding
    ve = [(TL, A, A + 1), (A, A + 1, A + 2), (A + 1, A + 2, A + 3), (A + 2, A + 3, A + 4)]
    for y in range(4):
        for x in range(4):
            avg3(out(2, y, x), *ve[x])
    # HE
    he = [(TL, L, L + 1), (L, L + 1, L + 2), (L + 1, L + 2, L + 3), (L + 2, L + 3, L + 3)]
    for y in range(4):
        for x in range(4):
            avg3(out(3, y, x), *he[y])
    # LD: avgs[i] = avg3(a[i], a[i+1], a[min(i+2,7)]), rows shifted
    for y in range(4):
        for x in range(4):
            i = y + x
            avg3(out(4, y, x), A + i, A + i + 1, A + min(i + 2, 7))
    # RD: edges e0..e8 = l3,l2,l1,l0,tl,a0..a3; avgs[i]=avg3(e[i..i+2]); row y = avgs[3-y..7-y]
    E = [L + 3, L + 2, L + 1, L, TL, A, A + 1, A + 2, A + 3]
    for y in range(4):
        for x in range(4):
            i = 3 - y + x
            avg3(out(5, y, x), E[i], E[i + 1], E[i + 2])
    # VR
    EV = [L + 3, L + 2, L + 1, L, TL, A, A + 1, A + 2, A + 3]
    vr = {
        (0, 0): ("a2", 4), (0, 1): ("a2", 5), (0, 2): ("a2", 6), (0, 3): ("a2", 7),
        (1, 0): ("a3", 3), (1, 1): ("a3", 4), (1, 2): ("a3", 5), (1, 3): ("a3", 6),
        (2, 0): ("a3", 2), (2, 1): ("a2", 4), (2, 2): ("a2", 5), (2, 3): ("a2", 6),
        (3, 0): ("a3", 1), (3, 1): ("a3", 3), (3, 2): ("a3", 4), (3, 3): ("a3", 5),
    }
    for (y, x), (kind, i) in vr.items():
        o = out(6, y, x)
        if kind == "a2":
            avg2(o, EV[i], EV[i + 1])
        else:
            avg3(o, EV[i], EV[i + 1], EV[i + 2])
    # VL
    vl = {
        (0, 0): ("a2", 0), (0, 1): ("a2", 1), (0, 2): ("a2", 2), (0, 3): ("a2", 3),
        (1, 0): ("a3", 0), (1, 1): ("a3", 1), (1, 2): ("a3", 2), (1, 3): ("a3", 3),
        (2, 0): ("a2", 1), (2, 1): ("a2", 2), (2, 2): ("a2", 3), (2, 3): ("a3", 4),
        (3, 0): ("a3", 1), (3, 1): ("a3", 2), (3, 2): ("a3", 3), (3, 3): ("a3", 5),
    }
    for (y, x), (kind, i) in vl.items():
        o = out(7, y, x)
        if kind == "a2":
            avg2(o, A + i, A + i + 1)
        else:
            avg3(o, A + i, A + i + 1, A + i + 2)
    # HD
    hd = {
        (0, 0): ("a2", 3), (0, 1): ("a3", 3), (0, 2): ("a3", 4), (0, 3): ("a3", 5),
        (1, 0): ("a2", 2), (1, 1): ("a3", 2), (1, 2): ("a2", 3), (1, 3): ("a3", 3),
        (2, 0): ("a2", 1), (2, 1): ("a3", 1), (2, 2): ("a2", 2), (2, 3): ("a3", 2),
        (3, 0): ("a2", 0), (3, 1): ("a3", 0), (3, 2): ("a2", 1), (3, 3): ("a3", 1),
    }
    for (y, x), (kind, i) in hd.items():
        o = out(8, y, x)
        if kind == "a2":
            avg2(o, EV[i], EV[i + 1])
        else:
            avg3(o, EV[i], EV[i + 1], EV[i + 2])
    # HU
    hu = {
        (0, 0): ("a2", 0), (0, 1): ("a3", 0), (0, 2): ("a2", 1), (0, 3): ("a3", 1),
        (1, 0): ("a2", 1), (1, 1): ("a3", 1), (1, 2): ("a2", 2), (1, 3): ("a3x", 2),
        (2, 0): ("a2", 2), (2, 1): ("a3x", 2), (2, 2): ("c", 3), (2, 3): ("c", 3),
        (3, 0): ("c", 3), (3, 1): ("c", 3), (3, 2): ("c", 3), (3, 3): ("c", 3),
    }
    for (y, x), (kind, i) in hu.items():
        o = out(9, y, x)
        if kind == "a2":
            avg2(o, L + i, L + i + 1)
        elif kind == "a3":
            avg3(o, L + i, L + i + 1, L + i + 2)
        elif kind == "a3x":  # avg3(l2, l3, l3)
            avg3(o, L + i, L + i + 1, L + i + 1)
        else:
            copy(o, L + i)
    return W, r


_BPRED_W_np, _BPRED_R_np = _build_bpred_matrix()
# numpy on purpose (see ops/token_stats.py: module-level jnp constants can
# bind to a trace when first imported inside a jitted body)
_BPRED_W = _BPRED_W_np
_BPRED_R = _BPRED_R_np


def _predict_b_all_mat(patch):
    """All 10 B-mode predictions from a [5, 9] patch via one matmul."""
    b = jnp.concatenate([patch[0, 0:9], patch[1:5, 0]])
    out = (b @ _BPRED_W + _BPRED_R) >> 3
    return jnp.clip(out, 0, 255).reshape(10, 4, 4)


def _predict_b_one(patch, mode):
    """Single B-mode prediction via a [13]x[13,16] gathered matmul."""
    b = jnp.concatenate([patch[0, 0:9], patch[1:5, 0]])
    W = jnp.asarray(_BPRED_W).reshape(13, 10, 16)[:, mode]
    R = jnp.asarray(_BPRED_R).reshape(10, 16)[mode]
    return jnp.clip((b @ W + R) >> 3, 0, 255).reshape(4, 4)
