"""Lane-aligned wavefront VP8 loop filter, v2.

Same restructuring as `wavefront2.py`: at step t, row r filters MB
(x = t - 2r, r); all cross-row/cross-step dataflow is carried by small ring
buffers indexed by t mod 3 and static shifts along the row axis, so each step
is a fixed sequence of dense [R, B, ...] vector ops.  Every op is
Pallas-TPU-lowerable (static slices, concats, selects — no scatter, no
dynamic_slice on values, no transposes: edge windows are handled as tuples of
8 pixel-lane tensors).  Runs under `lax.scan` or inside a Pallas grid.

Filter math mirrors `webp_tpu.ops.loopfilter` (RFC 6386 §15.2-15.3; reference
`/root/reference/src/decoder/loop_filter.rs`, ordering
`/root/reference/src/decoder/vp8.rs:1188-1343`).

Dataflow facts (verified against the per-MB patch filter in
`jax_loopfilter.py`):
  - filter(x, y) reads a 20x20 patch: its own 16x16 recon + 4 rows above
    (cols 0..15 post filter(x, y-1) and filter(x+1, y-1)) + 4 cols left
    (rows 0..15 post filter(x-1, y)); the 4x4 top-left corner is never read.
  - filter(x, y) writes: its own block, 3 rows above, 3 cols left.
  - final pixels of MB (x, y): center from filter(x, y), cols 13..15 from
    filter(x+1, y) (its left margin), rows 13..15 from filter(x, y+1) (its
    top margin, which already includes filter(x+1, y)'s corner writes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .wavefront2 import (
    make_schedule_gather,
    schedule_mb_data,
    _shift_down_rows,
    ring_read,
    ring_write,
)


def _s(v):
    return v - 128


def _c(v):
    return jnp.clip(v, -128, 127)


def _u(v):
    return _c(v) + 128


# Edge windows are tuples of 8 tensors (p3 p2 p1 p0 q0 q1 q2 q3), each of
# shape [R, B, L]; thresholds/masks are [R, B, 1] and broadcast over L.

def _simple_threshold(c, limit):
    return (jnp.abs(c[3] - c[4]) * 2 + jnp.abs(c[2] - c[5]) // 2) <= limit


def _should_filter(c, interior, edge_limit):
    ok = _simple_threshold(c, edge_limit)
    for a, b in ((0, 1), (1, 2), (2, 3), (7, 6), (6, 5), (5, 4)):
        ok &= jnp.abs(c[a] - c[b]) <= interior
    return ok


def _hev(c, threshold):
    return (jnp.abs(c[2] - c[3]) > threshold) | (jnp.abs(c[5] - c[4]) > threshold)


def _common_adjust(c, use_outer, mask):
    p1, p0, q0, q1 = _s(c[2]), _s(c[3]), _s(c[4]), _s(c[5])
    outer = jnp.where(use_outer, _c(p1 - q1), 0)
    a = _c(outer + 3 * (q0 - p0))
    b = _c(a + 3) >> 3
    a4 = _c(a + 4) >> 3
    c[4] = jnp.where(mask, _u(q0 - a4), c[4])
    c[3] = jnp.where(mask, _u(p0 + b), c[3])
    return a4


def _filter_window(c, kind, hev_t, interior, limit, enabled, simple):
    """c: list of 8 [R, B, L] tensors; params [R, B, 1]. Returns new list."""
    c = list(c)
    if simple:
        mask = _simple_threshold(c, limit) & enabled
        _common_adjust(c, jnp.bool_(True), mask)
        return c
    mask = _should_filter(c, interior, limit) & enabled
    hv = _hev(c, hev_t)
    if kind == "mb":
        wide = mask & ~hv
        p2, p1, p0 = _s(c[1]), _s(c[2]), _s(c[3])
        q0, q1, q2 = _s(c[4]), _s(c[5]), _s(c[6])
        wv = _c(_c(p1 - q1) + 3 * (q0 - p0))
        a0 = _c((27 * wv + 63) >> 7)
        a1 = _c((18 * wv + 63) >> 7)
        a2 = _c((9 * wv + 63) >> 7)
        c[4] = jnp.where(wide, _u(q0 - a0), c[4])
        c[3] = jnp.where(wide, _u(p0 + a0), c[3])
        c[5] = jnp.where(wide, _u(q1 - a1), c[5])
        c[2] = jnp.where(wide, _u(p1 + a1), c[2])
        c[6] = jnp.where(wide, _u(q2 - a2), c[6])
        c[1] = jnp.where(wide, _u(p2 + a2), c[1])
        _common_adjust(c, jnp.bool_(True), mask & hv)
    else:
        a = _common_adjust(c, hv, mask)
        a1 = (a + 1) >> 1
        outer = mask & ~hv
        q1, p1 = _s(c[5]), _s(c[2])
        c[5] = jnp.where(outer, _u(q1 - a1), c[5])
        c[2] = jnp.where(outer, _u(p1 + a1), c[2])
    return c


def _filter_patch(patch, n: int, has_left, has_top, level, interior, hev_t,
                  do_sub, simple):
    """Filter one bordered patch stack.

    patch [R, B, n+4, n+4]: MB pixels at [4:, 4:], 4 margin rows/cols.
    n = 16 (luma) or 8 (chroma). has_left/has_top [R] bool. Params [R, B].
    """
    on = level > 0
    mb_lim = ((level + 2) * 2 + interior)[..., None]
    sub_lim = (level * 2 + interior)[..., None]
    hv_t = hev_t[..., None]
    intr = interior[..., None]
    en_left = (has_left & on)[..., None]   # has_left [R,1] x on [R,B]
    en_top = (has_top & on)[..., None]
    en_sub = (on & do_sub)[..., None]

    # NB: boundary edges (col/row == 4, or touching the patch's far side)
    # would make the flanking concat pieces zero-size — legal in XLA but not
    # in Mosaic (Pallas TPU), so empty pieces are skipped statically.

    def v_edge(p, col, kind, lim, en):
        c = [p[:, :, 4:, col - 4 + k] for k in range(8)]
        c = _filter_window(c, kind, hv_t, intr, lim, en, simple)
        block = jnp.concatenate([x[..., None] for x in c], axis=-1)
        mid = jnp.concatenate([p[:, :, :4, col - 4 : col + 4], block], axis=-2)
        pieces = []
        if col > 4:
            pieces.append(p[:, :, :, : col - 4])
        pieces.append(mid)
        if col + 4 < p.shape[-1]:
            pieces.append(p[:, :, :, col + 4 :])
        return jnp.concatenate(pieces, axis=-1) if len(pieces) > 1 else mid

    def h_edge(p, row, kind, lim, en):
        c = [p[:, :, row - 4 + k, 4:] for k in range(8)]
        c = _filter_window(c, kind, hv_t, intr, lim, en, simple)
        block = jnp.concatenate([x[..., None, :] for x in c], axis=-2)
        rows = jnp.concatenate([p[:, :, row - 4 : row + 4, :4], block], axis=-1)
        pieces = []
        if row > 4:
            pieces.append(p[:, :, : row - 4])
        pieces.append(rows)
        if row + 4 < p.shape[-2]:
            pieces.append(p[:, :, row + 4 :])
        return jnp.concatenate(pieces, axis=-2) if len(pieces) > 1 else rows

    patch = v_edge(patch, 4, "mb", mb_lim, en_left)
    for col in range(8, n + 3, 4):
        patch = v_edge(patch, col, "sub", sub_lim, en_sub)
    patch = h_edge(patch, 4, "mb", mb_lim, en_top)
    for row in range(8, n + 3, 4):
        patch = h_edge(patch, row, "sub", sub_lim, en_sub)
    return patch


def filter_init_state(mbh: int, batch: int, simple: bool, dtype=jnp.int32):
    R, B = mbh, batch
    st = dict(
        fl_y=jnp.zeros((R, B, 16, 4), dtype),
        fb_y=jnp.zeros((3, R, B, 4, 20), dtype),
        em_y=jnp.zeros((3, R, B, 16, 16), dtype),
    )
    if not simple:
        for c in ("u", "v"):
            st[f"fl_{c}"] = jnp.zeros((R, B, 8, 4), dtype)
            st[f"fb_{c}"] = jnp.zeros((3, R, B, 4, 12), dtype)
            st[f"em_{c}"] = jnp.zeros((3, R, B, 8, 8), dtype)
    return st


def _shift_up_rows(a):
    """Row r receives row r+1's value; last row receives zeros."""
    return jnp.concatenate([a[1:], jnp.zeros_like(a[:1])], axis=0)


def filter_step(state, t, recon_y, recon_u, recon_v, level, interior, hev_t,
                do_sub, mbw: int, simple: bool,
                shift=None, shift_up=None, row0=0, r_total=None):
    """One filter wavefront step; emits final blocks of diag t-2.

    recon_* [R, B, n, n] int32 recon of MB (t-2r, r); params [R, B].
    Returns (new_state, outs): (out_y,) if simple else (out_y, out_u, out_v),
    the final pixels of diag t-2.

    `shift`/`shift_up`/`row0`/`r_total` support band sharding over the row
    axis (neighbor-shard boundary rows via ppermute, global row indexing).
    """
    if shift is None:
        shift = _shift_down_rows
    if shift_up is None:
        shift_up = _shift_up_rows
    R, B = level.shape
    if r_total is None:
        r_total = R
    # Masks from 2-D int32 (Mosaic cannot reshape 1-D bool vectors).
    rows = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0) + row0
    x = t - 2 * rows                      # [R, 1]
    valid = (x >= 0) & (x < mbw)          # [R, 1]
    row0_mask = rows == 0
    s0 = t % 3
    s1 = (t + 2) % 3
    s2 = (t + 1) % 3

    new_state = dict(state)
    outs = []
    planes = (("y", 16, recon_y),)
    if not simple:  # simple filter touches luma only; chroma passes through
        planes += (("u", 8, recon_u), ("v", 8, recon_v))
    for plane, n, recon in planes:
        fl = state[f"fl_{plane}"]                    # [R, B, n, 4]
        top4 = shift(ring_read(state[f"fb_{plane}"], s2))  # [R,B,4,n+4]
        corner = jnp.zeros((R, B, 4, 4), recon.dtype)
        top_row = jnp.concatenate([corner, top4[..., 4:]], axis=-1)  # never-read corner
        body = jnp.concatenate([fl, recon], axis=-1)                 # [R,B,n,n+4]
        patch = jnp.concatenate([top_row, body], axis=-2)            # [R,B,n+4,n+4]

        patch = _filter_patch(
            patch, n, x > 0, ~row0_mask, level, interior, hev_t, do_sub, simple
        )

        vmask = valid[:, :, None, None]          # [R, 1, 1, 1]
        upd = (valid & (x > 0))[:, :, None, None]

        # Bottom-rows ring: slot s0 <- this patch's bottom 4 rows; the left
        # margin writes also update the previous entry's cols 12..15.
        fb = state[f"fb_{plane}"]
        fb = ring_write(fb, s0, jnp.where(vmask, patch[:, :, n:, :], ring_read(fb, s0)))
        prev = ring_read(fb, s1)
        prev_upd = jnp.concatenate(
            [prev[..., :n], jnp.where(upd, patch[:, :, n:, :4], prev[..., n:])],
            axis=-1,
        )
        fb = ring_write(fb, s1, prev_upd)
        new_state[f"fb_{plane}"] = fb

        # Emission ring: s0 <- center; s1 cols n-3..n-1 <- left margin;
        # s2 rows n-3..n-1 <- row r+1's top margin (same x column), then emit.
        em = state[f"em_{plane}"]
        em = ring_write(em, s0, jnp.where(vmask, patch[:, :, 4:, 4:], ring_read(em, s0)))
        e1 = ring_read(em, s1)
        e1 = jnp.concatenate(
            [e1[..., : n - 3], jnp.where(upd, patch[:, :, 4:, 1:4], e1[..., n - 3 :])],
            axis=-1,
        )
        em = ring_write(em, s1, e1)
        below = shift_up(patch[:, :, 1:4, 4:])    # [R, B, 3, n]
        # Row r+1's MB this step is at x - 2; it must exist and be in-frame.
        below_valid = (rows < r_total - 1) & (x - 2 >= 0) & (x - 2 < mbw)  # [R, 1]
        e2 = ring_read(em, s2)
        e2 = jnp.concatenate(
            [e2[..., : n - 3, :],
             jnp.where(below_valid[:, :, None, None], below, e2[..., n - 3 :, :])],
            axis=-2,
        )
        em = ring_write(em, s2, e2)
        new_state[f"em_{plane}"] = em
        outs.append(e2)

        new_state[f"fl_{plane}"] = jnp.where(vmask, patch[:, :, 4:, n:], fl)

    return new_state, tuple(outs)


@functools.partial(jax.jit, static_argnames=("mbw", "mbh", "simple"))
def loop_filter_frames_v2(ybuf, ubuf, vbuf, level, interior, hev_t, do_sub,
                          mbw: int, mbh: int, simple: bool):
    """Batched lane-aligned loop filter over whole planes.

    ybuf [B, mbh*16, mbw*16], ubuf/vbuf [B, mbh*8, mbw*8] (uint8 or int32);
    level/interior/hev_t [B, nmb] int32, do_sub [B, nmb] bool.
    Returns filtered (y, u, v) uint8.
    """
    B = ybuf.shape[0]
    T, idx = make_schedule_gather(mbw, mbh)

    def plane_blocks(p, n):
        # [B, mbh*n, mbw*n] -> [B, nmb, n, n] -> scheduled [T, R, B, n, n]
        blocks = (
            p.reshape(B, mbh, n, mbw, n)
            .transpose(0, 1, 3, 2, 4)
            .reshape(B, mbh * mbw, n, n)
            .astype(jnp.int32)
        )
        return schedule_mb_data(blocks, idx)

    ys = plane_blocks(ybuf, 16)
    us = plane_blocks(ubuf, 8)
    vs = plane_blocks(vbuf, 8)
    lv = schedule_mb_data(level.astype(jnp.int32), idx)
    it = schedule_mb_data(interior.astype(jnp.int32), idx)
    hv = schedule_mb_data(hev_t.astype(jnp.int32), idx)
    ds = schedule_mb_data(do_sub, idx)

    # Two trailing flush steps so every diag is emitted (emit lag = 2).
    def pad2(a):
        pad = jnp.zeros((2,) + a.shape[1:], a.dtype)
        return jnp.concatenate([a, pad], axis=0)

    state = filter_init_state(mbh, B, simple)

    def step(state, inp):
        t, ry, ru, rv, l, i, h, d = inp
        return filter_step(state, t, ry, ru, rv, l, i, h, d, mbw, simple)

    _, outs = jax.lax.scan(
        step,
        state,
        (jnp.arange(T + 2), pad2(ys), pad2(us), pad2(vs), pad2(lv), pad2(it),
         pad2(hv), pad2(ds)),
    )

    from .wavefront2 import assemble_plane_v2

    def assemble(stacked, n):
        # MB (x, y) emitted at step x + 2y + 2 -> drop the first 2 steps.
        return assemble_plane_v2(stacked[2:], mbw, mbh, n).astype(jnp.uint8)

    if simple:
        return assemble(outs[0], 16), ubuf.astype(jnp.uint8), vbuf.astype(jnp.uint8)
    return assemble(outs[0], 16), assemble(outs[1], 8), assemble(outs[2], 8)
