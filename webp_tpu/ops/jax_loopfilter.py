"""VP8 loop filtering on device (JAX), wavefront-scheduled.

The filter has the same raster dependency as reconstruction — MB (x, y)'s
edges touch pixels written by (x-1, y), (x, y-1), (x+1, y-1) — so it runs on
the identical anti-diagonal schedule (t = x + 2y). Each step gathers one
margin-padded patch per diagonal MB (20x20 luma, 12x12 chroma), applies the
four edge groups in spec order (left MB edge, vertical subblock edges, top MB
edge, horizontal subblock edges; RFC 6386 §15.2-15.3), and scatters the
patches back. Patches of diagonal-mates are column-disjoint, so the scatter
is race-free.

Filter math is the jnp mirror of `webp_tpu.ops.loopfilter`; exactness is
enforced end-to-end by tests/test_device_decode.py over the golden corpus.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .wavefront import diagonal_schedule


def _s(v):
    return v - 128


def _c(v):
    return jnp.clip(v, -128, 127)


def _u(v):
    return _c(v) + 128


def _simple_threshold(w, limit):
    d0 = jnp.abs(w[:, 3] - w[:, 4])
    d1 = jnp.abs(w[:, 2] - w[:, 5])
    return (d0 * 2 + d1 // 2) <= limit


def _should_filter(w, interior, edge_limit):
    ok = _simple_threshold(w, edge_limit)
    for a, b in ((0, 1), (1, 2), (2, 3), (7, 6), (6, 5), (5, 4)):
        ok &= jnp.abs(w[:, a] - w[:, b]) <= interior
    return ok


def _hev(w, threshold):
    return (jnp.abs(w[:, 2] - w[:, 3]) > threshold) | (jnp.abs(w[:, 5] - w[:, 4]) > threshold)


def _common_adjust(w, use_outer, mask):
    p1, p0, q0, q1 = _s(w[:, 2]), _s(w[:, 3]), _s(w[:, 4]), _s(w[:, 5])
    outer = jnp.where(use_outer, _c(p1 - q1), 0)
    a = _c(outer + 3 * (q0 - p0))
    b = _c(a + 3) >> 3
    a4 = _c(a + 4) >> 3
    w = w.at[:, 4].set(jnp.where(mask, _u(q0 - a4), w[:, 4]))
    w = w.at[:, 3].set(jnp.where(mask, _u(p0 + b), w[:, 3]))
    return w, a4


def _simple_filter(w, edge_limit, enabled):
    mask = _simple_threshold(w, edge_limit) & enabled
    w, _ = _common_adjust(w, jnp.ones(w.shape[0], bool), mask)
    return w


def _subblock_filter(w, hev_t, interior, edge_limit, enabled):
    mask = _should_filter(w, interior, edge_limit) & enabled
    hv = _hev(w, hev_t)
    w, a = _common_adjust(w, hv, mask)
    a1 = (a + 1) >> 1
    outer = mask & ~hv
    q1, p1 = _s(w[:, 5]), _s(w[:, 2])
    w = w.at[:, 5].set(jnp.where(outer, _u(q1 - a1), w[:, 5]))
    w = w.at[:, 2].set(jnp.where(outer, _u(p1 + a1), w[:, 2]))
    return w


def _mb_filter(w, hev_t, interior, edge_limit, enabled):
    mask = _should_filter(w, interior, edge_limit) & enabled
    hv = _hev(w, hev_t)
    wide = mask & ~hv
    p2, p1, p0 = _s(w[:, 1]), _s(w[:, 2]), _s(w[:, 3])
    q0, q1, q2 = _s(w[:, 4]), _s(w[:, 5]), _s(w[:, 6])
    wv = _c(_c(p1 - q1) + 3 * (q0 - p0))
    a0 = _c((27 * wv + 63) >> 7)
    a1 = _c((18 * wv + 63) >> 7)
    a2 = _c((9 * wv + 63) >> 7)
    w = w.at[:, 4].set(jnp.where(wide, _u(q0 - a0), w[:, 4]))
    w = w.at[:, 3].set(jnp.where(wide, _u(p0 + a0), w[:, 3]))
    w = w.at[:, 5].set(jnp.where(wide, _u(q1 - a1), w[:, 5]))
    w = w.at[:, 2].set(jnp.where(wide, _u(p1 + a1), w[:, 2]))
    w = w.at[:, 6].set(jnp.where(wide, _u(q2 - a2), w[:, 6]))
    w = w.at[:, 1].set(jnp.where(wide, _u(p2 + a2), w[:, 1]))
    w, _ = _common_adjust(w, jnp.ones(w.shape[0], bool), mask & hv)
    return w


def _apply_v_edge(patch, col, kind, hev_t, interior, limit, enabled, simple):
    """Filter the vertical edge at static local `col` over the MB's rows."""
    w = patch[4:, col - 4 : col + 4]
    if simple:
        w = _simple_filter(w, limit, enabled)
    elif kind == "mb":
        w = _mb_filter(w, hev_t, interior, limit, enabled)
    else:
        w = _subblock_filter(w, hev_t, interior, limit, enabled)
    return patch.at[4:, col - 4 : col + 4].set(w)


def _apply_h_edge(patch, row, kind, hev_t, interior, limit, enabled, simple):
    w = patch[row - 4 : row + 4, 4:].T
    if simple:
        w = _simple_filter(w, limit, enabled)
    elif kind == "mb":
        w = _mb_filter(w, hev_t, interior, limit, enabled)
    else:
        w = _subblock_filter(w, hev_t, interior, limit, enabled)
    return patch.at[row - 4 : row + 4, 4:].set(w.T)


def _filter_luma_patch(patch, mbx, mby, level, interior, hev_t, do_sub, simple):
    """patch: [20, 20] int32, MB pixels at [4:20, 4:20]."""
    on = level > 0
    mb_lim = (level + 2) * 2 + interior
    sub_lim = level * 2 + interior
    rows16 = jnp.ones(16, bool)

    patch = _apply_v_edge(patch, 4, "mb", hev_t, interior, mb_lim, on & (mbx > 0) & rows16, simple)
    for col in (8, 12, 16):
        patch = _apply_v_edge(
            patch, col, "sub", hev_t, interior, sub_lim, on & do_sub & rows16, simple
        )
    patch = _apply_h_edge(patch, 4, "mb", hev_t, interior, mb_lim, on & (mby > 0) & rows16, simple)
    for row in (8, 12, 16):
        patch = _apply_h_edge(
            patch, row, "sub", hev_t, interior, sub_lim, on & do_sub & rows16, simple
        )
    return patch


def _filter_chroma_patch(patch, mbx, mby, level, interior, hev_t, do_sub):
    on = level > 0
    mb_lim = (level + 2) * 2 + interior
    sub_lim = level * 2 + interior
    rows8 = jnp.ones(8, bool)
    patch = _apply_v_edge(patch, 4, "mb", hev_t, interior, mb_lim, on & (mbx > 0) & rows8, False)
    patch = _apply_v_edge(patch, 8, "sub", hev_t, interior, sub_lim, on & do_sub & rows8, False)
    patch = _apply_h_edge(patch, 4, "mb", hev_t, interior, mb_lim, on & (mby > 0) & rows8, False)
    patch = _apply_h_edge(patch, 8, "sub", hev_t, interior, sub_lim, on & do_sub & rows8, False)
    return patch


@functools.partial(jax.jit, static_argnames=("mbw", "mbh", "simple"))
def loop_filter_frame(ybuf, ubuf, vbuf, level, interior, hev_t, do_sub, mbw: int, mbh: int, simple: bool):
    """Apply the VP8 loop filter over whole planes.

    level/interior/hev_t/do_sub: [nmb] int32/bool per-MB parameters.
    Returns filtered (ybuf, ubuf, vbuf) uint8.
    """
    # The luma edge at a patch border needs a 4px margin on top/left and the
    # vertical-subblock filters read 4px beyond on the right/bottom? No —
    # all reads stay inside the patch: edge col 16 reads cols 12..19.
    pady = jnp.pad(ybuf.astype(jnp.int32), ((4, 0), (4, 0)))
    padu = jnp.pad(ubuf.astype(jnp.int32), ((4, 0), (4, 0)))
    padv = jnp.pad(vbuf.astype(jnp.int32), ((4, 0), (4, 0)))

    xs, ys, valid = diagonal_schedule(mbw, mbh)

    def mb_kernel(py, pu, pv, x, y, lvl, intr, hv, ds):
        lp = jax.lax.dynamic_slice(py, (y * 16, x * 16), (20, 20))
        lp = _filter_luma_patch(lp, x, y, lvl, intr, hv, ds, simple)
        if simple:
            return lp, None, None
        up = jax.lax.dynamic_slice(pu, (y * 8, x * 8), (12, 12))
        vp = jax.lax.dynamic_slice(pv, (y * 8, x * 8), (12, 12))
        up = _filter_chroma_patch(up, x, y, lvl, intr, hv, ds)
        vp = _filter_chroma_patch(vp, x, y, lvl, intr, hv, ds)
        return lp, up, vp

    r20 = jnp.arange(20)
    r12 = jnp.arange(12)

    def step(state, inputs):
        py, pu, pv = state
        x, y, ok = inputs
        idx = y * mbw + x
        lp, up, vp = jax.vmap(mb_kernel, in_axes=(None, None, None, 0, 0, 0, 0, 0, 0))(
            py, pu, pv, x, y, level[idx], interior[idx], hev_t[idx], do_sub[idx]
        )
        ox = jnp.where(ok, x, mbw + 100)
        oy = jnp.where(ok, y, mbh + 100)
        py = py.at[
            oy[:, None, None] * 16 + r20[None, :, None],
            ox[:, None, None] * 16 + r20[None, None, :],
        ].set(lp, mode="drop")
        if not simple:
            pu = pu.at[
                oy[:, None, None] * 8 + r12[None, :, None],
                ox[:, None, None] * 8 + r12[None, None, :],
            ].set(up, mode="drop")
            pv = pv.at[
                oy[:, None, None] * 8 + r12[None, :, None],
                ox[:, None, None] * 8 + r12[None, None, :],
            ].set(vp, mode="drop")
        return (py, pu, pv), None

    (pady, padu, padv), _ = jax.lax.scan(step, (pady, padu, padv), (xs, ys, valid))
    return (
        pady[4:, 4:].astype(jnp.uint8),
        padu[4:, 4:].astype(jnp.uint8),
        padv[4:, 4:].astype(jnp.uint8),
    )
