"""Device trellis quantization (RD-optimal levels) for the v2 encoder.

Same DP as `webp_tpu.encode.trellis.trellis_quantize` (libwebp
VP8TrellisQuantizeBlock; parity reference
`/root/reference/src/encoder/cost.rs:788-1006`), restructured for TPU lanes:

- arbitrary leading lane dims (the wavefront calls it on [R, B] or
  [R, B, blocks, ctx-variants] lanes), 16 zigzag positions unrolled;
- scores are 64-bit quantities (256 * weight * (err^2 - a^2) reaches 2^51)
  carried as (hi int32, lo uint32) pairs — XLA:TPU has no native int64 and
  the pair ops are a handful of VPU instructions;
- all table lookups are select chains over the 11 token classes / 3
  contexts (no gathers), with the level fixed-cost reconstructed
  arithmetically (`encode_wavefront2._fixed_cost_arith`).

`tests/test_trellis2.py` fuzzes it against the host int64 implementation.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..common import vp8_tables as T
from ..encode import tables as ET

# Static unroll factor for the 16-position DP / unwind scans when they run
# directly inside the p2 wavefront step (the I16/UV paths; the I4 chain
# passes unroll=True and inlines fully).  Measured r5 on v5e: unroll=8
# DOUBLED the spec3 DP while's time (0.4 -> 0.8 ms/step — the wide body
# spills; the loop's cost is real vector work, not launch latency), so the
# default stays 1.
_DP_UNROLL = int(os.environ.get("WEBP_TPU_TRELLIS_UNROLL", "1"))
from .encode_wavefront2 import _CLS_THRESH, _fixed_cost_arith

# NB: module-level constants stay numpy/python — this module is imported
# lazily from inside jit traces (circular-import avoidance), and creating
# jnp arrays mid-trace leaks tracers.
_ZZ = np.asarray(T.ZIGZAG)
_W_TRELLIS_ZZ = np.asarray(ET.VP8_WEIGHT_TRELLIS)[np.asarray(T.ZIGZAG)]
_TBIAS = ((0x80 << 17) + 128) >> 8  # biased-threshold rounding constant

# hi value for "+infinity" scores: far above any reachable |score| < 2^55/2^32.
_BIG_HI = 1 << 30


def _u32(x):
    return x.astype(jnp.uint32)


def _p_add(ah, al, bh, bl):
    """(ah, al) + (bh, bl); lo is uint32, hi is int32 (two's complement)."""
    l = al + bl
    carry = (l < al).astype(jnp.int32)
    return ah + bh + carry, l


def _p_lt(ah, al, bh, bl):
    return (ah < bh) | ((ah == bh) & (al < bl))


def _p_sel(c, ah, al, bh, bl):
    return jnp.where(c, ah, bh), jnp.where(c, al, bl)


def _p_mul_nn(a, b):
    """Pair of a * b for nonneg int32 a <= 2^17, b <= 2^18."""
    bh = b >> 8
    bl = b & 255
    p1 = a * bh  # <= 2^27
    p2 = a * bl  # <= 2^25
    h, l = p1 >> 24, _u32(p1 & 0xFFFFFF) << 8
    return _p_add(h, l, jnp.zeros_like(p2), _u32(p2))


def _p_mul256_w(diff, wn: int):
    """Pair of 256 * wn * diff for |diff| <= 2^28 and static 0 <= wn <= 2^15."""
    p_lo = (diff & 0x7FFF) * wn  # nonneg <= 2^30
    p_hi = (diff >> 15) * wn  # |.| <= 2^28
    h1, l1 = p_hi >> 9, _u32(p_hi & 0x1FF) << 23
    h2, l2 = p_lo >> 24, _u32(p_lo & 0xFFFFFF) << 8
    return _p_add(h1, l1, h2, l2)


def _cls_rows(tbl_n, cls):
    """tbl_n [..., 3, 11] x class index [...] -> per-context values [3 x ...]."""
    rows = []
    for c in range(3):
        row = jnp.zeros_like(cls)
        for k in range(11):
            row = jnp.where(cls == k, tbl_n[..., c, k].astype(jnp.int32), row)
        rows.append(row)
    return rows


def _ctx_pick(rows, ctx):
    return jnp.where(ctx == 0, rows[0], jnp.where(ctx == 1, rows[1], rows[2]))


def _ctx3(stacked, ctx):
    """stacked [..., 3] picked by ctx [...] in {0,1,2} (selects)."""
    return jnp.where(
        ctx == 0, stacked[..., 0], jnp.where(ctx == 1, stacked[..., 1], stacked[..., 2])
    )


def trellis_par(coeffs_raster, q, iq, sharpen_zz, lam, ctype: int, first: int,
                ctx0, cls_cost, eob_cost, init_cost, unroll: bool = False):
    """RD-optimal levels for [..., 16] raster-order coefficient blocks.

    q/iq/sharpen_zz: per-zigzag-position vectors, broadcastable to
    [..., 16] (per-lane for segment support).  lam: broadcastable [...]
    nonneg int32 (< 2^18).  cls_cost [.., 16, 3, 11], eob_cost/init_cost
    [.., 16, 3] are the EncTables fields for this ctype (leading dims must
    broadcast against the lane shape).

    Returns (levels_zz [..., 16] int32, has_nz [...] bool) — bit-identical
    to `encode.trellis.trellis_quantize`.
    """
    c_zz = coeffs_raster[..., _ZZ].astype(jnp.int32)
    lead = c_zz.shape[:-1]
    lam = jnp.broadcast_to(jnp.asarray(lam, jnp.int32), lead)
    ctx0 = jnp.broadcast_to(jnp.asarray(ctx0, jnp.int32), lead)
    q = jnp.broadcast_to(jnp.asarray(q, jnp.int32), c_zz.shape)
    iq = jnp.broadcast_to(jnp.asarray(iq, jnp.int32), c_zz.shape)
    sharpen = jnp.broadcast_to(jnp.asarray(sharpen_zz, jnp.int32), c_zz.shape)

    sign = c_zz < 0
    a = jnp.abs(c_zz) + sharpen

    thresh = (q[..., 1] * q[..., 1]) // 4
    sig = (c_zz * c_zz) > thresh[..., None]
    if first:
        sig = sig.at[..., :first].set(False)
    any_sig = sig.any(-1)
    n_idx = jnp.arange(16, dtype=jnp.int32)
    last_pos = jnp.max(jnp.where(sig, n_idx, -1), axis=-1)
    last = jnp.where(any_sig, last_pos, first - 1)
    last = jnp.minimum(last + 1, 15)

    level0 = jnp.minimum((a * iq) >> 17, 2047)
    tlevel = jnp.minimum((a * iq + _TBIAS) >> 17, 2047)

    # Init: skip score (EOB at `first`) and the two start nodes.
    skip_cost = _ctx_pick(
        [eob_cost[..., first, c].astype(jnp.int32) + jnp.zeros(lead, jnp.int32)
         for c in range(3)],
        ctx0,
    )
    best_h, best_l = _p_mul_nn(skip_cost, lam)
    best_n = jnp.full(lead, -1, jnp.int32)
    best_delta = jnp.zeros(lead, jnp.int32)
    best_prev = jnp.zeros(lead, jnp.int32)

    init_rate = jnp.where(
        ctx0 == 0,
        init_cost[..., first, 0].astype(jnp.int32) + jnp.zeros(lead, jnp.int32),
        0,
    )
    s0h, s0l = _p_mul_nn(init_rate, lam)

    # ---- vectorized precompute over all (position, delta) pairs ----------
    # The DP body must stay tiny: it sits inside the wavefront scan (and the
    # I4 subblock scan), so every op here multiplies by the unroll factor.
    # Everything that depends only on (n, delta) — candidate levels,
    # validity, contexts, rate*lambda pairs, 256*w*dd pairs, EOB pairs —
    # is computed as dense [.., 16, 2] tensors up front.
    n_iota = jnp.arange(16, dtype=jnp.int32)
    active_n = (n_iota >= first) & (n_iota <= last[..., None])  # [.., 16]

    lvl_d = jnp.stack([level0, level0 + 1], axis=-1)  # [.., 16, 2]
    valid_d = active_n[..., None] & (lvl_d <= tlevel[..., None])
    ctx_d = jnp.minimum(lvl_d, 2)
    nz_d = valid_d & (lvl_d != 0)

    err_d = a[..., None] - lvl_d * q[..., None]
    diff_d = err_d * err_d - (a * a)[..., None]
    wvec = jnp.asarray(_W_TRELLIS_ZZ.astype(np.int32))[:, None]  # [16, 1]
    base_h, base_l = _p_mul256_w(diff_d, wvec)

    # Rate under each possible predecessor context, already * lambda.
    vc_d = jnp.minimum(lvl_d, 67)
    cls_d = sum((vc_d >= int(t)).astype(jnp.int32) for t in _CLS_THRESH)
    lvf_d = _fixed_cost_arith(lvl_d) + jnp.where(lvl_d > 0, 256, 0)
    tc_h, tc_l = [], []
    for c in range(3):
        row = jnp.zeros_like(cls_d)
        for k in range(11):
            row = jnp.where(
                cls_d == k, cls_cost[..., :, c, k][..., None].astype(jnp.int32), row
            )
        h, l = _p_mul_nn(row + lvf_d, lam[..., None, None])
        tc_h.append(h)
        tc_l.append(l)
    tc_h = jnp.stack(tc_h, axis=-1)  # [.., 16, 2, 3]
    tc_l = jnp.stack(tc_l, axis=-1)

    # EOB-termination pairs at (n+1, ctx(level)); zero at n = 15.
    eob_next = jnp.concatenate(
        [eob_cost[..., 1:, :], jnp.zeros_like(eob_cost[..., :1, :])], axis=-2
    ).astype(jnp.int32)
    eobn_d = jnp.zeros_like(lvl_d)
    for c in range(3):
        eobn_d = jnp.where(ctx_d == c, eob_next[..., :, c][..., None], eobn_d)
    eobn_d = jnp.where(n_iota[:, None] < 15, eobn_d, 0)
    eob_h, eob_l = _p_mul_nn(eobn_d, lam[..., None, None])

    def tx(v):
        """[.., 16, 2] -> [16, .., 2] (position axis leading for the scan)."""
        return jnp.moveaxis(v, -2, 0)

    xs = (
        n_iota,
        tx(valid_d), tx(ctx_d), tx(nz_d), tx(lvl_d),
        tx(base_h), tx(base_l),
        jnp.moveaxis(tc_h, -3, 0), jnp.moveaxis(tc_l, -3, 0),
        tx(eob_h), tx(eob_l),
    )

    def body(carry, x):
        (s0h_c, s0l_c, s1h_c, s1l_c, pc0, pc1,
         b_h, b_l, b_n, b_d, b_p) = carry
        n, valid2, ctx2, nz2, lvl2, bh2, bl2, tch2, tcl2, eh2, el2 = x
        run = n >= first

        nsc = []
        nctx = []
        nl = []
        npv = []
        for delta in (0, 1):
            valid = valid2[..., delta]
            t0h = _ctx3(tch2[..., delta, :], pc0)
            t0l = _ctx3(tcl2[..., delta, :], pc0)
            c0h, c0l = _p_add(s0h_c, s0l_c, t0h, t0l)
            t1h = _ctx3(tch2[..., delta, :], pc1)
            t1l = _ctx3(tcl2[..., delta, :], pc1)
            c1h, c1l = _p_add(s1h_c, s1l_c, t1h, t1l)
            take1 = _p_lt(c1h, c1l, c0h, c0l)
            bsh, bsl = _p_sel(take1, c1h, c1l, c0h, c0l)
            bsh, bsl = _p_add(bsh, bsl, bh2[..., delta], bl2[..., delta])
            best_p = take1.astype(jnp.int32)

            nsc.append((
                jnp.where(valid, bsh, _BIG_HI),
                jnp.where(valid, bsl, _u32(jnp.zeros_like(bsh))),
            ))
            nctx.append(ctx2[..., delta])
            nl.append(lvl2[..., delta])
            npv.append(best_p)

            th_, tl_ = _p_add(bsh, bsl, eh2[..., delta], el2[..., delta])
            better = nz2[..., delta] & _p_lt(th_, tl_, b_h, b_l)
            b_h = jnp.where(better, th_, b_h)
            b_l = jnp.where(better, tl_, b_l)
            b_n = jnp.where(better, n, b_n)
            b_d = jnp.where(better, delta, b_d)
            b_p = jnp.where(better, best_p, b_p)

        keep = lambda new, old: jnp.where(run, new, old)
        new_carry = (
            keep(nsc[0][0], s0h_c), keep(nsc[0][1], s0l_c),
            keep(nsc[1][0], s1h_c), keep(nsc[1][1], s1l_c),
            keep(nctx[0], pc0), keep(nctx[1], pc1),
            b_h, b_l, b_n, b_d, b_p,
        )
        ys = (jnp.stack(nl, axis=-1), jnp.stack(npv, axis=-1))
        return new_carry, ys

    init = (s0h, s0l, s0h, s0l, ctx0, ctx0,
            best_h, best_l, best_n, best_delta, best_prev)
    sign_t = jnp.moveaxis(sign, -1, 0)  # [16, ...]

    if unroll:
        # Statically unrolled drivers: one fused DP, no inner-loop launch
        # latency.  Used inside already-scanned callers (the I4 subblock
        # chain), where exactly one instance of the body gets compiled.
        carry = init
        nls, npvs = [], []
        for n in range(16):
            carry, (nl, npv) = body(carry, tuple(a[n] for a in xs))
            nls.append(nl)
            npvs.append(npv)
        best_n, best_delta = carry[8], carry[9]
        outs = [None] * 16
        cur_delta = best_delta
        for n in range(15, -1, -1):
            sel = (best_n >= n) & (n >= first)
            lvl = jnp.where(cur_delta == 0, nls[n][..., 0], nls[n][..., 1])
            outs[n] = jnp.where(sel, jnp.where(sign_t[n], -lvl, lvl), 0)
            prv = jnp.where(cur_delta == 0, npvs[n][..., 0], npvs[n][..., 1])
            cur_delta = jnp.where(sel, prv, cur_delta)
        levels = jnp.stack(outs, axis=-1)
        has_nz = (levels[..., first:] != 0).any(-1)
        return levels, has_nz

    carry, (node_level, node_prev) = jax.lax.scan(
        body, init, xs, unroll=_DP_UNROLL
    )
    best_n, best_delta = carry[8], carry[9]

    # Unwind best paths backward from each block's terminal node.
    def unwind(cur_delta, x):
        n, nl, npv, sg = x
        sel = (best_n >= n) & (n >= first)
        lvl = jnp.where(cur_delta == 0, nl[..., 0], nl[..., 1])
        out_n = jnp.where(sel, jnp.where(sg, -lvl, lvl), 0)
        prv = jnp.where(cur_delta == 0, npv[..., 0], npv[..., 1])
        return jnp.where(sel, prv, cur_delta), out_n

    _, outs = jax.lax.scan(
        unwind,
        best_delta,
        (jnp.arange(16, dtype=jnp.int32), node_level, node_prev, sign_t),
        reverse=True,
        unroll=_DP_UNROLL,
    )
    levels = jnp.moveaxis(outs, 0, -1)
    has_nz = (levels[..., first:] != 0).any(-1)
    return levels, has_nz


def trellis_spec3(coeffs_raster, q, iq, sharpen_zz, lam, ctype: int, first: int,
                  cls_cost, eob_cost, init_cost):
    """trellis_par evaluated for ALL THREE possible initial contexts at once.

    The I16 path needs the DP under every ctx0 in {0,1,2} (intra-MB context
    speculation); running `trellis_par` on ctx-broadcast lanes triples every
    level-dependent precompute tensor.  Here the precompute stays on the
    coefficient lanes and only the DP state carries a trailing spec axis —
    ~1/3 the work and a far smaller graph.

    Returns (levels [..., 3, 16] int32, has_nz [..., 3] bool), matching
    trellis_par(ctx0=c) at [..., c, :].
    """
    c_zz = coeffs_raster[..., _ZZ].astype(jnp.int32)
    lead = c_zz.shape[:-1]
    lam = jnp.broadcast_to(jnp.asarray(lam, jnp.int32), lead)
    q = jnp.broadcast_to(jnp.asarray(q, jnp.int32), c_zz.shape)
    iq = jnp.broadcast_to(jnp.asarray(iq, jnp.int32), c_zz.shape)
    sharpen = jnp.broadcast_to(jnp.asarray(sharpen_zz, jnp.int32), c_zz.shape)

    sign = c_zz < 0
    a = jnp.abs(c_zz) + sharpen
    thresh = (q[..., 1] * q[..., 1]) // 4
    sig = (c_zz * c_zz) > thresh[..., None]
    if first:
        sig = sig.at[..., :first].set(False)
    any_sig = sig.any(-1)
    n_iota = jnp.arange(16, dtype=jnp.int32)
    last_pos = jnp.max(jnp.where(sig, n_iota, -1), axis=-1)
    last = jnp.minimum(jnp.where(any_sig, last_pos, first - 1) + 1, 15)

    level0 = jnp.minimum((a * iq) >> 17, 2047)
    tlevel = jnp.minimum((a * iq + _TBIAS) >> 17, 2047)

    active_n = (n_iota >= first) & (n_iota <= last[..., None])
    lvl_d = jnp.stack([level0, level0 + 1], axis=-1)
    valid_d = active_n[..., None] & (lvl_d <= tlevel[..., None])
    ctx_d = jnp.minimum(lvl_d, 2)
    nz_d = valid_d & (lvl_d != 0)

    err_d = a[..., None] - lvl_d * q[..., None]
    diff_d = err_d * err_d - (a * a)[..., None]
    wvec = jnp.asarray(_W_TRELLIS_ZZ.astype(np.int32))[:, None]
    base_h, base_l = _p_mul256_w(diff_d, wvec)

    vc_d = jnp.minimum(lvl_d, 67)
    cls_d = sum((vc_d >= int(t)).astype(jnp.int32) for t in _CLS_THRESH)
    lvf_d = _fixed_cost_arith(lvl_d) + jnp.where(lvl_d > 0, 256, 0)
    tc_h, tc_l = [], []
    for c in range(3):
        row = jnp.zeros_like(cls_d)
        for k in range(11):
            row = jnp.where(
                cls_d == k, cls_cost[..., :, c, k][..., None].astype(jnp.int32), row
            )
        h, l = _p_mul_nn(row + lvf_d, lam[..., None, None])
        tc_h.append(h)
        tc_l.append(l)
    tc_h = jnp.stack(tc_h, axis=-1)  # [.., 16, 2, 3ctx]
    tc_l = jnp.stack(tc_l, axis=-1)

    eob_next = jnp.concatenate(
        [eob_cost[..., 1:, :], jnp.zeros_like(eob_cost[..., :1, :])], axis=-2
    ).astype(jnp.int32)
    eobn_d = jnp.zeros_like(lvl_d)
    for c in range(3):
        eobn_d = jnp.where(ctx_d == c, eob_next[..., :, c][..., None], eobn_d)
    eobn_d = jnp.where(n_iota[:, None] < 15, eobn_d, 0)
    eob_h, eob_l = _p_mul_nn(eobn_d, lam[..., None, None])

    # Spec-axis initial state: ctx0 = [0, 1, 2] on a trailing axis.
    spec = (*lead, 3)
    ctx0s = jnp.broadcast_to(jnp.arange(3, dtype=jnp.int32), spec)
    # The spec axis IS the ctx0 index, so the EOB row aligns directly.
    skip_cost = jnp.broadcast_to(eob_cost[..., first, :].astype(jnp.int32), spec)
    lam3 = lam[..., None]
    best_h, best_l = _p_mul_nn(skip_cost, lam3)
    best_n = jnp.full(spec, -1, jnp.int32)
    best_delta = jnp.zeros(spec, jnp.int32)
    init_rate = jnp.where(
        ctx0s == 0,
        init_cost[..., first, 0].astype(jnp.int32) + jnp.zeros(spec, jnp.int32),
        0,
    )
    s0h, s0l = _p_mul_nn(init_rate, lam3)

    def tx(v):
        return jnp.moveaxis(v, -2, 0)

    xs = (
        n_iota,
        tx(valid_d), tx(ctx_d), tx(nz_d), tx(lvl_d),
        tx(base_h), tx(base_l),
        jnp.moveaxis(tc_h, -3, 0), jnp.moveaxis(tc_l, -3, 0),
        tx(eob_h), tx(eob_l),
    )

    def body(carry, x):
        (s0h_c, s0l_c, s1h_c, s1l_c, pc0, pc1,
         b_h, b_l, b_n, b_d, b_p) = carry
        n, valid2, ctx2, nz2, lvl2, bh2, bl2, tch2, tcl2, eh2, el2 = x
        run = n >= first

        nsc, nctx, npv = [], [], []
        for delta in (0, 1):
            # Precomputed terms lack the spec axis: insert it ([..., None]).
            valid = valid2[..., delta][..., None]
            t0h = _ctx3(tch2[..., delta, :][..., None, :], pc0)
            t0l = _ctx3(tcl2[..., delta, :][..., None, :], pc0)
            c0h, c0l = _p_add(s0h_c, s0l_c, t0h, t0l)
            t1h = _ctx3(tch2[..., delta, :][..., None, :], pc1)
            t1l = _ctx3(tcl2[..., delta, :][..., None, :], pc1)
            c1h, c1l = _p_add(s1h_c, s1l_c, t1h, t1l)
            take1 = _p_lt(c1h, c1l, c0h, c0l)
            bsh, bsl = _p_sel(take1, c1h, c1l, c0h, c0l)
            bsh, bsl = _p_add(
                bsh, bsl, bh2[..., delta][..., None], bl2[..., delta][..., None]
            )
            best_p = take1.astype(jnp.int32)

            nsc.append((
                jnp.where(valid, bsh, _BIG_HI),
                jnp.where(valid, bsl, _u32(jnp.zeros_like(bsh))),
            ))
            nctx.append(jnp.broadcast_to(ctx2[..., delta][..., None], pc0.shape))
            npv.append(best_p)

            th_, tl_ = _p_add(
                bsh, bsl, eh2[..., delta][..., None], el2[..., delta][..., None]
            )
            better = (nz2[..., delta][..., None]) & _p_lt(th_, tl_, b_h, b_l)
            b_h = jnp.where(better, th_, b_h)
            b_l = jnp.where(better, tl_, b_l)
            b_n = jnp.where(better, n, b_n)
            b_d = jnp.where(better, delta, b_d)
            b_p = jnp.where(better, best_p, b_p)

        keep = lambda new, old: jnp.where(run, new, old)
        new_carry = (
            keep(nsc[0][0], s0h_c), keep(nsc[0][1], s0l_c),
            keep(nsc[1][0], s1h_c), keep(nsc[1][1], s1l_c),
            keep(nctx[0], pc0), keep(nctx[1], pc1),
            b_h, b_l, b_n, b_d, b_p,
        )
        return new_carry, (jnp.stack(npv, axis=-1),)

    init = (
        s0h, s0l, s0h, s0l, ctx0s, ctx0s,
        best_h, best_l, best_n, best_delta, jnp.zeros(spec, jnp.int32),
    )
    carry, (node_prev,) = jax.lax.scan(body, init, xs, unroll=_DP_UNROLL)
    best_n, best_delta = carry[8], carry[9]

    # Unwind: node levels are spec-independent (level0/level0+1).
    def unwind(cur_delta, x):
        n, lvl2, npv, sg = x
        sel = (best_n >= n) & (n >= first)
        lvl = jnp.where(
            cur_delta == 0, lvl2[..., 0][..., None], lvl2[..., 1][..., None]
        )
        out_n = jnp.where(sel, jnp.where(sg[..., None], -lvl, lvl), 0)
        prv = jnp.where(cur_delta == 0, npv[..., 0], npv[..., 1])
        return jnp.where(sel, prv, cur_delta), out_n

    _, outs = jax.lax.scan(
        unwind,
        best_delta,
        (n_iota, tx(lvl_d), node_prev, jnp.moveaxis(sign, -1, 0)),
        reverse=True,
        unroll=_DP_UNROLL,
    )
    levels = jnp.moveaxis(outs, 0, -1)  # [..., 3, 16]
    has_nz = (levels[..., first:] != 0).any(-1)
    return levels, has_nz
