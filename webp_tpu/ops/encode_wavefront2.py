"""Lane-aligned encoder mode decision + reconstruction, v2.

Same restructuring applied to the decoder in `wavefront2.py`: instead of
vmapping a ragged anti-diagonal of MBs (v1 `encode_wavefront.py`, ~25 active
lanes and per-lane dynamic gathers), every MB row advances together — at step
t, row r decides MB (x = t - 2r, r) — so each scan step is a fixed sequence
of dense [R, B, ...] vector ops and all cross-row dataflow is a static row
shift plus 3-slot ring buffers indexed by t mod 3.

The RD search semantics mirror `webp_tpu.encode.vp8._analysis_pass` exactly
(reference flow `/root/reference/src/encoder/vp8.rs:1281-1488`): I16 DC/V/H/TM
with Y2 WHT, sequential 16-subblock I4 with top-n_try candidate filtering by
prediction SSE and the running-score early exit, UV DC/V/H/TM with the
flatness penalty, and chroma DC error diffusion — same tie-breaking, same
integer RD score (`_rd_score32`).  `tests/test_encode_wavefront.py` enforces
equality with the python backend.

Structural upgrades over v1 beyond the schedule — all driven by the fact
that XLA:TPU lowers per-lane table gathers to near-scalar loops (measured
~2 ms for one [R,B,10,16] GetResidualCost call, dominating the kernel):
  - `residual_costs_par` is gather-free.  pos_cost[t][n][ctx][v] is constant
    within each of the 11 token classes (it is the token-tree path cost, the
    per-level extra bits live in VP8_LEVEL_FIXED_COSTS), so the rate is an
    11-wide one-hot matmul against a [16, 3, 11] class-cost table; the fixed
    extra-bits cost is reconstructed arithmetically from the category bit
    pattern (verified equal to the table for every level 0..2047).
  - candidate picks (I16 best-of-4, I4 top-n_try by SSE, UV best-of-4) are
    one-hot einsums instead of argsort / take_along_axis.
  - U and V ride one [R, B, 2, ...] channel axis through the chroma search.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..common import vp8_tables as T
from ..encode import tables as ET
from . import jax_ops
from .encode_wavefront import BIG, IZZ, ZZ, EncParams, EncTables, _rd_score32
from .wavefront2 import (
    _W13,
    _R13,
    _clip255,
    _shift_down_rows,
    make_schedule_gather,
    ring_read,
    ring_write,
    schedule_mb_data,
)

# Static unroll of the 16-subblock I4 chains inside the p2 wavefront step.
# Measured r5 on v5e: 4 is the sweet spot — 8 made the I4 RD while ~20%
# SLOWER (the wider body spills; the while's cost is real vector work, not
# launch latency) and full 16x inline stalls the remote compiler for
# minutes (see _i4_trellis_v2).
_I4_UNROLL = int(os.environ.get("WEBP_TPU_I4_UNROLL", "4"))

# numpy on purpose (see ops/token_stats.py: module-level jnp constants can
# bind to a trace when first imported inside a jitted body)
_IZZ_J = np.asarray(IZZ)
_ZZ_J = np.asarray(ZZ)

# --- static cost-table decompositions (built once, in numpy) ----------------

# Token classes over clamped levels vc = min(v, 67): 0,1,2,3,4,cat1..cat6.
_CLS_THRESH = np.array([1, 2, 3, 4, 5, 7, 11, 19, 35, 67], np.int32)

# Per-category extra-bits cost tables: value = base[cat] + extra, and the
# extra bits are coded MSB-first with PROB_DCT_CAT.  CL1/CL0[cat][j] is the
# cost of a 1/0 bit at shift j (j counted from the LSB).
_CAT_BASE = np.array([5, 7, 11, 19, 35, 67], np.int32)
_CAT_NBITS = np.array([1, 2, 3, 4, 5, 11], np.int32)


def _build_fixed_decomp():
    ent = ET.VP8_ENTROPY_COST.astype(np.int64)
    cl0 = np.zeros((6, 11), np.int32)
    cl1 = np.zeros((6, 11), np.int32)
    for cat in range(6):
        probs = T.PROB_DCT_CAT[cat]
        nb = len(probs)
        for j in range(nb):
            p = int(probs[nb - 1 - j])
            cl0[cat, j] = ent[p]
            cl1[cat, j] = ent[255 - p]

    def arith(v):
        if v == 0:
            return 0
        c = 256
        if v < 5:
            return c
        cat = int((v >= _CAT_BASE).sum()) - 1
        extra = v - int(_CAT_BASE[cat])
        for j in range(int(_CAT_NBITS[cat])):
            c += int(cl1[cat, j] if (extra >> j) & 1 else cl0[cat, j])
        return c

    fx = ET.VP8_LEVEL_FIXED_COSTS.astype(np.int64)
    diff = np.array([int(fx[v]) - arith(v) for v in range(2048)], np.int64)
    bad = np.nonzero(diff)[0]
    # libwebp's table deviates from the pure formula only at levels 9 and 10
    # (a historical quirk carried by every implementation); anything else
    # differing would mean the probability tables changed under us.
    assert set(bad.tolist()) <= {9, 10}, bad
    corr = {int(v): int(diff[v]) for v in bad}
    return cl0, cl1, corr


_CL0_np, _CL1_np, _FIXED_CORR = _build_fixed_decomp()


def _cat_select(cat, table_np):
    """table_np [6] static -> per-lane value by category index (selects)."""
    out = jnp.full(cat.shape, int(table_np[0]), jnp.int32)
    for c in range(1, 6):
        out = jnp.where(cat == c, int(table_np[c]), out)
    return out


def _fixed_cost_arith(v):
    """VP8_LEVEL_FIXED_COSTS[min(v, 2047)] without a gather.

    v [...] int32 >= 0.  Sign bit (256) + per-category extra-bits cost,
    with the two table quirks (levels 9, 10) patched by constants.
    """
    v = jnp.minimum(v, 2047)
    ge5 = v >= 5
    cat = (
        (v >= 5).astype(jnp.int32)
        + (v >= 7)
        + (v >= 11)
        + (v >= 19)
        + (v >= 35)
        + (v >= 67)
        - 1
    )
    catc = jnp.maximum(cat, 0)
    base = _cat_select(catc, _CAT_BASE)
    nbits = _cat_select(catc, _CAT_NBITS)
    extra = v - base
    cost = jnp.where(v > 0, 256, 0)
    for j in range(11):
        bit = (extra >> j) & 1
        c0j = _cat_select(catc, _CL0_np[:, j])
        c1j = _cat_select(catc, _CL1_np[:, j])
        cost = cost + jnp.where(ge5 & (j < nbits), jnp.where(bit == 1, c1j, c0j), 0)
    for lvl, d in _FIXED_CORR.items():
        cost = cost + jnp.where(v == lvl, d, 0)
    return cost


def _onehot(idx, n, dtype=jnp.float32):
    return (idx[..., None] == jnp.arange(n, dtype=jnp.int32)).astype(dtype)


def _split_einsum(spec, table_i32, *ohs):
    """Exact one-hot table pick as two einsums.

    XLA lowers f32 dots to bf16 multiplies by default (on TPU MXU and the CPU
    fast path), which silently rounds table values above 2^8.  Splitting the
    table into two 7-bit halves keeps every operand exactly representable in
    bf16 (one-hots are 0/1; halves are < 128), so the accumulated f32 result
    is exact.  Requires 0 <= table < 2^14.
    """
    tf = table_i32.astype(jnp.int32)
    hi = jnp.einsum(spec, *ohs, (tf >> 7).astype(jnp.float32),
                    preferred_element_type=jnp.float32)
    lo = jnp.einsum(spec, *ohs, (tf & 127).astype(jnp.float32),
                    preferred_element_type=jnp.float32)
    return (hi * 128 + lo).astype(jnp.int32)


def _ctx3(stacked, ctx):
    """stacked [..., 3] picked by ctx [...] in {0,1,2} (selects)."""
    return jnp.where(
        ctx == 0, stacked[..., 0], jnp.where(ctx == 1, stacked[..., 1], stacked[..., 2])
    )


def residual_costs_par(levels, ctype: int, first: int, ctx0, tbl: EncTables):
    """Rate of [..., 16] zigzag level blocks in 1/256 bits — gather-free.

    Bit-identical to `encode_wavefront.residual_costs_jax` (GetResidualCost,
    `/root/reference/src/encoder/cost.rs:1666-1740`): token contexts are
    closed-form (ctx[n] = min(|v[n-1]|, 2)), the class cost is a one-hot-11
    matmul, the fixed cost is `_fixed_cost_arith`, and EOB/init/empty terms
    come from the precomputed [16, 3] cost tables.
    """
    v = jnp.abs(levels)
    lead = levels.shape[:-1]
    nz = v != 0
    any_nz = nz[..., first:].any(axis=-1)
    n_idx = jnp.arange(16, dtype=jnp.int32)
    last = jnp.max(jnp.where(nz, n_idx, -1), axis=-1)  # -1 when all-zero

    vc = jnp.minimum(v, 67)
    vfix = _fixed_cost_arith(v)

    ctx0b = jnp.broadcast_to(jnp.asarray(ctx0, jnp.int32), lead)
    ctx = jnp.concatenate([ctx0b[..., None], jnp.minimum(v[..., :-1], 2)], axis=-1)
    if first:
        ctx = ctx.at[..., first].set(ctx0b)

    # Class cost: one-hot over the 11 token classes, batched matmul over the
    # 16 positions, then a 3-way context select.
    cls = sum((vc >= int(t)).astype(jnp.int32) for t in _CLS_THRESH)
    oh = _onehot(cls, 11)  # [..., 16, 11]
    cc3 = _split_einsum(
        "...nk,nck->...nc", tbl.cls_cost[ctype].astype(jnp.int32), oh
    )
    terms = _ctx3(cc3, ctx) + vfix

    active = (n_idx >= first) & (n_idx <= last[..., None])
    cost = jnp.where(active, terms, 0).sum(axis=-1)
    cost = cost + jnp.where(ctx0b == 0, tbl.init_cost[ctype, first, 0], 0)

    is_last = n_idx == last[..., None]
    lastv1 = ((v == 1) & is_last).any(-1)
    last_ctx = jnp.where(lastv1, 1, 2)
    eob_pos = jnp.minimum(last + 1, 15)
    eob3 = _split_einsum("...n,nc->...c", tbl.eob_cost[ctype], _onehot(eob_pos, 16))
    eobc = jnp.where(last_ctx == 1, eob3[..., 1], eob3[..., 2])
    cost = jnp.where(any_nz & (last < 15), cost + eobc, cost)

    empty = _ctx3(
        jnp.broadcast_to(tbl.eob_cost[ctype, first], (*lead, 3)), ctx0b
    )
    return jnp.where(any_nz, cost, empty)


# ---------------------------------------------------------------------------
# Small batched helpers (arbitrary leading dims)
# ---------------------------------------------------------------------------


def _blocks16(mb):
    """[..., 16, 16] spatial -> [..., 16, 16] raster-order coeff blocks."""
    s = mb.shape[:-2]
    return mb.reshape(*s, 4, 4, 4, 4).swapaxes(-3, -2).reshape(*s, 16, 16)


def _spatial16(blk):
    s = blk.shape[:-2]
    return blk.reshape(*s, 4, 4, 4, 4).swapaxes(-3, -2).reshape(*s, 16, 16)


def _blocks8(mb):
    """[..., 8, 8] spatial -> [..., 4, 16] raster-order coeff blocks."""
    s = mb.shape[:-2]
    return mb.reshape(*s, 2, 4, 2, 4).swapaxes(-3, -2).reshape(*s, 4, 16)


def _spatial8(blk):
    s = blk.shape[:-2]
    return blk.reshape(*s, 2, 2, 4, 4).swapaxes(-3, -2).reshape(*s, 8, 8)


def _quant_zz(blocks_raster, iq, bias):
    return jax_ops.quantize_zz(blocks_raster[..., _ZZ_J], iq, bias)


def _dequant_zz(levels, q):
    return (levels * q)[..., _IZZ_J]


# Segment support: quant vectors / lambdas may be per-lane ([R,B,16] / [R,B])
# instead of shared ([16] / int).  _ex/_exl insert the broadcast axes a call
# site needs; shared values pass through untouched.

def _ex(v, n: int):
    if getattr(v, "ndim", 1) <= 1:
        return v
    return v.reshape(*v.shape[:-1], *(1,) * n, v.shape[-1])


def _exl(lam, n: int):
    if isinstance(lam, (int, np.integer)) or getattr(lam, "ndim", 0) == 0:
        return lam
    return lam.reshape(*lam.shape, *(1,) * n)


class _LaneParams:
    pass


def _lane_params(P, sid):
    """EncParamsSegs ([B,4,16]/[B,4] leaves) + sid [R,B] -> per-lane params
    ([R,B,16] vectors, [R,B] lambdas) via 4-way selects."""
    from .encode_wavefront import EncParamsSegs

    lp = _LaneParams()
    for name in EncParamsSegs._VECS:
        arr = getattr(P, name)  # [.., 4, 16] (optionally image-leading)
        v = jnp.broadcast_to(arr[..., 0, :], (*sid.shape, arr.shape[-1]))
        for s in range(1, 4):
            v = jnp.where((sid == s)[..., None], arr[..., s, :], v)
        setattr(lp, name, v)
    for name in EncParamsSegs._LAMS:
        arr = getattr(P, name)  # [.., 4]
        v = jnp.broadcast_to(arr[..., 0], sid.shape)
        for s in range(1, 4):
            v = jnp.where(sid == s, arr[..., s], v)
        setattr(lp, name, v)
    return lp


def _t_transform(blocks4, w):
    """Hadamard |.|-weighted sum of [..., 4, 4] blocks -> [...]."""
    b = blocks4.astype(jnp.int32)
    e0, e1, e2, e3 = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    a0, a1, a2, a3 = e0 + e2, e1 + e3, e1 - e3, e0 - e2
    t = jnp.stack([a0 + a1, a3 + a2, a3 - a2, a0 - a1], axis=-1)
    c0, c1, c2, c3 = t[..., 0, :], t[..., 1, :], t[..., 2, :], t[..., 3, :]
    a0, a1, a2, a3 = c0 + c2, c1 + c3, c1 - c3, c0 - c2
    out = jnp.stack([a0 + a1, a3 + a2, a3 - a2, a0 - a1], axis=-2)
    return (jnp.abs(out) * w.reshape(4, 4)).sum(axis=(-1, -2))


def _whole_pred_all4(a, left, tl, has_above, has_left, size: int):
    """DC/V/H/TM whole-block predictions, all four stacked.

    a [..., size], left [..., size], tl [...], has_* [...] bool.
    Returns [..., 4, size, size].
    """
    shf = (
        (2 if size == 8 else 3)
        + has_above.astype(jnp.int32)
        + has_left.astype(jnp.int32)
    )
    total = jnp.where(has_left, left.sum(-1), 0) + jnp.where(has_above, a.sum(-1), 0)
    dc = jnp.where(has_above | has_left, (total + (1 << (shf - 1))) >> shf, 128)
    lead = a.shape[:-1]
    dc_blk = jnp.broadcast_to(dc[..., None, None], (*lead, size, size))
    v_blk = jnp.broadcast_to(a[..., None, :], (*lead, size, size))
    h_blk = jnp.broadcast_to(left[..., :, None], (*lead, size, size))
    tm_blk = _clip255(left[..., :, None] + a[..., None, :] - tl[..., None, None])
    return jnp.stack([dc_blk, v_blk, h_blk, tm_blk], axis=-3)


def _pick_mode(x, best, M: int):
    """Select x[:, :, m] by per-lane index `best` [R,B] — an exact select
    chain (int-safe where one-hot float sums would round above 2^24)."""
    R, B = best.shape
    bb = best.reshape(R, B, *(1,) * (x.ndim - 3))
    out = x[:, :, 0]
    for m in range(1, M):
        out = jnp.where(bb == m, x[:, :, m], out)
    return out


# ---------------------------------------------------------------------------
# Per-step searches
# ---------------------------------------------------------------------------


def _i16_search_v2(a16, left16, tl, src, has_above, has_left, P, tbl):
    """All-mode I16 search. src [R,B,16,16] int32.

    Returns (mode [R,B], i16_score_at_lambda_mode, y2_lv [R,B,16],
    y_lv [R,B,16,16], rec [R,B,16,16], dct [R,B,16,16], pred [R,B,16,16]).
    """
    R, B = src.shape[:2]
    pred4 = _whole_pred_all4(a16, left16, tl, has_above, has_left, 16)
    resid = src[..., None, :, :] - pred4  # [R,B,4,16,16]
    dct = jax_ops.dct4x4(_blocks16(resid))  # [R,B,4,16,16]
    y2 = jax_ops.wht4x4(dct[..., 0])  # [R,B,4,16]
    y2_lv = _quant_zz(y2, _ex(P.y2_iq, 1), _ex(P.y2_bias, 1))
    y_lv = _quant_zz(dct, _ex(P.y1_iq, 2), _ex(P.y1_bias, 2)).at[..., 0].set(0)
    cost = residual_costs_par(y2_lv, 1, 0, 0, tbl) + residual_costs_par(
        y_lv, 0, 1, 0, tbl
    ).sum(-1)

    y2_r = jax_ops.iwht4x4(_dequant_zz(y2_lv, _ex(P.y2_q, 1)))
    blk = _dequant_zz(y_lv, _ex(P.y1_q, 2)).at[..., 0].set(y2_r)
    rec = _clip255(pred4 + _spatial16(jax_ops.idct4x4(blk)))
    d = ((rec - src[..., None, :, :]) ** 2).sum((-1, -2))
    tsrc = _t_transform(_blocks16(src).reshape(R, B, 16, 4, 4), tbl.weight_y)
    trec = _t_transform(_blocks16(rec).reshape(R, B, 4, 16, 4, 4), tbl.weight_y)
    td = (jnp.abs(trec - tsrc[:, :, None]) >> 5).sum(-1)  # [R,B,4]
    tl1 = _exl(P.tlambda, 1)
    sd = jnp.where(tl1 > 0, (tl1 * td + 128) >> 8, 0)

    is_flat = (src == src[..., 0:1, 0:1]).all((-1, -2))
    flat_pen = is_flat[..., None] & ((y_lv[..., 1:] != 0).sum((-1, -2)) <= 0)
    d = jnp.where(flat_pen, d * 2, d)
    sd = jnp.where(flat_pen, sd * 2, sd)

    allowed = jnp.stack(
        [jnp.ones_like(has_above), has_above, has_left, has_above & has_left],
        axis=-1,
    )
    scores = jnp.where(
        allowed, _rd_score32(tbl.fixed_i16 + cost, d + sd, _exl(P.lambda_i16, 1)), BIG
    )
    best = jnp.argmin(scores, axis=-1)  # [R,B]
    final = _rd_score32(
        _pick_mode(tbl.fixed_i16.reshape(1, 1, 4) + cost, best, 4),
        _pick_mode(d + sd, best, 4),
        P.lambda_mode,
    )
    return (
        best,
        final,
        _pick_mode(y2_lv, best, 4),
        _pick_mode(y_lv, best, 4),
        _pick_mode(rec, best, 4),
        _pick_mode(dct, best, 4),
        _pick_mode(pred4, best, 4),
    )


def _i16_trellis_v2(dct, y2_lv, pred, top_cy, left_cy, P, tbl):
    """Trellis-requantize the 16 Y blocks of I16 MBs with exact contexts.

    Intra-MB context dependencies (block (x,y) needs the nnz of (x-1,y) and
    (x,y-1)) are handled by speculation: the DP runs for all 3 possible
    initial contexts at once ([R,B,16,3] lanes), then a 16-step select chain
    resolves the real context per block — mirroring `_trellis_i16`'s 7
    diagonal batches in webp_tpu.encode.vp8 without any added sequencing.

    Returns (levels [R,B,16,16], rec [R,B,16,16], nnz [R,B,16] 0/1).
    """
    from .trellis2 import trellis_spec3

    R, B = dct.shape[:2]
    lv3, nz3 = trellis_spec3(
        dct, _ex(P.y1_q, 1), _ex(P.y1_iq, 1), _ex(P.y1_sharpen, 1),
        _exl(P.lambda_trellis_i16, 1), 0, 1,
        tbl.cls_cost[0], tbl.eob_cost[0], tbl.init_cost[0],
    )  # [R,B,16,3,16], [R,B,16,3]
    nz3 = nz3.astype(jnp.int32)

    levels = [None] * 16
    nnz = [[None] * 4 for _ in range(4)]
    for y in range(4):
        for x in range(4):
            bi = y * 4 + x
            top = top_cy[..., x] if y == 0 else nnz[y - 1][x]
            left = left_cy[..., y] if x == 0 else nnz[y][x - 1]
            ctx = top + left  # [R,B] in 0..2
            cb = ctx[..., None]
            levels[bi] = jnp.where(
                cb == 0,
                lv3[:, :, bi, 0],
                jnp.where(cb == 1, lv3[:, :, bi, 1], lv3[:, :, bi, 2]),
            )
            nnz[y][x] = jnp.where(
                ctx == 0,
                nz3[:, :, bi, 0],
                jnp.where(ctx == 1, nz3[:, :, bi, 1], nz3[:, :, bi, 2]),
            )
    y_lv = jnp.stack(levels, axis=2)  # [R,B,16,16]

    y2_r = jax_ops.iwht4x4(_dequant_zz(y2_lv, P.y2_q))
    blk = _dequant_zz(y_lv, _ex(P.y1_q, 1)).at[..., 0].set(y2_r)
    rec = _clip255(pred + _spatial16(jax_ops.idct4x4(blk)))
    nnz_flat = jnp.stack([nnz[i // 4][i % 4] for i in range(16)], axis=-1)
    return y_lv, rec, nnz_flat


def _i4_trellis_v2(a16, tr4, tl, left16, src, modes, top_cy, left_cy, P, tbl):
    """Re-run the I4 subblock chain with trellis quantization (modes fixed
    from the RD pick; predictions re-derive from the trellis recon) —
    mirrors `Vp8Encoder._trellis_i4`.

    The chain runs as a lax.scan over the 16 subblocks with a bordered
    workspace tensor [R,B,17,21] (uniform dynamic slices — offsets depend
    only on the scan counter), keeping the compiled graph 1/16th of the
    statically-unrolled form: with the trellis DP inlined 16x the XLA
    compile stalls for minutes.

    Returns (levels [R,B,16,16], rec [R,B,16,16], nnz [R,B,16] 0/1).
    """
    from .trellis2 import trellis_par

    R, B = src.shape[:2]
    ws = _make_i4_ws(a16, tr4, tl, left16)

    # nnz grid with neighbor-MB context halo: ext[r+1, c+1] = nnz(r, c),
    # ext[0, 1:] = top contexts, ext[1:, 0] = left contexts.
    nnz_ext = jnp.zeros((R, B, 5, 5), jnp.int32)
    nnz_ext = nnz_ext.at[..., 0, 1:].set(top_cy)
    nnz_ext = nnz_ext.at[..., 1:, 0].set(left_cy)

    src_x = jnp.moveaxis(_blocks16(src), 2, 0)  # [16, R, B, 16]
    modes_x = jnp.moveaxis(modes, 2, 0)  # [16, R, B]

    def body(carry, x):
        ws, nnz_ext = carry
        i, src4, mode_i = x
        sby, sbx = i // 4, i % 4
        preds = _i4_preds_from_ws(ws, sby, sbx)
        pred = _pick_mode(preds, mode_i, 10)  # [R,B,16]

        dct = jax_ops.dct4x4(src4 - pred)
        top = jax.lax.dynamic_slice(nnz_ext, (0, 0, sby, sbx + 1), (R, B, 1, 1))
        left = jax.lax.dynamic_slice(nnz_ext, (0, 0, sby + 1, sbx), (R, B, 1, 1))
        ctx = (top + left)[..., 0, 0]
        lv, has = trellis_par(
            dct, P.y1_q, P.y1_iq, P.y1_sharpen, P.lambda_trellis_i4, 3, 0,
            ctx, tbl.cls_cost[3], tbl.eob_cost[3], tbl.init_cost[3],
            unroll=True,
        )
        rec = _clip255(pred + jax_ops.idct4x4(_dequant_zz(lv, P.y1_q)))
        ws = jax.lax.dynamic_update_slice(
            ws, rec.reshape(R, B, 4, 4), (0, 0, sby * 4 + 1, sbx * 4 + 1)
        )
        nnz_ext = jax.lax.dynamic_update_slice(
            nnz_ext,
            has.astype(jnp.int32)[..., None, None],
            (0, 0, sby + 1, sbx + 1),
        )
        return (ws, nnz_ext), lv

    (ws, nnz_ext), lvs = jax.lax.scan(
        body, (ws, nnz_ext), (jnp.arange(16, dtype=jnp.int32), src_x, modes_x),
        unroll=_I4_UNROLL,
    )
    levels = jnp.moveaxis(lvs, 0, 2)  # [R,B,16,16]
    rec_full = ws[..., 1:, 1:17]
    nnz_flat = nnz_ext[..., 1:, 1:].reshape(R, B, 16)
    return levels, rec_full, nnz_flat


def _top_ntry_onehots(sse10, n_try: int):
    """[R,B,10] SSEs -> one-hot [R,B,n_try,10] candidate set.

    DC is always candidate 0 when pruning (its header bits are far cheaper
    than any other mode's, so pure prediction-SSE ranking under-serves it);
    the rest are the SSE-smallest of modes 1..9 in stable (value, index)
    order — matching the python encoder's candidate order exactly.
    """
    ohs = []
    if n_try < 10:
        lead = sse10.shape[:-1]
        ohs.append(_onehot(jnp.zeros(lead, jnp.int32), 10))
        cur = sse10.at[..., 0].set(BIG)
        n_rank = n_try - 1
    else:
        cur = sse10
        n_rank = n_try
    for _ in range(n_rank):
        m = jnp.argmin(cur, axis=-1)
        oh = _onehot(m, 10)
        ohs.append(oh)
        cur = jnp.where(oh > 0, BIG, cur)
    return jnp.stack(ohs, axis=2)  # [R,B,n_try,10]


def _make_i4_ws(a16, tr4, tl, left16):
    """Bordered I4 workspace [R,B,17,21]: row 0 = [tl | above | tr], col 0 =
    left, with the MB-level TR pixels replicated at rows 4/8/12 (the
    column-3 subblocks use them for every row — create_border_luma)."""
    R, B = tl.shape
    ws = jnp.zeros((R, B, 17, 21), jnp.int32)
    ws = ws.at[..., 0, :].set(jnp.concatenate([tl[..., None], a16, tr4], axis=-1))
    ws = ws.at[..., 1:, 0].set(left16)
    for rr in (4, 8, 12):
        ws = ws.at[..., rr, 17:21].set(tr4)
    return ws


def _i4_preds_from_ws(ws, sby, sbx):
    """All 10 B-mode predictions for subblock (sby, sbx) from the workspace
    (uniform dynamic slice; offsets depend only on scalars)."""
    R, B = ws.shape[:2]
    patch = jax.lax.dynamic_slice(ws, (0, 0, sby * 4, sbx * 4), (R, B, 5, 9))
    b13 = jnp.concatenate(
        [patch[..., 0, 0:1], patch[..., 0, 1:9], patch[..., 1:5, 0]], axis=-1
    )
    preds = jnp.dot(
        b13.reshape(R * B, 13).astype(jnp.float32),
        _W13,
        preferred_element_type=jnp.float32,
    ).astype(jnp.int32).reshape(R, B, 160)
    return jnp.clip((preds + _R13) >> 3, 0, 255).reshape(R, B, 10, 16)


def _i4_search_v2(a16, tr4, tl, left16, src, tb0, lb0, i16_score, n_try: int, P, tbl):
    """Sequential 16-subblock I4 search over [R, B] lanes, as a lax.scan
    over the subblocks (bordered workspace + uniform dynamic slices: a
    statically-unrolled chain multiplies the wavefront graph ~16x and
    stalls the XLA compile).

    src [R,B,16,16] int32; tb0/lb0 [R,B,4] neighbor bpred modes.
    Returns (ok [R,B], modes [R,B,16], levels [R,B,16,16], rec [R,B,16,16],
    tb [R,B,4], lb [R,B,4]).
    """
    R, B = src.shape[:2]
    src_blocks = _blocks16(src)  # [R,B,16,16] per-subblock raster pixels
    tsrc_all = _t_transform(src_blocks.reshape(R, B, 16, 4, 4), tbl.weight_y)
    ws0 = _make_i4_ws(a16, tr4, tl, left16)
    arange10 = jnp.arange(10, dtype=jnp.int32)

    def body(carry, x):
        ws, tb, lb, tnz, lnz, rate, disto, tmc, ok = carry
        i, src4, tsrc = x
        sby, sbx = i // 4, i % 4
        preds = _i4_preds_from_ws(ws, sby, sbx)

        sse10 = ((preds - src4[..., None, :]) ** 2).sum(-1)  # [R,B,10]
        oh_k = _top_ntry_onehots(sse10, n_try)  # [R,B,K,10]
        cand = jnp.einsum(
            "rbkm,rbmv->rbkv",
            oh_k,
            preds.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        ).astype(jnp.int32)  # [R,B,K,16]
        kmode = jnp.einsum(
            "rbkm,m->rbk", oh_k, arange10.astype(jnp.float32)
        ).astype(jnp.int32)

        resid = src4[..., None, :] - cand
        dct = jax_ops.dct4x4(resid)
        lv = _quant_zz(dct, _ex(P.y1_iq, 1), _ex(P.y1_bias, 1))  # [R,B,K,16]
        # Within-MB nonzero context for the coefficient cost (MB-edge
        # subblocks use 0, like the reference: vp8.rs:1869-1873).
        nz_t = jax.lax.dynamic_slice(tnz, (0, 0, sbx), (R, B, 1))[..., 0]
        nz_l = jax.lax.dynamic_slice(lnz, (0, 0, sby), (R, B, 1))[..., 0]
        ctx0 = jnp.where(sby > 0, nz_t, 0) + jnp.where(sbx > 0, nz_l, 0)
        cc = residual_costs_par(lv, 3, 0, ctx0[..., None], tbl)
        rec = _clip255(cand + jax_ops.idct4x4(_dequant_zz(lv, _ex(P.y1_q, 1))))
        d = ((rec - src4[..., None, :]) ** 2).sum(-1)
        trec = _t_transform(rec.reshape(R, B, n_try, 4, 4), tbl.weight_y)
        td = jnp.abs(trec - tsrc[..., None]) >> 5
        tl1 = _exl(P.tlambda, 1)
        sd = jnp.where(tl1 > 0, (tl1 * td + 128) >> 8, 0)

        # Mode header cost: VP8_FIXED_COSTS_I4[top][left][mode] as one-hot
        # contractions instead of a per-lane gather (byte-split: exact).
        tbx = jax.lax.dynamic_slice(tb, (0, 0, sbx), (R, B, 1))[..., 0]
        lby = jax.lax.dynamic_slice(lb, (0, 0, sby), (R, B, 1))[..., 0]
        mc_all = _split_einsum(
            "rbt,rbl,tlm->rbm", tbl.fixed_i4, _onehot(tbx, 10), _onehot(lby, 10)
        )
        mode_costs = _split_einsum("rbkm,rbm->rbk", mc_all, oh_k)

        rates = cc + mode_costs
        scores = _rd_score32(rates, d + sd, _exl(P.lambda_i4, 1))
        # argmin over candidates in SSE-rank order == python's pick (among
        # score ties the earliest candidate wins).
        k = jnp.argmin(scores, axis=-1)
        m = _pick_mode(kmode, k, n_try)
        lv_k = _pick_mode(lv, k, n_try)
        rec_k = _pick_mode(rec, k, n_try)
        pick1 = lambda x: _pick_mode(x, k, n_try)

        ws = jax.lax.dynamic_update_slice(
            ws, rec_k.reshape(R, B, 4, 4), (0, 0, sby * 4 + 1, sbx * 4 + 1)
        )
        tb = jax.lax.dynamic_update_slice(tb, m[..., None], (0, 0, sbx))
        lb = jax.lax.dynamic_update_slice(lb, m[..., None], (0, 0, sby))
        has = (lv_k != 0).any(-1).astype(jnp.int32)
        tnz = jax.lax.dynamic_update_slice(tnz, has[..., None], (0, 0, sbx))
        lnz = jax.lax.dynamic_update_slice(lnz, has[..., None], (0, 0, sby))
        rate = rate + pick1(rates)
        disto = disto + pick1(d) + pick1(sd)
        tmc = tmc + pick1(mode_costs)
        # Early-exit + the I4 header-bit budget (libwebp max_header_bits,
        # 64 bits/MB; reference vp8.rs:1838-1839, 2016-2018).
        ok = ok & (_rd_score32(rate, disto, P.lambda_mode) < i16_score)
        ok = ok & (tmc <= 256 * 16 * 16 // 4)
        return (ws, tb, lb, tnz, lnz, rate, disto, tmc, ok), (m, lv_k)

    init = (
        ws0, tb0, lb0,
        jnp.zeros((R, B, 4), jnp.int32),   # within-MB top nz context
        jnp.zeros((R, B, 4), jnp.int32),   # within-MB left nz context
        jnp.full((R, B), 211, jnp.int32),  # BMODE initial penalty
        jnp.zeros((R, B), jnp.int32),
        jnp.zeros((R, B), jnp.int32),
        jnp.ones((R, B), bool),
    )
    src_x = jnp.moveaxis(src_blocks, 2, 0)  # [16, R, B, 16]
    tsrc_x = jnp.moveaxis(tsrc_all, 2, 0)  # [16, R, B]
    (ws, tb, lb, _, _, rate, disto, tmc, ok), (ms, lvs) = jax.lax.scan(
        body, init, (jnp.arange(16, dtype=jnp.int32), src_x, tsrc_x),
        unroll=_I4_UNROLL,
    )
    return (
        ok,
        jnp.moveaxis(ms, 0, 2),
        jnp.moveaxis(lvs, 0, 2),
        ws[..., 1:, 1:17],
        tb,
        lb,
    )


def _uv_search_v2(a8, left8, tlc, src_c, has_above, has_left, P, tbl):
    """All-mode UV search with U/V on a channel axis.

    a8/left8 [R,B,2,8], tlc [R,B,2], src_c [R,B,2,8,8] int32.
    Returns (mode [R,B], dct of the best mode [R,B,2,4,16],
    pred of the best mode [R,B,2,8,8]).
    """
    R, B = src_c.shape[:2]
    pred4 = _whole_pred_all4(
        a8, left8, tlc, has_above[..., None], has_left[..., None], 8
    )  # [R,B,2,4,8,8]
    resid = src_c[..., None, :, :] - pred4
    dct = jax_ops.dct4x4(_blocks8(resid))  # [R,B,2,4modes,4blk,16]
    lv = _quant_zz(dct, _ex(P.uv_iq, 3), _ex(P.uv_bias, 3))
    rec = _clip255(
        pred4 + _spatial8(jax_ops.idct4x4(_dequant_zz(lv, _ex(P.uv_q, 3))))
    )
    d = ((rec - src_c[..., None, :, :]) ** 2).sum((-1, -2)).sum(-2)  # [R,B,4]
    lv_m = jnp.swapaxes(lv, 2, 3)  # [R,B,4modes,2,4,16]
    cost = residual_costs_par(lv_m, 2, 0, 0, tbl).sum((-1, -2))  # [R,B,4]
    rate = tbl.fixed_uv + cost
    flat = (lv_m[..., 1:] != 0).sum((-1, -2, -3)) <= 2
    mode_is_dc = jnp.arange(4) == 0
    rate = jnp.where((~mode_is_dc) & flat, rate + 140 * 8, rate)
    allowed = jnp.stack(
        [jnp.ones_like(has_above), has_above, has_left, has_above & has_left],
        axis=-1,
    )
    scores = jnp.where(allowed, _rd_score32(rate, d, _exl(P.lambda_uv, 1)), BIG)
    best = jnp.argmin(scores, axis=-1)  # [R,B]
    bb = best[:, :, None, None, None]
    dct_k = dct[:, :, :, 0]
    pred_k = pred4[:, :, :, 0]
    for m in range(1, 4):
        dct_k = jnp.where(bb == m, dct[:, :, :, m], dct_k)
        pred_k = jnp.where(bb == m, pred4[:, :, :, m], pred_k)
    return best, dct_k, pred_k


def _chroma_diffusion_v2(dct, pred, P, top_err, left_err):
    """Chroma DC error diffusion over [R,B,2] lanes (C1=7, C2=8, DSHIFT=4).

    dct [R,B,2,4,16], pred [R,B,2,8,8]; top_err/left_err [R,B,2,2] int32.
    Returns (levels [R,B,2,4,16], rec [R,B,2,8,8], new_top, new_left).
    """
    # diffuse() runs on [R,B,2ch] values: per-lane DC quant params need one
    # broadcast axis for the channel dim (shared params pass through).
    q = _exl(P.uv_q[..., 0], 1)
    iq = _exl(P.uv_iq[..., 0], 1)
    bias = _exl(P.uv_bias[..., 0], 1)
    dc = dct[..., 0]  # [R,B,2,4]

    def diffuse(dcv, t_err, l_err):
        d2 = dcv + ((7 * t_err + 8 * l_err) >> 3)
        a = jnp.abs(d2)
        level = (a * iq + bias) >> 17
        # libwebp QuantizeSingle semantics: the coefficient becomes its
        # predicted reconstruction level*q (sign restored); see the python
        # twin in encode/vp8.py:_chroma_error_diffusion.
        qv = level * q
        dcq = jnp.where(d2 < 0, -qv, qv)
        err = a - qv
        err = jnp.where(d2 < 0, -err, err)
        return dcq, jnp.clip(err >> 1, -127, 127)

    te, le = top_err, left_err
    dc0, e0 = diffuse(dc[..., 0], te[..., 0], le[..., 0])
    dc1, e1 = diffuse(dc[..., 1], te[..., 1], e0)
    dc2, e2 = diffuse(dc[..., 2], e0, le[..., 1])
    dc3, e3 = diffuse(dc[..., 3], e1, e2)
    nl1 = (3 * e3) >> 2
    new_left = jnp.stack([e1, nl1], axis=-1)
    new_top = jnp.stack([e2, e3 - nl1], axis=-1)

    dct = dct.at[..., 0].set(jnp.stack([dc0, dc1, dc2, dc3], axis=-1))
    lv = _quant_zz(dct, _ex(P.uv_iq, 2), _ex(P.uv_bias, 2))
    rec = _clip255(
        pred + _spatial8(jax_ops.idct4x4(_dequant_zz(lv, _ex(P.uv_q, 2))))
    )
    return lv, rec, new_top, new_left


# ---------------------------------------------------------------------------
# Scan driver
# ---------------------------------------------------------------------------


def enc_init_state(mbh: int, batch: int, do_trellis: bool = False):
    R, B = mbh, batch
    state = dict(
        rbot_y=jnp.full((3, R, B, 16), 127, jnp.int32),
        rbot_c=jnp.full((3, R, B, 2, 8), 127, jnp.int32),
        rbpred=jnp.zeros((3, R, B, 4), jnp.int32),
        rderr=jnp.zeros((3, R, B, 2, 2), jnp.int32),
        left_y=jnp.full((R, B, 16), 129, jnp.int32),
        left_c=jnp.full((R, B, 2, 8), 129, jnp.int32),
        left_bpred=jnp.zeros((R, B, 4), jnp.int32),
        left_derr=jnp.zeros((R, B, 2, 2), jnp.int32),
    )
    if do_trellis:
        # Per-block-column Y nnz of the trellis output (the DP's entry
        # contexts), flowing through the wavefront like the pixel borders.
        state["rcy"] = jnp.zeros((3, R, B, 4), jnp.int32)
        state["left_cy"] = jnp.zeros((R, B, 4), jnp.int32)
    return state


def enc_step(state, t, src, src_c, P, tbl, mbw: int, n_try: int,
             do_trellis: bool = False, sid=None):
    """One lane-aligned encoder wavefront step.

    src [R,B,16,16] int32 luma source of MB (t-2r, r); src_c [R,B,2,8,8].
    Returns (new_state, outputs) with outputs matching the v1 kernel.
    With do_trellis (method >= 4), the chosen mode's levels are re-quantized
    by the trellis DP with exact neighbor contexts and the reconstruction
    (and thus the wavefront's borders) follows the trellis output — the same
    flow as `Vp8Encoder._analysis_pass` at method >= 4.

    With `sid` ([R,B] segment ids), P must be an EncParamsSegs and every
    quantizer/lambda becomes per-lane (segment-modulated quantization).
    """
    R, B = src.shape[:2]
    if sid is not None:
        P = _lane_params(P, sid)
    rows = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)
    x = t - 2 * rows
    at_x0 = x == 0
    at_y0 = rows == 0
    at_right = x == mbw - 1

    s0 = t % 3
    s1 = (t + 2) % 3
    s2 = (t + 1) % 3

    # Luma borders (identical rules to the decoder: wavefront2.recon_step).
    a16 = _shift_down_rows(ring_read(state["rbot_y"], s2))
    tr4 = _shift_down_rows(ring_read(state["rbot_y"], s1))[..., :4]
    tl = _shift_down_rows(ring_read(state["rbot_y"], s0))[..., 15]
    tr4 = jnp.where(at_right[..., None], a16[..., 15:16], tr4)
    a16 = jnp.where(at_y0[..., None], 127, a16)
    tr4 = jnp.where(at_y0[..., None], 127, tr4)
    tl = jnp.where(at_y0, 127, jnp.where(at_x0, 129, tl))
    left16 = jnp.where(at_x0[..., None], 129, state["left_y"])

    has_above = ~at_y0 & jnp.ones((R, B), bool)
    has_left = ~at_x0 & jnp.ones((R, B), bool)

    # Neighbor bpred modes / chroma diffusion errors.
    tb0 = jnp.where(
        at_y0[..., None], 0, _shift_down_rows(ring_read(state["rbpred"], s2))
    )
    lb0 = jnp.where(at_x0[..., None], 0, state["left_bpred"])
    tde = jnp.where(
        at_y0[..., None, None], 0, _shift_down_rows(ring_read(state["rderr"], s2))
    )
    lde = jnp.where(at_x0[..., None, None], 0, state["left_derr"])

    # --- luma decision -------------------------------------------------------
    i16_mode, i16_score, i16_y2, i16_y, i16_rec, i16_dct, i16_pred = _i16_search_v2(
        a16, left16, tl, src, has_above, has_left, P, tbl
    )
    if n_try > 0:
        ok, i4_modes, i4_levels, i4_rec, tb4, lb4 = _i4_search_v2(
            a16, tr4, tl, left16, src, tb0, lb0, i16_score, n_try, P, tbl
        )
    else:
        ok = jnp.zeros((R, B), bool)
        i4_modes = jnp.zeros((R, B, 16), jnp.int32)
        i4_levels = jnp.zeros((R, B, 16, 16), jnp.int32)
        i4_rec = i16_rec
        tb4, lb4 = tb0, lb0

    use_i4 = ok
    if do_trellis:
        tcy = jnp.where(
            at_y0[..., None], 0, _shift_down_rows(ring_read(state["rcy"], s2))
        )
        lcy = jnp.where(at_x0[..., None], 0, state["left_cy"])
        i16_y, i16_rec, _ = _i16_trellis_v2(
            i16_dct, i16_y2, i16_pred, tcy, lcy, P, tbl
        )
        if n_try > 0:
            i4_levels, i4_rec, _ = _i4_trellis_v2(
                a16, tr4, tl, left16, src, i4_modes, tcy, lcy, P, tbl
            )
    luma_rec = jnp.where(use_i4[..., None, None], i4_rec, i16_rec)
    luma_mode = jnp.where(use_i4, 4, i16_mode)
    bmode = jnp.where(
        i16_mode == 0, 0, jnp.where(i16_mode == 1, 2, jnp.where(i16_mode == 2, 3, 1))
    )  # DC/V/H/TM -> B_DC/B_VE/B_HE/B_TM, gather-free
    bpred_out = jnp.where(
        use_i4[..., None],
        i4_modes,
        jnp.zeros((R, B, 16), jnp.int32).at[..., 12:].set(bmode[..., None]),
    )
    new_tb = jnp.where(use_i4[..., None], tb4, bmode[..., None])
    new_lb = jnp.where(use_i4[..., None], lb4, bmode[..., None])
    y_levels = jnp.where(use_i4[..., None, None], i4_levels, i16_y)
    y2_levels = jnp.where(use_i4[..., None], 0, i16_y2)

    # --- chroma decision ------------------------------------------------------
    a8 = _shift_down_rows(ring_read(state["rbot_c"], s2))
    tlc = _shift_down_rows(ring_read(state["rbot_c"], s0))[..., 7]
    a8 = jnp.where(at_y0[..., None, None], 127, a8)
    tlc = jnp.where(at_y0[..., None], 127, jnp.where(at_x0[..., None], 129, tlc))
    left8 = jnp.where(at_x0[..., None, None], 129, state["left_c"])

    uv_mode, uv_dct, uv_pred = _uv_search_v2(
        a8, left8, tlc, src_c, has_above, has_left, P, tbl
    )
    uv_lv, uv_rec, new_tde, new_lde = _chroma_diffusion_v2(
        uv_dct, uv_pred, P, tde, lde
    )

    new_state = dict(
        rbot_y=ring_write(state["rbot_y"], s0, luma_rec[..., 15, :]),
        rbot_c=ring_write(state["rbot_c"], s0, uv_rec[..., 7, :]),
        rbpred=ring_write(state["rbpred"], s0, new_tb),
        rderr=ring_write(state["rderr"], s0, new_tde),
        left_y=luma_rec[..., :, 15],
        left_c=uv_rec[..., :, 7],
        left_bpred=new_lb,
        left_derr=new_lde,
    )
    if do_trellis:
        # Trellis contexts for neighbors: nnz of the final levels (position
        # 1.. for I16 MBs, 0.. for I4), per block, bottom row / right column.
        nz_grid = jnp.where(
            use_i4[..., None],
            (y_levels != 0).any(-1),
            (y_levels[..., 1:] != 0).any(-1),
        ).astype(jnp.int32).reshape(R, B, 4, 4)
        new_state["rcy"] = ring_write(state["rcy"], s0, nz_grid[..., 3, :])
        new_state["left_cy"] = nz_grid[..., :, 3]
    outs = (
        luma_mode,
        uv_mode,
        bpred_out,
        y_levels,
        y2_levels,
        uv_lv.reshape(R, B, 8, 16),
    )
    return new_state, outs


def _mb_tiles(plane, mb: int):
    """[B, H, W] -> [B, nmb, mb, mb] per-MB tiles (H, W multiples of mb)."""
    Bn, H, W = plane.shape
    mh, mw = H // mb, W // mb
    return (
        plane.reshape(Bn, mh, mb, mw, mb)
        .swapaxes(2, 3)
        .reshape(Bn, mh * mw, mb, mb)
    )


@functools.partial(
    jax.jit, static_argnames=("mbw", "mbh", "n_try", "do_trellis")
)
def encode_analysis_batch_v2(
    ybufs, ubufs, vbufs, params_tree, tables_tree, mbw: int, mbh: int, n_try: int,
    do_trellis: bool = False, segment_ids=None,
):
    """Batched lane-aligned RD analysis: [B, ...] planes -> per-MB decisions.

    Output dict matches `encode_wavefront.encode_analysis_batch`: luma_mode,
    chroma_mode [B,nmb], bpred [B,nmb,16], y_levels [B,nmb,16,16],
    y2_levels [B,nmb,16], uv_levels [B,nmb,8,16] (int16 levels / uint8 modes
    to keep the device->host transfer small).
    """
    P, tbl = params_tree, tables_tree
    Bn = ybufs.shape[0]
    T_, idx = make_schedule_gather(mbw, mbh)

    y_mb = _mb_tiles(ybufs.astype(jnp.int32), 16)
    u_mb = _mb_tiles(ubufs.astype(jnp.int32), 8)
    v_mb = _mb_tiles(vbufs.astype(jnp.int32), 8)
    src_s = schedule_mb_data(y_mb, idx)  # [T,R,B,16,16]
    srcc_s = jnp.stack(
        [schedule_mb_data(u_mb, idx), schedule_mb_data(v_mb, idx)], axis=3
    )  # [T,R,B,2,8,8]

    state = enc_init_state(mbh, Bn, do_trellis)

    if segment_ids is None:
        def step(state, inp):
            t, src, src_c = inp
            return enc_step(state, t, src, src_c, P, tbl, mbw, n_try, do_trellis)

        _, outs = jax.lax.scan(step, state, (jnp.arange(T_), src_s, srcc_s),
                               unroll=2)
    else:
        sid_s = schedule_mb_data(segment_ids.astype(jnp.int32), idx)  # [T,R,B]

        def step(state, inp):
            t, src, src_c, sid = inp
            return enc_step(
                state, t, src, src_c, P, tbl, mbw, n_try, do_trellis, sid
            )

        _, outs = jax.lax.scan(
            step, state, (jnp.arange(T_), src_s, srcc_s, sid_s), unroll=2
        )
    lmode, cmode, bp, ylv, y2lv, uvlv = outs

    # Inverse schedule: MB (x, y) was produced at step x + 2y, row y.
    t_idx = jnp.asarray(
        (np.arange(mbw)[None, :] + 2 * np.arange(mbh)[:, None]).astype(np.int32)
    )
    r_idx = jnp.arange(mbh)[:, None]

    def unsched(a, dtype):
        g = a[t_idx, r_idx]  # [mbh, mbw, B, ...]
        return jnp.moveaxis(g.reshape(mbh * mbw, *g.shape[2:]), 1, 0).astype(dtype)

    return dict(
        luma_mode=unsched(lmode, jnp.uint8),
        chroma_mode=unsched(cmode, jnp.uint8),
        bpred=unsched(bp, jnp.uint8),
        y_levels=unsched(ylv, jnp.int16),
        y2_levels=unsched(y2lv, jnp.int16),
        uv_levels=unsched(uvlv, jnp.int16),
    )


# ---------------------------------------------------------------------------
# Packed transfer format (the throughput path)
# ---------------------------------------------------------------------------

N_ESC = 4  # escape slots per MB (levels outside int8 range are rare)


def _prepack_body(
    ybufs, ubufs, vbufs, params_tree, tables_tree, mbw: int, mbh: int,
    n_try: int, do_trellis: bool, segment_ids,
):
    """Analysis + int8 clip + escape extraction (NO sparse pack).

    Returns (lv8 [B,nmb,400] int8, meta8 [B,nmb,18] uint8,
    esc_pos/esc_val [B,nmb,N_ESC] int16, overflow [B] bool)."""
    out = encode_analysis_batch_v2.__wrapped__(
        ybufs, ubufs, vbufs, params_tree, tables_tree, mbw, mbh, n_try,
        do_trellis, segment_ids,
    )
    lv = jnp.concatenate(
        [
            out["y_levels"].reshape(*out["y_levels"].shape[:2], 256),
            out["uv_levels"].reshape(*out["uv_levels"].shape[:2], 128),
            out["y2_levels"],
        ],
        axis=-1,
    ).astype(jnp.int32)  # [B, nmb, 400]
    lv8 = jnp.clip(lv, -128, 127).astype(jnp.int8)

    mask = jnp.abs(lv) > 127
    pos_list, val_list = [], []
    iota = jnp.arange(400, dtype=jnp.int32)
    for _ in range(N_ESC):
        idx = jnp.argmax(mask, axis=-1)  # [B, nmb]
        found = mask.any(-1)
        val = jnp.take_along_axis(lv, idx[..., None], axis=-1)[..., 0]
        pos_list.append(jnp.where(found, idx, -1).astype(jnp.int16))
        val_list.append(jnp.where(found, val, 0).astype(jnp.int16))
        mask = mask & (iota != idx[..., None])
    overflow = mask.any((-1, -2))  # [B]

    meta8 = jnp.concatenate(
        [
            out["bpred"],
            out["luma_mode"][..., None],
            out["chroma_mode"][..., None],
        ],
        axis=-1,
    )  # [B, nmb, 18] uint8
    esc_pos = jnp.stack(pos_list, axis=-1)  # [B, nmb, N_ESC] int16
    esc_val = jnp.stack(val_list, axis=-1)
    return lv8, meta8, esc_pos, esc_val, overflow


@functools.partial(jax.jit, static_argnames=("mbw", "mbh", "n_try", "do_trellis"))
def _prepack_batch(
    ybufs, ubufs, vbufs, params_tree, tables_tree, mbw: int, mbh: int,
    n_try: int, do_trellis: bool = False, segment_ids=None,
):
    return _prepack_body(
        ybufs, ubufs, vbufs, params_tree, tables_tree, mbw, mbh, n_try,
        do_trellis, segment_ids,
    )


@functools.partial(jax.jit, static_argnames=("mbw", "mbh", "n_try", "do_trellis"))
def _prepack_batch_pertbl(
    ybufs, ubufs, vbufs, params_tree, tables_batched, mbw: int, mbh: int,
    n_try: int, do_trellis: bool = False, segment_ids=None,
):
    if segment_ids is None:
        def one(y, u, v, tbl):
            return _prepack_body(
                y[None], u[None], v[None], params_tree, tbl, mbw, mbh, n_try,
                do_trellis, None,
            )

        outs = jax.vmap(one)(ybufs, ubufs, vbufs, tables_batched)
    else:
        def one(y, u, v, tbl, p1, sid):
            return _prepack_body(
                y[None], u[None], v[None], p1, tbl, mbw, mbh, n_try,
                do_trellis, sid[None],
            )

        outs = jax.vmap(one)(
            ybufs, ubufs, vbufs, tables_batched, params_tree, segment_ids
        )
    return tuple(a[:, 0] for a in outs)


@functools.partial(jax.jit, static_argnames=("cap_mb",))
def _pack_levels_stage(lv8, cap_mb: int):
    from .sparse import device_pack_levels_mb

    return device_pack_levels_mb(lv8, cap_mb)


# Per-MB nonzero budget.  The old image-level cap (128/MB POOLED across the
# image) rode out local density spikes; a per-MB cap cannot, and the mixed
# gallery1 bench corpus measures per-MB nonzeros up to 234/400 at Q75 m4
# (27% of MBs exceed 128).  256 covers the observed max with margin; wire
# cost is 256 + 50 bytes/MB (vs 400 dense) and the pipelined fetch hides
# under device compute of the next batch.
CAP_MB = 256


# The d2h tunnel on this setup is UNCOMPRESSED at ~15-35 MB/s and the whole
# pipeline is tunnel-byte-bound, so the wire packs levels to 4 bits:
# measured Q75-m4 bench-corpus stats — 98.6% of nonzero levels have
# |v| <= 7; per-MB |v|>7 counts are mean 1.2 / max 21 (MED_CAP=32 covers
# with margin); |v|>127 escapes are a handful per image (image-level list,
# ESC_IMG cap).  A two-tier row scheme was measured r5 and REJECTED:
# per-image >128-nonzero MB counts range 66..961 of 1536 (median 364), so
# any safe tier-2 budget saves <15% while risking ~40 ms dense-fetch
# fallbacks per dense image.
MED_CAP = 32
ESC_IMG = 512


def wire_bytes(nmb: int) -> int:
    """Total bytes of the coalesced d2h wire buffer for an nmb-MB image."""
    # flags(2) + bitmap(50/MB) + int4 vals (CAP_MB/2 per MB) + med escapes
    # (MED_CAP idx u8 + MED_CAP val i8 per MB) + meta8(18/MB) + image-level
    # |v|>127 escape list (pos i32 + val i16).
    return 2 + nmb * (50 + CAP_MB // 2 + 2 * MED_CAP + 18) + ESC_IMG * 6


def _i16_le_bytes(x):
    """int16 [..., N] -> uint8 [..., 2N] little-endian byte pairs."""
    xu = x.astype(jnp.int32)
    lo = (xu & 0xFF).astype(jnp.uint8)
    hi = ((xu >> 8) & 0xFF).astype(jnp.uint8)
    return jnp.stack([lo, hi], axis=-1).reshape(*x.shape[:-1], -1)


def _pack_stage(lv8, meta8, esc_pos, esc_val, overflow):
    """Second stage: sparse-pack the levels and coalesce EVERYTHING the host
    needs into one uint8 wire buffer per image (one jit, one d2h fetch).

    Kept a separate jit from the analysis so the pack reads the
    materialized lv8 instead of being fused back into (and re-running parts
    of) the analysis producer.  The pack itself is the per-MB one-hot
    matmul of ops/sparse.py:device_pack_levels_mb — the image-wide
    searchsorted compaction it replaces cost 48.75 ms/img on v5e (its
    ~200k binary-search gathers per image are TPU-hostile; round 3's
    "fusion pathology" diagnosis mis-attributed that cost to XLA
    recomputation).

    Why one buffer: the d2h tunnel is uncompressed ~25-35 MB/s with ~25 ms
    per-RPC latency (measured r5), so seven separate np.asarray fetches per
    batch cost ~150 ms of pure latency on top of the bytes.  See
    wire_bytes for why vals are single-tier.
    """
    return lv8, _wire_stage(lv8, meta8, esc_pos, esc_val, overflow)


def _rank_compact(mask, cap: int, fields):
    """One-hot-matmul compaction along the last axis: for each leading
    index, gather the masked entries of each `fields` array (same shape as
    mask) into rank order, cap `cap`.  Returns (list of [..., cap] f32
    results, over [...] bool).  Exact for integer-valued fields < 2^24."""
    rank = jnp.cumsum(mask.astype(jnp.int32), axis=-1)
    over = rank[..., -1] > cap
    onehot = (
        (rank[..., None] == jnp.arange(1, cap + 1, dtype=jnp.int32))
        & mask[..., None]
    ).astype(jnp.float32)
    outs = [
        jnp.einsum(
            "...j,...jk->...k", f.astype(jnp.float32), onehot,
            preferred_element_type=jnp.float32,
        )
        for f in fields
    ]
    return outs, over


@jax.jit
def _wire_stage(lv8, meta8, esc_pos, esc_val, overflow):
    B, nmb, _ = lv8.shape
    bitmap, vals, sp_over = _pack_levels_stage(lv8, CAP_MB)

    # int4 nibbles of the compacted vals (two's complement; |v|>7 slots are
    # overridden by the med list on expansion).
    nib = vals.astype(jnp.int32) & 0xF
    vals4 = (nib[..., 0::2] | (nib[..., 1::2] << 4)).astype(jnp.uint8)

    # Per-MB med escapes: rank-compact the |v|>7 slots of the 256-slot
    # compacted vals into (slot index u8, int8 value) pairs.
    vmask = jnp.abs(vals.astype(jnp.int32)) > 7
    ks = jnp.broadcast_to(
        jnp.arange(CAP_MB, dtype=jnp.int32), vals.shape
    )
    (med_idx, med_val), med_over = _rank_compact(
        vmask, MED_CAP, (ks, vals.astype(jnp.int32) & 0xFF)
    )
    sp_over = sp_over | med_over.any(-1)

    # Image-level |v|>127 escape list from the per-MB (pos, val) pairs
    # (positions are dense level indices mb*400+pos; invalid slots are -1).
    gpos = (
        jnp.arange(nmb, dtype=jnp.int32)[None, :, None] * 400
        + esc_pos.astype(jnp.int32)
    ).reshape(B, -1)
    emask = (esc_pos >= 0).reshape(B, -1)
    (eg_pos, eg_val), eg_over = _rank_compact(
        emask, ESC_IMG,
        (gpos, esc_val.reshape(B, -1).astype(jnp.int32) & 0xFFFF),
    )
    overflow = overflow | eg_over

    flags = jnp.stack(
        [sp_over.astype(jnp.uint8), overflow.astype(jnp.uint8)], axis=-1
    )
    eg_pos_i = eg_pos.astype(jnp.int32)
    eg_pos_bytes = jnp.stack(
        [
            (eg_pos_i & 0xFF), (eg_pos_i >> 8) & 0xFF,
            (eg_pos_i >> 16) & 0xFF, (eg_pos_i >> 24) & 0xFF,
        ],
        axis=-1,
    ).astype(jnp.uint8).reshape(B, -1)
    wire = jnp.concatenate(
        [
            flags,
            bitmap.reshape(B, -1),
            vals4.reshape(B, -1),
            med_idx.astype(jnp.uint8).reshape(B, -1),
            med_val.astype(jnp.uint8).reshape(B, -1),
            meta8.reshape(B, -1),
            eg_pos_bytes,
            _i16_le_bytes(eg_val.astype(jnp.int32).astype(jnp.int16)),
        ],
        axis=-1,
    )
    return wire


def encode_analysis_batch_v2_packed(
    ybufs, ubufs, vbufs, params_tree, tables_tree, mbw: int, mbh: int, n_try: int,
    do_trellis: bool = False, segment_ids=None,
):
    """Analysis with device-side packing for the narrow host tunnel.

    Levels ship sparse — a nonzero bitmap plus the nonzero int8 values in
    slot order (ops/sparse.py wire format: 50 + CAP_MB(=256) bytes/MB vs 400
    dense;
    measured density is ~93 nonzeros/MB at Q75 m4) — plus up to N_ESC per-MB
    escape (position, int16 value) pairs for |level| > 127.  `sp_over[b]`
    flags an image whose nonzero count exceeded the sparse budget: the
    caller fetches that image's row of the dense int8 array instead (it is
    returned device-resident and costs nothing unless fetched).
    `overflow[b]` flags an image whose escapes didn't fit (the caller falls
    back to the plain int16 variant — compiled lazily, essentially never).

    Two chained jit dispatches, not one — see _pack_stage for why.
    """
    pre = _prepack_batch(
        ybufs, ubufs, vbufs, params_tree, tables_tree, mbw, mbh, n_try,
        do_trellis, segment_ids,
    )
    return _pack_stage(*pre)


def encode_analysis_batch_v2_pertbl_packed(
    ybufs, ubufs, vbufs, params_tree, tables_batched, mbw: int, mbh: int,
    n_try: int, do_trellis: bool = False, segment_ids=None,
):
    """Packed analysis with PER-IMAGE cost tables (two-pass second pass:
    each image's probabilities were adapted from its own pass-1 stats).

    tables_batched: an EncTables pytree whose leaves carry a leading [B]
    image axis (stack per-image EncTables with jax.tree_util.tree_map).
    Two chained jit dispatches, not one — see _pack_stage for why.
    """
    pre = _prepack_batch_pertbl(
        ybufs, ubufs, vbufs, params_tree, tables_batched, mbw, mbh, n_try,
        do_trellis, segment_ids,
    )
    return _pack_stage(*pre)


@functools.partial(
    jax.jit,
    static_argnames=("mbw", "mbh", "n_try", "do_trellis", "nparts", "max_ops",
                     "max_bytes"),
)
def encode_analysis_batch_v2_pertbl_tokens(
    ybufs, ubufs, vbufs, params_tree, tables_batched, probs_flat, mbw: int,
    mbh: int, n_try: int, do_trellis: bool, nparts: int, max_ops: int,
    max_bytes: int, segment_ids=None,
):
    """Pass-2 analysis + DEVICE token encoding in one graph (per-image cost
    tables AND per-image adapted probabilities).

    Returns (meta8 [B,nmb,19] uint8 — bpred, luma_mode, chroma_mode, skip —
    plus the finished coefficient partitions: lead [B,P], tok [B,P,max_bytes]
    uint8, tok_n [B,P], tok_state (bottom/range/bit_num [B,P]), n_ops [B,P])
    and, device-resident for the overflow fallback, the dense int8 levels +
    escape lists of the packed transfer format.
    """
    from .token_ops import encode_coeff_partitions

    nmb = mbw * mbh

    def pack_lv(out):
        lv = jnp.concatenate(
            [
                out["y_levels"].reshape(*out["y_levels"].shape[:2], 256),
                out["uv_levels"].reshape(*out["uv_levels"].shape[:2], 128),
                out["y2_levels"],
            ],
            axis=-1,
        ).astype(jnp.int32)[0]
        lv8 = jnp.clip(lv, -128, 127).astype(jnp.int8)
        mask = jnp.abs(lv) > 127
        pos_list, val_list = [], []
        iota = jnp.arange(400, dtype=jnp.int32)
        for _ in range(N_ESC):
            idx = jnp.argmax(mask, axis=-1)
            found = mask.any(-1)
            val = jnp.take_along_axis(lv, idx[..., None], axis=-1)[..., 0]
            pos_list.append(jnp.where(found, idx, -1).astype(jnp.int16))
            val_list.append(jnp.where(found, val, 0).astype(jnp.int16))
            mask = mask & (iota != idx[..., None])
        overflow = mask.any((-1, -2))
        return (
            lv8,
            jnp.stack(pos_list, axis=-1),
            jnp.stack(val_list, axis=-1),
            overflow,
        )

    def one(y, u, v, tbl, pf, p1, sid):
        out = encode_analysis_batch_v2.__wrapped__(
            y[None], u[None], v[None], p1, tbl, mbw, mbh, n_try, do_trellis,
            sid[None] if sid is not None else None,
        )
        y2 = out["y2_levels"][0]
        yl = out["y_levels"][0]
        uv = out["uv_levels"][0]
        lm = out["luma_mode"][0].astype(jnp.int32)
        lead, tok, tok_n, state, n_ops = encode_coeff_partitions.__wrapped__(
            y2, yl, uv, lm, pf, mbw, mbh, nparts, max_ops, max_bytes
        )
        skipped = (
            (yl == 0).all((-2, -1)) & (uv == 0).all((-2, -1)) & (y2 == 0).all(-1)
        )
        meta8 = jnp.concatenate(
            [
                out["bpred"][0],
                out["luma_mode"][0][..., None],
                out["chroma_mode"][0][..., None],
                skipped[..., None].astype(jnp.uint8),
            ],
            axis=-1,
        )
        lv8, esc_pos, esc_val, esc_over = pack_lv(out)
        return meta8, lead, tok, tok_n, state, n_ops, lv8, esc_pos, esc_val, esc_over

    if segment_ids is None:
        outs = jax.vmap(
            lambda y, u, v, tbl, pf: one(y, u, v, tbl, pf, params_tree, None)
        )(ybufs, ubufs, vbufs, tables_batched, probs_flat)
    else:
        outs = jax.vmap(
            lambda y, u, v, tbl, pf, p1, sid: one(y, u, v, tbl, pf, p1, sid)
        )(ybufs, ubufs, vbufs, tables_batched, probs_flat, params_tree, segment_ids)
    return outs


def stack_enc_tables(tables_list):
    """Per-image EncTables -> one EncTables pytree with [B]-leading leaves."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *tables_list)


def _build_level_code_masks_np():
    from ..encode.costs import _LC_A1, _LC_A0

    return _LC_A1.astype(np.float32), _LC_A0.astype(np.float32)


@jax.jit
def enc_tables_from_probs(probs_u8):
    """Per-image probability sets [B, 4, 8, 3, 11] -> batched EncTables.

    The host path built 32 EncTables via hundreds of small device
    transfers; here one 4 KB probability upload derives every table on
    device (the same closed form as the vectorized LevelCosts build).
    Jitted: built eagerly, the ~40 small ops each pay a remote-dispatch
    round trip (36 ms/img at batch 32 — the whole pass-1 budget twice over).
    """
    ent = jnp.asarray(ET.VP8_ENTROPY_COST.astype(np.int32))
    a1, a0 = _build_level_code_masks_np()
    bands = np.array(ET.VP8_ENC_BANDS[:16])

    p = probs_u8.astype(jnp.int32)  # [B,4,8,3,11]
    e1 = ent[255 - p]
    e0 = ent[p]
    cost0 = jnp.concatenate(
        [jnp.zeros_like(e1[..., :1, 0]), e1[..., 1:, 0]], axis=-1
    )  # [B,4,8,3]
    cost_base = e1[..., 1] + cost0

    # Variable level costs via the static level-code masks (byte-split
    # einsums: operands exact in bf16).
    def mask_dot(mask_np, e):
        hi = jnp.einsum(
            "vi,...i->...v", jnp.asarray(mask_np), (e >> 7).astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        lo = jnp.einsum(
            "vi,...i->...v", jnp.asarray(mask_np), (e & 127).astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        return (hi * 128 + lo).astype(jnp.int32)

    var = mask_dot(a1, e1[..., 2:]) + mask_dot(a0, e0[..., 2:])  # [B,4,8,3,67]
    lc0 = (e0[..., 1] + cost0)[..., None]
    lc = jnp.concatenate([lc0, cost_base[..., None] + var], axis=-1)  # [..,68]

    pos_cost = lc[:, :, bands]  # [B,4,16,3,68]
    B = p.shape[0]
    t = EncTables.__new__(EncTables)
    t.pos_cost = pos_cost
    t.p0 = p[..., 0][:, :, bands, :]
    t.fixed = jnp.broadcast_to(
        jnp.asarray(ET.VP8_LEVEL_FIXED_COSTS.astype(np.int32)), (B, 2048)
    )
    t.ent = jnp.broadcast_to(ent, (B, 256))
    t.weight_y = jnp.broadcast_to(
        jnp.asarray(np.asarray(ET.VP8_WEIGHT_Y, np.int32)), (B, 16)
    )
    t.fixed_i16 = jnp.broadcast_to(
        jnp.asarray(np.asarray(ET.FIXED_COSTS_I16, np.int32)), (B, 4)
    )
    t.fixed_uv = jnp.broadcast_to(
        jnp.asarray(np.asarray(ET.FIXED_COSTS_UV, np.int32)), (B, 4)
    )
    t.fixed_i4 = jnp.broadcast_to(
        jnp.asarray(np.asarray(ET.VP8_FIXED_COSTS_I4, np.int32)), (B, 10, 10, 10)
    )
    t.cls_cost = pos_cost[..., EncTables._CLS_REPS].astype(jnp.float32)
    t.eob_cost = e0[..., 0][:, :, bands, :]
    t.init_cost = e1[..., 0][:, :, bands, :]
    return t


@functools.partial(jax.jit, static_argnames=("mbw", "mbh", "n_try"))
def encode_analysis_stats_batch(
    ybufs, ubufs, vbufs, params_tree, tables_tree, mbw: int, mbh: int, n_try: int,
    segment_ids=None,
):
    """Pass-1 analysis fused with on-device token statistics.

    Two-pass probability adaptation needs ONLY the per-image (total, ones)
    node counts from pass 1 — a few KB — so the pass-1 levels never leave
    the device.  Returns (totals, ones) [B, 4, 8, 3, 11] int32.
    """
    from .token_stats import token_stats_device

    out = encode_analysis_batch_v2.__wrapped__(
        ybufs, ubufs, vbufs, params_tree, tables_tree, mbw, mbh, n_try, False,
        segment_ids,
    )
    lm = out["luma_mode"].astype(jnp.int32)
    y2 = out["y2_levels"].astype(jnp.int32)
    y = out["y_levels"].astype(jnp.int32)
    uv = out["uv_levels"].astype(jnp.int32)
    skipped = (
        (y == 0).all(axis=(-1, -2))
        & (uv == 0).all(axis=(-1, -2))
        & (y2 == 0).all(axis=-1)
    )
    return token_stats_device.__wrapped__(lm, y2, y, uv, skipped, mbw, mbh)


def split_wire(wire_row: np.ndarray, nmb: int):
    """Slice ONE image's coalesced uint8 wire buffer back into views.

    Returns (sp_over, overflow, bitmap, vals4 [nmb,CAP_MB/2] u8,
    med_idx [nmb,MED_CAP] u8, med_val [nmb,MED_CAP] i8, meta8 [nmb,18],
    eg_pos [ESC_IMG] i32, eg_val [ESC_IMG] i16).  Layout must match
    _wire_stage exactly.
    """
    o = 2
    sp_over, overflow = bool(wire_row[0]), bool(wire_row[1])
    bitmap = wire_row[o : o + nmb * 50]
    o += nmb * 50
    vals4 = wire_row[o : o + nmb * (CAP_MB // 2)].reshape(nmb, CAP_MB // 2)
    o += nmb * (CAP_MB // 2)
    med_idx = wire_row[o : o + nmb * MED_CAP].reshape(nmb, MED_CAP)
    o += nmb * MED_CAP
    med_val = wire_row[o : o + nmb * MED_CAP].view(np.int8).reshape(nmb, MED_CAP)
    o += nmb * MED_CAP
    meta8 = wire_row[o : o + nmb * 18].reshape(nmb, 18)
    o += nmb * 18
    eg_pos = wire_row[o : o + ESC_IMG * 4].view("<i4")
    o += ESC_IMG * 4
    eg_val = wire_row[o : o + ESC_IMG * 2].view("<i2")
    return sp_over, overflow, bitmap, vals4, med_idx, med_val, meta8, eg_pos, eg_val


def unpack_analysis_wire(wire_row: np.ndarray, nmb: int):
    """Host-side unpack of ONE image's coalesced wire buffer (sparse path):
    expand the per-MB bitmap + int4 vals + med escapes to dense levels
    (native C++, ~0.3 ms/img vs ~12 ms numpy), then apply the image-level
    |v|>127 escape list."""
    (_, _, bitmap, vals4, med_idx, med_val, meta8, eg_pos, eg_val) = split_wire(
        wire_row, nmb
    )
    try:
        from ..io import native

        lv = native.wire_expand_levels(bitmap, vals4, med_idx, med_val, nmb)
    except Exception as e:  # pragma: no cover - build/ABI problems
        from ..io.native import warn_once

        warn_once("wire_expand_levels", e)
        lv = _numpy_wire_expand(bitmap, vals4, med_idx, med_val, nmb)
    lv = lv.reshape(-1).astype(np.int32)
    live = eg_val != 0  # padding entries carry val 0 (real escapes are >127)
    lv[eg_pos[live]] = eg_val[live]
    return _split_levels(lv.reshape(nmb, 400), meta8)


def _numpy_wire_expand(bitmap, vals4, med_idx, med_val, nmb):
    """Numpy reference twin of native wire_expand_levels (tests + fallback)."""
    lo = (vals4.astype(np.int32) & 0xF)
    hi = (vals4.astype(np.int32) >> 4) & 0xF
    nib = np.empty((nmb, CAP_MB), np.int32)
    nib[:, 0::2] = lo
    nib[:, 1::2] = hi
    nib = np.where(nib >= 8, nib - 16, nib)  # two's complement int4
    # med escapes override their slots (rank order; padding entries have
    # val 0 which no real |v|>7 entry can carry)
    rows, cols = np.nonzero(med_val != 0)
    nib[rows, med_idx[rows, cols].astype(np.int64)] = med_val[rows, cols]
    from .sparse import host_expand_levels_mb

    return host_expand_levels_mb(
        bitmap, np.clip(nib, -128, 127).astype(np.int8), nmb, 400
    ).astype(np.int16)


def _split_levels(lv, meta8):
    """[nmb, 400] int32 levels + meta8 -> the plain arrays dict."""
    nmb = lv.shape[0]
    return dict(
        y_levels=lv[:, :256].reshape(nmb, 16, 16),
        uv_levels=lv[:, 256:384].reshape(nmb, 8, 16),
        y2_levels=lv[:, 384:],
        bpred=meta8[:, :16].astype(np.int32),
        luma_mode=meta8[:, 16].astype(np.int32),
        chroma_mode=meta8[:, 17].astype(np.int32),
    )


def unpack_analysis(lv8, meta8, esc_pos, esc_val):
    """Host-side unpack of the packed transfer -> the plain arrays dict
    for ONE image (numpy inputs [nmb, ...]; esc_pos/esc_val are the per-MB
    [nmb, N_ESC] escape pairs of _prepack_body)."""
    lv = lv8.astype(np.int32)
    for k in range(N_ESC):
        sel = np.flatnonzero(esc_pos[:, k] >= 0)
        if len(sel):
            lv[sel, esc_pos[sel, k].astype(np.int64)] = esc_val[sel, k]
    return _split_levels(lv, meta8)


def unpack_analysis_dense_wire(lv8_row, wire_row, nmb):
    """sp_over fallback: dense int8 levels row + the wire's image-level
    escape list -> the plain arrays dict."""
    (_, _, _, _, _, _, meta8, eg_pos, eg_val) = split_wire(wire_row, nmb)
    lv = lv8_row.reshape(-1).astype(np.int32)
    live = eg_val != 0
    lv[eg_pos[live]] = eg_val[live]
    return _split_levels(lv.reshape(nmb, 400), meta8)
