"""Encoder mode decision + reconstruction on device (JAX wavefront).

The encoder has the decoder's dependency structure — MB (x, y) predicts from
reconstructed neighbors — so the full-RD search (I16/I4/UV candidate
evaluation: predict, DCT, quantize, rate via level-cost gathers, dequantize,
IDCT, SSE + TDisto) runs on the same anti-diagonal wavefront, with every
candidate batched. Semantics mirror `webp_tpu.encode.vp8._analysis_pass`
exactly (same tie-breaking, same edge-mode skipping, same I4 early-exit
condition expressed as an all-prefixes test); `tests/test_encode_wavefront.py`
enforces equality.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .wavefront import (
    _build_ws_chroma,
    _build_ws_luma,
    _clip255,
    _predict_b_all_mat,
    _predict_whole,
    assemble_plane,
    diagonal_schedule,
    inverse_schedule,
)
from . import jax_ops

BIG = jnp.int32(1 << 30)  # sentinel / saturation score (int32 lanes)


def _rd_score32(rate, disto, lam):
    """floor(rate*lam / 256) + disto in pure int32 via hi/lo split.

    Exact for rate*lam < 2^38 (hi = rate>>8 capped so hi*lam stays in int32;
    beyond that the score saturates, which only affects absurd candidates).
    `lam` may be a python int or a broadcastable int32 array (per-segment
    lambdas in the v2 kernel).
    """
    if isinstance(lam, (int, np.integer)):
        lam = int(lam)
        cap = (1 << 30) // max(lam, 1)
    else:
        cap = (1 << 30) // jnp.maximum(lam, 1)
    hi = jnp.minimum(rate >> 8, cap)
    lo = rate & 255
    return hi * lam + ((lo * lam) >> 8) + disto

ZZ = np.array([0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15])
IZZ = np.argsort(ZZ)


class EncTables:
    """Constant device arrays: cost tables, weights, fixed mode costs."""

    # Token-class representatives: pos_cost[..., v] is constant within each
    # class (the per-level extra bits live in the fixed table), so the v2
    # kernel rates levels with an 11-wide one-hot against cls_cost.
    _CLS_REPS = np.array([0, 1, 2, 3, 4, 5, 7, 11, 19, 35, 67])

    def __init__(self, level_costs, ent_cost, fixed_costs, weight_y, fixed_i16, fixed_uv, fixed_i4):
        self.pos_cost = jnp.asarray(level_costs.pos_cost, jnp.int32)  # [4,16,3,68]
        self.p0 = jnp.asarray(level_costs.p0, jnp.int32)  # [4,16,3]
        self.fixed = jnp.asarray(level_costs.fixed, jnp.int32)  # [2048]
        self.ent = jnp.asarray(ent_cost, jnp.int32)  # [256]
        self.weight_y = jnp.asarray(weight_y, jnp.int32)
        self.fixed_i16 = jnp.asarray(fixed_i16, jnp.int32)
        self.fixed_uv = jnp.asarray(fixed_uv, jnp.int32)
        self.fixed_i4 = jnp.asarray(fixed_i4, jnp.int32)  # [10,10,10]
        ent64 = np.asarray(ent_cost, np.int64)
        p0np = np.asarray(level_costs.p0, np.int64)
        # [4,16,3,11] f32 class costs (exact: values < 2^24).
        self.cls_cost = jnp.asarray(
            np.asarray(level_costs.pos_cost)[..., self._CLS_REPS], jnp.float32
        )
        self.eob_cost = jnp.asarray(ent64[p0np], jnp.int32)        # [4,16,3]
        self.init_cost = jnp.asarray(ent64[255 - p0np], jnp.int32)  # [4,16,3]

    @classmethod
    def from_level_costs(cls, lc):
        from ..encode import tables as ET

        return cls(
            lc,
            ET.VP8_ENTROPY_COST,
            ET.VP8_LEVEL_FIXED_COSTS,
            ET.VP8_WEIGHT_Y,
            ET.FIXED_COSTS_I16,
            ET.FIXED_COSTS_UV,
            ET.VP8_FIXED_COSTS_I4,
        )

    @classmethod
    def default(cls):
        from ..common import vp8_tables as T
        from ..encode import costs as C

        return cls.from_level_costs(C.cached_level_costs(T.COEFF_PROBS_DEFAULT))


class EncParams:
    """Per-call quantizer/lambda arrays for one segment."""

    def __init__(self, seg):
        from ..common import vp8_tables as _T

        def zzvec(m, attr):
            v = np.empty(16, np.int32)
            v[:] = getattr(m, attr)[1]
            v[0] = getattr(m, attr)[0]
            return jnp.asarray(v)

        self.y1_iq, self.y1_bias, self.y1_q = (
            zzvec(seg.y1, "iq"), zzvec(seg.y1, "bias"), zzvec(seg.y1, "q"))
        self.y2_iq, self.y2_bias, self.y2_q = (
            zzvec(seg.y2, "iq"), zzvec(seg.y2, "bias"), zzvec(seg.y2, "q"))
        self.uv_iq, self.uv_bias, self.uv_q = (
            zzvec(seg.uv, "iq"), zzvec(seg.uv, "bias"), zzvec(seg.uv, "q"))
        zz = np.asarray(_T.ZIGZAG)
        self.y1_sharpen = jnp.asarray(np.asarray(seg.y1.sharpen)[zz].astype(np.int32))
        self.lambda_i16 = seg.lambda_i16
        self.lambda_i4 = seg.lambda_i4
        self.lambda_uv = seg.lambda_uv
        self.lambda_mode = seg.lambda_mode
        self.tlambda = seg.tlambda
        self.lambda_trellis_i16 = seg.lambda_trellis_i16
        self.lambda_trellis_i4 = seg.lambda_trellis_i4


def _bit_cost(tbl, bit_true, prob):
    return jnp.where(bit_true, tbl.ent[255 - prob], tbl.ent[prob])


def residual_costs_jax(levels, ctype: int, first: int, ctx0, tbl: EncTables):
    """Rate of [N, 16] zigzag level blocks in 1/256 bits (GetResidualCost)."""
    v = jnp.abs(levels)
    N = levels.shape[0]
    ctx0 = jnp.broadcast_to(jnp.asarray(ctx0, jnp.int32), (N,))
    nz = v != 0
    any_nz = nz[:, first:].any(axis=1)
    last = jnp.where(any_nz, 15 - jnp.argmax(nz[:, ::-1], axis=1), -1)
    vc = jnp.minimum(v, 67)
    vfix = tbl.fixed[jnp.minimum(v, 2047)]

    cost = jnp.where(ctx0 == 0, _bit_cost(tbl, True, tbl.p0[ctype, first, ctx0]), 0)
    ctx = ctx0
    last_ctx = ctx0
    for n in range(first, 16):
        active = n <= last
        c_n = tbl.pos_cost[ctype, n][ctx, vc[:, n]] + vfix[:, n]
        cost = jnp.where(active, cost + c_n, cost)
        last_ctx = jnp.where(active & (n == last), jnp.where(v[:, n] == 1, 1, 2), last_ctx)
        ctx = jnp.where(active, jnp.minimum(v[:, n], 2), ctx)

    eob_pos = jnp.minimum(last + 1, 15)
    eob = _bit_cost(tbl, False, tbl.p0[ctype, eob_pos, last_ctx])
    cost = jnp.where(any_nz & (last < 15), cost + eob, cost)
    empty = _bit_cost(tbl, False, tbl.p0[ctype, first, ctx0])
    return jnp.where(any_nz, cost, empty)


def _t_transform_j(blocks, w):
    b = blocks.astype(jnp.int32)
    e0, e1, e2, e3 = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    a0, a1, a2, a3 = e0 + e2, e1 + e3, e1 - e3, e0 - e2
    t = jnp.stack([a0 + a1, a3 + a2, a3 - a2, a0 - a1], axis=-1)
    c0, c1, c2, c3 = t[..., 0, :], t[..., 1, :], t[..., 2, :], t[..., 3, :]
    a0, a1, a2, a3 = c0 + c2, c1 + c3, c1 - c3, c0 - c2
    out = jnp.stack([a0 + a1, a3 + a2, a3 - a2, a0 - a1], axis=-2)
    return (jnp.abs(out) * w.reshape(4, 4)).sum(axis=(-1, -2))


def _tdisto_j(src, rec, w):
    return jnp.abs(_t_transform_j(rec, w) - _t_transform_j(src, w)) >> 5


def _quant_zz(blocks_raster, iq, bias):
    return jax_ops.quantize_zz(blocks_raster[..., ZZ], iq, bias)


def _dequant_zz(levels, q):
    return (levels * q)[..., IZZ]


def _blocks16(mb16):
    """[16, 16] spatial -> [16 blocks, 16] raster-order coefficients."""
    return mb16.reshape(4, 4, 4, 4).transpose(0, 2, 1, 3).reshape(16, 16)


def _spatial16(blocks):
    return blocks.reshape(4, 4, 4, 4).transpose(0, 2, 1, 3).reshape(16, 16)


def _blocks8(mb8):
    return mb8.reshape(2, 4, 2, 4).transpose(0, 2, 1, 3).reshape(4, 16)


def _spatial8(blocks):
    return blocks.reshape(2, 2, 4, 4).transpose(0, 2, 1, 3).reshape(8, 8)


def _sse(a, b):
    d = a - b
    return (d * d).sum(axis=tuple(range(1, d.ndim))) if d.ndim > 1 else (d * d).sum()


def _i16_search(ws, src, mbx, mby, P: EncParams, tbl: EncTables, t_4x4):
    """Try DC/V/H/TM; returns (mode, score_at_lambda_mode, y2_lv, y_lv, rec)."""
    is_flat = (src == src[0, 0]).all()

    def eval_mode(mode):
        pred = _predict_whole(ws, 16, jnp.int32(mode), mby != 0, mbx != 0)
        resid = src - pred
        dct = jax_ops.dct4x4(_blocks16(resid))
        y2 = jax_ops.wht4x4(dct[:, 0][None, :])[0]
        y2_lv = _quant_zz(y2[None, :], P.y2_iq, P.y2_bias)[0]
        y_lv = _quant_zz(dct, P.y1_iq, P.y1_bias).at[:, 0].set(0)
        cost = residual_costs_jax(y2_lv[None, :], 1, 0, 0, tbl)[0]
        cost = cost + residual_costs_jax(y_lv, 0, 1, 0, tbl).sum()
        y2_r = jax_ops.iwht4x4(_dequant_zz(y2_lv, P.y2_q)[None, :])[0]
        blk = _dequant_zz(y_lv, P.y1_q)
        blk = blk.at[:, 0].set(y2_r)
        res = jax_ops.idct4x4(blk)
        rec = _clip255(pred + _spatial16(res))
        d = _sse(src[None], rec[None])[0]
        sd = jnp.where(
            P.tlambda > 0,
            (P.tlambda * _tdisto_j(t_4x4(src), t_4x4(rec), tbl.weight_y).sum() + 128) >> 8,
            0,
        )
        flat_pen = is_flat & ((y_lv[:, 1:] != 0).sum() <= 0)
        d = jnp.where(flat_pen, d * 2, d)
        sd = jnp.where(flat_pen, sd * 2, sd)
        return y2_lv, y_lv, rec, cost, d, sd

    y2s, ys, recs, costs, ds, sds = [], [], [], [], [], []
    for mode in range(4):
        y2_lv, y_lv, rec, cost, d, sd = eval_mode(mode)
        y2s.append(y2_lv)
        ys.append(y_lv)
        recs.append(rec)
        costs.append(cost)
        ds.append(d)
        sds.append(sd)
    costs = jnp.stack(costs)
    ds = jnp.stack(ds)
    sds = jnp.stack(sds)
    mode_costs = tbl.fixed_i16
    allowed = jnp.stack(
        [jnp.bool_(True), mby != 0, mbx != 0, (mbx != 0) & (mby != 0)]
    )
    scores = _rd_score32(mode_costs + costs, ds + sds, P.lambda_i16)
    scores = jnp.where(allowed, scores, BIG)
    best = jnp.argmin(scores)
    final = _rd_score32(mode_costs[best] + costs[best], ds[best] + sds[best], P.lambda_mode)
    return (
        best,
        final,
        jnp.stack(y2s)[best],
        jnp.stack(ys)[best],
        jnp.stack(recs)[best],
    )


def _i4_search(ws0, src, tb_modes, lb_modes, i16_score, n_try: int, P, tbl, t_4x4_blk):
    """Sequential 16-subblock I4 search; returns (ok, modes, levels, ws)."""

    def sub_step(i, carry):
        ws, tb, lb, levels, modes, rate, disto, ok = carry
        sby = i // 4
        sbx = i % 4
        y0 = sby * 4 + 1
        x0 = sbx * 4 + 1
        sb_src = jax.lax.dynamic_slice(src, (sby * 4, sbx * 4), (4, 4))
        patch = jax.lax.dynamic_slice(ws, (y0 - 1, x0 - 1), (5, 9))
        preds = _predict_b_all_mat(patch)  # [10, 4, 4]
        pred_sse = ((preds - sb_src[None]) ** 2).sum(axis=(1, 2))
        order = jnp.argsort(pred_sse, stable=True)[:n_try]
        cand = preds[order]  # [n, 4, 4]
        resid = sb_src[None] - cand
        dct = jax_ops.dct4x4(resid.reshape(n_try, 16))
        lv = _quant_zz(dct, P.y1_iq, P.y1_bias)
        cc = residual_costs_jax(lv, 3, 0, 0, tbl)
        res = jax_ops.idct4x4(_dequant_zz(lv, P.y1_q))
        rec = _clip255(cand + res.reshape(n_try, 4, 4))
        d = ((rec - sb_src[None]) ** 2).sum(axis=(1, 2))
        sd = jnp.where(
            P.tlambda > 0,
            (P.tlambda * _tdisto_j(sb_src[None], rec, tbl.weight_y) + 128) >> 8,
            0,
        )
        mode_costs = tbl.fixed_i4[tb[sbx], lb[sby]][order]
        rates = cc + mode_costs
        scores = _rd_score32(rates, d + sd, P.lambda_i4)
        k = jnp.argmin(scores)
        m = order[k]

        ws = jax.lax.dynamic_update_slice(ws, rec[k].astype(ws.dtype), (y0, x0))
        tb = tb.at[sbx].set(m.astype(tb.dtype))
        lb = lb.at[sby].set(m.astype(lb.dtype))
        levels = levels.at[i].set(lv[k].astype(levels.dtype))
        modes = modes.at[i].set(m.astype(modes.dtype))
        rate = (rate + rates[k]).astype(rate.dtype)
        disto = (disto + d[k] + sd[k]).astype(disto.dtype)
        running = _rd_score32(rate, disto, P.lambda_mode)
        ok = ok & (running < i16_score)
        return ws, tb, lb, levels, modes, rate, disto, ok

    init = (
        ws0,
        tb_modes,
        lb_modes,
        jnp.zeros((16, 16), jnp.int32),
        jnp.zeros(16, jnp.int32),
        jnp.int32(211),
        jnp.int32(0),
        jnp.bool_(True),
    )
    ws, tb, lb, levels, modes, rate, disto, ok = jax.lax.fori_loop(0, 16, sub_step, init)
    return ok, modes, levels, ws, tb, lb


def _uv_search(uws, vws, usrc, vsrc, mbx, mby, P, tbl):
    def eval_mode(mode):
        levels = []
        recs = []
        dcts = []
        preds = []
        d = jnp.int32(0)
        for ws, srcp in ((uws, usrc), (vws, vsrc)):
            pred = _predict_whole(ws, 8, jnp.int32(mode), mby != 0, mbx != 0)
            resid = srcp - pred
            dct = jax_ops.dct4x4(_blocks8(resid))
            lv = _quant_zz(dct, P.uv_iq, P.uv_bias)
            rec = _clip255(pred + _spatial8(jax_ops.idct4x4(_dequant_zz(lv, P.uv_q))))
            levels.append(lv)
            recs.append(rec)
            dcts.append(dct)
            preds.append(pred)
            d = d + _sse(srcp[None], rec[None])[0]
        levels = jnp.concatenate(levels)  # [8, 16]
        cost = residual_costs_jax(levels, 2, 0, 0, tbl).sum()
        rate = tbl.fixed_uv[mode] + cost
        flat = (levels[:, 1:] != 0).sum() <= 2
        rate = jnp.where((mode != 0) & flat, rate + 140 * 8, rate)
        score = _rd_score32(rate, d, P.lambda_uv)
        return score, levels, recs, dcts, preds

    scores, lvls, urecs, vrecs, udcts, vdcts, upreds, vpreds = [], [], [], [], [], [], [], []
    for mode in range(4):
        s, lv, recs, dcts, preds = eval_mode(mode)
        scores.append(s)
        lvls.append(lv)
        urecs.append(recs[0])
        vrecs.append(recs[1])
        udcts.append(dcts[0])
        vdcts.append(dcts[1])
        upreds.append(preds[0])
        vpreds.append(preds[1])
    scores = jnp.stack(scores)
    allowed = jnp.stack(
        [
            jnp.bool_(True),
            mby != 0,
            mbx != 0,
            (mbx != 0) & (mby != 0),
        ]
    )
    scores = jnp.where(allowed, scores, BIG)
    best = jnp.argmin(scores)
    pick = lambda xs: jnp.stack(xs)[best]
    return (best, pick(lvls), pick(urecs), pick(vrecs),
            (pick(udcts), pick(vdcts)), (pick(upreds), pick(vpreds)))


def _chroma_diffusion_j(dcts, preds, P, top_err, left_err):
    """Device chroma DC error diffusion (C1=7/C2=8, DSHIFT-DSCALE=3).

    dcts/preds: ([4,16] dct, [8,8] pred) per channel; top_err/left_err:
    [2, 2] int32 state. Returns (levels [8,16], urec, vrec, new_top, new_left).
    """
    q = P.uv_q[0]
    iq = P.uv_iq[0]
    bias = P.uv_bias[0]
    out_levels = []
    recs = []
    new_top = []
    new_left = []
    for ci in range(2):
        dct = dcts[ci]
        te = top_err[ci]
        le = left_err[ci]

        def diffuse(dct, bi, t_err, l_err):
            dc = dct[bi, 0] + ((7 * t_err + 8 * l_err) >> 3)
            dct = dct.at[bi, 0].set(dc)
            a = jnp.abs(dc)
            level = (a * iq + bias) >> 17
            err = a - level * q
            err = jnp.where(dc < 0, -err, err)
            return dct, jnp.clip(err >> 1, -127, 127)

        dct, e0 = diffuse(dct, 0, te[0], le[0])
        dct, e1 = diffuse(dct, 1, te[1], e0)
        dct, e2 = diffuse(dct, 2, e0, le[1])
        dct, e3 = diffuse(dct, 3, e1, e2)
        nl1 = (3 * e3) >> 2
        new_left.append(jnp.stack([e1, nl1]))
        new_top.append(jnp.stack([e2, e3 - nl1]))

        lv = _quant_zz(dct, P.uv_iq, P.uv_bias)
        out_levels.append(lv)
        rec = _clip255(preds[ci] + _spatial8(jax_ops.idct4x4(_dequant_zz(lv, P.uv_q))))
        recs.append(rec)
    return (jnp.concatenate(out_levels), recs[0], recs[1],
            jnp.stack(new_top), jnp.stack(new_left))


def encode_analysis_frame(ybuf, ubuf, vbuf, params_tree, tables_tree, mbw: int, mbh: int, n_try: int):
    """Full-frame mode decision + reconstruction on the wavefront.

    RD scores use the scaled int32 formula floor(rate*lambda/256) + disto
    (mirrored by the host encoder), keeping every lane 32-bit on TPU.
    Returns dict of per-MB decisions and level tensors.
    """
    return _encode_analysis_frame(
        ybuf, ubuf, vbuf, params_tree, tables_tree, mbw, mbh, n_try
    )


@functools.partial(jax.jit, static_argnames=("mbw", "mbh", "n_try"))
def _encode_analysis_frame(ybuf, ubuf, vbuf, params_tree, tables_tree, mbw: int, mbh: int, n_try: int):
    P = params_tree
    tbl = tables_tree
    xs, ys, valid = diagonal_schedule(mbw, mbh)
    nmb = mbw * mbh

    y_src = ybuf.astype(jnp.int32)
    u_src = ubuf.astype(jnp.int32)
    v_src = vbuf.astype(jnp.int32)

    def t_4x4(mb16):
        return mb16.reshape(4, 4, 4, 4).transpose(0, 2, 1, 3).reshape(16, 4, 4)

    state = dict(
        top_y=jnp.full((mbw * 16 + 4,), 127, jnp.int32),
        top_u=jnp.full((mbw * 8 + 4,), 127, jnp.int32),
        top_v=jnp.full((mbw * 8 + 4,), 127, jnp.int32),
        left_y=jnp.full((mbh, 17), 129, jnp.int32),
        left_u=jnp.full((mbh, 9), 129, jnp.int32),
        left_v=jnp.full((mbh, 9), 129, jnp.int32),
        top_bpred=jnp.zeros((mbw, 4), jnp.int32),
        left_bpred=jnp.zeros((mbh, 4), jnp.int32),
        top_derr=jnp.zeros((mbw, 2, 2), jnp.int32),
        left_derr=jnp.zeros((mbh, 2, 2), jnp.int32),
    )

    def mb_kernel(x, y, top_y, top_u, top_v, left_y_row, left_u_row, left_v_row, tb, lb, tde, lde):
        src = jax.lax.dynamic_slice(y_src, (y * 16, x * 16), (16, 16))
        usrc = jax.lax.dynamic_slice(u_src, (y * 8, x * 8), (8, 8))
        vsrc = jax.lax.dynamic_slice(v_src, (y * 8, x * 8), (8, 8))

        ws0 = _build_ws_luma(x, y, mbw, top_y, left_y_row)
        i16_mode, i16_score, i16_y2, i16_y, i16_rec = _i16_search(
            ws0, src, x, y, P, tbl, t_4x4
        )

        if n_try > 0:
            ok, modes, i4_levels, ws4, tb4, lb4 = _i4_search(
                ws0, src, tb, lb, i16_score, n_try, P, tbl, None
            )
        else:
            ok = jnp.bool_(False)
            modes = jnp.zeros(16, jnp.int32)
            i4_levels = jnp.zeros((16, 16), jnp.int32)
            ws4 = ws0
            tb4, lb4 = tb, lb

        use_i4 = ok
        luma_rec = jnp.where(use_i4, ws4[1:17, 1:17], i16_rec)
        luma_mode = jnp.where(use_i4, 4, i16_mode)
        bmode_tbl = jnp.array([0, 2, 3, 1])
        bmode = bmode_tbl[i16_mode]
        bpred_out = jnp.where(
            use_i4,
            modes,
            jnp.zeros(16, jnp.int32).at[12:].set(bmode),
        )
        new_tb = jnp.where(use_i4, tb4, jnp.full(4, bmode))
        new_lb = jnp.where(use_i4, lb4, jnp.full(4, bmode))
        y_levels = jnp.where(use_i4, i4_levels, i16_y)
        y2_levels = jnp.where(use_i4, jnp.zeros(16, jnp.int32), i16_y2)

        uws0 = _build_ws_chroma(x, y, top_u, left_u_row)
        vws0 = _build_ws_chroma(x, y, top_v, left_v_row)
        uv_mode, uv_levels, urec, vrec, uv_dcts, uv_preds = _uv_search(
            uws0, vws0, usrc, vsrc, x, y, P, tbl
        )
        uv_levels, urec, vrec, new_tde, new_lde = _chroma_diffusion_j(
            uv_dcts, uv_preds, P, tde, lde
        )

        new_left_y = jnp.concatenate([ws0[0:1, 16], luma_rec[:, 15]])
        new_left_u = jnp.concatenate([uws0[0:1, 8], urec[:, 7]])
        new_left_v = jnp.concatenate([vws0[0:1, 8], vrec[:, 7]])

        return (
            luma_rec, urec, vrec, new_left_y, new_left_u, new_left_v,
            luma_mode, bpred_out, y_levels, y2_levels, uv_mode, uv_levels,
            new_tb, new_lb, new_tde, new_lde,
        )

    def step(state, inputs):
        x, y, ok = inputs
        out = jax.vmap(
            mb_kernel,
            in_axes=(0, 0, None, None, None, 0, 0, 0, 0, 0, 0, 0),
        )(
            x, y,
            state["top_y"], state["top_u"], state["top_v"],
            state["left_y"][y], state["left_u"][y], state["left_v"][y],
            state["top_bpred"][x], state["left_bpred"][y],
            state["top_derr"][x], state["left_derr"][y],
        )
        (yblk, ublk, vblk, nly, nlu, nlv, lmode, bp, ylv, y2lv, cmode, uvlv,
         ntb, nlb, ntde, nlde) = out

        ox = jnp.where(ok, x, mbw + 100)
        oy = jnp.where(ok, y, mbh + 100)
        r16 = jnp.arange(16)
        r8 = jnp.arange(8)

        state = dict(state)
        state["top_y"] = state["top_y"].at[ox[:, None] * 16 + r16[None, :]].set(
            yblk[:, 15, :], mode="drop"
        )
        state["top_u"] = state["top_u"].at[ox[:, None] * 8 + r8[None, :]].set(
            ublk[:, 7, :], mode="drop"
        )
        state["top_v"] = state["top_v"].at[ox[:, None] * 8 + r8[None, :]].set(
            vblk[:, 7, :], mode="drop"
        )
        is_last = ok & (x == mbw - 1)
        tail_val = jnp.where(
            is_last.any(), yblk[jnp.argmax(is_last), 15, 15], state["top_y"][mbw * 16 - 1]
        )
        tail = jnp.where(is_last.any(), jnp.full(4, tail_val), state["top_y"][mbw * 16 :])
        state["top_y"] = state["top_y"].at[mbw * 16 :].set(tail)

        state["left_y"] = state["left_y"].at[oy].set(nly, mode="drop")
        state["left_u"] = state["left_u"].at[oy].set(nlu, mode="drop")
        state["left_v"] = state["left_v"].at[oy].set(nlv, mode="drop")
        state["top_bpred"] = state["top_bpred"].at[ox].set(ntb, mode="drop")
        state["left_bpred"] = state["left_bpred"].at[oy].set(nlb, mode="drop")
        state["top_derr"] = state["top_derr"].at[ox].set(ntde, mode="drop")
        state["left_derr"] = state["left_derr"].at[oy].set(nlde, mode="drop")
        return state, (lmode, cmode, bp, ylv, y2lv, uvlv)

    state, outs = jax.lax.scan(step, state, (xs, ys, valid))
    lmode, cmode, bp, ylv, y2lv, uvlv = outs
    t_of, lane_of = inverse_schedule(mbw, mbh)
    pick = lambda a: a[t_of, lane_of]
    return dict(
        luma_mode=pick(lmode),
        chroma_mode=pick(cmode),
        bpred=pick(bp),
        y_levels=pick(ylv),
        y2_levels=pick(y2lv),
        uv_levels=pick(uvlv),
    )


jax.tree_util.register_pytree_node(
    EncParams,
    lambda p: (
        (
            p.y1_iq, p.y1_bias, p.y1_q, p.y2_iq, p.y2_bias, p.y2_q,
            p.uv_iq, p.uv_bias, p.uv_q, p.y1_sharpen,
        ),
        (p.lambda_i16, p.lambda_i4, p.lambda_uv, p.lambda_mode, p.tlambda,
         p.lambda_trellis_i16, p.lambda_trellis_i4),
    ),
    lambda aux, leaves: _encparams_unflatten(aux, leaves),
)


def _encparams_unflatten(aux, leaves):
    p = EncParams.__new__(EncParams)
    (p.y1_iq, p.y1_bias, p.y1_q, p.y2_iq, p.y2_bias, p.y2_q,
     p.uv_iq, p.uv_bias, p.uv_q, p.y1_sharpen) = leaves
    (p.lambda_i16, p.lambda_i4, p.lambda_uv, p.lambda_mode, p.tlambda,
     p.lambda_trellis_i16, p.lambda_trellis_i4) = aux
    return p


jax.tree_util.register_pytree_node(
    EncTables,
    lambda t: (
        (t.pos_cost, t.p0, t.fixed, t.ent, t.weight_y, t.fixed_i16, t.fixed_uv,
         t.fixed_i4, t.cls_cost, t.eob_cost, t.init_cost),
        None,
    ),
    lambda aux, leaves: _enctables_unflatten(aux, leaves),
)


def _enctables_unflatten(aux, leaves):
    t = EncTables.__new__(EncTables)
    (t.pos_cost, t.p0, t.fixed, t.ent, t.weight_y, t.fixed_i16, t.fixed_uv,
     t.fixed_i4, t.cls_cost, t.eob_cost, t.init_cost) = leaves
    return t


@functools.partial(jax.jit, static_argnames=("mbw", "mbh", "n_try"))
def encode_analysis_batch(ybufs, ubufs, vbufs, params_tree, tables_tree, mbw: int, mbh: int, n_try: int):
    """Batched (vmapped) frame analysis: [B, ...] planes -> batched decisions."""
    return jax.vmap(
        lambda y, u, v: _encode_analysis_frame(y, u, v, params_tree, tables_tree, mbw, mbh, n_try)
    )(ybufs, ubufs, vbufs)
