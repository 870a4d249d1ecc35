"""Trellis (rate-distortion optimal) quantization, batched over blocks.

2-node-per-position dynamic program over zigzag positions (libwebp
VP8TrellisQuantizeBlock semantics; parity reference
`/root/reference/src/encoder/cost.rs:788-1006`): at each position the level is
either the neutral-bias quantization or one above, predecessors carry the
probability context, and EOB termination is scored at every position. All
16 positions x 2 nodes x N blocks evaluate as numpy tensors — the same shape
used by the device port.
"""

from __future__ import annotations

import numpy as np

from ..common import vp8_tables as T
from . import tables as ET
from .costs import LevelCosts
from .quant import QFIX

ZZ = np.asarray(T.ZIGZAG)
BIG = np.int64(1) << 62
_BANDS = np.array(ET.VP8_ENC_BANDS[:17], np.int64)


def _bias(b):
    return ((b << QFIX) + 128) >> 8


def trellis_quantize(coeffs_raster: np.ndarray, mtx, lambda_: int, first: int,
                     costs: LevelCosts, ctype: int, ctx0: np.ndarray):
    """RD-optimal levels for [N, 16] raster-order coefficient blocks.

    Returns (levels_zz [N, 16], has_nz [N]).
    """
    N = coeffs_raster.shape[0]
    c_zz = coeffs_raster[:, ZZ].astype(np.int64)
    ctx0 = np.broadcast_to(np.asarray(ctx0, np.int64), (N,))

    q = np.empty(16, np.int64)
    q[:] = mtx.q[1]
    q[0] = mtx.q[0]
    iq = np.empty(16, np.int64)
    iq[:] = mtx.iq[1]
    iq[0] = mtx.iq[0]
    sharpen = mtx.sharpen[ZZ]
    weight = ET.VP8_WEIGHT_TRELLIS.astype(np.int64)[ZZ]

    # Last significant coefficient by threshold, extended by one.
    thresh = int(mtx.q[1]) * int(mtx.q[1]) // 4
    sig = (c_zz * c_zz) > thresh
    sig[:, :first] = False
    any_sig = sig.any(axis=1)
    last = np.where(any_sig, 15 - np.argmax(sig[:, ::-1], axis=1), first - 1)
    last = np.minimum(last + 1, 15)

    sign = c_zz < 0
    a = np.abs(c_zz) + sharpen[None, :]

    neutral = _bias(0x00)
    tbias = _bias(0x80)
    level0 = np.minimum((a * iq + neutral) >> QFIX, 2047)
    thresh_level = np.minimum((a * iq + tbias) >> QFIX, 2047)

    lam = np.int64(lambda_)
    pos_cost = costs.pos_cost  # [4, 16, 3, 68]
    fixed = costs.fixed
    p0 = costs.p0  # [4, 16, 3]
    ent = None  # p0-based eob costs precomputed below

    def eob_cost_at(pos, ctx):
        # Cost of the EOB bit at band(pos) with given context.
        from .costs import bit_cost

        return bit_cost(False, p0[ctype, pos, ctx])

    from .costs import bit_cost

    # Init: skip score (EOB at `first`), and initial node scores.
    skip_cost = bit_cost(False, p0[ctype, first, ctx0]).astype(np.int64)
    best_score = skip_cost * lam
    best_n = np.full(N, -1, np.int64)
    best_delta = np.zeros(N, np.int64)
    best_prev = np.zeros(N, np.int64)

    init_rate = np.where(ctx0 == 0, bit_cost(True, p0[ctype, first, ctx0]), 0).astype(np.int64)
    score = np.stack([init_rate * lam] * 2, axis=1)  # [N, 2]
    prev_ctx = np.stack([ctx0, ctx0], axis=1)  # [N, 2] context for cost at next pos

    node_level = np.zeros((16, N, 2), np.int64)
    node_prev = np.zeros((16, N, 2), np.int64)

    for n in range(first, 16):
        active = n <= last  # [N]
        lv0 = level0[:, n]
        tl = thresh_level[:, n]
        qn = q[n]
        an = a[:, n]
        wn = weight[n]

        new_score = np.full((N, 2), BIG, np.int64)
        new_prev_ctx = np.zeros((N, 2), np.int64)
        for delta in (0, 1):
            level = lv0 + delta
            valid = active & (level <= tl)
            ctx = np.minimum(level, 2)
            err = an - level * qn
            dd = wn * (err * err - an * an)
            base = 256 * dd

            lvc = np.minimum(level, 67)
            lvf = fixed[np.minimum(level, 2047)] + np.where(level > 0, 256, 0)
            # Transition cost from each predecessor (its stored context).
            cost_p0 = pos_cost[ctype, n][prev_ctx[:, 0], lvc] + lvf
            cost_p1 = pos_cost[ctype, n][prev_ctx[:, 1], lvc] + lvf
            s0 = score[:, 0] + cost_p0 * lam
            s1 = score[:, 1] + cost_p1 * lam
            take1 = s1 < s0
            best_s = np.where(take1, s1, s0) + base
            best_p = take1.astype(np.int64)

            new_score[:, delta] = np.where(valid, best_s, BIG)
            new_prev_ctx[:, delta] = ctx
            node_level[n, :, delta] = level
            node_prev[n, :, delta] = best_p

            # Terminal (EOB after this position) check.
            nz = valid & (level != 0)
            eob_pos = min(n + 1, 15)
            term = best_s + np.where(
                n < 15, eob_cost_at(eob_pos, ctx).astype(np.int64) * lam, 0
            )
            better = nz & (term < best_score)
            best_score = np.where(better, term, best_score)
            best_n = np.where(better, n, best_n)
            best_delta = np.where(better, delta, best_delta)
            best_prev = np.where(better, best_p, best_prev)

        score = new_score
        prev_ctx = new_prev_ctx

    # Unwind best paths: walk deltas backward from each block's terminal node.
    out = np.zeros((N, 16), np.int64)
    cur_delta = best_delta.copy()
    idx = np.arange(N)
    for n in range(15, first - 1, -1):
        sel = best_n >= n
        lvl = node_level[n, idx, cur_delta]
        out[:, n] = np.where(sel, np.where(sign[:, n], -lvl, lvl), 0)
        cur_delta = np.where(sel, node_prev[n, idx, cur_delta], cur_delta)

    has_nz = (out[:, first:] != 0).any(axis=1)
    return out.astype(np.int32), has_nz
