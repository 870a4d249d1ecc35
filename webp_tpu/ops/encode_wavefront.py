"""Shared device-encoder primitives: RD score, cost/param pytrees.

The actual RD-search kernel lives in `encode_wavefront2.py` (the
lane-aligned v2 wavefront); this module carries what it shares with the
host encoder: the int32 RD score, the EncTables / EncParams /
EncParamsSegs pytrees, and the loop-form GetResidualCost twin
(`residual_costs_jax`) kept as a differential-testing reference for the
position-parallel `residual_costs_par`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


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


class EncParamsSegs:
    """Per-segment quantizer/lambda arrays for the v2 kernel's segment mode.

    Leaves carry a leading image axis and a segment axis: quant vectors
    [B, 4, 16], lambdas [B, 4] — per-MB values select by segment id inside
    the wavefront step ([B, ...] broadcasts against [R, B, ...] lanes).
    """

    _VECS = ("y1_iq", "y1_bias", "y1_q", "y2_iq", "y2_bias", "y2_q",
             "uv_iq", "uv_bias", "uv_q", "y1_sharpen")
    _LAMS = ("lambda_i16", "lambda_i4", "lambda_uv", "lambda_mode", "tlambda",
             "lambda_trellis_i16", "lambda_trellis_i4")

    @classmethod
    def from_segments(cls, segments_lists):
        """segments_lists: per image, a list of 4 SegmentParams.

        Built entirely in numpy with ONE device transfer per field —
        constructing per-segment EncParams would issue 10 tiny transfers per
        (image, segment), ~40 s per batch through the host tunnel.
        """
        from ..common import vp8_tables as _T

        zz = np.asarray(_T.ZIGZAG)

        def zzvec(m, attr):
            v = np.empty(16, np.int32)
            v[:] = getattr(m, attr)[1]
            v[0] = getattr(m, attr)[0]
            return v

        def vec_np(seg, name):
            if name == "y1_sharpen":
                return np.asarray(seg.y1.sharpen)[zz].astype(np.int32)
            mtx, attr = name.split("_", 1)
            return zzvec(getattr(seg, mtx), attr)

        t = cls.__new__(cls)
        for name in cls._VECS:
            setattr(t, name, jnp.asarray(np.stack([
                np.stack([vec_np(seg, name) for seg in segs])
                for segs in segments_lists
            ])))
        for name in cls._LAMS:
            setattr(t, name, jnp.asarray(np.array([
                [int(getattr(seg, name)) for seg in segs]
                for segs in segments_lists
            ], np.int32)))
        return t


jax.tree_util.register_pytree_node(
    EncParamsSegs,
    lambda p: (
        tuple(getattr(p, n) for n in EncParamsSegs._VECS + EncParamsSegs._LAMS),
        None,
    ),
    lambda aux, leaves: _encparamssegs_unflatten(aux, leaves),
)


def _encparamssegs_unflatten(aux, leaves):
    p = EncParamsSegs.__new__(EncParamsSegs)
    for name, leaf in zip(EncParamsSegs._VECS + EncParamsSegs._LAMS, leaves):
        setattr(p, name, leaf)
    return p


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
