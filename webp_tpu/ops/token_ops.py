"""Device-side token op-stream builder for VP8 coefficient partitions.

Turns quantized levels (already device-resident after the encoder wavefront)
into aligned (prob, bit) boolean-op streams per coefficient partition, ready
for ops/boolenc2.bool_encode_lanes — together they produce the final
partition bitstreams ON the device, collapsing the encoder's device->host
transfer from packed levels (~180 B/MB sparse) to finished bytes (~15 B/MB).

Every op slot is computed vectorized over all blocks at once:
 - token classes and complexity chains are closed-form in the levels
   (ctx[i] = min(|v[i-1]|, 2), skip-EOB = previous coeff zero);
 - tree paths / category extra bits come from small static tables indexed
   by (skip-eob, class, depth);
 - probabilities gather from the [4,8,3,11] adapted table per image.

Semantics mirror Vp8Encoder._write_block / token_stream exactly
(reference: /root/reference/src/encoder/vp8.rs:798-958).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..common import vp8_tables as T


def _build_static_tables():
    from ..encode.vp8 import _TOKEN_PATHS

    # paths[start][cls] -> ((bit, node), ...); start 0 = full tree, 2 = skip EOB
    max_len = max(
        len(p) for start in (0, 2) for p in _TOKEN_PATHS[start].values()
    )
    tp_len = np.zeros((2, 12), np.int32)
    tp_bit = np.zeros((2, 12, max_len), np.int32)
    tp_node = np.zeros((2, 12, max_len), np.int32)
    for s2, start in enumerate((0, 2)):
        for cls, path in _TOKEN_PATHS[start].items():
            tp_len[s2, cls] = len(path)
            for k, (bit, node) in enumerate(path):
                tp_bit[s2, cls, k] = bit
                tp_node[s2, cls, k] = node
    cat_nbits = np.zeros(12, np.int32)
    cat_probs = np.zeros((12, 11), np.int32)
    for c, probs in enumerate(T.PROB_DCT_CAT):
        cat_nbits[6 + c] = len(probs)
        cat_probs[6 + c, : len(probs)] = probs
    cat_base = np.zeros(12, np.int32)
    cat_base[6:12] = T.DCT_CAT_BASE
    return max_len, tp_len, tp_bit, tp_node, cat_nbits, cat_probs, cat_base


(_TP_MAX, _TP_LEN, _TP_BIT, _TP_NODE, _CAT_NBITS, _CAT_PROBS, _CAT_BASE) = (
    _build_static_tables()
)
_BANDS = np.asarray(T.COEFF_BANDS, np.int32)
# per-coefficient slot budget: tree path + extra bits + sign, then EOB path.
_PER_COEFF = _TP_MAX + 11 + 1
SLOTS = 16 * _PER_COEFF + _TP_MAX


def _cls_of(v):
    """Token class of |level| v (NOT zero-checked; v==0 -> class 1)."""
    small = jnp.minimum(v, 4) + 1
    cat = (
        6
        + (v >= 7).astype(jnp.int32)
        + (v >= 11).astype(jnp.int32)
        + (v >= 19).astype(jnp.int32)
        + (v >= 35).astype(jnp.int32)
        + (v >= 67).astype(jnp.int32)
    )
    return jnp.where(v <= 4, small, cat)


def block_ops(levels, plane, first, ctx0, probs_flat):
    """Op slots for [..., 16] zigzag level blocks.

    levels int32, plane/first/ctx0 int32 [...], probs_flat [1056] (one
    image's [4,8,3,11] table, flattened; vmap for batches). Returns
    (prob [..., SLOTS] int32, bit [..., SLOTS] int32, valid [..., SLOTS]
    bool) in exact stream order.
    """
    lead = levels.shape[:-1]
    v = jnp.abs(levels)
    nz = v != 0
    n_idx = jnp.arange(16, dtype=jnp.int32)
    last = jnp.max(jnp.where(nz, n_idx, -1), axis=-1)  # -1 when empty
    end = last + 1

    cls = _cls_of(v)                                     # [..., 16]
    prev_v = jnp.concatenate([jnp.zeros((*lead, 1), v.dtype), v[..., :-1]], axis=-1)
    chain = jnp.minimum(prev_v, 2)
    ci = jnp.where(n_idx == first[..., None], ctx0[..., None], chain)
    skip2 = ((n_idx > first[..., None]) & (prev_v == 0)).astype(jnp.int32)
    active = (n_idx >= first[..., None]) & (n_idx < end[..., None])

    tp_len = jnp.asarray(_TP_LEN)
    tp_bit = jnp.asarray(_TP_BIT)
    tp_node = jnp.asarray(_TP_NODE)
    cat_nbits = jnp.asarray(_CAT_NBITS)
    cat_probs = jnp.asarray(_CAT_PROBS)
    cat_base = jnp.asarray(_CAT_BASE)
    bands = jnp.asarray(_BANDS)

    # --- tree ops: slot (i, k) ------------------------------------------
    plen = tp_len[skip2, cls]                            # [..., 16]
    ks = jnp.arange(_TP_MAX, dtype=jnp.int32)
    node = tp_node[skip2[..., None], cls[..., None], ks]  # [..., 16, K]
    tbit = tp_bit[skip2[..., None], cls[..., None], ks]
    tvalid = active[..., None] & (ks < plen[..., None])
    # prob index: ((plane*8 + band)*3 + ctx)*11 + node
    pidx = ((plane[..., None, None] * 8 + bands[None, :, None]) * 3
            + ci[..., None]) * 11 + node
    tprob = probs_flat[pidx]

    # --- extra bits ------------------------------------------------------
    nb = cat_nbits[cls]                                  # [..., 16]
    extra = v - cat_base[cls]
    ke = jnp.arange(11, dtype=jnp.int32)
    shift = nb[..., None] - 1 - ke
    ebit = (extra[..., None] >> jnp.maximum(shift, 0)) & 1
    eprob = cat_probs[cls[..., None], ke]
    evalid = active[..., None] & (ke < nb[..., None])

    # --- sign ------------------------------------------------------------
    sbit = (levels < 0).astype(jnp.int32)[..., None]
    sprob = jnp.full((*lead, 16, 1), 128, jnp.int32)
    svalid = (active & (cls != 1))[..., None]            # zeros carry no sign

    per_coeff_prob = jnp.concatenate([tprob, eprob, sprob], axis=-1)
    per_coeff_bit = jnp.concatenate([tbit, ebit, sbit], axis=-1)
    per_coeff_valid = jnp.concatenate([tvalid, evalid, svalid], axis=-1)

    # --- EOB (class 0, start 0) after the last coefficient ---------------
    eb_pos = jnp.minimum(jnp.maximum(first, end), 15)
    eb_band = bands[eb_pos]
    last_v = jnp.take_along_axis(v, jnp.maximum(last, 0)[..., None], axis=-1)[..., 0]
    eb_ctx = jnp.where(end > first, jnp.where(last_v == 1, 1, 2), ctx0)
    eb_len = tp_len[0, 0]
    eb_node = tp_node[0, 0, ks]
    eb_bit = tp_bit[0, 0, ks]
    eb_valid = (end < 16)[..., None] & (ks < eb_len)
    eb_pidx = ((plane * 8 + eb_band) * 3 + eb_ctx)[..., None] * 11 + eb_node
    eb_prob = probs_flat[eb_pidx]

    prob = jnp.concatenate(
        [per_coeff_prob.reshape(*lead, -1), eb_prob], axis=-1
    )
    bit = jnp.concatenate(
        [per_coeff_bit.reshape(*lead, -1), jnp.broadcast_to(eb_bit, (*lead, _TP_MAX))],
        axis=-1,
    )
    valid = jnp.concatenate(
        [per_coeff_valid.reshape(*lead, -1), eb_valid], axis=-1
    )
    return prob, bit, valid


# ---------------------------------------------------------------------------
# whole-frame assembly: contexts, block order, partition compaction
# ---------------------------------------------------------------------------


def compute_contexts_dev(luma_mode, y2_levels, y_levels, uv_levels, mbw: int,
                         mbh: int):
    """jnp port of encode/contexts.compute_contexts (shifted nnz grids; the
    Y2 chain skips B-mode MBs via an associative-scan forward fill)."""
    nmb = mbw * mbh
    has_y2 = luma_mode != 4
    first = jnp.where(has_y2, 1, 0)

    nz_full = (y_levels != 0).any(-1)
    nz_ac = (y_levels[..., 1:] != 0).any(-1)
    y_nz = jnp.where(has_y2[:, None], nz_ac, nz_full)
    uv_nz = (uv_levels != 0).any(-1)
    y2_nz = (y2_levels != 0).any(-1) & has_y2

    def grid_ctx(nz, sub: int):
        g = (
            nz.reshape(mbh, mbw, sub, sub)
            .transpose(0, 2, 1, 3)
            .reshape(mbh * sub, mbw * sub)
            .astype(jnp.int32)
        )
        t = jnp.concatenate([jnp.zeros((1, mbw * sub), jnp.int32), g[:-1]], 0)
        l = jnp.concatenate([jnp.zeros((mbh * sub, 1), jnp.int32), g[:, :-1]], 1)
        return (
            (t + l)
            .reshape(mbh, sub, mbw, sub)
            .transpose(0, 2, 1, 3)
            .reshape(nmb, sub * sub)
        )

    y_ctx = grid_ctx(y_nz, 4)
    uv_ctx = jnp.concatenate(
        [grid_ctx(uv_nz[:, :4], 2), grid_ctx(uv_nz[:, 4:], 2)], axis=1
    )

    vals = jnp.where(has_y2, y2_nz.astype(jnp.int32), -1).reshape(mbh, mbw)

    def ffill_excl(a, axis):
        def comb(x, y):
            return jnp.where(y == -1, x, y)

        shifted = jnp.concatenate(
            [
                jnp.full_like(jax.lax.slice_in_dim(a, 0, 1, axis=axis), -1),
                jax.lax.slice_in_dim(a, 0, a.shape[axis] - 1, axis=axis),
            ],
            axis=axis,
        )
        return jax.lax.associative_scan(comb, shifted, axis=axis)

    top_f = ffill_excl(vals, 0)
    left_f = ffill_excl(vals, 1)
    y2_ctx = (jnp.maximum(top_f, 0) + jnp.maximum(left_f, 0)).reshape(nmb)
    return y2_ctx, y_ctx, uv_ctx, has_y2, first


@functools.partial(
    jax.jit, static_argnames=("mbw", "mbh", "nparts", "max_ops", "max_bytes")
)
def encode_coeff_partitions(y2_levels, y_levels, uv_levels, luma_mode,
                            probs_flat, mbw: int, mbh: int, nparts: int,
                            max_ops: int, max_bytes: int):
    """Levels (one image) -> final coefficient-partition bitstreams.

    y2_levels [nmb, 16], y_levels [nmb, 16, 16], uv_levels [nmb, 8, 16]
    int32; probs_flat [1056]. Returns (lead [P], bytes [P, max_bytes],
    n_bytes [P], (bottom, range, bit_num) [P] each, n_ops [P]) — callers
    must fall back when n_ops > max_ops or n_bytes > max_bytes.
    vmap over images for batches.
    """
    nmb = mbw * mbh
    skipped = (
        (y_levels == 0).all((-2, -1))
        & (uv_levels == 0).all((-2, -1))
        & (y2_levels == 0).all(-1)
    )
    y2_ctx, y_ctx, uv_ctx, has_y2, first_y = compute_contexts_dev(
        luma_mode, y2_levels, y_levels, uv_levels, mbw, mbh
    )

    levels = jnp.concatenate(
        [y2_levels[:, None], y_levels, uv_levels], axis=1
    )  # [nmb, 25, 16]
    plane = jnp.zeros((nmb, 25), jnp.int32)
    plane = plane.at[:, 0].set(1)
    plane = plane.at[:, 1:17].set(jnp.where(has_y2, 0, 3)[:, None])
    plane = plane.at[:, 17:].set(2)
    first = jnp.zeros((nmb, 25), jnp.int32)
    first = first.at[:, 1:17].set(first_y[:, None])
    ctxs = jnp.concatenate([y2_ctx[:, None], y_ctx, uv_ctx], axis=1)
    blk_ok = jnp.ones((nmb, 25), bool)
    blk_ok = blk_ok.at[:, 0].set(has_y2)
    blk_ok = blk_ok & (~skipped)[:, None]

    prob, bit, valid = block_ops(levels, plane, first, ctxs, probs_flat)
    valid = valid & blk_ok[..., None]

    # The op streams go to the boolean scan UNCOMPACTED, invalid slots
    # riding as valid=0 no-ops: the unrolled scan (ops/boolenc2, UNROLL
    # steps fused per loop iteration) makes a no-op ~as cheap as a real op,
    # so the ~6%-density gaps cost a few ms/batch — while the old
    # image-flat cumsum+searchsorted compaction was the same TPU-hostile
    # gather pattern as the retired level pack and cost ~seconds per batch
    # (NOTES r4).  max_ops is no longer a stream bound; it remains the
    # caller's fallback criterion against n_ops.
    S = prob.shape[-1]
    p8 = prob.astype(jnp.uint8)
    b8 = bit.astype(jnp.uint8)
    v8 = valid.astype(jnp.uint8)

    # Partition p carries MB rows r with r % nparts == p, raster order.
    rows_per = (mbh + nparts - 1) // nparts
    row_idx = np.full((nparts, rows_per), -1, np.int64)
    for p in range(nparts):
        rs = np.arange(p, mbh, nparts)
        row_idx[p, : len(rs)] = rs
    row_ok = jnp.asarray(row_idx >= 0)
    row_gather = jnp.asarray(np.maximum(row_idx, 0))

    prob_r = p8.reshape(mbh, mbw * 25 * S)
    bit_r = b8.reshape(mbh, mbw * 25 * S)
    val_r = v8.reshape(mbh, mbw * 25 * S)

    pp = prob_r[row_gather].reshape(nparts, -1)  # [P, rows_per*mbw*25*S]
    bb = bit_r[row_gather].reshape(nparts, -1)
    vv = (val_r[row_gather] & row_ok[..., None].astype(jnp.uint8)).reshape(
        nparts, -1
    )

    n_ops = vv.astype(jnp.int32).sum(-1)

    from .boolenc2 import bool_encode_lanes

    lead, data, n_bytes, state = bool_encode_lanes(bb.T, pp.T, vv.T, max_bytes)
    return lead, data, n_bytes, state, n_ops


# ---------------------------------------------------------------------------
# MB-header ops (partition 0 tail): segment id, skip, modes
# ---------------------------------------------------------------------------


def _mode_tree_tables(tree, nsym: int):
    from ..encode.boolenc import tree_paths

    paths = tree_paths(tree)[0]
    max_len = max(len(p) for p in paths.values())
    ln = np.zeros(nsym, np.int32)
    bit = np.zeros((nsym, max_len), np.int32)
    node = np.zeros((nsym, max_len), np.int32)
    for sym, path in paths.items():
        ln[sym] = len(path)
        for k, (b, nd) in enumerate(path):
            bit[sym, k] = b
            node[sym, k] = nd
    return ln, bit, node, max_len


_SEG_LN, _SEG_BIT, _SEG_NODE, _SEG_MAX = _mode_tree_tables(T.SEGMENT_ID_TREE, 4)
_YM_LN, _YM_BIT, _YM_NODE, _YM_MAX = _mode_tree_tables(T.KEYFRAME_YMODE_TREE, 5)
_UV_LN, _UV_BIT, _UV_NODE, _UV_MAX = _mode_tree_tables(T.KEYFRAME_UV_MODE_TREE, 4)
_BP_LN, _BP_BIT, _BP_NODE, _BP_MAX = _mode_tree_tables(T.KEYFRAME_BPRED_MODE_TREE, 10)
_BP_PROBS = np.asarray(T.KEYFRAME_BPRED_MODE_PROBS, np.int32)  # [10, 10, 9]
_YM_PROBS = np.asarray(T.KEYFRAME_YMODE_PROBS, np.int32)
_UV_PROBS = np.asarray(T.KEYFRAME_UV_MODE_PROBS, np.int32)
# whole-MB luma modes imply a uniform bpred context (DC, V, H, TM)
_IMPLIED_BMODE = np.asarray([0, 2, 3, 1, 0], np.int32)  # B_DC,B_VE,B_HE,B_TM; [4]=B unused

HEADER_SLOTS = _SEG_MAX + 1 + _YM_MAX + 16 * _BP_MAX + _UV_MAX


def header_ops(luma_mode, bpred, chroma_mode, segment_ids, skipped,
               seg_probs3, skip_prob, write_segments: bool,
               mbw: int, mbh: int):
    """Op slots for every MB header, raster order (the partition-0 stream
    after the frame header): optional segment id, skip flag, luma mode,
    B sub-modes with their top/left mode contexts, chroma mode. Mirrors
    the host writer (encode/vp8.py _write_bitstream_arrays MB loop;
    reference vp8.rs:498-560)."""
    nmb = mbw * mbh
    lm = luma_mode.astype(jnp.int32)

    # Sub-block mode grid with implied modes for whole-MB predictions.
    implied = jnp.asarray(_IMPLIED_BMODE)[jnp.minimum(lm, 3)]
    eff = jnp.where((lm == 4)[:, None], bpred.astype(jnp.int32), implied[:, None])
    grid = (
        eff.reshape(mbh, mbw, 4, 4)
        .transpose(0, 2, 1, 3)
        .reshape(mbh * 4, mbw * 4)
    )
    top = jnp.concatenate([jnp.zeros((1, mbw * 4), jnp.int32), grid[:-1]], 0)
    left = jnp.concatenate([jnp.zeros((mbh * 4, 1), jnp.int32), grid[:, :-1]], 1)

    def unmb(g):
        return (
            g.reshape(mbh, 4, mbw, 4).transpose(0, 2, 1, 3).reshape(nmb, 16)
        )

    top_m = unmb(top)
    left_m = unmb(left)

    # segment id (2 tree ops)
    sid = segment_ids.astype(jnp.int32)
    ks = jnp.arange(_SEG_MAX, dtype=jnp.int32)
    seg_bit = jnp.asarray(_SEG_BIT)[sid[:, None], ks]
    seg_node = jnp.asarray(_SEG_NODE)[sid[:, None], ks]
    seg_prob = seg_probs3[seg_node]
    seg_valid = jnp.broadcast_to(
        bool(write_segments) & (ks < jnp.asarray(_SEG_LN)[sid][:, None]),
        (nmb, _SEG_MAX),
    )

    # skip flag
    sk_bit = skipped.astype(jnp.int32)[:, None]
    sk_prob = jnp.broadcast_to(skip_prob.astype(jnp.int32), (nmb,))[:, None]
    sk_valid = jnp.ones((nmb, 1), bool)

    # luma mode
    ky = jnp.arange(_YM_MAX, dtype=jnp.int32)
    ym_bit = jnp.asarray(_YM_BIT)[lm[:, None], ky]
    ym_prob = jnp.asarray(_YM_PROBS)[jnp.asarray(_YM_NODE)[lm[:, None], ky]]
    ym_valid = ky < jnp.asarray(_YM_LN)[lm][:, None]

    # 16 B sub-modes (only when lm == 4)
    kb = jnp.arange(_BP_MAX, dtype=jnp.int32)
    bp = bpred.astype(jnp.int32)
    bp_bit = jnp.asarray(_BP_BIT)[bp[..., None], kb]            # [nmb,16,K]
    bp_node = jnp.asarray(_BP_NODE)[bp[..., None], kb]
    bp_prob = jnp.asarray(_BP_PROBS)[top_m[..., None], left_m[..., None], bp_node]
    bp_valid = (lm == 4)[:, None, None] & (
        kb < jnp.asarray(_BP_LN)[bp][..., None]
    )

    # chroma mode
    ku = jnp.arange(_UV_MAX, dtype=jnp.int32)
    cm = chroma_mode.astype(jnp.int32)
    uv_bit = jnp.asarray(_UV_BIT)[cm[:, None], ku]
    uv_prob = jnp.asarray(_UV_PROBS)[jnp.asarray(_UV_NODE)[cm[:, None], ku]]
    uv_valid = ku < jnp.asarray(_UV_LN)[cm][:, None]

    prob = jnp.concatenate(
        [seg_prob, sk_prob, ym_prob, bp_prob.reshape(nmb, -1), uv_prob], axis=-1
    )
    bit = jnp.concatenate(
        [seg_bit, sk_bit, ym_bit, bp_bit.reshape(nmb, -1), uv_bit], axis=-1
    )
    valid = jnp.concatenate(
        [seg_valid, sk_valid, ym_valid, bp_valid.reshape(nmb, -1), uv_valid],
        axis=-1,
    )
    return prob, bit, valid


@functools.partial(jax.jit, static_argnames=("mbw", "mbh", "write_segments",
                                              "max_ops", "max_bytes"))
def encode_mb_headers(luma_mode, bpred, chroma_mode, segment_ids, skipped,
                      seg_probs3, skip_prob, init_state, mbw: int, mbh: int,
                      write_segments: bool, max_ops: int, max_bytes: int):
    """Device continuation of the partition-0 boolean stream: MB headers
    encoded from the frame-header encoder's (bottom, range, bit_num) state.
    Returns (lead, bytes, n_bytes, final state, n_ops) for one image; the
    host applies `lead` carries to its frame-header prefix and flushes."""
    from .boolenc2 import bool_encode_lanes

    prob, bit, valid = header_ops(
        luma_mode, bpred, chroma_mode, segment_ids, skipped,
        seg_probs3, skip_prob, write_segments, mbw, mbh,
    )
    flat_p = prob.reshape(-1)
    flat_b = bit.reshape(-1)
    flat_v = valid.reshape(-1)
    n_flat = flat_p.shape[0]
    cs = jnp.cumsum(flat_v.astype(jnp.int32))
    n_ops = cs[-1]
    ksq = jnp.arange(1, max_ops + 1, dtype=jnp.int32)
    idx = jnp.searchsorted(cs, ksq, side="left")
    ok = idx < n_flat
    gi = jnp.clip(idx, 0, n_flat - 1)
    pc = jnp.where(ok, flat_p[gi], 128)
    bc = jnp.where(ok, flat_b[gi], 0)

    lead, data, n_bytes, state = bool_encode_lanes(
        bc[:, None], pc[:, None], ok.astype(jnp.int32)[:, None], max_bytes,
        init_state=tuple(s[None] for s in init_state),
    )
    return lead[0], data[0], n_bytes[0], tuple(s[0] for s in state), n_ops
