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
