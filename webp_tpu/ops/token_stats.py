"""On-device token statistics for two-pass probability adaptation.

The pass-1 analysis only feeds the (total, ones) counts per token-tree node
— a [4, 8, 3, 11, 2] tensor of a few KB — yet the host path downloads every
level (~0.5 MB/image through a ~25 MB/s tunnel) to compute them.  This
module computes the same statistics on the device from the packed per-MB
level tensors: per-(block, position) token events are closed-form in
(|v[n]|, |v[n-1]|, position-active), contexts come from shifted nnz grids
(the jnp port of `encode.contexts.compute_contexts`), and the accumulation
is dense masked reductions grouped by the static band-of-position table.

Bit-identical to `encode.costs.ProbaStats.record_blocks` over the token
stream (tests/test_token_stats.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..encode import tables as ET

_BANDS = np.array(ET.VP8_ENC_BANDS[:16], np.int32)
# numpy on purpose: module-level jnp constants become trace-bound tracers
# when the module's first import happens inside a jitted body (lazy import),
# breaking any later trace. jnp ops lift numpy constants per trace instead.
_BAND_OH = (np.arange(8)[None, :] == _BANDS[:, None]).astype(np.float32)  # [16, 8]


def _ffill_exclusive_j(vals):
    """Per column: last non-(-1) value strictly above, else -1. vals [..,H,W].

    Values are in {-1, 0, 1}; encode (row*2 + v) for present rows and take a
    running max — the low bit of the max is the most recent value.
    """
    H = vals.shape[-2]
    rows = jnp.arange(H, dtype=jnp.int32)[:, None]
    key = jnp.where(vals >= 0, rows * 2 + vals, -1)
    run = jax.lax.cummax(key, axis=key.ndim - 2)
    shifted = jnp.concatenate(
        [jnp.full_like(run[..., :1, :], -1), run[..., :-1, :]], axis=-2
    )
    return jnp.where(shifted >= 0, shifted & 1, -1)


def compute_contexts_j(luma_mode, y2_levels, y_levels, uv_levels, mbw: int, mbh: int):
    """jnp port of encode.contexts.compute_contexts (batched, [B, nmb, ...])."""
    B = luma_mode.shape[0]
    nmb = mbw * mbh
    has_y2 = luma_mode != 4

    y_nz_all = (y_levels != 0).any(-1)
    y_nz_ac = (y_levels[..., 1:] != 0).any(-1)
    y_nz = jnp.where(has_y2[..., None], y_nz_ac, y_nz_all)  # [B, nmb, 16]
    uv_nz = (uv_levels != 0).any(-1)  # [B, nmb, 8]
    y2_nz = (y2_levels != 0).any(-1) & has_y2

    def grid_ctx(nz, sub: int):
        g = (
            nz.reshape(B, mbh, mbw, sub, sub)
            .transpose(0, 1, 3, 2, 4)
            .reshape(B, mbh * sub, mbw * sub)
            .astype(jnp.int32)
        )
        top = jnp.concatenate([jnp.zeros_like(g[:, :1]), g[:, :-1]], axis=1)
        left = jnp.concatenate([jnp.zeros_like(g[:, :, :1]), g[:, :, :-1]], axis=2)
        return (
            (top + left)
            .reshape(B, mbh, sub, mbw, sub)
            .transpose(0, 1, 3, 2, 4)
            .reshape(B, nmb, sub * sub)
        )

    y_ctx = grid_ctx(y_nz, 4)
    uv_ctx = jnp.concatenate(
        [grid_ctx(uv_nz[..., :4], 2), grid_ctx(uv_nz[..., 4:], 2)], axis=-1
    )

    vals = jnp.where(has_y2, y2_nz.astype(jnp.int32), -1).reshape(B, mbh, mbw)
    top_f = _ffill_exclusive_j(vals)
    left_f = jnp.swapaxes(_ffill_exclusive_j(jnp.swapaxes(vals, -1, -2)), -1, -2)
    y2_ctx = (jnp.maximum(top_f, 0) + jnp.maximum(left_f, 0)).reshape(B, nmb)

    return y2_ctx, y_ctx, uv_ctx


def _block_events(v, first, ctx0, active):
    """Token-tree events for [.., 16] |level| blocks.

    first/ctx0/active broadcastable [..]; returns (tot, ones) [.., 16, 11]
    float32 masks (position x node), plus the trailing-EOB event folded into
    position min(end, 15) of node 0.
    """
    n_idx = jnp.arange(16, dtype=jnp.int32)
    nz = v != 0
    pos_ge_first = n_idx >= first[..., None]
    nz_eff = nz & pos_ge_first
    any_nz = nz_eff.any(-1)
    last = jnp.max(jnp.where(nz_eff, n_idx, -1), axis=-1)
    end = jnp.where(any_nz, last + 1, 0)

    act = active & any_nz
    in_run = pos_ge_first & (n_idx < end[..., None]) & act[..., None]

    vprev = jnp.concatenate([jnp.zeros_like(v[..., :1]), v[..., :-1]], axis=-1)
    prev_zero = jnp.concatenate(
        [jnp.zeros_like(nz[..., :1]), nz[..., :-1] == False], axis=-1  # noqa: E712
    )
    at_first = n_idx == first[..., None]
    skip_eob = (~at_first) & prev_zero

    vn = v
    vcl = jnp.minimum(vn, 67)
    is_zero = vn == 0
    gt1 = (~is_zero) & (vn > 1)
    le4 = gt1 & (vcl <= 4)
    mid = gt1 & (vcl > 4) & (vcl <= 10)
    hi = gt1 & (vcl > 10)
    cat34 = hi & (vcl < 3 + (8 << 2))
    cat56 = hi & (vcl >= 3 + (8 << 2))

    # (mask, bit) per node, all [.., 16] within the run.
    node_events = {
        0: (in_run & ~skip_eob, jnp.ones_like(vn, bool)),  # not-EOB
        1: (in_run, ~is_zero),
        2: (in_run & ~is_zero, gt1),
        3: (in_run & gt1, vcl > 4),
        4: (in_run & le4, vcl > 2),
        5: (in_run & le4 & (vcl > 2), vcl == 4),
        6: (in_run & (mid | hi), hi),
        7: (in_run & mid, vcl > 6),
        8: (in_run & (cat34 | cat56), cat56),
        9: (in_run & cat34, vcl >= 3 + (8 << 1)),
        10: (in_run & cat56, vcl >= 3 + (8 << 3)),
    }
    tot = jnp.stack(
        [node_events[k][0] for k in range(11)], axis=-1
    ).astype(jnp.float32)
    ones = jnp.stack(
        [node_events[k][0] & node_events[k][1] for k in range(11)], axis=-1
    ).astype(jnp.float32)

    # Trailing / empty EOB (node 0, bit 0) at position end (empty: first).
    eob_pos = jnp.where(act, jnp.minimum(end, 15), first)
    eob_on = active & (jnp.where(act, end < 16, True))
    eob_mask = (n_idx == eob_pos[..., None]) & eob_on[..., None]
    tot = tot.at[..., 0].add(eob_mask.astype(jnp.float32))

    # Context per position: ctx0 at `first`, min(v[n-1], 2) after.
    ctx = jnp.where(
        at_first,
        jnp.broadcast_to(ctx0[..., None], vn.shape),
        jnp.minimum(vprev, 2),
    )
    return tot, ones, ctx


def _accumulate(tot, ones, ctx):
    """[.., 16, 11] masks + ctx [.., 16] -> (tot, ones) [8, 3, 11] f32.

    The trailing-EOB event uses the run's context at its position; ctx is
    already correct there (min(v[n-1], 2), or ctx0 for empty blocks at
    `first`).  Band-of-position is static -> one [16, 8] matmul.
    """
    outs = []
    for arr in (tot, ones):
        per_c = []
        for c in range(3):
            m = arr * (ctx == c)[..., None].astype(jnp.float32)  # [.., 16, 11]
            flat = m.reshape(-1, 16, 11)
            band = jnp.einsum(
                "lnk,nb->bk", flat, _BAND_OH, preferred_element_type=jnp.float32
            )  # [8, 11]
            per_c.append(band)
        outs.append(jnp.stack(per_c, axis=1))  # [8, 3, 11]
    return outs[0], outs[1]


@functools.partial(jax.jit, static_argnames=("mbw", "mbh"))
def token_stats_device(luma_mode, y2_levels, y_levels, uv_levels, skipped,
                       mbw: int, mbh: int):
    """Per-image token statistics: [B, 4, 8, 3, 11] (totals, ones) int32.

    Inputs are the analysis arrays as device tensors: luma_mode [B, nmb],
    y2_levels [B, nmb, 16], y_levels [B, nmb, 16, 16], uv_levels
    [B, nmb, 8, 16], skipped [B, nmb] bool.
    """
    B, nmb = luma_mode.shape
    y2_ctx, y_ctx, uv_ctx = compute_contexts_j(
        luma_mode, y2_levels, y_levels, uv_levels, mbw, mbh
    )
    has_y2 = luma_mode != 4
    act = ~skipped

    def img_stats(lm_y2v, y2c, yv, yc, uvv, uvc, a, hy2):
        # ctype 1: Y2 blocks (first=0) where has_y2 & active.
        t, o, c = _block_events(
            jnp.abs(lm_y2v.astype(jnp.int32)),
            jnp.zeros(lm_y2v.shape[0], jnp.int32),
            y2c, a & hy2,
        )
        s_t, s_o = _accumulate(t, o, c)
        res = [jnp.zeros((4, 8, 3, 11), jnp.float32) for _ in range(2)]
        res[0] = res[0].at[1].add(s_t)
        res[1] = res[1].at[1].add(s_o)

        vy = jnp.abs(yv.astype(jnp.int32)).reshape(-1, 16)
        firsts = jnp.broadcast_to(hy2[:, None].astype(jnp.int32), yc.shape).reshape(-1)
        ctx0 = yc.reshape(-1)
        # ctype 0 (Y after Y2, first=1) vs ctype 3 (I4 Y, first=0).
        for ctype, sel in ((0, hy2), (3, ~hy2)):
            mask = (a & sel)[:, None]
            t, o, c = _block_events(
                vy, firsts, ctx0, jnp.broadcast_to(mask, yc.shape).reshape(-1)
            )
            s_t, s_o = _accumulate(t, o, c)
            res[0] = res[0].at[ctype].add(s_t)
            res[1] = res[1].at[ctype].add(s_o)

        vuv = jnp.abs(uvv.astype(jnp.int32)).reshape(-1, 16)
        t, o, c = _block_events(
            vuv,
            jnp.zeros(vuv.shape[0], jnp.int32),
            uvc.reshape(-1),
            jnp.broadcast_to(a[:, None], uvc.shape).reshape(-1),
        )
        s_t, s_o = _accumulate(t, o, c)
        res[0] = res[0].at[2].add(s_t)
        res[1] = res[1].at[2].add(s_o)
        return res[0].astype(jnp.int32), res[1].astype(jnp.int32)

    return jax.vmap(img_stats)(
        y2_levels, y2_ctx, y_levels, y_ctx, uv_levels, uv_ctx, act, has_y2
    )