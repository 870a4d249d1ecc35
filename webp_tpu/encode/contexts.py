"""Vectorized nnz-context computation for the token stream.

The decoder's complexity chains (left/top nonzero counts per 4x4 block) are
pure functions of the quantized levels, so the whole frame's contexts compute
as shifted boolean grids — no sequential walk. Y2 contexts skip over B-mode
macroblocks (which carry no Y2 block) via a forward fill.
"""

from __future__ import annotations

import numpy as np


def _ffill_exclusive(arr):
    """Per column: last non-(-1) value strictly above, else -1. arr [H, W]."""
    out = np.vstack([np.full((1, arr.shape[1]), -1, arr.dtype), arr[:-1]])
    for i in range(1, out.shape[0]):
        out[i] = np.where(out[i] == -1, out[i - 1], out[i])
    return out


def compute_contexts(luma_mode, y2_levels, y_levels, uv_levels, skipped, mbw, mbh):
    """Per-block initial contexts for cost/stats/encoding.

    Returns dict with y2_ctx [nmb], y_ctx [nmb, 16], uv_ctx [nmb, 8] and the
    per-block nnz flags (y2_nz [nmb], y_nz [nmb, 16], uv_nz [nmb, 8]).
    skipped MBs contribute zero contexts (their levels are all zero), except
    B-mode skipped MBs which leave the Y2 chain untouched.
    """
    nmb = mbw * mbh
    has_y2 = luma_mode != 4

    first = np.where(has_y2, 1, 0)
    y_nz = np.zeros((nmb, 16), bool)
    y_nz[first == 0] = (y_levels[first == 0] != 0).any(axis=2)
    y_nz[first == 1] = (y_levels[first == 1][:, :, 1:] != 0).any(axis=2)
    uv_nz = (uv_levels != 0).any(axis=2)
    y2_nz = (y2_levels != 0).any(axis=1) & has_y2

    # -- Y 4x4 grid ---------------------------------------------------------
    grid = (
        y_nz.reshape(mbh, mbw, 4, 4)
        .transpose(0, 2, 1, 3)
        .reshape(mbh * 4, mbw * 4)
        .astype(np.int32)
    )
    top = np.vstack([np.zeros((1, mbw * 4), np.int32), grid[:-1]])
    left = np.hstack([np.zeros((mbh * 4, 1), np.int32), grid[:, :-1]])
    y_ctx = (
        (top + left)
        .reshape(mbh, 4, mbw, 4)
        .transpose(0, 2, 1, 3)
        .reshape(nmb, 16)
    )

    # -- UV 2x2 grids -------------------------------------------------------
    def uv_ctx_half(nz_half):
        g = (
            nz_half.reshape(mbh, mbw, 2, 2)
            .transpose(0, 2, 1, 3)
            .reshape(mbh * 2, mbw * 2)
            .astype(np.int32)
        )
        t = np.vstack([np.zeros((1, mbw * 2), np.int32), g[:-1]])
        l = np.hstack([np.zeros((mbh * 2, 1), np.int32), g[:, :-1]])
        return (t + l).reshape(mbh, 2, mbw, 2).transpose(0, 2, 1, 3).reshape(nmb, 4)

    uv_ctx = np.concatenate([uv_ctx_half(uv_nz[:, :4]), uv_ctx_half(uv_nz[:, 4:])], axis=1)

    # -- Y2 grid with B-mode transparency -----------------------------------
    vals = np.where(has_y2, y2_nz.astype(np.int32), -1).reshape(mbh, mbw)
    top_f = _ffill_exclusive(vals)
    left_f = _ffill_exclusive(vals.T).T
    y2_ctx = (np.maximum(top_f, 0) + np.maximum(left_f, 0)).reshape(nmb)

    return dict(
        y2_ctx=y2_ctx.astype(np.int32),
        y_ctx=y_ctx,
        uv_ctx=uv_ctx,
        y2_nz=y2_nz,
        y_nz=y_nz,
        uv_nz=uv_nz,
        has_y2=has_y2,
    )
