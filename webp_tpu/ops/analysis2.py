"""Device-side segment analysis: per-MB "alpha" compressibility on TPU.

The host pass (encode/analysis.py:analyze_image — libwebp MBAnalyze /
reference analysis.rs:120-260) costs ~22 ms/img of numpy on this 2-core
host, which co-limits the pipelined bench.  The math is already dense
tensor form, so this twin runs it batched on device and ships back only
the per-MB alpha bytes (~1.5 KB/img) + the mean chroma alpha; histogram,
k-means and quant math stay on host (~1 ms).

Bit-parity with the numpy pass is enforced by tests/test_analysis2.py —
segment maps feed emitted bitstreams, so the two must agree exactly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

MAX_ALPHA = 255
ALPHA_SCALE = 2 * MAX_ALPHA
MAX_COEFF_THRESH = 31


def _dct4x4(resid):
    """libwebp analysis FTransform on [..., 4, 4] int32 residuals."""
    d = resid.astype(jnp.int32)
    d0, d1, d2, d3 = d[..., 0], d[..., 1], d[..., 2], d[..., 3]
    a0, a1, a2, a3 = d0 + d3, d1 + d2, d1 - d2, d0 - d3
    t = jnp.stack(
        [
            (a0 + a1) * 8,
            (a2 * 2217 + a3 * 5352 + 1812) >> 9,
            (a0 - a1) * 8,
            (a3 * 2217 - a2 * 5352 + 937) >> 9,
        ],
        axis=-1,
    )
    c0, c1, c2, c3 = t[..., 0, :], t[..., 1, :], t[..., 2, :], t[..., 3, :]
    a0, a1, a2, a3 = c0 + c3, c1 + c2, c1 - c2, c0 - c3
    return jnp.stack(
        [
            (a0 + a1 + 7) >> 4,
            ((a2 * 2217 + a3 * 5352 + 12000) >> 16) + (a3 != 0),
            (a0 - a1 + 7) >> 4,
            (a3 * 2217 - a2 * 5352 + 51000) >> 16,
        ],
        axis=-2,
    )


def _alphas_from_coeffs(coeffs):
    """[..., nmb, n_coeff] -> per-MB histogram alpha (int32)."""
    v = jnp.minimum(jnp.abs(coeffs) >> 3, MAX_COEFF_THRESH)
    bins = jnp.arange(MAX_COEFF_THRESH + 1, dtype=jnp.int32)
    hist = (v[..., None] == bins).sum(axis=-2)  # [..., nmb, 32]
    max_value = hist.max(axis=-1)
    nz = hist > 0
    any_nz = nz.any(axis=-1)
    last_nz = jnp.where(
        any_nz, (bins * nz).max(axis=-1), 1
    )
    return jnp.where(
        max_value > 1, ALPHA_SCALE * last_nz // jnp.maximum(max_value, 1), 0
    )


def _mb_blocks(plane, mbh: int, mbw: int, size: int):
    """[B, mbh*size, mbw*size] -> [B, nmb, (size/4)^2, 4, 4]."""
    nb = size // 4
    B = plane.shape[0]
    return (
        plane.reshape(B, mbh, size, mbw, size)
        .transpose(0, 1, 3, 2, 4)
        .reshape(B, mbh * mbw, size, size)
        .reshape(B, -1, nb, 4, nb, 4)
        .transpose(0, 1, 2, 4, 3, 5)
        .reshape(B, mbh * mbw, nb * nb, 4, 4)
    )


def _borders(plane, mbh: int, mbw: int, size: int):
    """Source top rows / left cols / corners per MB (127/129 defaults)."""
    B = plane.shape[0]
    H, W = mbh * size, mbw * size
    p = plane.astype(jnp.int32)
    top_row = jnp.full((B, 1, W), 127, jnp.int32)
    left_col = jnp.full((B, H + 1, 1), 129, jnp.int32)
    left_col = left_col.at[:, 0, 0].set(127)
    padded = jnp.concatenate(
        [left_col, jnp.concatenate([top_row, p], axis=1)], axis=2
    )  # [B, H+1, W+1]
    top = padded[:, 0:H:size, 1:]          # [B, mbh, W]
    left = padded[:, 1:, 0:W:size]         # [B, H, mbw]
    corner = padded[:, 0:H:size, 0:W:size]  # [B, mbh, mbw]
    top = top.reshape(B, mbh, 1, mbw, size).transpose(0, 1, 3, 2, 4).reshape(
        B, -1, size
    )
    left = left.reshape(B, mbh, size, mbw).transpose(0, 1, 3, 2).reshape(
        B, -1, size
    )
    return top, left, corner.reshape(B, -1)


def _dc_tm_preds(plane, mbh, mbw, size, has_top, has_left):
    top, left, corner = _borders(plane, mbh, mbw, size)
    B = plane.shape[0]
    nmb = mbh * mbw
    ht = has_top.astype(jnp.int32)
    hl = has_left.astype(jnp.int32)
    shift = (2 if size == 8 else 3) + ht + hl
    total = jnp.where(has_left, left.sum(-1), 0) + jnp.where(has_top, top.sum(-1), 0)
    dc = jnp.where(
        has_top | has_left,
        (total + (1 << jnp.maximum(shift - 1, 0))) >> shift,
        0x80,
    )
    dc_pred = jnp.broadcast_to(dc[..., None, None], (B, nmb, size, size))
    tm = jnp.clip(
        left[..., :, None] + top[..., None, :] - corner[..., None, None], 0, 255
    )
    return dc_pred, tm


@functools.partial(jax.jit, static_argnames=("mbw", "mbh"))
def analyze_alphas_batch(Y, U, V, mbw: int, mbh: int):
    """Batched device twin of encode/analysis.py:analyze_image.

    Y [B, mbh*16, mbw*16], U/V [B, mbh*8, mbw*8] uint8/int.
    Returns (final_alpha [B, nmb] int32, uv_alpha [B] int32) — exactly the
    values the host pass computes (verified bit-equal in tests)."""
    B = Y.shape[0]
    nmb = mbw * mbh
    gx = jnp.tile(jnp.arange(mbw), mbh)
    gy = jnp.repeat(jnp.arange(mbh), mbw)
    has_left = jnp.broadcast_to((gx > 0)[None], (B, nmb))
    has_top = jnp.broadcast_to((gy > 0)[None], (B, nmb))

    y_src = _mb_blocks(Y.astype(jnp.int32), mbh, mbw, 16)  # [B, nmb, 16, 4, 4]
    best_alpha = jnp.full((B, nmb), -1, jnp.int32)
    for pred in _dc_tm_preds(Y.astype(jnp.int32), mbh, mbw, 16, has_top, has_left):
        pred_blocks = (
            pred.reshape(B, -1, 4, 4, 4, 4)
            .transpose(0, 1, 2, 4, 3, 5)
            .reshape(B, nmb, 16, 4, 4)
        )
        coeffs = _dct4x4(y_src - pred_blocks).reshape(B, nmb, -1)
        best_alpha = jnp.maximum(best_alpha, _alphas_from_coeffs(coeffs))

    u_src = _mb_blocks(U.astype(jnp.int32), mbh, mbw, 8)
    v_src = _mb_blocks(V.astype(jnp.int32), mbh, mbw, 8)
    best_uv = jnp.full((B, nmb), -1, jnp.int32)
    updc, uptm = _dc_tm_preds(U.astype(jnp.int32), mbh, mbw, 8, has_top, has_left)
    vpdc, vptm = _dc_tm_preds(V.astype(jnp.int32), mbh, mbw, 8, has_top, has_left)
    for up, vp in ((updc, vpdc), (uptm, vptm)):
        ub = (
            up.reshape(B, -1, 2, 4, 2, 4)
            .transpose(0, 1, 2, 4, 3, 5)
            .reshape(B, nmb, 4, 4, 4)
        )
        vb = (
            vp.reshape(B, -1, 2, 4, 2, 4)
            .transpose(0, 1, 2, 4, 3, 5)
            .reshape(B, nmb, 4, 4, 4)
        )
        cu = _dct4x4(u_src - ub).reshape(B, nmb, -1)
        cv = _dct4x4(v_src - vb).reshape(B, nmb, -1)
        coeffs = jnp.concatenate([cu, cv], axis=-1)
        best_uv = jnp.maximum(best_uv, _alphas_from_coeffs(coeffs))

    alpha = (3 * best_alpha + best_uv + 2) >> 2
    final = jnp.clip(MAX_ALPHA - alpha, 0, MAX_ALPHA)
    # host pass: int(best_uv.mean()) — match numpy's float mean + trunc
    uv_alpha = (best_uv.sum(axis=-1) // nmb).astype(jnp.int32)
    return final, uv_alpha
