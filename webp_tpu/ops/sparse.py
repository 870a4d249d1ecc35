"""Sparse transfer format for coefficient levels across the host<->device link.

Quantized levels are ~75-90% zeros at normal qualities (measured 93 nonzeros
per MB at Q75 method-4 on the Kodak bench geometry, i.e. 23% of the 400
level slots per macroblock). Shipping them dense wastes the narrow
host<->device link, which is the pipeline's binding constraint (NOTES.md).

Wire format per image (flat level vector of length N = nmb*400):
  bitmap: uint8 [N/8]   one bit per level slot, np.packbits order (MSB first)
  vals:   int8  [CAP]   the nonzero levels in slot order, zero padded
CAP is static per geometry (128 per MB = 32% density) so kernels compile
once; an image whose nonzero count exceeds CAP falls back to the dense path.

Both directions use it: the decoder's host entropy pass packs on the host
(numpy) and the device expands; the encoder's analysis kernel compacts on the
device (cumsum + searchsorted, gather-only — no scatter) and the host expands.

The dense<->sparse mapping covers the int8-clipped levels; values outside
int8 range ride the existing per-MB escape lists and are re-applied after
expansion on either side (see decode/device.py, ops/encode_wavefront2.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def cap_for(nmb: int) -> int:
    """Static nonzero budget per image: 128 level slots per macroblock."""
    return nmb * 128


# ---------------------------------------------------------------------------
# device side
# ---------------------------------------------------------------------------

_BIT_SHIFTS = tuple(range(7, -1, -1))  # np.packbits default: MSB first


def device_pack_levels(flat_i8, cap: int):
    """[B, N] int8 -> (bitmap uint8 [B, N/8], vals int8 [B, cap], overflow [B]).

    Gather-only compaction: vals[k] = flat[searchsorted(cumsum(mask), k+1)],
    i.e. the position of the (k+1)-th nonzero. No scatter (TPU-unfriendly).

    NOTE: measured 48.75 ms/img on v5e at bench geometry (the ~200k-key
    binary-search gathers per image don't vectorize) — the production encode
    path uses device_pack_levels_mb instead.  Kept for the decode-direction
    wire format and small shapes.
    """
    B, N = flat_i8.shape
    assert N % 8 == 0
    mask = flat_i8 != 0
    m8 = mask.reshape(B, N // 8, 8)
    weights = jnp.array([1 << s for s in _BIT_SHIFTS], jnp.int32)
    bitmap = (m8.astype(jnp.int32) * weights).sum(-1).astype(jnp.uint8)

    cs = jnp.cumsum(mask.astype(jnp.int32), axis=-1)
    ks = jnp.arange(1, cap + 1, dtype=jnp.int32)

    def one(cs_b, flat_b):
        idx = jnp.searchsorted(cs_b, ks, side="left")
        v = flat_b[jnp.clip(idx, 0, N - 1)]
        return jnp.where(idx < N, v, 0)

    vals = jax.vmap(one)(cs, flat_i8)
    overflow = cs[:, -1] > cap
    return bitmap, vals, overflow


def device_pack_levels_mb(lv8, cap_mb: int):
    """[B, nmb, S] int8 -> (bitmap uint8 [B, nmb*S/8], vals int8
    [B, nmb, cap_mb], overflow [B]).  TPU-native compaction.

    Per-MB one-hot-matmul compaction instead of image-wide searchsorted:
    vals[m, k] = sum_j lv[m, j] * 1[cumsum(mask)[m, j] == k+1] — the sum
    picks exactly the (k+1)-th nonzero because lv is zero everywhere the
    one-hot collides with a zero slot.  The contraction is an [S, cap_mb]
    matmul per MB that rides the MXU (~5 GFLOP/batch at bench geometry,
    sub-ms) versus ~200k serial binary-search gathers for the flat pack
    (48.75 ms/img measured).  f32 accumulation is exact: levels are int8
    and S <= 400 so every partial sum stays far below 2^24.

    overflow[b] is set when ANY MB in image b has more than cap_mb
    nonzeros (caller falls back to fetching that image's dense row).
    """
    B, nmb, S = lv8.shape
    assert (nmb * S) % 8 == 0
    mask = lv8 != 0
    m8 = mask.reshape(B, (nmb * S) // 8, 8)
    weights = jnp.array([1 << s for s in _BIT_SHIFTS], jnp.int32)
    bitmap = (m8.astype(jnp.int32) * weights).sum(-1).astype(jnp.uint8)

    cs = jnp.cumsum(mask.astype(jnp.int32), axis=-1)  # [B, nmb, S]
    onehot = (cs[..., None] == jnp.arange(1, cap_mb + 1, dtype=jnp.int32)).astype(
        jnp.float32
    )  # [B, nmb, S, cap_mb], fused tile-wise into the matmul below
    vals = jnp.einsum(
        "bmj,bmjk->bmk",
        lv8.astype(jnp.float32),
        onehot,
        preferred_element_type=jnp.float32,
    )
    overflow = (cs[..., -1] > cap_mb).any(-1)
    return bitmap, vals.astype(jnp.int8), overflow


def device_expand_levels(bitmap, vals, n: int):
    """(bitmap uint8 [B, n/8], vals int8 [B, cap]) -> dense int8 [B, n].

    NOTE: the image-flat take_along_axis gather costs ~478 ms/batch at bench
    geometry (profiled r5: one kCustom gather fusion dominates the whole
    decode dispatch) — production decode uses device_expand_levels_mb.
    Kept for small shapes and as the flat-format reference.
    """
    B = bitmap.shape[0]
    cap = vals.shape[-1]
    shifts = jnp.array(_BIT_SHIFTS, jnp.uint8)
    bits = (bitmap[..., None] >> shifts) & jnp.uint8(1)
    mask = bits.reshape(B, -1)[:, :n]
    cs = jnp.cumsum(mask.astype(jnp.int32), axis=-1)
    idx = jnp.clip(cs - 1, 0, cap - 1)
    lv = jnp.take_along_axis(vals, idx, axis=-1)
    return jnp.where(mask != 0, lv, jnp.int8(0))


def device_expand_levels_mb(bitmap, vals, nmb: int, S: int):
    """(bitmap uint8 [B, nmb*S/8], vals int8 [B, nmb, cap_mb]) -> dense int8
    [B, nmb, S].  TPU-native expansion, inverse of device_pack_levels_mb.

    One-hot-matmul scatter instead of a gather: dense[m, j] =
    sum_k vals[m, k] * 1[cumsum(mask)[m, j] == k+1 and mask[m, j]] — each set
    slot j receives exactly its rank-(cs[j]-1) value, unset slots sum to
    zero.  The contraction is a [cap_mb, S] matmul per MB on the MXU
    (~25 ms/batch at bench geometry) versus the flat gather's ~478 ms.
    f32 accumulation is exact (|vals| < 2^7, one term per output).
    """
    B = bitmap.shape[0]
    cap = vals.shape[-1]
    shifts = jnp.array(_BIT_SHIFTS, jnp.uint8)
    bits = (bitmap[..., None] >> shifts) & jnp.uint8(1)
    mask = bits.reshape(B, -1)[:, : nmb * S].reshape(B, nmb, S)
    cs = jnp.cumsum(mask.astype(jnp.int32), axis=-1)  # [B, nmb, S]
    onehot = (
        (cs[..., None] == jnp.arange(1, cap + 1, dtype=jnp.int32))
        & (mask[..., None] != 0)
    ).astype(jnp.float32)  # [B, nmb, S, cap], fused tile-wise into the matmul
    dense = jnp.einsum(
        "bmk,bmjk->bmj",
        vals.astype(jnp.float32),
        onehot,
        preferred_element_type=jnp.float32,
    )
    return dense.astype(jnp.int8)


# ---------------------------------------------------------------------------
# host side
# ---------------------------------------------------------------------------


def host_pack_levels(flat_i8: np.ndarray, cap: int):
    """[N] int8 -> (bitmap, vals, ok). ok=False when nonzeros exceed cap."""
    mask = flat_i8 != 0
    bitmap = np.packbits(mask)
    nz = flat_i8[mask]
    if len(nz) > cap:
        return bitmap, None, False
    vals = np.zeros(cap, np.int8)
    vals[: len(nz)] = nz
    return bitmap, vals, True


def host_pack_levels_mb(flat_i8: np.ndarray, nmb: int, S: int, cap_mb: int):
    """[nmb*S] int8 -> (bitmap uint8 [nmb*S/8], vals int8 [nmb, cap_mb], ok).

    Per-MB wire format (matches device_pack_levels_mb / host_expand_levels_mb):
    MB m's nonzeros occupy vals[m, :count_m] in slot order.  ok=False when
    any MB exceeds cap_mb (caller falls back to the dense path).
    """
    lv2 = flat_i8.reshape(nmb, S)
    mask = lv2 != 0
    bitmap = np.packbits(mask)
    counts = mask.sum(1)
    if counts.max(initial=0) > cap_mb:
        return bitmap, None, False
    rows, cols = np.nonzero(mask)  # sorted by (row, col)
    row_start = np.concatenate([[0], np.cumsum(counts[:-1])])
    ranks = np.arange(len(rows)) - row_start[rows]
    vals = np.zeros((nmb, cap_mb), np.int8)
    vals[rows, ranks] = lv2[rows, cols]
    return bitmap, vals, True


def host_expand_levels(bitmap: np.ndarray, vals: np.ndarray, n: int) -> np.ndarray:
    """(bitmap uint8 [n/8], vals int8 [cap]) -> dense int8 [n]."""
    bits = np.unpackbits(bitmap)[:n]
    out = np.zeros(n, np.int8)
    idx = np.nonzero(bits)[0]
    out[idx] = vals[: len(idx)]
    return out


def host_expand_levels_mb(bitmap: np.ndarray, vals: np.ndarray, nmb: int,
                          S: int) -> np.ndarray:
    """(bitmap uint8 [nmb*S/8], vals int8 [nmb, cap_mb]) -> dense [nmb, S].

    Inverse of device_pack_levels_mb: each MB's nonzeros sit in ITS row of
    vals in slot order (zero-padded), not packed across the whole image.
    """
    cap_mb = vals.shape[1]
    flat_bits = np.unpackbits(bitmap)[: nmb * S]
    flat_idx = np.flatnonzero(flat_bits)  # sorted, so grouped by MB
    mb_idx = flat_idx // S
    counts = np.bincount(mb_idx, minlength=nmb)
    if counts.max(initial=0) > cap_mb:
        # device_pack_levels_mb flagged this image via `overflow`; callers
        # must fetch the dense row instead of expanding a truncated pack.
        raise ValueError("per-MB nonzero count exceeds the sparse cap")
    # within-row rank of each nonzero = its column in vals
    row_start = np.concatenate([[0], np.cumsum(counts[:-1])])
    ranks = np.arange(len(flat_idx)) - row_start[mb_idx]
    out = np.zeros(nmb * S, np.int8)
    out[flat_idx] = vals.reshape(-1)[mb_idx * cap_mb + ranks]
    return out.reshape(nmb, S)
