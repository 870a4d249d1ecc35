"""Rate and distortion models: probability-dependent level costs, residual
cost, token statistics, TDisto spectral distortion, flatness heuristics.

All batched over a leading block axis so whole-macroblock (and later whole
frame) cost evaluation is a handful of numpy gathers. Parity reference:
`/root/reference/src/encoder/cost.rs` (level costs :1449-1591, residual cost
:1666-1740, stats :1170-1400, TDisto :48-160, flatness :177-228).
"""

from __future__ import annotations

import numpy as np

from ..common import vp8_tables as T
from . import tables as ET

NUM_TYPES, NUM_BANDS, NUM_CTX, NUM_PROBAS = 4, 8, 3, 11
MAX_VARIABLE_LEVEL = 67
MAX_LEVEL = 2047

_ENT = ET.VP8_ENTROPY_COST.astype(np.int64)
_BANDS = np.array(ET.VP8_ENC_BANDS[:16], np.int64)


def bit_cost(bit, prob):
    """Cost in 1/256-bit units of coding `bit` with probability `prob`."""
    p = np.asarray(prob, np.int64)
    return np.where(np.asarray(bit, bool), _ENT[255 - p], _ENT[p])


def _variable_level_cost(level: int, probas) -> int:
    if level == 0:
        return 0
    idx = min(level, MAX_VARIABLE_LEVEL) - 1
    pattern = int(ET.VP8_LEVEL_CODES[idx, 0])
    bits = int(ET.VP8_LEVEL_CODES[idx, 1])
    cost = 0
    i = 2
    while pattern:
        if pattern & 1:
            cost += int(bit_cost(bits & 1, probas[i]))
        bits >>= 1
        pattern >>= 1
        i += 1
    return cost


_LEVEL_COSTS_CACHE = {}


def cached_level_costs(probs: np.ndarray) -> "LevelCosts":
    """LevelCosts memoized by probability content (the default-probs table is
    rebuilt for every encode otherwise — ~0.2 s of pure table math)."""
    key = probs.tobytes()
    hit = _LEVEL_COSTS_CACHE.get(key)
    if hit is None:
        hit = LevelCosts(probs)
        if len(_LEVEL_COSTS_CACHE) > 8:
            _LEVEL_COSTS_CACHE.clear()
        _LEVEL_COSTS_CACHE[key] = hit
    return hit


# Static decomposition of the per-level variable cost: cost(v >= 1) =
# sum_i A1[v-1, i] * bitcost(1, p[i+2]) + A0[v-1, i] * bitcost(0, p[i+2]),
# where the 0/1 masks come from VP8_LEVEL_CODES' (pattern, bits) pairs.
def _build_level_code_masks():
    a1 = np.zeros((MAX_VARIABLE_LEVEL, 9), np.int64)
    a0 = np.zeros((MAX_VARIABLE_LEVEL, 9), np.int64)
    for idx in range(MAX_VARIABLE_LEVEL):
        pattern = int(ET.VP8_LEVEL_CODES[idx, 0])
        bits = int(ET.VP8_LEVEL_CODES[idx, 1])
        i = 0
        while pattern:
            if pattern & 1:
                (a1 if bits & 1 else a0)[idx, i] = 1
            bits >>= 1
            pattern >>= 1
            i += 1
    return a1, a0


_LC_A1, _LC_A0 = _build_level_code_masks()


class LevelCosts:
    """Precomputed cost tables from a token probability set.

    Fully vectorized (one einsum over the static level-code masks) — the
    per-(type, band, ctx, level) python loop took ~0.2 s per probability
    set, which matters when two-pass encoding adapts probabilities per
    image in a batch.
    """

    def __init__(self, probs: np.ndarray):
        self.probs = probs.astype(np.int64)
        p = self.probs  # [T, B, C, 11]
        e1 = _ENT[255 - p]  # cost of bit=1 per node
        e0 = _ENT[p]        # cost of bit=0 per node
        cost0 = np.zeros((NUM_TYPES, NUM_BANDS, NUM_CTX), np.int64)
        cost0[:, :, 1:] = e1[:, :, 1:, 0]
        cost_base = e1[..., 1] + cost0

        lc = np.zeros((NUM_TYPES, NUM_BANDS, NUM_CTX, MAX_VARIABLE_LEVEL + 1), np.int64)
        lc[..., 0] = e0[..., 1] + cost0
        var = np.einsum("vi,tbci->tbcv", _LC_A1, e1[..., 2:]) + np.einsum(
            "vi,tbci->tbcv", _LC_A0, e0[..., 2:]
        )
        lc[..., 1:] = cost_base[..., None] + var
        self.level_cost = lc
        # Position-remapped variable costs [t][pos][ctx][level]
        self.pos_cost = lc[:, _BANDS]
        self.eob = e0[..., 0]
        self.init = e1[..., 0]
        # p0 per [t][pos][ctx] for EOB terms.
        self.p0 = self.probs[..., 0][:, _BANDS, :]
        self.fixed = ET.VP8_LEVEL_FIXED_COSTS.astype(np.int64)


def residual_costs(levels: np.ndarray, ctype: int, first: int, ctx0, costs: LevelCosts):
    """Cost of residual blocks [N, 16] (zigzag-order levels) in 1/256 bits.

    `ctx0` is a scalar or [N] array of initial contexts.
    """
    v = np.abs(levels.astype(np.int64))
    n_blocks = v.shape[0]
    ctx0 = np.broadcast_to(np.asarray(ctx0, np.int64), (n_blocks,)).copy()

    nz = v != 0
    any_nz = nz[:, first:].any(axis=1)
    last = np.where(any_nz, 15 - np.argmax(nz[:, ::-1], axis=1), -1)

    vc = np.minimum(v, MAX_VARIABLE_LEVEL)
    vfix = costs.fixed[np.minimum(v, MAX_LEVEL)]

    cost = np.where(ctx0 == 0, bit_cost(True, costs.p0[ctype, first, ctx0]), 0)
    ctx = ctx0.copy()
    last_ctx = ctx0.copy()
    for n in range(first, 16):
        active = n <= last
        c_n = costs.pos_cost[ctype, n][ctx, vc[:, n]] + vfix[:, n]
        cost = np.where(active, cost + c_n, cost)
        new_ctx = np.minimum(v[:, n], 2)
        # Track the context that follows the final coefficient for the EOB term.
        last_ctx = np.where(active & (n == last), np.where(v[:, n] == 1, 1, 2), last_ctx)
        ctx = np.where(active, new_ctx, ctx)

    # EOB cost after the last coefficient (when not at position 15).
    eob_pos = np.minimum(last + 1, 15)
    eob_cost = bit_cost(False, costs.p0[ctype, eob_pos, last_ctx])
    cost = np.where(any_nz & (last < 15), cost + eob_cost, cost)

    # Empty blocks: a single EOB bit.
    empty_cost = bit_cost(False, costs.p0[ctype, first, ctx0])
    return np.where(any_nz, cost, empty_cost)


class ProbaStats:
    """Token statistics accumulator; counts (total, ones) per tree node."""

    def __init__(self):
        self.total = np.zeros((NUM_TYPES, NUM_BANDS, NUM_CTX, NUM_PROBAS), np.int64)
        self.ones = np.zeros_like(self.total)

    def record_blocks(self, levels: np.ndarray, ctype: int, first: int, ctx0):
        """Record stats for [N, 16] zigzag-order level blocks (batched)."""
        v = np.abs(levels.astype(np.int64))
        n_blocks = v.shape[0]
        ctx = np.broadcast_to(np.asarray(ctx0, np.int64), (n_blocks,)).copy()

        nz = v != 0
        any_nz = nz[:, first:].any(axis=1)
        last = np.where(any_nz, 15 - np.argmax(nz[:, ::-1], axis=1), -1)
        end = np.where(any_nz, last + 1, 0)

        t = ctype
        tot, ones = self.total[t], self.ones[t]

        def rec(band, c, node, bits, mask):
            # band/c/bits are [N] arrays, mask selects active lanes.
            if not mask.any():
                return
            np.add.at(tot, (band[mask], c[mask], node), 1)
            np.add.at(ones, (band[mask], c[mask], node), bits[mask].astype(np.int64))

        # Empty blocks record one EOB=false at node 0.
        empty = end <= first
        band_first = np.full(n_blocks, int(_BANDS[first]))
        zeros = np.zeros(n_blocks, np.int64)
        rec(band_first, ctx, 0, zeros, empty)

        skip_eob = np.zeros(n_blocks, bool)
        for n in range(first, 16):
            active = (~empty) & (n < end)
            if not active.any():
                break
            band = np.full(n_blocks, int(_BANDS[n]))
            vn = v[:, n]
            ones_arr = np.ones(n_blocks, np.int64)
            rec(band, ctx, 0, ones_arr, active & ~skip_eob)  # not EOB
            is_zero = vn == 0
            rec(band, ctx, 1, (~is_zero).astype(np.int64), active)
            nz_act = active & ~is_zero
            # Value cascade (nodes 2..10), mirroring the token tree.
            rec(band, ctx, 2, (vn > 1).astype(np.int64), nz_act)
            gt1 = nz_act & (vn > 1)
            vcl = np.minimum(vn, MAX_VARIABLE_LEVEL)
            rec(band, ctx, 3, (vcl > 4).astype(np.int64), gt1)
            le4 = gt1 & (vcl <= 4)
            rec(band, ctx, 4, (vcl > 2).astype(np.int64), le4)
            rec(band, ctx, 5, (vcl == 4).astype(np.int64), le4 & (vcl > 2))
            mid = gt1 & (vcl > 4) & (vcl <= 10)
            rec(band, ctx, 6, zeros, mid)
            rec(band, ctx, 7, (vcl > 6).astype(np.int64), mid)
            hi = gt1 & (vcl > 10)
            rec(band, ctx, 6, ones_arr, hi)
            cat34 = hi & (vcl < 3 + (8 << 2))
            rec(band, ctx, 8, zeros, cat34)
            rec(band, ctx, 9, (vcl >= 3 + (8 << 1)).astype(np.int64), cat34)
            cat56 = hi & (vcl >= 3 + (8 << 2))
            rec(band, ctx, 8, ones_arr, cat56)
            rec(band, ctx, 10, (vcl >= 3 + (8 << 3)).astype(np.int64), cat56)

            skip_eob = np.where(active, is_zero, skip_eob)
            ctx = np.where(active, np.minimum(vn, 2), ctx)

        # Trailing EOB for blocks ending before position 16.
        tail = (~empty) & (end < 16)
        band_end = _BANDS[np.minimum(end, 15)]
        rec(band_end, ctx, 0, zeros, tail)

    def updated_probs(self, old_probs: np.ndarray) -> np.ndarray:
        """Choose per-node new probabilities when they pay for themselves."""
        total = self.total
        nb = self.ones
        with np.errstate(divide="ignore", invalid="ignore"):
            new_p = np.where(total > 0, 255 - (nb * 255) // np.maximum(total, 1), 255)
        new_p = new_p.astype(np.int64)
        old = old_probs.astype(np.int64)
        upd = T.COEFF_UPDATE_PROBS.astype(np.int64)

        def branch_cost(probs):
            return nb * _ENT[255 - probs] + (total - nb) * _ENT[probs]

        old_cost = branch_cost(old) + _ENT[upd]
        new_cost = branch_cost(new_p) + _ENT[255 - upd] + 8 * 256
        use_new = (total > 0) & (old_cost > new_cost)
        return np.where(use_new, new_p, old).astype(np.uint8)


# -- spectral distortion (TDisto) ------------------------------------------

def _t_transform(blocks: np.ndarray, w: np.ndarray) -> np.ndarray:
    """Weighted Hadamard energy of [..., 4, 4] blocks -> [...]."""
    b = blocks.astype(np.int64)
    e0, e1, e2, e3 = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    a0, a1, a2, a3 = e0 + e2, e1 + e3, e1 - e3, e0 - e2
    t = np.stack([a0 + a1, a3 + a2, a3 - a2, a0 - a1], axis=-1)
    c0, c1, c2, c3 = t[..., 0, :], t[..., 1, :], t[..., 2, :], t[..., 3, :]
    a0, a1, a2, a3 = c0 + c2, c1 + c3, c1 - c3, c0 - c2
    out = np.stack([a0 + a1, a3 + a2, a3 - a2, a0 - a1], axis=-2)
    wr = w.reshape(4, 4)
    return (np.abs(out) * wr).sum(axis=(-1, -2))


def tdisto(src: np.ndarray, rec: np.ndarray, w: np.ndarray) -> np.ndarray:
    """Spectral distortion of [..., 4, 4] block pairs: |T(a)-T(b)| >> 5."""
    return np.abs(_t_transform(rec, w) - _t_transform(src, w)) >> 5


def sse(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    d = a.astype(np.int64) - b.astype(np.int64)
    return (d * d).sum(axis=tuple(range(1, d.ndim))) if d.ndim > 1 else (d * d).sum()


FLATNESS_LIMIT_I16 = 0
FLATNESS_LIMIT_I4 = 3
FLATNESS_LIMIT_UV = 2
FLATNESS_PENALTY = 140


def is_flat_source(block: np.ndarray) -> bool:
    return bool((block == block.flat[0]).all())


def is_flat_levels(levels: np.ndarray, thresh: int) -> bool:
    """True when the count of nonzero AC levels is <= thresh."""
    return int((levels.reshape(-1, 16)[:, 1:] != 0).sum()) <= thresh
