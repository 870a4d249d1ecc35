"""VP8L (lossless WebP) encoder.

Capability parity with the reference encoder
(`/root/reference/src/encoder/api.rs:936-1222`): always subtract-green,
optional whole-image TOP predictor transform, distance-1 run-length backrefs
(single-entry distance tree), and length-limited canonical Huffman codes.

The implementation is array-oriented: transforms are whole-frame numpy diffs,
the pixel stream is run-length factored with vectorized comparisons, per-symbol
(code, nbits) streams are built by table lookup, and the final LSB-first bit
packing is a vectorized scatter-add (disjoint bit ranges never carry), which is
also the shape of the device packer.
"""

from __future__ import annotations

import heapq

import numpy as np

from ..errors import InvalidDimensions


# -- canonical, length-limited Huffman --------------------------------------

def build_code_lengths(freqs: np.ndarray, limit: int) -> np.ndarray:
    """Huffman code lengths (<= limit) for symbol frequencies; all-zero when
    fewer than two symbols are used."""
    n = len(freqs)
    used = np.flatnonzero(freqs)
    lengths = np.zeros(n, np.int64)
    if len(used) <= 1:
        return lengths

    heap = [(int(freqs[i]), int(i)) for i in used]
    heapq.heapify(heap)
    parent = {}
    next_id = n
    while len(heap) > 1:
        f1, a = heapq.heappop(heap)
        f2, b = heapq.heappop(heap)
        parent[a] = next_id
        parent[b] = next_id
        heapq.heappush(heap, (f1 + f2, next_id))
        next_id += 1
    for i in used:
        d = 0
        x = int(i)
        while x in parent:
            x = parent[x]
            d += 1
        lengths[i] = d

    if lengths.max() > limit:
        counts = np.zeros(limit + 1, np.int64)
        for l in lengths[used]:
            counts[min(int(l), limit)] += 1
        total = sum(int(counts[i]) << (limit - i) for i in range(1, limit + 1))
        while total > (1 << limit):
            i = limit - 1
            while counts[i] == 0:
                i -= 1
            counts[i] -= 1
            counts[limit] -= 1
            counts[i + 1] += 2
            total -= 1
        order = used[np.argsort(freqs[used], kind="stable")]
        ln = limit
        for i in order:
            while counts[ln] == 0:
                ln -= 1
            lengths[i] = ln
            counts[ln] -= 1
    return lengths


def canonical_codes(lengths: np.ndarray) -> np.ndarray:
    """Assign canonical codes (bit-reversed for LSB-first writing)."""
    codes = np.zeros(len(lengths), np.int64)
    code = 0
    max_len = int(lengths.max()) if len(lengths) else 0
    for ln in range(1, max_len + 1):
        for i in np.flatnonzero(lengths == ln):
            rev = int(f"{code:0{ln}b}"[::-1], 2)
            codes[i] = rev
            code += 1
        code <<= 1
    return codes


# -- LSB-first vectorized bit stream ----------------------------------------

class BitStream:
    """Accumulates (code, nbits) entries; packs once with a scatter-add."""

    def __init__(self):
        self.chunks = []  # list of (codes int64 array, nbits int64 array)

    def append(self, codes, nbits):
        self.chunks.append(
            (np.asarray(codes, np.int64).reshape(-1), np.asarray(nbits, np.int64).reshape(-1))
        )

    def append_bits(self, value: int, nbits: int):
        self.append([value], [nbits])

    def to_bytes(self) -> bytes:
        codes = np.concatenate([c for c, _ in self.chunks]) if self.chunks else np.zeros(0, np.int64)
        nbits = np.concatenate([n for _, n in self.chunks]) if self.chunks else np.zeros(0, np.int64)
        keep = nbits > 0
        codes, nbits = codes[keep], nbits[keep]
        offsets = np.zeros(len(nbits) + 1, np.int64)
        np.cumsum(nbits, out=offsets[1:])
        total_bits = int(offsets[-1])
        nbytes = (total_bits + 7) // 8
        acc = np.zeros(nbytes + 8, np.int64)
        byte_idx = offsets[:-1] >> 3
        shift = offsets[:-1] & 7
        # Codes are < 2^25 (15-bit code + 7-bit shift fits in 32 bits).
        val = codes << shift
        for b in range(4):
            np.add.at(acc, byte_idx + b, (val >> (8 * b)) & 0xFF)
        return acc[:nbytes].astype(np.uint8).tobytes()


# -- tree serialization ------------------------------------------------------

_CL_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)


def _write_single_entry_tree(bs: BitStream, symbol: int):
    bs.append_bits(1, 2)  # simple tree, one symbol
    if symbol <= 1:
        bs.append_bits(0, 1)
        bs.append_bits(symbol, 1)
    else:
        bs.append_bits(1, 1)
        bs.append_bits(symbol, 8)


def write_huffman_tree(bs: BitStream, freqs: np.ndarray):
    """Serialize a tree; returns (lengths, codes) for the symbol writer."""
    lengths = build_code_lengths(freqs, 15)
    if lengths.max() == 0:
        used = np.flatnonzero(freqs)
        sym = int(used[0]) if len(used) else 0
        _write_single_entry_tree(bs, sym)
        codes = np.zeros(len(freqs), np.int64)
        return lengths, codes
    codes = canonical_codes(lengths)

    cl_freqs = np.bincount(lengths, minlength=19)[:19]
    cl_lengths = build_code_lengths(cl_freqs, 7)
    single_cl = cl_lengths.max() == 0
    cl_codes = canonical_codes(cl_lengths)

    bs.append_bits(0, 1)  # normal (code-length-coded) tree
    bs.append_bits(19 - 4, 4)
    for i in _CL_ORDER:
        if i > 15 or cl_freqs[i] == 0:
            bs.append_bits(0, 3)
        elif single_cl:
            bs.append_bits(1, 3)
        else:
            bs.append_bits(int(cl_lengths[i]), 3)
    bs.append_bits(0, 1)  # no explicit max_symbol
    if not single_cl:
        bs.append(cl_codes[lengths], cl_lengths[lengths])
    return lengths, codes


def _length_to_symbol(run: np.ndarray):
    """Run length -> (prefix symbol, extra_bits count) vectorized."""
    lm1 = run - 1
    high = np.int64(np.floor(np.log2(np.maximum(lm1, 1))))
    second = (lm1 >> np.maximum(high - 1, 0)) & 1
    symbol = 2 * high + second
    extra = np.maximum(high - 1, 0)
    return symbol, extra


# -- main entry --------------------------------------------------------------

def _cache_hits(packed: np.ndarray, bits: int):
    """Exact color-cache hit mask: pixel i hits iff the most recent earlier
    pixel in its hash bucket holds the same value (every decoded pixel is
    inserted, so the bucket's last writer before i decides)."""
    h = ((0x1E35A7BD * packed.astype(np.uint64)) & 0xFFFFFFFF) >> (32 - bits)
    h = h.astype(np.int64)
    n = len(packed)
    order = np.argsort(h, kind="stable")
    sh = h[order]
    sv = packed[order]
    prev_same = np.zeros(n, bool)
    prev_val = np.zeros(n, np.int64)
    same_bucket = np.zeros(n, bool)
    same_bucket[1:] = sh[1:] == sh[:-1]
    prev_val[1:] = sv[:-1]
    hits_sorted = same_bucket & (prev_val == sv)
    hits = np.zeros(n, bool)
    hits[order] = hits_sorted
    return hits, h


def _entropy_bits(freq: np.ndarray) -> float:
    tot = freq.sum()
    if tot == 0:
        return 0.0
    p = freq[freq > 0] / tot
    return float(-(p * np.log2(p)).sum() * tot)


def encode_lossless(
    rgba: np.ndarray,
    use_predictor: bool = True,
    implicit_dims: bool = False,
    alpha_used: bool = True,
    cache_bits: int = 10,
    predictor_size_bits: int = 4,
) -> bytes:
    """Encode an [h, w, 4] RGBA array as a VP8L stream.

    Pipeline: subtract-green, per-block best-of-14 predictor transform
    (16-px tiles by default; the reference emits only the TOP predictor at
    512-px blocks, api.rs:984-991), windowed LZ77 + entropy-gated color
    cache, canonical Huffman coding.
    """
    h, w = rgba.shape[:2]
    if not (0 < w <= 16384 and 0 < h <= 16384):
        raise InvalidDimensions(f"{w}x{h}")

    # Palette path: when the image has <= 256 distinct colors, encode a
    # color-indexing transform variant too and keep whichever is smaller
    # (the reference encoder has no palette support at all).
    flat = np.ascontiguousarray(rgba.reshape(-1, 4)).view(np.uint32)[:, 0]
    colors = np.unique(flat)
    pal_bytes = None
    if len(colors) <= 256:
        pal_bytes = _encode_palette(
            rgba, colors, implicit_dims, alpha_used, cache_bits
        )

    bs = BitStream()
    if not implicit_dims:
        bs.append_bits(0x2F, 8)
        bs.append_bits(w - 1, 14)
        bs.append_bits(h - 1, 14)
        bs.append_bits(1 if alpha_used else 0, 1)
        bs.append_bits(0, 3)

    px = rgba.reshape(-1, 4).astype(np.int16).copy()
    # Subtract green.
    bs.append_bits(0b101, 3)
    px[:, 0] -= px[:, 1]
    px[:, 2] -= px[:, 1]

    if use_predictor:
        sb = predictor_size_bits
        modes, out = _pick_predictors((px.reshape(h, w, 4) & 0xFF), w, h, sb)
        # transform header: present(1) | type(00=predictor) | size_bits-2
        bs.append_bits(1 | ((sb - 2) << 3), 6)
        bh, bw = modes.shape
        mode_px = np.zeros((bh * bw, 4), np.int64)
        mode_px[:, 1] = modes.reshape(-1)
        _write_image_stream(bs, mode_px, bw, cache_bits=0, is_argb=False)
        px = out.reshape(-1, 4)

        # Cross-color transform on the predictor residuals (per-block
        # least-squares slopes, entropy-gated). Stream order SG, PRED, CT
        # decodes as CT^-1, PRED^-1, SG^-1.
        coefs, ct_out, gain = _pick_color_transform(
            (px.reshape(h, w, 4) & 0xFF), w, h, sb
        )
        if gain > 12.0 * coefs.shape[0] * coefs.shape[1]:  # > sub-image cost
            bs.append_bits(1 | (1 << 1) | ((sb - 2) << 3), 6)
            cbh, cbw = coefs.shape[:2]
            _write_image_stream(
                bs, coefs.reshape(-1, 4).astype(np.int64), cbw,
                cache_bits=0, is_argb=False,
            )
            px = ct_out.reshape(-1, 4)

    px = (px & 0xFF).astype(np.int64)
    bs.append_bits(0, 1)  # transforms done
    _write_image_stream(bs, px, w, cache_bits=cache_bits, is_argb=True)
    out = bs.to_bytes()
    if pal_bytes is not None and len(pal_bytes) < len(out):
        return pal_bytes
    return out


def _encode_palette(rgba: np.ndarray, colors: np.ndarray, implicit_dims: bool,
                    alpha_used: bool, cache_bits: int) -> bytes:
    """Color-indexing (palette) encoding: delta-coded palette sub-image +
    an index image in the green channel, sub-byte packed for <= 16 colors
    (decoder: ops/vp8l_transforms.py inverse_color_indexing)."""
    h, w = rgba.shape[:2]
    n_colors = len(colors)
    bs = BitStream()
    if not implicit_dims:
        bs.append_bits(0x2F, 8)
        bs.append_bits(w - 1, 14)
        bs.append_bits(h - 1, 14)
        bs.append_bits(1 if alpha_used else 0, 1)
        bs.append_bits(0, 3)

    # transform header: present(1) | type(11=color indexing) | size-1
    bs.append_bits(1 | (3 << 1), 3)
    bs.append_bits(n_colors - 1, 8)
    # Palette entries delta-coded per channel; stored as an image stream.
    pal = colors.view(np.uint8).reshape(n_colors, 4)  # r,g,b,a byte order
    delta = pal.astype(np.int64)
    delta[1:] = (pal[1:].astype(np.int64) - pal[:-1].astype(np.int64)) & 0xFF
    _write_image_stream(bs, delta, n_colors, cache_bits=0, is_argb=False)

    # Index image (possibly sub-byte packed).
    flat = np.ascontiguousarray(rgba.reshape(-1, 4)).view(np.uint32)[:, 0]
    idx = np.searchsorted(colors, flat).reshape(h, w)
    if n_colors <= 2:
        w_bits = 3
    elif n_colors <= 4:
        w_bits = 2
    elif n_colors <= 16:
        w_bits = 1
    else:
        w_bits = 0
    if w_bits:
        per = 1 << w_bits
        bpp = 8 >> w_bits
        pw = (w + per - 1) // per
        padded = np.zeros((h, pw * per), np.int64)
        padded[:, :w] = idx
        shifts = (np.arange(per) * bpp)[None, None, :]
        packed = (padded.reshape(h, pw, per) << shifts).sum(-1)
    else:
        pw = w
        packed = idx
    px = np.zeros((h * pw, 4), np.int64)
    px[:, 1] = packed.reshape(-1)

    bs.append_bits(0, 1)  # transforms done
    _write_image_stream(bs, px, pw, cache_bits=cache_bits, is_argb=True)
    return bs.to_bytes()


def _s8(v):
    return ((v.astype(np.int32) + 128) & 0xFF) - 128


def _pick_color_transform(u: np.ndarray, w: int, h: int, size_bits: int):
    """Per-block cross-color coefficients (green->red, green->blue,
    red->blue) by least squares on int8-interpreted residuals, each kept
    only when it beats coefficient 0 on the entropy surrogate.

    Returns (coefs [bh, bw, 4] uint8 sub-image pixels with red_to_blue in
    byte 0 / green_to_blue in byte 1 / green_to_red in byte 2, transformed
    [h, w, 4] int64, estimated bit gain)."""
    S = 1 << size_bits
    bw = _subsample_enc(w, size_bits)
    bh = _subsample_enc(h, size_bits)

    def pool(x):  # [h, w] -> [bh, bw] block sums
        p = np.zeros((bh * S, bw * S), x.dtype)
        p[:h, :w] = x
        return p.reshape(bh, S, bw, S).sum((1, 3))

    def ls_coef(xs, ys):
        num = pool((xs * ys).astype(np.int64))
        den = pool((xs * xs).astype(np.int64))
        c = np.round(32.0 * num / np.maximum(den, 1)).astype(np.int64)
        return np.clip(c, -128, 127)

    def cost(res_bytes):  # [h, w] wrapped residual bytes -> [bh, bw] bits
        wrapped = np.minimum(res_bytes, 256 - res_bytes)
        return pool(_PRED_COST_LUT[wrapped])

    def expand(cblk):  # [bh, bw] -> per-pixel [h, w]
        return cblk[np.arange(h) >> size_bits][:, np.arange(w) >> size_bits]

    gs = _s8(u[:, :, 1])
    gain = 0.0

    def apply(chan, xs, name_cost0):
        """Pick per-block coef for `chan -= (coef*xs)>>5`; returns
        (coef [bh,bw], new channel bytes, gain)."""
        c_fit = ls_coef(xs, _s8(chan))
        fitpx = expand(c_fit)
        newb = (chan - ((fitpx * xs) >> 5)) & 0xFF
        c0 = name_cost0
        cf = cost(newb)
        use_fit = cf + 0.5 < c0  # slight bias toward 0 (cheaper sub-image)
        coef = np.where(use_fit, c_fit, 0)
        out = np.where(expand(use_fit), newb, chan)
        return coef, out, float(np.where(use_fit, c0 - cf, 0.0).sum())

    r = u[:, :, 0].astype(np.int32)
    b = u[:, :, 2].astype(np.int32)

    g2r, r2, g1 = apply(r, gs, cost(r))
    g2b, b2, g2 = apply(b, gs, cost(b))
    # The decoder's red_to_blue term uses the red value it has already
    # inverse-transformed, i.e. the ORIGINAL (pre-CT) red on our side.
    r2b, b3, g3 = apply(b2, _s8(u[:, :, 0]), cost(b2))
    gain = g1 + g2 + g3

    coefs = np.zeros((bh, bw, 4), np.uint8)
    coefs[:, :, 0] = r2b & 0xFF
    coefs[:, :, 1] = g2b & 0xFF
    coefs[:, :, 2] = g2r & 0xFF
    out = u.astype(np.int64).copy()
    out[:, :, 0] = r2
    out[:, :, 2] = b3
    return coefs, out, gain


_PRED_COST_LUT = np.log2(1.0 + np.arange(129))


def _pick_predictors(u: np.ndarray, w: int, h: int, size_bits: int):
    """Choose the best of the 14 VP8L predictors per 2^size_bits block.

    u: [h, w, 4] int (0..255) pixels in the subtract-green domain. Cost
    proxy: sum of log2(1+|wrapped residual|) over channels — a per-pixel
    entropy surrogate; forced-mode edge pixels (row 0 = L, column 0 = T)
    are excluded. Returns (modes [bh, bw] uint8, residual [h, w, 4] int64).
    """
    u = u.astype(np.int32)
    L = np.zeros_like(u)
    L[:, 1:] = u[:, :-1]
    T = np.zeros_like(u)
    T[1:] = u[:-1]
    TL = np.zeros_like(u)
    TL[1:, 1:] = u[:-1, :-1]
    TR = np.zeros_like(u)
    if w > 1:
        TR[1:, :-1] = u[:-1, 1:]
    TR[1:, -1] = u[1:, 0]  # last column: current row's first pixel

    def avg2(a, b):
        return (a + b) >> 1

    preds = np.empty((14, h, w, 4), np.int32)
    preds[0] = 0
    preds[0, :, :, 3] = 255
    preds[1] = L
    preds[2] = T
    preds[3] = TR
    preds[4] = TL
    preds[5] = avg2(avg2(L, TR), T)
    preds[6] = avg2(L, TL)
    preds[7] = avg2(L, T)
    preds[8] = avg2(TL, T)
    preds[9] = avg2(T, TR)
    preds[10] = avg2(avg2(L, TL), avg2(T, TR))
    p = L + T - TL
    p_left = np.abs(p - L).sum(-1, keepdims=True)
    p_top = np.abs(p - T).sum(-1, keepdims=True)
    preds[11] = np.where(p_left < p_top, L, T)
    preds[12] = np.clip(p, 0, 255)
    a2 = avg2(L, T)
    d = a2 - TL
    half = np.where(d >= 0, d >> 1, -((-d) >> 1))
    preds[13] = np.clip(a2 + half, 0, 255)

    res = (u[None] - preds) & 0xFF
    wrapped = np.minimum(res, 256 - res)  # 0 stays 0
    cost_px = _PRED_COST_LUT[wrapped].sum(-1)  # [14, h, w]
    # Forced-mode pixels don't discriminate between block modes.
    cost_px[:, 0, :] = 0.0
    cost_px[:, :, 0] = 0.0

    S = 1 << size_bits
    bw = _subsample_enc(w, size_bits)
    bh = _subsample_enc(h, size_bits)
    padded = np.zeros((14, bh * S, bw * S))
    padded[:, :h, :w] = cost_px
    cost_blk = padded.reshape(14, bh, S, bw, S).sum((2, 4))
    modes = np.argmin(cost_blk, axis=0).astype(np.uint8)  # [bh, bw]

    # Final residual under the chosen per-block modes + edge overrides.
    ys = np.arange(h) >> size_bits
    xs = np.arange(w) >> size_bits
    mode_map = modes[ys][:, xs]  # [h, w]
    pred = np.take_along_axis(
        preds, mode_map[None, :, :, None].astype(np.int64), axis=0
    )[0]
    pred[:, 0] = T[:, 0]   # column 0: top predictor
    pred[0, :] = L[0, :]   # row 0: left predictor
    pred[0, 0] = (0, 0, 0, 255)
    return modes, ((u - pred) & 0xFF).astype(np.int64)


def _subsample_enc(size: int, bits: int) -> int:
    return (size + (1 << bits) - 1) >> bits


def _write_image_stream(bs: BitStream, px: np.ndarray, width: int,
                        cache_bits: int, is_argb: bool):
    """Write one VP8L-coded image stream (cache flag, [meta flag for ARGB],
    5 trees, token stream) for px [n, 4] int64 (r, g, b, a) values 0..255.

    `width` feeds the distance->plane-code mapping (the 2D neighborhood
    codes are width-relative); token distances are linear either way.
    """
    w = width
    packed = (px[:, 0] << 16) | (px[:, 1] << 8) | px[:, 2] | (px[:, 3] << 24)
    n = len(packed)
    # Tokenize: windowed LZ77 (native hash-chain matcher) when available,
    # else distance-1 runs (the reference encoder's scheme,
    # /root/reference/src/encoder/api.rs:366-412).
    lens, dists = _tokenize(packed)
    pos = np.zeros(len(lens), np.int64)
    np.cumsum(lens[:-1], out=pos[1:])
    is_lit = lens == 1
    literals_idx = pos[is_lit]

    g = px[:, 1]
    r = px[:, 0]
    b = px[:, 2]
    a = px[:, 3]

    # Color cache: exact hit detection, kept only when the entropy estimate
    # says it pays for itself (extra g-tree symbols vs dropped R/B/A codes).
    use_cache = False
    if cache_bits:
        hits_all, hashes_all = _cache_hits(packed, cache_bits)
        lit_hit = hits_all[literals_idx]
        lit_hash = hashes_all[literals_idx]
        fg_nc = np.bincount(g[literals_idx], minlength=256).astype(np.int64)
        fr_nc = np.bincount(r[literals_idx], minlength=256).astype(np.int64)
        fb_nc = np.bincount(b[literals_idx], minlength=256).astype(np.int64)
        fa_nc = np.bincount(a[literals_idx], minlength=256).astype(np.int64)
        no_cache_bits = sum(map(_entropy_bits, (fg_nc, fr_nc, fb_nc, fa_nc)))
        miss = ~lit_hit
        fg_c = np.zeros(280 + (1 << cache_bits), np.int64)
        np.add.at(fg_c, g[literals_idx][miss], 1)
        np.add.at(fg_c, 280 + lit_hash[lit_hit], 1)
        fr_c = np.bincount(r[literals_idx][miss], minlength=256).astype(np.int64)
        fb_c = np.bincount(b[literals_idx][miss], minlength=256).astype(np.int64)
        fa_c = np.bincount(a[literals_idx][miss], minlength=256).astype(np.int64)
        cache_bits_est = sum(map(_entropy_bits, (fg_c, fr_c, fb_c, fa_c)))
        use_cache = cache_bits_est + (1 << cache_bits) * 0.5 < no_cache_bits

    if use_cache:
        bs.append_bits(1, 1)
        bs.append_bits(cache_bits, 4)
    else:
        bs.append_bits(0, 1)  # no color cache
    if is_argb:
        bs.append_bits(0, 1)  # no meta-huffman (top-level streams only)

    # Histogram for the green/length(/cache) tree.
    alpha_size = 280 + ((1 << cache_bits) if use_cache else 0)
    freq_g = np.zeros(alpha_size if use_cache else 280, np.int64)
    if use_cache:
        miss = ~lit_hit
        np.add.at(freq_g, g[literals_idx][miss], 1)
        np.add.at(freq_g, 280 + lit_hash[lit_hit], 1)
        freq_r = np.bincount(r[literals_idx][miss], minlength=256).astype(np.int64)
        freq_b = np.bincount(b[literals_idx][miss], minlength=256).astype(np.int64)
        freq_a = np.bincount(a[literals_idx][miss], minlength=256).astype(np.int64)
    else:
        np.add.at(freq_g, g[literals_idx], 1)
        freq_r = np.bincount(r[literals_idx], minlength=256).astype(np.int64)
        freq_b = np.bincount(b[literals_idx], minlength=256).astype(np.int64)
        freq_a = np.bincount(a[literals_idx], minlength=256).astype(np.int64)

    # Copy tokens: length prefix symbols on the green tree, distance prefix
    # symbols (plane-code mapped) on the distance tree.
    cp_len = lens[~is_lit]
    cp_dist = dists[~is_lit]
    len_sym, len_eb = _length_to_symbol(cp_len)
    len_sym = np.where(cp_len <= 4, cp_len - 1, len_sym)
    len_eb = np.where(cp_len <= 4, 0, len_eb)
    plane = _distance_to_plane_code(cp_dist, w)
    d_sym, d_eb = _length_to_symbol(plane)
    d_sym = np.where(plane <= 4, plane - 1, d_sym)
    d_eb = np.where(plane <= 4, 0, d_eb)
    np.add.at(freq_g, 256 + len_sym, 1)
    freq_d = np.bincount(d_sym, minlength=40).astype(np.int64)

    # Trees: green+length(+cache), red, blue, alpha, distance.
    len_g, code_g = write_huffman_tree(bs, freq_g)
    len_r, code_r = write_huffman_tree(bs, freq_r)
    len_b, code_b = write_huffman_tree(bs, freq_b)
    len_a, code_a = write_huffman_tree(bs, freq_a)
    len_d, code_d = write_huffman_tree(bs, freq_d)

    # Emit the token stream as fixed 4-slot records (zero-width slots drop
    # out in BitStream packing): literal = G,R,B,A (or one cache symbol);
    # copy = length prefix, length extra, distance prefix, distance extra.
    nt = len(lens)
    codes4 = np.zeros((nt, 4), np.int64)
    bits4 = np.zeros((nt, 4), np.int64)

    li = literals_idx
    codes4[is_lit] = np.stack(
        [code_g[g[li]], code_r[r[li]], code_b[b[li]], code_a[a[li]]], axis=1
    )
    bits4[is_lit] = np.stack(
        [len_g[g[li]], len_r[r[li]], len_b[b[li]], len_a[a[li]]], axis=1
    )
    if use_cache:
        # Cache-hit literals collapse to one g-tree symbol (280 + hash).
        cache_sym = 280 + lit_hash
        lit_codes = codes4[is_lit]
        lit_bits = bits4[is_lit]
        zero = np.zeros_like(cache_sym)
        lit_codes = np.where(
            lit_hit[:, None],
            np.stack([code_g[cache_sym], zero, zero, zero], axis=1),
            lit_codes,
        )
        lit_bits = np.where(
            lit_hit[:, None],
            np.stack([len_g[cache_sym], zero, zero, zero], axis=1),
            lit_bits,
        )
        codes4[is_lit] = lit_codes
        bits4[is_lit] = lit_bits

    if len(cp_len):
        gsym = 256 + len_sym
        codes4[~is_lit] = np.stack(
            [
                code_g[gsym],
                (cp_len - 1) & ((1 << len_eb) - 1),
                code_d[d_sym],
                (plane - 1) & ((1 << d_eb) - 1),
            ],
            axis=1,
        )
        bits4[~is_lit] = np.stack([len_g[gsym], len_eb, len_d[d_sym], d_eb], axis=1)

    bs.append(codes4.reshape(-1), bits4.reshape(-1))


def _tokenize(packed: np.ndarray):
    """Factor the pixel stream into (lens, dists) tokens: len==1 literals,
    len>=2 backref copies. Native windowed LZ77 when available; otherwise
    distance-1 runs of identical pixels (the reference encoder's subset)."""
    n = len(packed)
    try:
        from ..io import native

        if native.available() and n > 1:
            return native.vp8l_lz77(packed.astype(np.uint32))
    except Exception:
        pass
    # Fallback: runs of identical pixels, capped at 4096 per token.
    boundaries = np.flatnonzero(np.diff(packed)) + 1
    starts = np.concatenate([[0], boundaries])
    run_lens = np.diff(np.concatenate([starts, [n]]))
    lens_l, dists_l = [], []
    for rl in run_lens:
        rl = int(rl)
        lens_l.append(1)
        dists_l.append(0)
        rem = rl - 1
        while rem > 0:
            take = min(rem, 4096)
            if take == 1:
                lens_l.append(1)
                dists_l.append(0)
            else:
                lens_l.append(take)
                dists_l.append(1)
            rem -= take
    return np.array(lens_l, np.int64), np.array(dists_l, np.int64)


def _distance_to_plane_code(dist: np.ndarray, width: int) -> np.ndarray:
    """Map linear backref distances to VP8L plane codes: the 120-entry 2D
    neighborhood map when applicable (smaller symbols), else dist+120."""
    from ..decode.vp8l import DISTANCE_MAP

    lut_size = 8 + 7 * width + 2
    lut = np.zeros(lut_size, np.int64)
    for i, (xoff, yoff) in enumerate(DISTANCE_MAP):
        d = max(xoff + yoff * width, 1)
        if d < lut_size and lut[d] == 0:
            lut[d] = i + 1
    dist = dist.astype(np.int64)
    in_lut = dist < lut_size
    mapped = np.where(in_lut, lut[np.minimum(dist, lut_size - 1)], 0)
    return np.where(mapped > 0, mapped, dist + 120)


def encode_alpha_lossless(alpha_plane: np.ndarray) -> bytes:
    """ALPH chunk payload: VP8L-compressed alpha in the green channel."""
    h, w = alpha_plane.shape
    rgba = np.empty((h, w, 4), np.uint8)
    # L8 expansion (r=g=b=value) so subtract-green zeroes R and B.
    rgba[:, :, 0] = rgba[:, :, 1] = rgba[:, :, 2] = alpha_plane
    rgba[:, :, 3] = 255
    # header byte: compression=1 (lossless), no filtering, no preprocessing
    payload = encode_lossless(rgba, use_predictor=True, implicit_dims=True)
    return b"\x01" + payload
