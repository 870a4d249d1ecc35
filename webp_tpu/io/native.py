"""ctypes bindings for the native (C++) entropy hot loops.

The boolean arithmetic coder is the codec's serial tail; `native/
vp8_entropy.cpp` runs it at native speed while all tables stay single-sourced
in Python. Falls back gracefully (callers check `available()`).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path

import numpy as np

from ..common import vp8_tables as T

_ROOT = Path(__file__).resolve().parent.parent.parent
_SRC = _ROOT / "native" / "vp8_entropy.cpp"
_SRC2 = _ROOT / "native" / "vp8l.cpp"
_LIB_PATH = _ROOT / "native" / "libwebp_tpu_native.so"

_lib = None


_load_lock = threading.Lock()


def _build():
    # Build to a temp file + atomic rename so concurrent first-use from other
    # processes never loads a half-written .so.
    tmp = _LIB_PATH.with_suffix(f".tmp{os.getpid()}.so")
    subprocess.run(
        ["g++", "-O2", "-shared", "-fPIC", "-o", str(tmp), str(_SRC), str(_SRC2)],
        check=True,
        capture_output=True,
    )
    os.replace(tmp, _LIB_PATH)


def _load():
    global _lib
    if _lib is not None:
        return _lib
    with _load_lock:
        return _load_locked()


def _load_locked():
    global _lib
    if _lib is not None:
        return _lib
    newest_src = max(_SRC.stat().st_mtime, _SRC2.stat().st_mtime)
    if not _LIB_PATH.exists() or _LIB_PATH.stat().st_mtime < newest_src:
        _build()
    lib = ctypes.CDLL(str(_LIB_PATH))
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i16p = ctypes.POINTER(ctypes.c_int16)
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.vp8_parse_dims.restype = ctypes.c_int
    lib.vp8_parse_dims.argtypes = [u8p, ctypes.c_int, i32p, i32p]
    lib.vp8_entropy_decode.restype = ctypes.c_int
    lib.vp8_entropy_decode.argtypes = [
        u8p, ctypes.c_int, u8p, u8p, u8p, i16p, i16p,
        i32p, i32p, i32p, i32p, i32p, i32p, u8p, u8p, u8p, i32p,
    ]
    lib.vp8_entropy_decode16.restype = ctypes.c_int
    lib.vp8_entropy_decode16.argtypes = [
        u8p, ctypes.c_int, u8p, u8p, u8p, i16p, i16p,
        i32p, i32p, u8p, u8p, u8p, u8p, u8p, u8p, i16p,
    ]
    lib.vp8_token_encode.restype = ctypes.c_int
    lib.vp8_token_encode.argtypes = [i32p, i32p, ctypes.c_int, u8p, u8p, ctypes.c_int]
    lib.vp8_token_stats.restype = ctypes.c_int
    lib.vp8_token_stats.argtypes = [i32p, i32p, ctypes.c_int,
                                    ctypes.POINTER(ctypes.c_int64),
                                    ctypes.POINTER(ctypes.c_int64)]
    lib.vp8_mbheader_encode.restype = ctypes.c_int
    lib.vp8_mbheader_encode.argtypes = [
        u8p, ctypes.c_int, ctypes.c_uint32, ctypes.c_uint32, ctypes.c_int,
        i32p, i32p, i32p, i32p, u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, u8p, u8p, u8p, ctypes.c_int,
    ]
    lib.vp8l_get_dims.restype = ctypes.c_int
    lib.vp8l_get_dims.argtypes = [u8p, ctypes.c_int, i32p, i32p]
    lib.vp8l_decode.restype = ctypes.c_int
    lib.vp8l_decode.argtypes = [u8p, ctypes.c_int, ctypes.c_int32, ctypes.c_int32,
                                ctypes.c_int, u8p]
    lib.vp8l_decode_entropy.restype = ctypes.c_int
    lib.vp8l_decode_entropy.argtypes = [
        u8p, ctypes.c_int, ctypes.c_int32, ctypes.c_int32, ctypes.c_int,
        u8p, i32p, u8p, ctypes.c_int,
    ]
    lib.vp8l_lz77.restype = ctypes.c_int
    lib.vp8l_lz77.argtypes = [
        ctypes.POINTER(ctypes.c_uint32), ctypes.c_int, i32p, i32p,
        ctypes.c_int, ctypes.c_int,
    ]
    lib.vp8l_huffman_lengths.restype = ctypes.c_int
    lib.vp8l_huffman_lengths.argtypes = [
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int, ctypes.c_int, i32p,
        ctypes.c_int, ctypes.c_int, u8p,
    ]
    lib.vp8l_pick_predictors.restype = ctypes.c_int
    lib.vp8l_pick_predictors.argtypes = [
        u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, u8p, u8p, u8p,
    ]
    lib.vp8l_cache_hits.restype = ctypes.c_int
    lib.vp8l_cache_hits.argtypes = [
        ctypes.POINTER(ctypes.c_uint32), ctypes.c_int, ctypes.c_int, u8p, i32p,
    ]
    lib.rgb_to_yuv420.restype = ctypes.c_int
    lib.rgb_to_yuv420.argtypes = [
        u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, u8p, u8p, u8p,
    ]
    lib.yuv420_to_rgb_fancy.restype = ctypes.c_int
    lib.yuv420_to_rgb_fancy.argtypes = [
        u8p, ctypes.c_int, u8p, u8p, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, u8p,
    ]
    i8p = ctypes.POINTER(ctypes.c_int8)
    lib.wire_expand_levels.restype = ctypes.c_int
    lib.wire_expand_levels.argtypes = [
        u8p, u8p, u8p, i8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, i16p,
    ]
    _lib = lib
    return lib


def available() -> bool:
    try:
        _load()
        return True
    except Exception:
        return False


_warned: set = set()


def warn_once(name: str, exc: BaseException) -> None:
    """Log the first failure of a native fast path (then stay quiet).

    Callers that fall back to the Python implementation on a raised native
    call should report it once instead of swallowing it silently — a native
    path erroring on every call is a build/ABI problem worth surfacing
    (ADVICE r3)."""
    if name not in _warned:
        _warned.add(name)
        import logging

        logging.getLogger("webp_tpu.native").warning(
            "native %s raised %r; using python fallback", name, exc
        )


def _p(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


_DEFAULT_PROBS = np.ascontiguousarray(T.COEFF_PROBS_DEFAULT, dtype=np.uint8)
_UPDATE_PROBS = np.ascontiguousarray(T.COEFF_UPDATE_PROBS, dtype=np.uint8)
_BPRED_PROBS = np.ascontiguousarray(T.KEYFRAME_BPRED_MODE_PROBS, dtype=np.uint8)
_DC_Q = np.ascontiguousarray(T.DC_QUANT, dtype=np.int16)
_AC_Q = np.ascontiguousarray(T.AC_QUANT, dtype=np.int16)


class EntropyResult:
    __slots__ = (
        "width", "height", "mbw", "mbh", "filter_type", "filter_level",
        "sharpness", "lf_adjust", "ref_delta0", "mode_delta0",
        "segments_enabled", "segments_update_map", "seg_delta_values",
        "segments", "luma_mode", "chroma_mode", "segment_ids", "bpred",
        "skipped", "non_zero", "has_ac", "coeffs",
    )


def vp8_entropy_decode(data: bytes) -> EntropyResult:
    """Run the full VP8 keyframe entropy pass in C++."""
    lib = _load()
    buf = np.frombuffer(bytes(data), np.uint8)
    w = ctypes.c_int32()
    h = ctypes.c_int32()
    rc = lib.vp8_parse_dims(_p(buf, ctypes.c_uint8), len(buf), ctypes.byref(w), ctypes.byref(h))
    if rc != 0:
        raise ValueError(f"vp8_parse_dims failed: {rc}")
    mbw = (w.value + 15) // 16
    mbh = (h.value + 15) // 16
    nmb = mbw * mbh

    header = np.zeros(16, np.int32)
    seg = np.zeros(32, np.int32)
    luma_mode = np.zeros(nmb, np.int32)
    chroma_mode = np.zeros(nmb, np.int32)
    segment_ids = np.zeros(nmb, np.int32)
    bpred = np.zeros((nmb, 16), np.int32)
    skipped = np.zeros(nmb, np.uint8)
    non_zero = np.zeros(nmb, np.uint8)
    has_ac = np.zeros((nmb, 24), np.uint8)
    coeffs = np.zeros((nmb, 24, 16), np.int32)

    rc = lib.vp8_entropy_decode(
        _p(buf, ctypes.c_uint8), len(buf),
        _p(_DEFAULT_PROBS, ctypes.c_uint8), _p(_UPDATE_PROBS, ctypes.c_uint8),
        _p(_BPRED_PROBS, ctypes.c_uint8), _p(_DC_Q, ctypes.c_int16), _p(_AC_Q, ctypes.c_int16),
        _p(header, ctypes.c_int32), _p(seg, ctypes.c_int32),
        _p(luma_mode, ctypes.c_int32), _p(chroma_mode, ctypes.c_int32),
        _p(segment_ids, ctypes.c_int32), _p(bpred, ctypes.c_int32),
        _p(skipped, ctypes.c_uint8), _p(non_zero, ctypes.c_uint8),
        _p(has_ac, ctypes.c_uint8), _p(coeffs, ctypes.c_int32),
    )
    if rc != 0:
        raise ValueError(f"vp8_entropy_decode failed: {rc}")

    r = EntropyResult()
    r.width, r.height, r.mbw, r.mbh = header[0], header[1], header[2], header[3]
    r.filter_type = bool(header[4])
    r.filter_level = int(header[5])
    r.sharpness = int(header[6])
    r.lf_adjust = bool(header[7])
    r.ref_delta0 = int(header[8])
    r.mode_delta0 = int(header[9])
    r.segments_enabled = bool(header[10])
    r.segments_update_map = bool(header[11])
    r.seg_delta_values = [bool(header[12] & (1 << i)) for i in range(4)]
    r.segments = seg.reshape(4, 8)
    r.luma_mode = luma_mode
    r.chroma_mode = chroma_mode
    r.segment_ids = segment_ids
    r.bpred = bpred
    r.skipped = skipped.astype(bool)
    r.non_zero = non_zero.astype(bool)
    r.has_ac = has_ac.astype(bool)
    r.coeffs = coeffs
    return r


def vp8_entropy_decode16_into(data, header, seg, luma_mode, chroma_mode,
                              segment_ids, bpred, skipped, non_zero, levels):
    """Levels-mode entropy pass writing into caller-provided (zeroed) arrays.

    The fast batch path: `levels` is int16 raw quantizer levels
    [nmb, 25, 16] (block 24 = Y2, untransformed); mode arrays are uint8.
    All arrays must be C-contiguous views (e.g. rows of a batch buffer) and
    zero-initialized — only nonzero values are written. The device
    dequantizes and folds Y2 (see decode/device.py).
    """
    lib = _load()
    buf = np.frombuffer(bytes(data), np.uint8)
    rc = lib.vp8_entropy_decode16(
        _p(buf, ctypes.c_uint8), len(buf),
        _p(_DEFAULT_PROBS, ctypes.c_uint8), _p(_UPDATE_PROBS, ctypes.c_uint8),
        _p(_BPRED_PROBS, ctypes.c_uint8), _p(_DC_Q, ctypes.c_int16), _p(_AC_Q, ctypes.c_int16),
        _p(header, ctypes.c_int32), _p(seg, ctypes.c_int32),
        _p(luma_mode, ctypes.c_uint8), _p(chroma_mode, ctypes.c_uint8),
        _p(segment_ids, ctypes.c_uint8), _p(bpred, ctypes.c_uint8),
        _p(skipped, ctypes.c_uint8), _p(non_zero, ctypes.c_uint8),
        _p(levels, ctypes.c_int16),
    )
    if rc != 0:
        raise ValueError(f"vp8_entropy_decode16 failed: {rc}")


def vp8_token_encode(levels: np.ndarray, meta: np.ndarray, probs: np.ndarray) -> bytes:
    """Boolean-encode [N, 16] level blocks with [N, 4] (plane, first, ctx, _)."""
    lib = _load()
    levels = np.ascontiguousarray(levels, np.int32)
    meta = np.ascontiguousarray(meta, np.int32)
    probs = np.ascontiguousarray(probs, np.uint8)
    cap = max(levels.size * 8, 4096)
    out = np.zeros(cap, np.uint8)
    n = lib.vp8_token_encode(
        _p(levels, ctypes.c_int32), _p(meta, ctypes.c_int32), len(levels),
        _p(probs, ctypes.c_uint8), _p(out, ctypes.c_uint8), cap,
    )
    if n < 0:
        raise ValueError("vp8_token_encode overflow")
    return out[:n].tobytes()


def vp8l_decode_entropy(data: bytes, width: int, height: int,
                        implicit: bool = False):
    """Native VP8L entropy pass (transforms NOT applied).

    Returns (buf [h, tw, 4] uint8, transforms) where transforms is a list of
    (type, size_bits, table_size, data bytes) in stream order and tw is the
    transformed (possibly palette-packed) width.
    """
    lib = _load()
    src = np.frombuffer(bytes(data), np.uint8)
    # The entropy stream is written contiguously at the transformed width.
    out = np.zeros(height * width * 4, np.uint8)
    meta = np.zeros(1 + 4 * 4, np.int32)
    bw2 = (width + 3) // 4
    bh2 = (height + 3) // 4
    tdata = np.zeros(2 * bw2 * bh2 * 4 + 1024, np.uint8)
    tw = lib.vp8l_decode_entropy(
        _p(src, ctypes.c_uint8), len(src), width, height, 1 if implicit else 0,
        _p(out, ctypes.c_uint8), _p(meta, ctypes.c_int32),
        _p(tdata, ctypes.c_uint8), len(tdata),
    )
    if tw <= 0:
        raise ValueError(f"vp8l_decode_entropy failed: {tw}")
    transforms = []
    off = 0
    for i in range(int(meta[0])):
        ttype, size_bits, table_size, dlen = (int(v) for v in meta[1 + 4 * i : 5 + 4 * i])
        transforms.append((ttype, size_bits, table_size, tdata[off : off + dlen].copy()))
        off += dlen
    return out[: height * tw * 4].reshape(height, tw, 4), transforms


def vp8l_lz77(packed: np.ndarray, optimal: bool = True):
    """Greedy windowed LZ77 over packed ARGB pixels -> (lens, dists) int32.

    lens[i] == 1 is a literal; lens[i] >= 2 copies lens[i] pixels from
    dists[i] back. Token count <= n, so n-sized buffers always fit.
    """
    lib = _load()
    px = np.ascontiguousarray(packed, np.uint32)
    n = len(px)
    out_len = np.zeros(n, np.int32)
    out_dist = np.zeros(n, np.int32)
    nt = lib.vp8l_lz77(
        px.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), n,
        _p(out_len, ctypes.c_int32), _p(out_dist, ctypes.c_int32), n,
        1 if optimal else 0,
    )
    if nt < 0:
        raise ValueError("vp8l_lz77 overflow")
    return out_len[:nt].astype(np.int64), out_dist[:nt].astype(np.int64)


def vp8l_huffman_lengths(hist: np.ndarray, offs: np.ndarray, limit: int = 15):
    """Limited Huffman code lengths for [K, A] concatenated-alphabet
    histograms; segment s spans columns [offs[s], offs[s+1]). Identical
    output to encode.vp8l.build_code_lengths per segment."""
    lib = _load()
    hist = np.ascontiguousarray(hist, np.int64)
    if hist.ndim == 1:
        hist = hist[None]
    K, A = hist.shape
    offs = np.ascontiguousarray(offs, np.int32)
    out = np.zeros((K, A), np.uint8)
    rc = lib.vp8l_huffman_lengths(
        hist.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), K, A,
        _p(offs, ctypes.c_int32), len(offs) - 1, limit,
        _p(out, ctypes.c_uint8),
    )
    if rc != 0:
        raise ValueError("vp8l_huffman_lengths failed")
    return out


def vp8l_cache_hits(packed: np.ndarray, bits: int):
    """Exact color-cache hit mask + hash per pixel -> (hits bool, hash i64)."""
    lib = _load()
    px = np.ascontiguousarray(packed, np.uint32)
    n = len(px)
    hits = np.zeros(n, np.uint8)
    hsh = np.zeros(n, np.int32)
    rc = lib.vp8l_cache_hits(
        px.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), n, bits,
        _p(hits, ctypes.c_uint8), _p(hsh, ctypes.c_int32),
    )
    if rc != 0:
        raise ValueError("vp8l_cache_hits failed")
    return hits.astype(bool), hsh.astype(np.int64)


def vp8l_pick_predictors(u: np.ndarray, w: int, h: int, size_bits: int,
                         cost_lut: np.ndarray):
    """Best-of-14 predictor modes per tile + wrapped residual (uint8)."""
    lib = _load()
    u8 = np.ascontiguousarray(u, np.uint8)
    bw = (w + (1 << size_bits) - 1) >> size_bits
    bh = (h + (1 << size_bits) - 1) >> size_bits
    modes = np.zeros((bh, bw), np.uint8)
    res = np.zeros((h, w, 4), np.uint8)
    lut = np.ascontiguousarray(cost_lut, np.uint8)
    rc = lib.vp8l_pick_predictors(
        _p(u8, ctypes.c_uint8), w, h, size_bits, _p(lut, ctypes.c_uint8),
        _p(modes, ctypes.c_uint8), _p(res, ctypes.c_uint8),
    )
    if rc != 0:
        raise ValueError("vp8l_pick_predictors failed")
    return modes, res


def vp8l_decode(data: bytes, width: int, height: int, implicit: bool = False):
    """Native full VP8L decode to an [h, w, 4] uint8 RGBA array."""
    lib = _load()
    buf = np.frombuffer(bytes(data), np.uint8)
    out = np.zeros((height, width, 4), np.uint8)
    rc = lib.vp8l_decode(
        _p(buf, ctypes.c_uint8), len(buf), width, height, 1 if implicit else 0,
        _p(out, ctypes.c_uint8),
    )
    if rc != 0:
        raise ValueError(f"vp8l_decode failed: {rc}")
    return out


def vp8_mbheader_encode(enc_state, luma_mode, bpred, chroma_mode, segment_ids,
                        skipped, mbw, skip_prob, write_segments, seg_tree_probs):
    """Continue a Python BoolEncoder with all MB headers in C++ and flush.

    enc_state: the in-progress BoolEncoder (frame header already written).
    Returns the final header-partition bytes.
    """
    lib = _load()
    state_bytes = np.frombuffer(bytes(enc_state.out), np.uint8)
    nmb = len(luma_mode)
    cap = len(state_bytes) + nmb * 16 + 4096
    out = np.zeros(cap, np.uint8)
    luma_mode = np.ascontiguousarray(luma_mode, np.int32)
    bpred = np.ascontiguousarray(bpred, np.int32)
    chroma_mode = np.ascontiguousarray(chroma_mode, np.int32)
    segment_ids = np.ascontiguousarray(segment_ids, np.int32)
    skipped_u8 = np.ascontiguousarray(skipped, np.uint8)
    seg_probs = np.ascontiguousarray(seg_tree_probs, np.uint8)
    n = lib.vp8_mbheader_encode(
        _p(state_bytes, ctypes.c_uint8) if len(state_bytes) else
        np.zeros(1, np.uint8).ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        len(state_bytes),
        ctypes.c_uint32(enc_state.bottom), ctypes.c_uint32(enc_state.range),
        enc_state.bit_num,
        _p(luma_mode, ctypes.c_int32), _p(bpred, ctypes.c_int32),
        _p(chroma_mode, ctypes.c_int32), _p(segment_ids, ctypes.c_int32),
        _p(skipped_u8, ctypes.c_uint8), nmb, mbw, skip_prob,
        1 if write_segments else 0, _p(seg_probs, ctypes.c_uint8),
        _p(_BPRED_PROBS, ctypes.c_uint8), _p(out, ctypes.c_uint8), cap,
    )
    if n < 0:
        raise ValueError(f"vp8_mbheader_encode failed: {n}")
    return out[:n].tobytes()


def rgb_to_yuv420(rgb: np.ndarray):
    """Native BT.601 RGB->YUV420 with MB padding; bit-exact twin of
    ops/yuv.py:rgb_to_yuv420 (the numpy pass costs ~7 ms/img of scarce
    2-core host time at bench geometry; this runs in ~1 ms)."""
    lib = _load()
    rgb = np.ascontiguousarray(rgb, np.uint8)
    h, w = rgb.shape[:2]
    ch = rgb.shape[2]
    mbw, mbh = (w + 15) // 16, (h + 15) // 16
    y = np.empty((mbh * 16, mbw * 16), np.uint8)
    u = np.empty((mbh * 8, mbw * 8), np.uint8)
    v = np.empty((mbh * 8, mbw * 8), np.uint8)
    rc = lib.rgb_to_yuv420(
        _p(rgb, ctypes.c_uint8), h, w, ch,
        _p(y, ctypes.c_uint8), _p(u, ctypes.c_uint8), _p(v, ctypes.c_uint8),
    )
    if rc != 0:
        raise ValueError(f"rgb_to_yuv420 failed: {rc}")
    return y, u, v


def wire_expand_levels(bitmap: np.ndarray, vals4: np.ndarray,
                       med_idx: np.ndarray, med_val: np.ndarray,
                       nmb: int) -> np.ndarray:
    """Expand the per-MB int4 sparse wire (bitmap + nibble vals + med
    escapes) to dense int16 levels [nmb, 400] (~0.3 ms vs ~12 ms numpy)."""
    lib = _load()
    bitmap = np.ascontiguousarray(bitmap, np.uint8)
    vals4 = np.ascontiguousarray(vals4, np.uint8)
    med_idx = np.ascontiguousarray(med_idx, np.uint8)
    med_val = np.ascontiguousarray(med_val, np.int8)
    out = np.zeros((nmb, 400), np.int16)
    rc = lib.wire_expand_levels(
        _p(bitmap, ctypes.c_uint8), _p(vals4, ctypes.c_uint8),
        _p(med_idx, ctypes.c_uint8),
        med_val.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
        nmb, vals4.shape[1] * 2, med_val.shape[1], _p(out, ctypes.c_int16),
    )
    if rc != 0:
        raise ValueError(f"wire_expand_levels failed: {rc}")
    return out


def yuv420_to_rgb_fancy(ybuf: np.ndarray, ubuf: np.ndarray, vbuf: np.ndarray,
                        width: int, height: int) -> np.ndarray:
    """Native fancy YUV420 -> RGB [h, w, 3]; bit-exact twin of
    ops/yuv.py:fancy_yuv420_to_rgb (used by the host-delivery decode path:
    fetching YUV halves the uncompressed d2h tunnel bytes vs RGB)."""
    lib = _load()
    ybuf = np.ascontiguousarray(ybuf, np.uint8)
    ubuf = np.ascontiguousarray(ubuf, np.uint8)
    vbuf = np.ascontiguousarray(vbuf, np.uint8)
    rgb = np.empty((height, width, 3), np.uint8)
    rc = lib.yuv420_to_rgb_fancy(
        _p(ybuf, ctypes.c_uint8), ybuf.shape[1],
        _p(ubuf, ctypes.c_uint8), _p(vbuf, ctypes.c_uint8), ubuf.shape[1],
        width, height, _p(rgb, ctypes.c_uint8),
    )
    if rc != 0:
        raise ValueError(f"yuv420_to_rgb_fancy failed: {rc}")
    return rgb


def vp8_token_stats(levels, meta):
    """C++ token-statistics pass; returns (totals, ones) [4,8,3,11] int64."""
    lib = _load()
    levels = np.ascontiguousarray(levels, np.int32)
    meta = np.ascontiguousarray(meta, np.int32)
    totals = np.zeros((4, 8, 3, 11), np.int64)
    ones = np.zeros((4, 8, 3, 11), np.int64)
    i64p = ctypes.POINTER(ctypes.c_int64)
    lib.vp8_token_stats(
        _p(levels, ctypes.c_int32), _p(meta, ctypes.c_int32), len(levels),
        totals.ctypes.data_as(i64p), ones.ctypes.data_as(i64p),
    )
    return totals, ones
