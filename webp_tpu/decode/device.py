"""Device-side VP8 decode pipeline: host entropy -> JAX reconstruction,
loop filtering, and RGB conversion on the accelerator.

The host `Vp8Decoder` performs the serial entropy pass (boolean decode of
modes + coefficients); everything after that — batched IDCT, wavefront
prediction/reconstruction, wavefront loop filtering, fancy upsampling and the
YUV->RGB matrix — runs under jit. Bit-exact with the scalar path.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..decode.vp8 import Vp8Decoder, VP8Frame
from ..ops import jax_ops
from ..ops.jax_loopfilter import loop_filter_frame
from ..ops.wavefront import reconstruct_frame

# v2 lane-aligned wavefront backends. "scan" (the production default, see
# _decode_backend) runs the recon+filter wavefronts as lax.scan drivers.
# WEBP_TPU_DECODE_BACKEND overrides: scan|v1.
from ..ops.loopfilter2 import loop_filter_frames_v2
from ..ops.wavefront2 import decode_frames_fused_v2, reconstruct_frames_v2


def _decode_backend() -> str:
    env = os.environ.get("WEBP_TPU_DECODE_BACKEND")
    if env:
        # Validate once here so every decode entry point behaves the same
        # (ADVICE r4: the batch path raised on "pallas" while the single
        # path silently remapped it).
        if env not in ("scan", "v1"):
            raise ValueError(
                f"WEBP_TPU_DECODE_BACKEND={env!r} is not supported; use 'scan' or "
                "'v1'. (The Pallas wavefront backend was retired in round 4: "
                "Mosaic lane-layout limits, see NOTES.md.)"
            )
        return env
    # The fused lax.scan drivers are the production path.  (A Pallas
    # wavefront variant was retired in round 4: Mosaic rejects the 16-lane-
    # granular layout's lane-offset concatenates even after the blocking
    # reshapes were removed — NOTES.md.)
    return "scan"


@functools.partial(jax.jit, static_argnames=("mbw", "mbh", "simple", "width", "height", "backend"))
def _device_decode_batch_v2(
    coeffs, has_ac, luma_mode, bpred, chroma_mode, level, interior, hev_t, do_sub,
    mbw: int, mbh: int, simple: bool, width: int, height: int, backend: str,
):
    full = jax_ops.idct4x4(coeffs)
    dc = (coeffs[..., 0:1] + 4) >> 3
    residuals = jnp.where(has_ac[..., None], full, jnp.broadcast_to(dc, full.shape))
    if backend == "pallas":
        raise ValueError("the Pallas wavefront backend was retired in round 4"
                         " (Mosaic lane-layout limits; see NOTES.md)")
    else:
        y, u, v = decode_frames_fused_v2(
            residuals, luma_mode, bpred, chroma_mode,
            level, interior, hev_t, do_sub, mbw, mbh, simple
        )
    rgb = jax_ops.fancy_yuv420_to_rgb(y, u, v, width, height)
    return y, u, v, rgb


@functools.partial(jax.jit, static_argnames=("mbw", "mbh", "simple", "width", "height"))
def _device_decode(
    coeffs,
    has_ac,
    luma_mode,
    bpred,
    chroma_mode,
    level,
    interior,
    hev_t,
    do_sub,
    mbw: int,
    mbh: int,
    simple: bool,
    width: int,
    height: int,
):
    full = jax_ops.idct4x4(coeffs)
    dc = (coeffs[..., 0:1] + 4) >> 3
    residuals = jnp.where(has_ac[..., None], full, jnp.broadcast_to(dc, full.shape))
    y, u, v = reconstruct_frame(residuals, luma_mode, bpred, chroma_mode, mbw, mbh)
    y, u, v = loop_filter_frame(y, u, v, level, interior, hev_t, do_sub, mbw, mbh, simple)
    rgb = jax_ops.fancy_yuv420_to_rgb(y, u, v, width, height)
    return y, u, v, rgb


def decode_vp8_frame_device(data: bytes):
    """Decode a VP8 chunk with the device pipeline; returns (VP8Frame, rgb)."""
    dec = Vp8Decoder(bytes(data))
    dec.parse(allow_native=True)

    level, interior, hev = dec.filter_params_arrays()
    do_sub = (dec.luma_mode == 4) | (~dec.skipped & dec.non_zero_dct)

    backend = _decode_backend()
    args = (
        jnp.asarray(dec.coeffs),
        jnp.asarray(dec.has_ac),
        jnp.asarray(dec.luma_mode),
        jnp.asarray(dec.bpred),
        jnp.asarray(dec.chroma_mode),
        jnp.asarray(level),
        jnp.asarray(interior),
        jnp.asarray(hev),
        jnp.asarray(do_sub),
    )
    if backend == "v1":
        y, u, v, rgb = _device_decode(
            *args, dec.mbw, dec.mbh, bool(dec.filter_type), dec.width, dec.height
        )
    else:
        y, u, v, rgb = _device_decode_batch_v2(
            *[a[None] for a in args],
            dec.mbw, dec.mbh, bool(dec.filter_type), dec.width, dec.height,
            backend,
        )
        y, u, v, rgb = y[0], u[0], v[0], rgb[0]
    frame = VP8Frame(dec.width, dec.height, np.asarray(y), np.asarray(u), np.asarray(v))
    return frame, np.asarray(rgb)


@functools.partial(jax.jit, static_argnames=("mbw", "mbh", "simple", "width", "height"))
def _device_decode_batch(
    coeffs, has_ac, luma_mode, bpred, chroma_mode, level, interior, hev_t, do_sub,
    mbw: int, mbh: int, simple: bool, width: int, height: int,
):
    return jax.vmap(
        lambda c, a, lm, bp, cm, lv, it, hv, ds: _device_decode(
            c, a, lm, bp, cm, lv, it, hv, ds, mbw, mbh, simple, width, height
        )[3]
    )(coeffs, has_ac, luma_mode, bpred, chroma_mode, level, interior, hev_t, do_sub)


# Host->device upload accounting (bytes), reset/read by bench.py.
XFER = {"up": 0, "down": 0}


def decode_vp8_batch_device(payloads, device_out: bool = False):
    """Decode same-geometry VP8 chunks as one batched device call -> RGB [B,...].

    Fast path: the C++ levels-mode entropy pass writes int16 raw levels
    directly into preallocated packed batch buffers (no per-image np.stack
    copies), the parse pool narrows them to int8 + a per-image escape list
    (levels outside int8 range are rare; the upload tunnel is the scarce
    resource), and the device does the escape scatter, dequantization, the
    Y2 inverse WHT + DC fold, IDCT, wavefront reconstruction, loop filtering
    and color conversion in one jit call.

    device_out=True returns the device-resident jax array (the TPU-native
    consumption model: downstream stages read the pixels on-device).
    """
    rgb = dispatch_decode_batch(payloads)
    return rgb if device_out else np.asarray(rgb)


def dispatch_decode_batch(payloads, out: str = "rgb"):
    """Parse + upload + launch the batched decode; returns the device array.

    Split from `decode_vp8_batch_device` so callers can pipeline: the
    returned array is async — fetch it (np.asarray) only after dispatching
    the next batch's work.

    out="rgb" (default) returns [B, h, w, 3]; out="yuv" returns the packed
    uint8 planes [B, yh*yw + 2*ch*cw_] for the host-delivery path (half the
    uncompressed d2h bytes; convert with native.yuv420_to_rgb_fancy).
    """
    from ..io import native

    if not native.available():  # pragma: no cover - fallback host path
        rgbs = [decode_vp8_frame_device(p)[1] for p in payloads]
        return jnp.asarray(np.stack(rgbs))

    batch = parse_levels_batch(payloads)
    backend = _decode_backend()
    h0 = batch["headers"][0]
    geo = (int(h0[2]), int(h0[3]), bool(h0[4]), int(h0[0]), int(h0[1]))
    # Count only the arrays actually uploaded for the path taken (the dense
    # i16buf/i8buf stay host-side on the sparse fast path — counting them
    # overstated decode_up ~6x, VERDICT r4 / bench accounting).
    if batch["bitmap"] is not None:
        up_keys = ("bitmap", "vals", "esc_pos", "esc_val", "qtab", "u8buf")
    elif batch["i8buf"] is not None:  # pragma: no cover - sparse overflow
        up_keys = ("i8buf", "esc_pos", "esc_val", "qtab", "u8buf")
    else:  # pragma: no cover - escape overflow
        up_keys = ("i16buf", "u8buf")
    XFER["up"] += sum(
        int(batch[k].nbytes) for k in up_keys if batch[k] is not None
    )
    if batch["bitmap"] is not None:
        return _device_decode_sparse8(
            jnp.asarray(batch["bitmap"]),
            jnp.asarray(batch["vals"]),
            jnp.asarray(batch["esc_pos"]),
            jnp.asarray(batch["esc_val"]),
            jnp.asarray(batch["qtab"]),
            jnp.asarray(batch["u8buf"]),
            *geo,
            backend,
            out == "yuv",
        )
    if batch["i8buf"] is not None:  # pragma: no cover - sparse overflow
        return _device_decode_levels8(
            jnp.asarray(batch["i8buf"]),
            jnp.asarray(batch["esc_pos"]),
            jnp.asarray(batch["esc_val"]),
            jnp.asarray(batch["qtab"]),
            jnp.asarray(batch["u8buf"]),
            *geo,
            backend,
        )
    return _device_decode_levels(  # pragma: no cover - escape overflow
        jnp.asarray(batch["i16buf"]), jnp.asarray(batch["u8buf"]), *geo, backend
    )


def yuv_packed_to_rgb(packed_np: np.ndarray, mbw: int, mbh: int,
                      width: int, height: int) -> np.ndarray:
    """Host half of the out="yuv" delivery path: split the fetched packed
    planes [B, yh*yw + 2*ch*cw] and convert to RGB [B, h, w, 3] with the
    native bit-exact fancy upsampler (thread pool; ~1 ms/img/core)."""
    from ..io import native

    if packed_np.ndim == 4:  # pragma: no cover - rare dense-fallback output
        return packed_np  # the fallback dispatch paths produce RGB directly
    B = packed_np.shape[0]
    yh, yw = mbh * 16, mbw * 16
    ch_, cw_ = mbh * 8, mbw * 8
    ylen, clen = yh * yw, ch_ * cw_
    out = np.empty((B, height, width, 3), np.uint8)

    def one(i):
        row = packed_np[i]
        y = row[:ylen].reshape(yh, yw)
        u = row[ylen : ylen + clen].reshape(ch_, cw_)
        v = row[ylen + clen :].reshape(ch_, cw_)
        out[i] = native.yuv420_to_rgb_fancy(y, u, v, width, height)

    # NOT the parse pool: in a pipelined loop the next batch's 64 parse jobs
    # are already queued there, and FIFO ordering would serialize this
    # batch's conversion behind them.
    list(_convert_pool().map(one, range(B)))
    return out


_CONVERT_POOL = None


def _convert_pool():
    global _CONVERT_POOL
    if _CONVERT_POOL is None:
        from concurrent.futures import ThreadPoolExecutor

        _CONVERT_POOL = ThreadPoolExecutor(max_workers=max(2, os.cpu_count() or 2))
    return _CONVERT_POOL


_PARSE_POOL = None


def _parse_pool():
    global _PARSE_POOL
    if _PARSE_POOL is None:
        from concurrent.futures import ThreadPoolExecutor

        _PARSE_POOL = ThreadPoolExecutor(max_workers=max(2, os.cpu_count() or 2))
    return _PARSE_POOL


def filter_params_from_header(header, seg, segment_ids, luma_mode):
    """Per-MB (level, interior, hev) from levels-mode header arrays.

    Mirrors Vp8Decoder.filter_params_arrays (reference derivation:
    /root/reference/src/decoder/vp8.rs:1470-1523).
    """
    filter_level = int(header[5])
    sharpness = int(header[6])
    lf_adjust = bool(header[7])
    ref_delta0, mode_delta0 = int(header[8]), int(header[9])
    segments_enabled = bool(header[10])
    seg_lf = seg[:, 1].astype(np.int32)
    seg_delta = np.array([bool(header[12] & (1 << i)) for i in range(4)])
    sid = segment_ids.astype(np.int32)
    nmb = len(segment_ids)
    level = np.full(nmb, filter_level, np.int32)
    if segments_enabled:
        level = np.where(seg_delta[sid], filter_level + seg_lf[sid], seg_lf[sid])
    level = np.clip(level, 0, 63)
    if lf_adjust:
        level = level + ref_delta0 + np.where(luma_mode == 4, mode_delta0, 0)
    level = np.clip(level, 0, 63)
    interior = level.copy()
    if sharpness > 0:
        interior >>= 2 if sharpness > 4 else 1
        interior = np.minimum(interior, 9 - sharpness)
    interior = np.maximum(interior, 1)
    hev = np.where(level >= 40, 2, np.where(level >= 15, 1, 0)).astype(np.int32)
    if filter_level == 0:
        level = np.zeros(nmb, np.int32)
    return level, interior, hev


# Packed-buffer field layout (per image). The int16 buffer row holds the
# raw levels then the dequant table; the uint8 buffer row holds the per-MB
# mode/flag/filter-parameter fields. Offsets are in elements of the buffer
# dtype; every field is contiguous within its row so the C++ parser can
# write straight into the batch buffer views.
def _u8_fields(nmb):
    names = [
        ("luma_mode", 1), ("chroma_mode", 1), ("segment_ids", 1),
        ("skipped", 1), ("non_zero", 1), ("level", 1), ("interior", 1),
        ("hev", 1), ("bpred", 16),
    ]
    out, off = {}, 0
    for name, width in names:
        out[name] = (off, width)
        off += nmb * width
    return out, off


N_ESC_DEC = 4096  # per-image escape budget for the int8 upload format
# Per-MB nonzero cap for the decode upload wire format (mirrors the encode
# side's encode_wavefront2.CAP_MB rationale: measured max 234/400 nonzero
# slots per MB at Q75 m4 on the bench corpus; 256 covers it with margin, and
# the h2d direction is tunnel-compressed so the zero padding is nearly free).
CAP_MB_DEC = 256


def parse_levels_batch(payloads):
    """Run the C++ levels-mode entropy pass over a same-geometry batch.

    Writes into packed batch buffers (i16buf [B, nmb*400 + 1600]: levels
    then qtab; u8buf [B, nmb*24]: modes/flags/filter params) so the host
    never re-copies, then narrows the levels to int8 + a per-image escape
    list (the upload tunnel is the scarce resource; levels outside int8
    range are rare).  `i8buf` is None when any image overflows the escape
    budget — the caller uploads the int16 buffer instead.
    """
    from ..io import native

    B = len(payloads)
    w, h = native_parse_dims(payloads[0])
    mbw, mbh = (w + 15) // 16, (h + 15) // 16
    nmb = mbw * mbh

    from ..ops import sparse

    cap_mb = CAP_MB_DEC
    i16buf = np.zeros((B, nmb * 400 + 4 * 400), np.int16)
    i8buf = np.zeros((B, nmb * 400), np.int8)
    bitmap = np.zeros((B, nmb * 50), np.uint8)
    vals = np.zeros((B, nmb, cap_mb), np.int8)
    sparse_ok = np.zeros(B, bool)
    # Unused escape slots point one past the end -> dropped by the scatter.
    esc_pos = np.full((B, N_ESC_DEC), nmb * 400, np.int32)
    esc_val = np.zeros((B, N_ESC_DEC), np.int16)
    overflow = np.zeros(B, bool)
    fields, u8_row = _u8_fields(nmb)
    u8buf = np.zeros((B, u8_row), np.uint8)
    headers = np.zeros((B, 16), np.int32)
    segs = np.zeros((B, 4, 8), np.int32)

    def view8(b, name):
        off, width = fields[name]
        v = u8buf[b, off : off + nmb * width]
        return v if width == 1 else v.reshape(nmb, width)

    def one(b):
        levels = i16buf[b, : nmb * 400]
        native.vp8_entropy_decode16_into(
            payloads[b], headers[b], segs[b].reshape(-1),
            view8(b, "luma_mode"), view8(b, "chroma_mode"),
            view8(b, "segment_ids"), view8(b, "bpred").reshape(-1),
            view8(b, "skipped"), view8(b, "non_zero"), levels,
        )
        if headers[b][2] != mbw or headers[b][3] != mbh:
            raise ValueError("mixed geometries in decode batch")
        # Per-(segment, block, position) dequant factors: blocks 0-15 luma
        # (ydc/yac), 16-23 chroma (uvdc/uvac), 24 Y2 (y2dc/y2ac).
        qtab = i16buf[b, nmb * 400 :].reshape(4, 25, 16)
        for s in range(4):
            ydc, yac, y2dc, y2ac, uvdc, uvac = segs[b, s, 2:8]
            qtab[s, :16, 0] = ydc
            qtab[s, :16, 1:] = yac
            qtab[s, 16:24, 0] = uvdc
            qtab[s, 16:24, 1:] = uvac
            qtab[s, 24, 0] = y2dc
            qtab[s, 24, 1:] = y2ac
        lv, it, hv = filter_params_from_header(
            headers[b], segs[b], view8(b, "segment_ids"), view8(b, "luma_mode")
        )
        view8(b, "level")[:] = lv
        view8(b, "interior")[:] = it
        view8(b, "hev")[:] = hv
        i8buf[b] = np.clip(levels, -128, 127).astype(np.int8)
        bm, vl, ok = sparse.host_pack_levels_mb(i8buf[b], nmb, 400, cap_mb)
        if ok:
            bitmap[b] = bm
            vals[b] = vl
            sparse_ok[b] = True
        big = np.flatnonzero(np.abs(levels) > 127)
        if len(big) > N_ESC_DEC:
            overflow[b] = True
        else:
            esc_pos[b, : len(big)] = big
            esc_val[b, : len(big)] = levels[big]

    list(_parse_pool().map(one, range(B)))
    qtab_all = i16buf[:, nmb * 400 :].copy()
    any_over = bool(overflow.any())
    all_sparse = bool(sparse_ok.all()) and not any_over
    return dict(
        i16buf=i16buf,
        i8buf=None if any_over else i8buf,
        bitmap=bitmap if all_sparse else None,
        vals=vals if all_sparse else None,
        esc_pos=esc_pos,
        esc_val=esc_val,
        qtab=qtab_all,
        u8buf=u8buf,
        headers=headers,
        segs=segs,
    )


def native_parse_dims(payload):
    from ..io import native
    import ctypes

    lib = native._load()
    buf = np.frombuffer(bytes(payload), np.uint8)
    w = ctypes.c_int32()
    h = ctypes.c_int32()
    rc = lib.vp8_parse_dims(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(buf),
        ctypes.byref(w), ctypes.byref(h),
    )
    if rc != 0:
        raise ValueError(f"vp8_parse_dims failed: {rc}")
    return w.value, h.value


@functools.partial(jax.jit, static_argnames=("mbw", "mbh", "simple", "width", "height", "backend"))
def _device_decode_levels(
    i16buf, u8buf,
    mbw: int, mbh: int, simple: bool, width: int, height: int, backend: str,
):
    """Packed int16 buffers -> RGB (escape-overflow fallback path)."""
    B = i16buf.shape[0]
    nmb = mbw * mbh
    levels = i16buf[:, : nmb * 400].reshape(B, nmb, 25, 16)
    qtab = i16buf[:, nmb * 400 :]
    return _decode_core(levels, qtab, u8buf, mbw, mbh, simple, width, height, backend)


@functools.partial(jax.jit, static_argnames=("mbw", "mbh", "simple", "width", "height", "backend", "out_yuv"))
def _device_decode_sparse8(
    bitmap, vals, esc_pos, esc_val, qtab, u8buf,
    mbw: int, mbh: int, simple: bool, width: int, height: int, backend: str,
    out_yuv: bool = False,
):
    """Sparse bitmap+vals levels + escape list -> RGB (the upload fast path).

    The bitmap/vals pair carries the int8-clipped levels (ops/sparse.py
    per-MB wire format, expanded with the one-hot MXU matmul — the old
    image-flat gather expand cost 478 ms/batch, ~80% of the decode
    dispatch); the escape list then restores values outside int8 range,
    exactly as in the dense int8 path.
    """
    from ..ops.sparse import device_expand_levels_mb

    B = bitmap.shape[0]
    nmb = mbw * mbh
    lv = (
        device_expand_levels_mb(bitmap, vals, nmb, 400)
        .reshape(B, nmb * 400)
        .astype(jnp.int16)
    )
    lv = lv.at[jnp.arange(B)[:, None], esc_pos].set(esc_val, mode="drop")
    levels = lv.reshape(B, nmb, 25, 16)
    return _decode_core(
        levels, qtab, u8buf, mbw, mbh, simple, width, height, backend, out_yuv
    )


@functools.partial(jax.jit, static_argnames=("mbw", "mbh", "simple", "width", "height", "backend"))
def _device_decode_levels8(
    i8buf, esc_pos, esc_val, qtab, u8buf,
    mbw: int, mbh: int, simple: bool, width: int, height: int, backend: str,
):
    """Packed int8 levels + escape list -> RGB (the upload fast path)."""
    B = i8buf.shape[0]
    nmb = mbw * mbh
    lv = i8buf.astype(jnp.int16)
    lv = lv.at[jnp.arange(B)[:, None], esc_pos].set(esc_val, mode="drop")
    levels = lv.reshape(B, nmb, 25, 16)
    return _decode_core(levels, qtab, u8buf, mbw, mbh, simple, width, height, backend)


def _decode_core(
    levels, qtab_i16, u8buf,
    mbw: int, mbh: int, simple: bool, width: int, height: int, backend: str,
    out_yuv: bool = False,
):
    """Levels + quant tables -> RGB: dequant, Y2 IWHT+fold, IDCT, recon, filter.

    The DC-only IDCT identity (full IDCT of an AC-free block == the
    (dc+4)>>3 shortcut) lets this path run the full IDCT unconditionally,
    so has_ac never needs to leave the device.
    """
    B = levels.shape[0]
    nmb = mbw * mbh
    qtab = qtab_i16.reshape(B, 4, 25, 16).astype(jnp.int32)
    fields, _ = _u8_fields(nmb)

    def f8(name):
        off, width_ = fields[name]
        v = u8buf[:, off : off + nmb * width_]
        return v if width_ == 1 else v.reshape(B, nmb, width_)

    luma_mode = f8("luma_mode")
    chroma_mode = f8("chroma_mode")
    segment_ids = f8("segment_ids")
    skipped = f8("skipped")
    non_zero = f8("non_zero")
    level = f8("level").astype(jnp.int32)
    interior = f8("interior").astype(jnp.int32)
    hev_t = f8("hev").astype(jnp.int32)
    bpred = f8("bpred")

    lv32 = levels.astype(jnp.int32)                       # [B, nmb, 25, 16]
    sid = segment_ids.astype(jnp.int32)
    q = jnp.zeros((B, nmb, 25, 16), jnp.int32)
    for s in range(4):
        q = q + jnp.where((sid == s)[..., None, None], qtab[:, s][:, None], 0)
    deq = lv32 * q
    y2 = jax_ops.iwht4x4(deq[:, :, 24, :])                # [B, nmb, 16]
    lm = luma_mode.astype(jnp.int32)
    dcs = jnp.where((lm != 4)[..., None], y2, deq[:, :, :16, 0])
    coeffs = deq[:, :, :24, :].at[:, :, :16, 0].set(dcs)
    residuals = jax_ops.idct4x4(coeffs)

    do_sub = (lm == 4) | (~skipped.astype(bool) & non_zero.astype(bool))
    bp = bpred.astype(jnp.int32)
    cm = chroma_mode.astype(jnp.int32)

    y, u, v = decode_frames_fused_v2(
        residuals, lm, bp, cm, level, interior, hev_t, do_sub,
        mbw, mbh, simple
    )
    if out_yuv:
        # Packed planes for the host-delivery path: half the bytes of RGB
        # over the uncompressed d2h tunnel; host converts with the native
        # bit-exact fancy upsampler.
        return jnp.concatenate(
            [y.reshape(B, -1), u.reshape(B, -1), v.reshape(B, -1)], axis=-1
        )
    return jax_ops.fancy_yuv420_to_rgb(y, u, v, width, height)


def decode_vp8_batch_device_mixed(payloads, device_out: bool = False):
    """Batched decode for payloads of MIXED geometries: groups by (w, h)
    and dispatches one batched device call per geometry bucket (each bucket
    compiles once and is cached), returning results in input order.

    Addresses the mixed-size production case (one compiled kernel per
    geometry bucket rather than per image)."""
    dims = [native_parse_dims(p) for p in payloads]
    groups = {}
    for i, d in enumerate(dims):
        groups.setdefault(d, []).append(i)
    out = [None] * len(payloads)
    for d, idxs in groups.items():
        handles = dispatch_decode_batch([payloads[i] for i in idxs])
        arr = handles if device_out else np.asarray(handles)
        for j, i in enumerate(idxs):
            out[i] = arr[j]
    return out
