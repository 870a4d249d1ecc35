"""VP8 (lossy WebP) keyframe encoder.

Pipeline (parity reference `/root/reference/src/encoder/vp8.rs:1281-1488`):
RGB->YUV420, quality->quantizer curve, per-macroblock full-RD mode decision
(I16 / I4 / UV) with reconstruction-in-the-loop, token statistics -> adaptive
probabilities, then boolean-coded headers + residual partitions.

Mode decision evaluates candidates as batched numpy DCT/quant/cost tensors
(the device-kernel shape); the raster walk carries reconstructed borders and
nnz contexts exactly as the decoder expects them.
"""

from __future__ import annotations

import functools
import os

import numpy as np

from ..common import vp8_tables as T
from ..errors import InvalidDimensions
from ..ops import predict as pr
from ..ops import transform as tx
from ..ops import yuv as yuvops
from . import costs as C
from . import tables as ET
from .boolenc import BoolEncoder, tree_paths
from .quant import (SegmentParams, quality_to_quant_index, compute_filter_level,
                    RD_DISTO_MULT, rd_score)

ZZ = T.ZIGZAG  # zigzag position -> raster index

# Content-adaptive chroma-AC quantization from uv_alpha (libwebp dq_uv_ac);
# see setup_segments.  Default ON since round 4: the derived delta matches
# libwebp's emitted uvac_delta exactly on all 5 gallery1 images (round-2's
# "measured worse" verdict was under the inverted SNS formula), and the
# missing delta was half of the replay-isolated chroma gap (NOTES r4).
# Overridable for A/B via env.
ADAPTIVE_UV_AC = os.environ.get("WEBP_TPU_ADAPTIVE_UV_AC", "1") == "1"
# Trellis at method>=4 (reference gate); WEBP_TPU_NO_TRELLIS=1 disables for
# A/B against libwebp's m4 (= RD_OPT_BASIC, no trellis).
TRELLIS_ENABLED = os.environ.get("WEBP_TPU_NO_TRELLIS", "0") != "1"
DC, V, H, TM, B = range(5)

# Precomputed tree paths for the writers.
_YMODE_PATHS = tree_paths(T.KEYFRAME_YMODE_TREE)[0]
_UV_PATHS = tree_paths(T.KEYFRAME_UV_MODE_TREE)[0]
_BPRED_PATHS = tree_paths(T.KEYFRAME_BPRED_MODE_TREE)[0]
_SEG_PATHS = tree_paths(T.SEGMENT_ID_TREE)[0]
# DCT token tree: leaves are EOB,0,1,2,3,4,cat1..cat6 encoded as token ids.
_DCT_TOKEN_TREE = (-0, 2, -1, 4, -2, 6, 8, 12, -3, 10, -4, -5, 14, 16, -6, -7, 18, 20, -8, -9, -10, -11)
_TOKEN_PATHS = tree_paths(_DCT_TOKEN_TREE)
TOK_EOB, TOK_0, TOK_1, TOK_2, TOK_3, TOK_4 = range(6)
TOK_CAT1 = 6


def _token_for(value: int) -> int:
    if value <= 4:
        return TOK_0 + value
    if value <= 6:
        return TOK_CAT1
    if value <= 10:
        return TOK_CAT1 + 1
    if value <= 18:
        return TOK_CAT1 + 2
    if value <= 34:
        return TOK_CAT1 + 3
    if value <= 66:
        return TOK_CAT1 + 4
    return TOK_CAT1 + 5


class MBInfo:
    __slots__ = ("luma_mode", "bpred", "chroma_mode", "segment_id", "skipped",
                 "y2_levels", "y_levels", "uv_levels", "has_y2")

    def __init__(self):
        self.luma_mode = DC
        self.bpred = None  # [16] modes when luma_mode == B
        self.chroma_mode = DC
        self.segment_id = 0
        self.skipped = False
        self.y2_levels = None   # [16] zigzag levels
        self.y_levels = None    # [16, 16]
        self.uv_levels = None   # [8, 16] (4 U then 4 V)
        self.has_y2 = True


class Vp8Encoder:
    def __init__(self, quality: int = 75, method: int = 4, backend: str = "python",
                 two_pass: bool = True, num_partitions: int = 1):
        assert num_partitions in (1, 2, 4, 8)
        self.quality = quality
        self.method = min(method, 6)
        self.backend = backend  # "python" | "device"
        self.two_pass = two_pass
        self.num_partitions = num_partitions
        # Batch-pipeline injection points: pre-encoded coefficient
        # partitions (device token coding) and the matching skip flags.
        self.partitions_override = None
        self.skip_override = None

    # ------------------------------------------------------------- helpers

    def _zz_quantize(self, mtx, blocks, first=0):
        """Raster-order coeff blocks [..., 16] -> zigzag levels [..., 16]."""
        zz = blocks[..., ZZ]
        q = np.empty(16, np.int64)
        q[:] = mtx.iq[1]
        q[0] = mtx.iq[0]
        bias = np.empty(16, np.int64)
        bias[:] = mtx.bias[1]
        bias[0] = mtx.bias[0]
        c = zz.astype(np.int64)
        level = np.minimum((np.abs(c) * q + bias) >> 17, 2047)
        levels = np.where(c < 0, -level, level).astype(np.int32)
        if first:
            levels[..., :first] = 0
        return levels

    def _zz_dequantize(self, mtx, levels):
        """Zigzag levels [..., 16] -> raster-order coefficients."""
        q = np.empty(16, np.int64)
        q[:] = mtx.q[1]
        q[0] = mtx.q[0]
        dq = levels.astype(np.int64) * q
        out = np.zeros_like(dq)
        out[..., ZZ] = dq
        return out.astype(np.int32)

    # -------------------------------------------------------------- encode

    def encode(self, rgb: np.ndarray) -> bytes:
        h, w = rgb.shape[:2]
        if not (0 < w <= 16383 and 0 < h <= 16383):
            raise InvalidDimensions(f"{w}x{h}")
        ybuf, ubuf, vbuf = yuvops.rgb_to_yuv420(rgb)
        return self.encode_yuv(ybuf, ubuf, vbuf, w, h)

    def encode_yuv(self, ybuf, ubuf, vbuf, width, height) -> bytes:
        self.mbw = (width + 15) // 16
        self.mbh = (height + 15) // 16
        self.width, self.height = width, height
        self.ybuf, self.ubuf, self.vbuf = ybuf, ubuf, vbuf

        qi = quality_to_quant_index(self.quality)
        self.quant_index = qi
        self.seg = SegmentParams(qi)
        self.filter_level = compute_filter_level(qi)
        self.sharpness = 0
        self._setup_segments(qi)
        self.probs = T.COEFF_PROBS_DEFAULT.copy()
        self.level_costs = C.cached_level_costs(self.probs)
        self.stats = C.ProbaStats()

        from .contexts import compute_contexts

        def derive(arrays):
            if self.skip_override is not None:
                # Device token coding: skip flags computed on the device and
                # the partition bitstreams arrive pre-encoded, so the level
                # arrays (and their contexts) never cross to the host.
                arrays["skipped"] = self.skip_override
                return None
            skipped = (
                (arrays["y_levels"] == 0).all(axis=(1, 2))
                & (arrays["uv_levels"] == 0).all(axis=(1, 2))
                & (arrays["y2_levels"] == 0).all(axis=1)
            )
            ctx = compute_contexts(
                arrays["luma_mode"], arrays["y2_levels"], arrays["y_levels"],
                arrays["uv_levels"], skipped, self.mbw, self.mbh,
            )
            arrays["skipped"] = skipped
            return ctx

        if getattr(self, "probs_override", None) is not None:
            # Batched two-pass flow: pass-1 statistics were computed on the
            # device (ops.token_stats) and the adapted probabilities arrive
            # pre-baked; _analysis_arrays returns the pass-2 decisions.
            new_probs = self.probs_override
            self.level_costs = C.cached_level_costs(new_probs)
            arrays = self._analysis_arrays()
            ctx = derive(arrays)
        else:
            # Pass 1 (no trellis): mode decision with default-probability
            # costs, collecting token statistics for probability adaptation
            # (reference two-pass flow, encoder vp8.rs:1317-1410).
            saved_method = self.method
            if self.two_pass:
                self.method = min(self.method, 3)  # trellis off in the stats pass
            arrays = self._analysis_arrays()
            self.method = saved_method
            ctx = derive(arrays)
            self._record_stats_arrays(arrays, ctx)
            new_probs = self.stats.updated_probs(self.probs)

            # Pass 2: re-decide with cost tables from the adapted
            # probabilities (and trellis for method >= 4); tokens are then
            # coded with the same adapted probabilities written in the header.
            if self.two_pass:
                self.level_costs = C.cached_level_costs(new_probs)
                arrays = self._analysis_arrays()
                ctx = derive(arrays)

        skipped = arrays["skipped"]
        total = len(skipped)
        non_skip = int(total - skipped.sum())
        prob = (255 * non_skip + total // 2) // total if total else 255
        self.skip_prob = min(max(prob, 1), 254)

        return self._write_bitstream_arrays(arrays, ctx, new_probs)

    def _analysis_arrays(self):
        """Run mode decision; returns per-MB arrays (device or python)."""
        if self.backend == "device":
            from ..ops.encode_wavefront import EncParams, EncParamsSegs, EncTables
            from ..ops.encode_wavefront2 import encode_analysis_batch_v2
            import jax.numpy as jnp

            n_try = 0 if self.method <= 1 else (
                3 if self.method <= 3 else (4 if self.method == 4 else 10)
            )
            if self.segments_enabled:
                P = EncParamsSegs.from_segments([self.segments_list])
                sid = jnp.asarray(self.segment_map.astype(np.int32))[None]
            else:
                P = EncParams(self.seg)
                sid = None
            out = encode_analysis_batch_v2(
                jnp.asarray(self.ybuf)[None], jnp.asarray(self.ubuf)[None],
                jnp.asarray(self.vbuf)[None],
                P, EncTables.from_level_costs(self.level_costs),
                self.mbw, self.mbh, n_try,
                self.method >= 4 and TRELLIS_ENABLED, sid,
            )
            arrays = {k: np.asarray(v[0]).astype(np.int32) for k, v in out.items()}
            # Device path leaves y2 zeroed for B MBs already.
            return arrays

        mbs = self._analysis_pass()
        nmb = len(mbs)
        arrays = dict(
            luma_mode=np.array(
                [4 if m.luma_mode == B else m.luma_mode for m in mbs], np.int32
            ),
            chroma_mode=np.array([m.chroma_mode for m in mbs], np.int32),
            bpred=np.stack(
                [m.bpred if m.bpred is not None else np.zeros(16, np.int32) for m in mbs]
            ).astype(np.int32),
            y2_levels=np.stack(
                [
                    m.y2_levels if m.y2_levels is not None else np.zeros(16, np.int32)
                    for m in mbs
                ]
            ),
            y_levels=np.stack([m.y_levels for m in mbs]),
            uv_levels=np.stack([m.uv_levels for m in mbs]),
        )
        return arrays

    def _record_stats_arrays(self, arrays, ctx):
        """Batched token statistics over all non-skipped blocks."""
        try:
            from ..io import native

            if native.available():
                levels, meta = self._token_stream(arrays, ctx)
                totals, ones = native.vp8_token_stats(levels, meta)
                self.stats.total += totals
                self.stats.ones += ones
                return
        except Exception:
            pass
        act = ~arrays["skipped"]
        has_y2 = ctx["has_y2"]
        y2_sel = act & has_y2
        if y2_sel.any():
            self.stats.record_blocks(
                arrays["y2_levels"][y2_sel], 1, 0, ctx["y2_ctx"][y2_sel]
            )
        for plane, first, sel in ((0, 1, act & has_y2), (3, 0, act & ~has_y2)):
            if sel.any():
                lv = arrays["y_levels"][sel].reshape(-1, 16)
                cc = ctx["y_ctx"][sel].reshape(-1)
                self.stats.record_blocks(lv, plane, first, cc)
        if act.any():
            lv = arrays["uv_levels"][act].reshape(-1, 16)
            cc = ctx["uv_ctx"][act].reshape(-1)
            self.stats.record_blocks(lv, 2, 0, cc)

    # ----------------------------------------------------- token stream

    def _token_stream(self, arrays, ctx):
        """Assemble (levels [N,16], meta [N,4]) in bitstream block order."""
        return token_stream(arrays, ctx, self.mbw, self.mbh)

    # -------------------------------------------------- mode decision pass

    # Zigzag-block diagonals for exact-context batched trellis inside an MB.
    _I16_DIAGS = [
        [(x, y) for x in range(4) for y in range(4) if x + y == t] for t in range(7)
    ]

    def _trellis_i16(self, dct_blocks, y2_r, pred, top_cy_mb, left_cy):
        """Trellis-requantize the 16 Y blocks of an I16 MB with exact contexts
        (blocks on a (x+y) diagonal are context-independent -> 7 batched DP
        calls), then reconstruct. Returns (levels [16,16], rec, nnz [4,4])."""
        from .trellis import trellis_quantize

        seg = self.seg
        nnz = np.zeros((4, 4), np.int64)  # [y][x]
        levels = np.zeros((16, 16), np.int32)
        for diag in self._I16_DIAGS:
            idxs = [y * 4 + x for (x, y) in diag]
            ctxs = np.array(
                [
                    (top_cy_mb[x] if y == 0 else nnz[y - 1, x])
                    + (left_cy[y] if x == 0 else nnz[y, x - 1])
                    for (x, y) in diag
                ],
                np.int64,
            )
            lv, has = trellis_quantize(
                dct_blocks[idxs], seg.y1, seg.lambda_trellis_i16, 1,
                self.level_costs, 0, ctxs,
            )
            levels[idxs] = lv
            for k, (x, y) in enumerate(diag):
                nnz[y, x] = 1 if has[k] else 0
        blk = self._zz_dequantize(seg.y1, levels)
        blk[:, 0] = y2_r
        res = tx.idct4x4(blk)
        rec = np.clip(
            pred.astype(np.int32)
            + res.reshape(4, 4, 4, 4).transpose(0, 2, 1, 3).reshape(16, 16),
            0,
            255,
        ).astype(np.uint8)
        return levels, rec, nnz

    def _trellis_i4(self, ws, src, modes, top_cy_mb, left_cy):
        """Re-run the I4 subblock chain with trellis quantization (modes are
        fixed from the RD pick; prediction re-derives from the trellis recon,
        matching the reference's transform_luma_blocks_4x4 + trellis path)."""
        from .trellis import trellis_quantize

        seg = self.seg
        nnz = np.zeros((4, 4), np.int64)
        levels = np.zeros((16, 16), np.int32)
        for sby in range(4):
            for sbx in range(4):
                bi = sby * 4 + sbx
                x0, y0 = sbx * 4 + 1, sby * 4 + 1
                pr.predict_b(ws, int(modes[bi]), x0, y0)
                pred4 = ws[y0 : y0 + 4, x0 : x0 + 4].astype(np.int32)
                sb_src = src[sby * 4 : sby * 4 + 4, sbx * 4 : sbx * 4 + 4].astype(np.int32)
                dct = tx.dct4x4((sb_src - pred4).reshape(1, 16))
                ctx = (top_cy_mb[sbx] if sby == 0 else nnz[sby - 1, sbx]) + (
                    left_cy[sby] if sbx == 0 else nnz[sby, sbx - 1]
                )
                lv, has = trellis_quantize(
                    dct, seg.y1, seg.lambda_trellis_i4, 0, self.level_costs, 3, [ctx]
                )
                levels[bi] = lv[0]
                nnz[sby, sbx] = 1 if has[0] else 0
                res = tx.idct4x4(self._zz_dequantize(seg.y1, lv))[0]
                ws[y0 : y0 + 4, x0 : x0 + 4] = np.clip(
                    pred4 + res.reshape(4, 4), 0, 255
                ).astype(np.uint8)
        return levels, ws[1:17, 1:17].copy(), nnz

    def _setup_segments(self, base_qi):
        """DCT-histogram analysis -> k-means segments (>=256 MBs; reference
        setup_encoding vp8.rs:2480-2492)."""
        r = setup_segments(self.ybuf, self.ubuf, self.vbuf, self.mbw,
                           self.mbh, base_qi, self.seg)
        (self.segments_enabled, self.segments_update_map, self.segment_map,
         self.segments_list, self.seg_tree_probs) = r

    def _setup_segments_off(self):
        nmb = self.mbw * self.mbh
        self.segments_enabled = False
        self.segments_update_map = False
        self.segment_map = np.zeros(nmb, np.int32)
        self.segments_list = [self.seg] * 4
        self.seg_tree_probs = [255, 255, 255]

    def _chroma_error_diffusion(self, dcts, preds, levels, mbx, top_derr, left_derr):
        """Floyd-Steinberg-like DC error diffusion across 2x2 chroma blocks
        (C1=7 top, C2=8 left, DSHIFT=4, DSCALE=1), then requantize DC and
        reconstruct. Mutates the diffusion state arrays."""
        seg = self.seg
        q = int(seg.uv.q[0])
        iq = int(seg.uv.iq[0])
        bias = int(seg.uv.bias[0])
        out_levels = levels.copy()
        recs = []
        for ci in range(2):
            dct = dcts[ci].copy()
            te = top_derr[mbx, ci]
            le = left_derr[ci]

            def diffuse(bi, t_err, l_err):
                dc = int(dct[bi, 0]) + ((7 * int(t_err) + 8 * int(l_err)) >> 3)
                a = abs(dc)
                level = (a * iq + bias) >> 17
                # libwebp's QuantizeSingle REPLACES the coefficient with its
                # predicted reconstruction level*q (sign restored) — the
                # later real quantization then re-quantizes that multiple,
                # which can land one level below the adjusted value's own
                # quantization (iq is floor(2^17/q), so q*iq < 2^17).
                # Keeping the adjusted value instead produced sparse +-1
                # chroma DC diffs vs libwebp under identical decisions
                # (r5 diff_levels).
                qv = level * q
                dct[bi, 0] = -qv if dc < 0 else qv
                err = a - qv
                err = -err if dc < 0 else err
                return max(-127, min(127, err >> 1))

            e0 = diffuse(0, te[0], le[0])
            e1 = diffuse(1, te[1], e0)
            e2 = diffuse(2, e0, le[1])
            e3 = diffuse(3, e1, e2)
            le[0] = e1
            le[1] = (3 * e3) >> 2
            te[0] = e2
            te[1] = e3 - le[1]

            lv = self._zz_quantize(seg.uv, dct)
            out_levels[ci * 4 : ci * 4 + 4] = lv
            dq = self._zz_dequantize(seg.uv, lv)
            res = tx.idct4x4(dq)
            rec = np.clip(
                preds[ci] + res.reshape(2, 2, 4, 4).transpose(0, 2, 1, 3).reshape(8, 8),
                0,
                255,
            ).astype(np.uint8)
            recs.append(rec)
        return out_levels, recs

    def _analysis_pass(self):
        mbw, mbh = self.mbw, self.mbh
        seg = self.seg
        mbs = []

        top_y = np.full(mbw * 16 + 16, 127, np.uint8)
        top_u = np.full(mbw * 8, 127, np.uint8)
        top_v = np.full(mbw * 8, 127, np.uint8)
        top_bpred = np.full((mbw, 4), pr.B_DC, np.int32)
        # Per-block-column Y nnz state for trellis contexts.
        top_cy = np.zeros((mbw, 4), np.int64)
        # Chroma DC error-diffusion state [mbx][channel][2].
        top_derr = np.zeros((mbw, 2, 2), np.int64)

        do_trellis = self.method >= 4 and TRELLIS_ENABLED
        wy = ET.VP8_WEIGHT_Y
        i4_try = 0 if self.method <= 1 else (3 if self.method <= 3 else (4 if self.method == 4 else 10))

        # Diagnostic hook: force per-MB decisions (luma_mode [nmb],
        # bpred [nmb, 16], chroma_mode [nmb]) to isolate mode-decision
        # quality from coefficient-coding quality (e.g. replay libwebp's
        # parsed modes through our quant/trellis pipeline).
        override = getattr(self, "mode_override", None)

        for mby in range(mbh):
            left_y = np.full(17, 129, np.uint8)
            left_u = np.full(9, 129, np.uint8)
            left_v = np.full(9, 129, np.uint8)
            left_bpred = np.full(4, pr.B_DC, np.int32)
            left_cy = np.zeros(4, np.int64)
            left_derr = np.zeros((2, 2), np.int64)
            for mbx in range(mbw):
                mb = MBInfo()
                f_lm = f_bp = f_cm = None
                if override is not None:
                    i_mb = mby * mbw + mbx
                    f_lm = int(override[0][i_mb])
                    f_bp = np.asarray(override[1][i_mb], np.int32)
                    f_cm = int(override[2][i_mb])
                if self.segments_enabled:
                    mb.segment_id = int(self.segment_map[mby * mbw + mbx])
                    seg = self.segments_list[mb.segment_id]
                    self.seg = seg  # current segment for trellis helpers
                src = self.ybuf[mby * 16 : mby * 16 + 16, mbx * 16 : mbx * 16 + 16]
                src_blocks = (
                    src.reshape(4, 4, 4, 4).transpose(0, 2, 1, 3).reshape(16, 4, 4)
                )  # [block, 4, 4] in raster block order

                ws0 = pr.create_border_luma(mbx, mby, mbw, top_y, left_y)

                # ---- I16 search -------------------------------------------------
                best = None
                is_flat = C.is_flat_source(src)
                for mode_idx, mode in enumerate((DC, V, H, TM)):
                    if f_lm is not None:
                        # Forced: evaluate only the forced I16 mode (DC as a
                        # placeholder when the MB is forced to I4).
                        want = 0 if f_lm == 4 else f_lm
                        if mode_idx != want:
                            continue
                    elif mode == V and mby == 0:
                        continue
                    elif mode == H and mbx == 0:
                        continue
                    elif mode == TM and (mbx == 0 or mby == 0):
                        continue
                    ws = ws0.copy()
                    if mode == DC:
                        pr.predict_dc(ws, 16, mby != 0, mbx != 0)
                    elif mode == V:
                        pr.predict_v(ws, 16)
                    elif mode == H:
                        pr.predict_h(ws, 16)
                    else:
                        pr.predict_tm(ws, 16)
                    pred = ws[1:17, 1:17]
                    resid = src.astype(np.int32) - pred.astype(np.int32)
                    blocks = (
                        resid.reshape(4, 4, 4, 4).transpose(0, 2, 1, 3).reshape(16, 16)
                    )
                    dct = tx.dct4x4(blocks)
                    y2 = tx.wht4x4(dct[:, 0][None, :])[0]
                    y2_levels = self._zz_quantize(seg.y2, y2[None, :])[0]
                    y_levels = self._zz_quantize(seg.y1, dct, first=1)

                    cost = int(
                        C.residual_costs(y2_levels[None, :], 1, 0, 0, self.level_costs)[0]
                    )
                    cost += int(
                        C.residual_costs(y_levels, 0, 1, 0, self.level_costs).sum()
                    )

                    # Reconstruction.
                    y2_dq = self._zz_dequantize(seg.y2, y2_levels[None, :])[0]
                    y2_r = tx.iwht4x4(y2_dq[None, :])[0]
                    blk = self._zz_dequantize(seg.y1, y_levels)
                    blk[:, 0] = y2_r
                    res = tx.idct4x4(blk)
                    rec = np.clip(
                        pred.astype(np.int32)
                        + res.reshape(4, 4, 4, 4).transpose(0, 2, 1, 3).reshape(16, 16),
                        0,
                        255,
                    ).astype(np.uint8)

                    d = int(C.sse(src[None], rec[None])[0])
                    sd = 0
                    if seg.tlambda > 0:
                        rec_blocks = rec.reshape(4, 4, 4, 4).transpose(0, 2, 1, 3).reshape(16, 4, 4)
                        td = int(C.tdisto(src_blocks, rec_blocks, wy).sum())
                        sd = (seg.tlambda * td + 128) >> 8
                    if is_flat and C.is_flat_levels(y_levels, C.FLATNESS_LIMIT_I16):
                        d *= 2
                        sd *= 2
                    mode_cost = ET.FIXED_COSTS_I16[mode_idx]
                    score = rd_score(mode_cost + cost, d + sd, seg.lambda_i16)
                    if best is None or score < best[0]:
                        best = (score, mode, mode_cost, cost, d, sd, y2_levels, y_levels, rec,
                                dct, pred)

                (_, i16_mode, i16_mode_cost, i16_cost, i16_d, i16_sd,
                 i16_y2, i16_y, i16_rec, i16_dct, i16_pred) = best
                i16_score = rd_score(
                    i16_mode_cost + i16_cost, i16_d + i16_sd, seg.lambda_mode
                )

                # ---- I4 search --------------------------------------------------
                use_i4 = False
                if f_lm is not None:
                    if f_lm == 4:
                        r = self._pick_intra4(
                            ws0, src, mbx, mby, top_bpred, left_bpred,
                            np.iinfo(np.int64).max, 10, forced=f_bp,
                        )
                        use_i4 = True
                        bpred_modes, i4_levels, i4_rec = r
                elif i4_try > 0:
                    r = self._pick_intra4(
                        ws0, src, mbx, mby, top_bpred, left_bpred, i16_score, i4_try
                    )
                    if r is not None:
                        use_i4 = True
                        bpred_modes, i4_levels, i4_rec = r

                if use_i4:
                    mb.luma_mode = B
                    mb.has_y2 = False
                    mb.bpred = bpred_modes
                    mb.y_levels = i4_levels
                    mb.y2_levels = None
                    luma_rec = i4_rec
                    if do_trellis:
                        mb.y_levels, luma_rec, _ = self._trellis_i4(
                            ws0.copy(), src, bpred_modes, top_cy[mbx], left_cy
                        )
                    top_bpred[mbx] = bpred_modes[12:]
                    left_bpred[:] = bpred_modes[3::4]
                else:
                    mb.luma_mode = i16_mode
                    mb.has_y2 = True
                    mb.y2_levels = i16_y2
                    mb.y_levels = i16_y
                    luma_rec = i16_rec
                    if do_trellis:
                        y2_dq = self._zz_dequantize(seg.y2, i16_y2[None, :])[0]
                        y2_r = tx.iwht4x4(y2_dq[None, :])[0]
                        mb.y_levels, luma_rec, _ = self._trellis_i16(
                            i16_dct, y2_r, i16_pred, top_cy[mbx], left_cy
                        )
                    bmode = (pr.B_DC, pr.B_VE, pr.B_HE, pr.B_TM)[i16_mode]
                    top_bpred[mbx] = bmode
                    left_bpred[:] = bmode

                # Track per-block-column nnz state for trellis contexts.
                first_y = 1 if mb.has_y2 else 0
                nnz_grid = (mb.y_levels[:, first_y:] != 0).any(axis=1).reshape(4, 4)
                top_cy[mbx] = nnz_grid[3, :]
                left_cy = nnz_grid[:, 3].astype(np.int64)

                # Update luma borders from reconstruction.
                left_y[0] = ws0[0, 16]
                left_y[1:] = luma_rec[:, 15]
                top_y[mbx * 16 : mbx * 16 + 16] = luma_rec[15, :]

                # ---- UV search --------------------------------------------------
                usrc = self.ubuf[mby * 8 : mby * 8 + 8, mbx * 8 : mbx * 8 + 8]
                vsrc = self.vbuf[mby * 8 : mby * 8 + 8, mbx * 8 : mbx * 8 + 8]
                uws0 = pr.create_border_chroma(mbx, mby, top_u, left_u)
                vws0 = pr.create_border_chroma(mbx, mby, top_v, left_v)
                best_uv = None
                for mode_idx, mode in enumerate((DC, V, H, TM)):
                    if f_cm is not None:
                        if mode_idx != f_cm:
                            continue
                    elif mode == V and mby == 0:
                        continue
                    elif mode == H and mbx == 0:
                        continue
                    elif mode == TM and (mbx == 0 or mby == 0):
                        continue
                    levels = np.zeros((8, 16), np.int32)
                    recs = []
                    dcts = []
                    cpreds = []
                    d = 0
                    for ci, (cws0, csrc) in enumerate(((uws0, usrc), (vws0, vsrc))):
                        cws = cws0.copy()
                        if mode == DC:
                            pr.predict_dc(cws, 8, mby != 0, mbx != 0)
                        elif mode == V:
                            pr.predict_v(cws, 8)
                        elif mode == H:
                            pr.predict_h(cws, 8)
                        else:
                            pr.predict_tm(cws, 8)
                        cpred = cws[1:9, 1:9]
                        resid = csrc.astype(np.int32) - cpred.astype(np.int32)
                        blocks = (
                            resid.reshape(2, 4, 2, 4).transpose(0, 2, 1, 3).reshape(4, 16)
                        )
                        dct = tx.dct4x4(blocks)
                        dcts.append(dct)
                        cpreds.append(cpred.astype(np.int32))
                        lv = self._zz_quantize(seg.uv, dct)
                        levels[ci * 4 : ci * 4 + 4] = lv
                        dq = self._zz_dequantize(seg.uv, lv)
                        res = tx.idct4x4(dq)
                        rec = np.clip(
                            cpred.astype(np.int32)
                            + res.reshape(2, 2, 4, 4).transpose(0, 2, 1, 3).reshape(8, 8),
                            0,
                            255,
                        ).astype(np.uint8)
                        recs.append(rec)
                        d += int(C.sse(csrc[None], rec[None])[0])
                    cost = int(C.residual_costs(levels, 2, 0, 0, self.level_costs).sum())
                    rate = ET.FIXED_COSTS_UV[mode_idx] + cost
                    if mode != DC and C.is_flat_levels(levels, C.FLATNESS_LIMIT_UV):
                        rate += C.FLATNESS_PENALTY * 8
                    score = rd_score(rate, d, seg.lambda_uv)
                    if best_uv is None or score < best_uv[0]:
                        best_uv = (score, mode, levels, recs, dcts, cpreds)

                _, uv_mode, uv_levels, uv_recs, uv_dcts, uv_preds = best_uv

                # Chroma DC error diffusion on the chosen mode's coefficients
                # (reference apply_chroma_error_diffusion, vp8.rs:572-647).
                uv_levels, uv_recs = self._chroma_error_diffusion(
                    uv_dcts, uv_preds, uv_levels, mbx, top_derr, left_derr
                )
                mb.chroma_mode = uv_mode
                mb.uv_levels = uv_levels
                for (cws0, leftb, topb, buf, rec) in (
                    (uws0, left_u, top_u, None, uv_recs[0]),
                    (vws0, left_v, top_v, None, uv_recs[1]),
                ):
                    leftb[0] = cws0[0, 8]
                    leftb[1:] = rec[:, 7]
                    topb[mbx * 8 : mbx * 8 + 8] = rec[7, :]

                # Skip detection: every level zero (incl. Y2 when present).
                all_zero = (
                    (mb.y_levels == 0).all()
                    and (mb.uv_levels == 0).all()
                    and (mb.y2_levels is None or (mb.y2_levels == 0).all())
                )
                mb.skipped = all_zero
                mbs.append(mb)
        return mbs

    def _pick_intra4(self, ws0, src, mbx, mby, top_bpred, left_bpred, i16_score,
                     n_try, forced=None):
        """Per-subblock I4 mode search with running-score early exit.

        `forced` (diagnostic): per-subblock modes [16] to evaluate alone —
        the search degenerates to coefficient coding of the given modes."""
        seg = self.seg
        ws = ws0.copy()
        levels_out = np.zeros((16, 16), np.int32)
        modes_out = np.zeros(16, np.int32)
        total_rate = 211  # BMODE_COST initial penalty
        total_disto = 0
        # I4 header-bit budget (libwebp max_header_bits; reference
        # vp8.rs:1838-1839, 2016-2018): abandon I4 when the mode headers
        # alone would cost more than 64 bits/MB.
        total_mode_cost = 0
        max_header_bits = 256 * 16 * 16 // 4
        tb = top_bpred[mbx].copy()
        lb = left_bpred.copy()
        wy = ET.VP8_WEIGHT_Y
        # Within-MB nonzero contexts for coefficient costing (MB-edge
        # subblocks use 0, like the reference: vp8.rs:1869-1873).
        top_nz = np.zeros(4, np.int64)
        left_nz = np.zeros(4, np.int64)

        for sby in range(4):
            for sbx in range(4):
                bi = sby * 4 + sbx
                x0, y0 = sbx * 4 + 1, sby * 4 + 1
                sb_src = src[sby * 4 : sby * 4 + 4, sbx * 4 : sbx * 4 + 4]
                top_mode = int(tb[sbx])
                left_mode = int(lb[sby])
                mode_costs = ET.VP8_FIXED_COSTS_I4[top_mode][left_mode]

                # Rank candidate modes by prediction SSE, keep the top n_try.
                preds = []
                for m in range(10):
                    wsp = ws.copy()
                    pr.predict_b(wsp, m, x0, y0)
                    preds.append(wsp[y0 : y0 + 4, x0 : x0 + 4].copy())
                preds = np.stack(preds)  # [10, 4, 4]
                pred_sse = C.sse(
                    np.broadcast_to(sb_src, preds.shape).reshape(10, -1),
                    preds.reshape(10, -1),
                )
                if forced is not None:
                    order = np.asarray([int(forced[bi])])
                elif n_try < 10:
                    # DC is always a candidate: its header bits are far
                    # cheaper than any other mode's, so pure prediction-SSE
                    # ranking under-serves it (libwebp's DC-heavy mode mix).
                    order = np.concatenate(
                        [[0], 1 + np.argsort(pred_sse[1:], kind="stable")[: n_try - 1]]
                    )
                else:
                    order = np.argsort(pred_sse, kind="stable")[:n_try]

                resid = sb_src.astype(np.int32)[None] - preds[order].astype(np.int32)
                dct = tx.dct4x4(resid.reshape(len(order), 16))
                lv = self._zz_quantize(seg.y1, dct)
                ctx0 = (top_nz[sbx] if sby > 0 else 0) + (
                    left_nz[sby] if sbx > 0 else 0
                )
                cc = C.residual_costs(lv, 3, 0, ctx0, self.level_costs)
                dq = self._zz_dequantize(seg.y1, lv)
                res = tx.idct4x4(dq)
                rec = np.clip(
                    preds[order].astype(np.int32) + res.reshape(len(order), 4, 4), 0, 255
                ).astype(np.uint8)
                d = C.sse(sb_src[None].repeat(len(order), 0).reshape(len(order), -1),
                          rec.reshape(len(order), -1))
                if seg.tlambda > 0:
                    td = C.tdisto(np.broadcast_to(sb_src, rec.shape), rec, wy)
                    sd = (seg.tlambda * td + 128) >> 8
                else:
                    sd = np.zeros(len(order), np.int64)
                rate = cc + mode_costs[order]
                scores = rd_score(rate, d + sd, seg.lambda_i4)
                k = int(np.argmin(scores))
                m = int(order[k])

                modes_out[bi] = m
                levels_out[bi] = lv[k]
                ws[y0 : y0 + 4, x0 : x0 + 4] = rec[k]
                tb[sbx] = m
                lb[sby] = m
                top_nz[sbx] = left_nz[sby] = int((lv[k] != 0).any())

                total_rate += int(rate[k])
                total_disto += int(d[k] + sd[k])
                running = rd_score(total_rate, total_disto, seg.lambda_mode)
                if running >= i16_score and forced is None:
                    return None
                total_mode_cost += int(mode_costs[m])
                if total_mode_cost > max_header_bits and forced is None:
                    return None

        return modes_out, levels_out, ws[1:17, 1:17].copy()

    # ----------------------------------------------------------- bitstream

    def _encode_mb_headers_device(self, hw, arrays):
        """Continue the frame-header boolean stream with device-coded MB
        headers (ops/token_ops.encode_mb_headers); None on budget overflow
        (caller falls back to the host writers)."""
        import jax.numpy as jnp

        from ..ops.boolenc2 import assemble_lane
        from ..ops.token_ops import encode_mb_headers

        nmb = self.mbw * self.mbh
        max_ops = max(2048, nmb * 48)
        max_bytes = max(1024, nmb * 8)
        init = (
            jnp.asarray(np.uint32(hw.bottom)),
            jnp.asarray(np.int32(hw.range)),
            jnp.asarray(np.int32(hw.bit_num)),
        )
        lead, data, nb, state, n_ops = encode_mb_headers(
            jnp.asarray(arrays["luma_mode"].astype(np.int32)),
            jnp.asarray(arrays["bpred"].astype(np.int32)),
            jnp.asarray(arrays["chroma_mode"].astype(np.int32)),
            jnp.asarray(self.segment_map.astype(np.int32)),
            jnp.asarray(arrays["skipped"].astype(np.int32)),
            jnp.asarray(np.asarray(self.seg_tree_probs, np.int32)),
            jnp.asarray(np.int32(self.skip_prob)),
            init, self.mbw, self.mbh,
            bool(self.segments_enabled and self.segments_update_map),
            max_ops, max_bytes,
        )
        if int(np.asarray(n_ops)) > max_ops or int(np.asarray(nb)) > max_bytes:
            return None  # pragma: no cover - budget overflow
        return assemble_lane(
            int(np.asarray(lead)), np.asarray(data), int(np.asarray(nb)),
            int(np.asarray(state[0])), int(np.asarray(state[2])),
            prefix=bytes(hw.out),
        )

    def _write_block(self, enc, levels, plane, first, ctx, probs):
        """Token-encode one zigzag-order level block (vp8.rs:798-958)."""
        nz_idx = np.flatnonzero(levels)
        end = int(nz_idx[-1]) + 1 if len(nz_idx) else 0
        skip_eob = False
        complexity = ctx
        plane_probs = probs[plane]
        for i in range(first, end):
            coeff = int(levels[i])
            band = T.COEFF_BANDS[i]
            p = plane_probs[band][complexity]
            start = 2 if skip_eob else 0
            v = abs(coeff)
            token = _token_for(v)
            enc.write_with_path(_TOKEN_PATHS[start][token], p)
            if token == TOK_0:
                skip_eob = True
                complexity = 0
                continue
            skip_eob = False
            if token >= TOK_CAT1:
                cat = token - TOK_CAT1
                extra = v - T.DCT_CAT_BASE[cat]
                cat_probs = T.PROB_DCT_CAT[cat]
                nbits = len(cat_probs)
                for b in range(nbits - 1, -1, -1):
                    enc.write_bool((extra >> b) & 1, cat_probs[nbits - 1 - b])
            enc.write_bool(1 if coeff < 0 else 0, 128)
            complexity = 1 if v == 1 else 2
        if end < 16:
            band = T.COEFF_BANDS[max(first, end)]
            p = plane_probs[band][complexity]
            enc.write_with_path(_TOKEN_PATHS[0][TOK_EOB], p)

    def _write_bitstream_arrays(self, arrays, ctx, new_probs) -> bytes:
        header = BoolEncoder()
        hw = header

        hw.write_literal(1, 0)  # color space
        hw.write_literal(1, 0)  # pixel type (clamping)
        # Per-segment loop-filter strengths (libwebp parity): the header's
        # base level is segment 0's strength and the others ride as deltas.
        seg_lf = (
            [s.lf_level for s in self.segments_list]
            if self.segments_enabled and
            all(s.lf_level is not None for s in self.segments_list)
            else None
        )
        if seg_lf is not None:
            self.filter_level = int(seg_lf[0])
        hw.write_flag(self.segments_enabled)
        if self.segments_enabled:
            hw.write_flag(self.segments_update_map)
            hw.write_flag(True)   # update segment feature data
            hw.write_flag(False)  # delta (not absolute) values
            for seg in self.segments_list:
                d = int(seg.quantizer_level)
                hw.write_optional_signed(7, d, present=d != 0)
            for lf in (seg_lf if seg_lf is not None else [None] * 4):
                if lf is None:
                    hw.write_flag(False)  # no per-segment loop filter delta
                else:
                    d = int(lf) - int(self.filter_level)
                    hw.write_optional_signed(6, d, present=d != 0)
            if self.segments_update_map:
                for p in self.seg_tree_probs:
                    if p != 255:
                        hw.write_flag(True)
                        hw.write_literal(8, p)
                    else:
                        hw.write_flag(False)
        hw.write_flag(False)    # filter type: normal
        hw.write_literal(6, self.filter_level)
        hw.write_literal(3, self.sharpness)
        hw.write_flag(False)    # no loop filter adjustments
        hw.write_literal(2, self.num_partitions.bit_length() - 1)

        # Quantizer indices: ydc/y2dc/y2ac deltas zero; uvdc carries the
        # global chroma-DC boost (quant.DQ_UV_DC unless overridden per
        # segment params), uvac the content-adaptive chroma susceptibility
        # delta (setup_segments / libwebp's dq_uv_ac).
        lead = self.segments_list[0] if self.segments_enabled else self.seg
        uvac_d = lead.uv_ac_delta
        uvdc_d = lead.uv_dc_delta
        hw.write_literal(7, self.quant_index)
        for _ in range(3):
            hw.write_flag(False)
        hw.write_optional_signed(4, uvdc_d, present=uvdc_d != 0)
        hw.write_optional_signed(4, uvac_d, present=uvac_d != 0)

        hw.write_literal(1, 0)  # refresh entropy probs

        # Token probability updates.
        upd = T.COEFF_UPDATE_PROBS
        old = self.probs
        for t in range(4):
            for b in range(8):
                for c in range(3):
                    for p in range(11):
                        if new_probs[t, b, c, p] != old[t, b, c, p]:
                            hw.write_bool(1, int(upd[t, b, c, p]))
                            hw.write_literal(8, int(new_probs[t, b, c, p]))
                        else:
                            hw.write_bool(0, int(upd[t, b, c, p]))
        self.probs = new_probs

        hw.write_literal(1, 1)  # mb_no_skip_coeff enabled
        hw.write_literal(8, self.skip_prob)

        # MB headers (into the header partition): device continuation when
        # the batch pipeline runs device token coding, else native fast path.
        mbw = self.mbw
        luma_mode = arrays["luma_mode"]
        chroma_mode = arrays["chroma_mode"]
        bpred_arr = arrays["bpred"]
        skipped = arrays["skipped"]
        header_bytes = None
        if getattr(self, "device_mb_headers", False):
            header_bytes = self._encode_mb_headers_device(hw, arrays)
        try:
            from ..io import native

            if header_bytes is None and native.available():
                header_bytes = native.vp8_mbheader_encode(
                    hw, luma_mode, bpred_arr, chroma_mode, self.segment_map,
                    skipped, mbw, self.skip_prob,
                    self.segments_enabled and self.segments_update_map,
                    self.seg_tree_probs,
                )
        except Exception:
            header_bytes = None
        if header_bytes is None:
            top_bpred = np.full((mbw, 4), pr.B_DC, np.int32)
            for mby in range(self.mbh):
                left_bpred = np.full(4, pr.B_DC, np.int32)
                for mbx in range(mbw):
                    i = mby * mbw + mbx
                    if self.segments_enabled and self.segments_update_map:
                        hw.write_with_path(
                            _SEG_PATHS[int(self.segment_map[i])], self.seg_tree_probs
                        )
                    hw.write_bool(1 if skipped[i] else 0, self.skip_prob)
                    lm = int(luma_mode[i])
                    hw.write_with_path(_YMODE_PATHS[lm], T.KEYFRAME_YMODE_PROBS)
                    if lm == 4:
                        for sy in range(4):
                            for sx in range(4):
                                m = int(bpred_arr[i, sy * 4 + sx])
                                probs_ctx = T.KEYFRAME_BPRED_MODE_PROBS[
                                    int(top_bpred[mbx, sx]), int(left_bpred[sy])
                                ]
                                hw.write_with_path(_BPRED_PATHS[m], probs_ctx)
                                top_bpred[mbx, sx] = m
                                left_bpred[sy] = m
                    else:
                        bmode = (pr.B_DC, pr.B_VE, pr.B_HE, pr.B_TM)[lm]
                        top_bpred[mbx] = bmode
                        left_bpred[:] = bmode
                    hw.write_with_path(_UV_PATHS[int(chroma_mode[i])], T.KEYFRAME_UV_MODE_PROBS)

        # Residual tokens: MB row r goes to partition r % n (the container's
        # per-partition parallel-entropy hook; decoder side already handles 8).
        if self.partitions_override is not None:
            part_streams = list(self.partitions_override)
            assert len(part_streams) == self.num_partitions
            part_bytes = b"".join(
                len(pb).to_bytes(3, "little") for pb in part_streams[:-1]
            ) + b"".join(part_streams)
            if header_bytes is None:
                header_bytes = header.flush()
            if len(header_bytes) >= (1 << 19):
                from ..errors import EncodingError

                raise EncodingError("partition 0 overflow (header > 512 KiB)")
            out = bytearray()
            tag = (len(header_bytes) << 5) | (1 << 4) | 0
            out += bytes([tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF])
            out += b"\x9d\x01\x2a"
            out += bytes([self.width & 0xFF, (self.width >> 8) & 0x3F])
            out += bytes([self.height & 0xFF, (self.height >> 8) & 0x3F])
            out += header_bytes
            out += part_bytes
            return bytes(out)

        levels, meta = self._token_stream(arrays, ctx)
        part_streams = []
        for p in range(self.num_partitions):
            psel = (meta[:, 3] % self.num_partitions) == p
            plevels, pmeta = levels[psel], meta[psel]
            pbytes = None
            try:
                from ..io import native

                if native.available():
                    pbytes = native.vp8_token_encode(plevels, pmeta, self.probs)
            except Exception:
                pbytes = None
            if pbytes is None:
                part = BoolEncoder()
                for lv, m in zip(plevels, pmeta):
                    self._write_block(part, lv, int(m[0]), int(m[1]), int(m[2]), self.probs)
                pbytes = part.flush()
            part_streams.append(pbytes)
        part_bytes = b"".join(
            len(pb).to_bytes(3, "little") for pb in part_streams[:-1]
        ) + b"".join(part_streams)

        if header_bytes is None:
            header_bytes = header.flush()

        if len(header_bytes) >= (1 << 19):
            # The frame tag's first-partition-size field is 19 bits; libwebp
            # raises PARTITION0_OVERFLOW here (mirrors encoder/vp8.rs limits).
            from ..errors import EncodingError

            raise EncodingError("partition 0 overflow (header > 512 KiB)")

        out = bytearray()
        tag = (len(header_bytes) << 5) | (1 << 4) | 0  # show_frame, version 0, keyframe
        out += bytes([tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF])
        out += b"\x9d\x01\x2a"
        out += bytes([self.width & 0xFF, (self.width >> 8) & 0x3F])
        out += bytes([self.height & 0xFF, (self.height >> 8) & 0x3F])
        out += header_bytes
        out += part_bytes
        return bytes(out)


def setup_segments(ybuf, ubuf, vbuf, mbw, mbh, base_qi, base_seg):
    """K-means segment analysis for one image (shared by the single-image
    encoder and the batch pipeline; reference analysis.rs:1029-1130).

    Returns (enabled, update_map, segment_map [nmb], segments_list [4],
    seg_tree_probs [3])."""
    nmb = mbw * mbh
    if nmb < 256:
        return False, False, np.zeros(nmb, np.int32), [base_seg] * 4, [255, 255, 255]
    from .analysis import analyze_image

    alphas, _histogram, uv_alpha = analyze_image(ybuf, ubuf, vbuf, mbw, mbh)
    return setup_segments_from_alphas(alphas, uv_alpha, base_qi)


def setup_segments_from_alphas(alphas, uv_alpha, base_qi):
    """K-means + quant/lf math on precomputed per-MB alphas (the host tail
    of setup_segments; alphas may come from the host analyze_image or the
    device twin ops/analysis2.analyze_alphas_batch — bit-identical)."""
    from .analysis import assign_segments_kmeans, compute_segment_quant

    histogram = np.bincount(alphas, minlength=256)
    centers, amap, mid = assign_segments_kmeans(histogram, 4)
    lo, hi = int(centers.min()), int(centers.max())
    rng = max(hi - lo, 1)
    segment_map = amap[alphas].astype(np.int32)
    # Content-adaptive chroma-AC quant delta (libwebp quant_enc.c's
    # dq_uv_ac: centered uv_alpha mapped onto [-4, 6] and rescaled by
    # sns/100; larger uv_alpha = smoother chroma = coarser chroma AC).
    # Round 2 measured this worse, but that was under the inverted luma
    # segment formula; gate on ADAPTIVE_UV_AC for A/B.
    if ADAPTIVE_UV_AC:
        d = int((uv_alpha - 64) * (6 - (-4)) / (100 - 30))  # C trunc-to-zero
        uv_ac_delta = min(max(int(d * 50 / 100), -4), 6)
    else:
        uv_ac_delta = 0
    segments_list = []
    for c in centers:
        t_alpha = min(max(255 * (int(c) - mid) // rng, -127), 127)
        seg_qi = compute_segment_quant(base_qi, t_alpha)
        sp = SegmentParams(base_qi, seg_qi - base_qi, uv_ac_delta=uv_ac_delta)
        # Per-segment loop-filter strength (libwebp VP8SetupFilterStrength):
        # beta = segment complexity in [0, 255]; busier segments are
        # filtered less, and the finest segment often not at all at high Q.
        beta = min(max(255 * (int(c) - lo) // rng, 0), 255)
        sp.lf_level = compute_filter_level(sp.quant_index, 0, 60, beta)
        segments_list.append(sp)

    counts = np.bincount(segment_map, minlength=4)

    def proba(a, b):
        t = a + b
        return int((255 * a + t // 2) // t) if t else 255

    seg_tree_probs = [
        proba(counts[0] + counts[1], counts[2] + counts[3]),
        proba(counts[0], counts[1]),
        proba(counts[2], counts[3]),
    ]
    return True, any(p != 255 for p in seg_tree_probs), segment_map, \
        segments_list, seg_tree_probs


def token_stream(arrays, ctx, mbw, mbh):
    """Assemble (levels [N,16], meta [N,4]) in bitstream block order."""
    nmb = mbw * mbh
    has_y2 = ctx["has_y2"]
    act = ~arrays["skipped"]

    all_levels = np.concatenate(
        [arrays["y2_levels"][:, None, :], arrays["y_levels"], arrays["uv_levels"]],
        axis=1,
    )  # [nmb, 25, 16]
    plane = np.zeros((nmb, 25), np.int32)
    plane[:, 0] = 1
    plane[:, 1:17] = np.where(has_y2, 0, 3)[:, None]
    plane[:, 17:] = 2
    first = np.zeros((nmb, 25), np.int32)
    first[:, 1:17] = np.where(has_y2, 1, 0)[:, None]
    ctxs = np.concatenate(
        [ctx["y2_ctx"][:, None], ctx["y_ctx"], ctx["uv_ctx"]], axis=1
    ).astype(np.int32)
    valid = np.ones((nmb, 25), bool)
    valid[:, 0] = has_y2
    valid &= act[:, None]

    sel = valid.reshape(-1)
    mby = np.repeat(np.arange(nmb, dtype=np.int32) // mbw, 25)
    levels = all_levels.reshape(-1, 16)[sel]
    meta = np.zeros((len(levels), 4), np.int32)
    meta[:, 0] = plane.reshape(-1)[sel]
    meta[:, 1] = first.reshape(-1)[sel]
    meta[:, 2] = ctxs.reshape(-1)[sel]
    meta[:, 3] = mby[sel]  # MB row, for partition interleaving
    return levels, meta


def derive_skip_and_contexts(arrays, mbw, mbh):
    """Per-MB skip flags + token contexts for an analysis-arrays dict."""
    from .contexts import compute_contexts

    skipped = (
        (arrays["y_levels"] == 0).all(axis=(1, 2))
        & (arrays["uv_levels"] == 0).all(axis=(1, 2))
        & (arrays["y2_levels"] == 0).all(axis=1)
    )
    arrays["skipped"] = skipped
    return compute_contexts(
        arrays["luma_mode"], arrays["y2_levels"], arrays["y_levels"],
        arrays["uv_levels"], skipped, mbw, mbh,
    )


def adapted_probs_for(arrays, mbw, mbh):
    """Pass-1 probability adaptation from an analysis-arrays dict
    (mirrors Vp8Encoder's stats pass; reference vp8.rs:1317-1410)."""
    ctx = derive_skip_and_contexts(arrays, mbw, mbh)
    stats = C.ProbaStats()
    levels, meta = token_stream(arrays, ctx, mbw, mbh)
    done = False
    try:
        from ..io import native

        if native.available():
            totals, ones = native.vp8_token_stats(levels, meta)
            stats.total += totals
            stats.ones += ones
            done = True
    except Exception:
        done = False
    if not done:  # pragma: no cover - python fallback
        for lv, m in zip(levels, meta):
            stats.record_blocks(lv[None], int(m[0]), int(m[1]), [int(m[2])])
    return stats.updated_probs(T.COEFF_PROBS_DEFAULT.copy())


def encode_frame_lossy(rgb: np.ndarray, quality: int = 75, method: int = 4) -> bytes:
    return Vp8Encoder(quality, method).encode(rgb)


_HOST_POOL = None


def _host_pool():
    global _HOST_POOL
    if _HOST_POOL is None:
        import os
        from concurrent.futures import ThreadPoolExecutor

        _HOST_POOL = ThreadPoolExecutor(max_workers=max(2, os.cpu_count() or 2))
    return _HOST_POOL


# Device<->host transfer accounting (bytes), reset/read by bench.py.
XFER = {"up": 0, "down": 0}


def _xfer_down(*arrays):
    XFER["down"] += sum(int(a.nbytes) for a in arrays)


class _LazyUnpack:
    """Mapping view of one image's analysis arrays that defers the wire
    unpack (bitmap expand + escapes, ~5 ms of numpy) until first access —
    the finisher resolves it inside its own host-pool workers, off the
    pipeline's critical xfer lane."""

    def __init__(self, thunk):
        self._thunk = thunk
        self._d = None

    def _resolve(self):
        if self._d is None:
            self._d = self._thunk()
            self._thunk = None
        return self._d

    def __getitem__(self, k):
        return self._resolve()[k]

    def keys(self):
        return self._resolve().keys()

    def __iter__(self):
        return iter(self._resolve())

    def __len__(self):
        return len(self._resolve())


def _fetch_packed(packed, planes, fallback):
    """Fetch the device analysis results over the coalesced wire buffer.

    ONE np.asarray round-trip for the whole batch (the d2h tunnel is
    uncompressed ~35 MB/s with ~25 ms per-RPC latency, so the old
    seven-fetch scheme paid ~150 ms/batch of pure latency).  The dense
    int8 level array stays device-resident; only the rows of images whose
    nonzero count overflowed the sparse budget are fetched.  Per-image
    unpack is LAZY (resolved by the finisher's workers).
    """
    from ..ops.encode_wavefront2 import (
        unpack_analysis_dense_wire,
        unpack_analysis_wire,
    )

    lv8_dev, wire_dev = packed
    wire = np.asarray(wire_dev)
    _xfer_down(wire)
    nmb = lv8_dev.shape[1]
    if (wire[:, 1] != 0).any():  # pragma: no cover - escape-budget overflow
        return fallback()

    def one(i):
        if wire[i, 0]:  # pragma: no cover - wire-budget overflow
            return unpack_analysis_dense_wire(
                np.asarray(lv8_dev[i]), wire[i], nmb
            )
        return unpack_analysis_wire(wire[i], nmb)

    return [_LazyUnpack(functools.partial(one, i)) for i in range(len(planes))]


DEVICE_TOKEN_PARTS = 8


def _token_budgets(nmb: int, nparts: int):
    """Static op/byte budgets per partition lane (overflow -> fallback)."""
    max_ops = max(4096, (nmb * 900) // nparts)
    max_bytes = max(2048, (nmb * 120) // nparts)
    return max_ops, max_bytes


def _fetch_tokens(Y, U, V, P, tables, probs, planes, mbw, mbh, n_try,
                  do_trellis, sid, chain=None):
    """Device-token fetch: finished partition bitstreams + mode metadata;
    levels stay on the device (fetched per image only on budget overflow)."""
    import jax
    import jax.numpy as jnp

    from ..ops.boolenc2 import assemble_lane
    from ..ops.encode_wavefront2 import (
        encode_analysis_batch_v2_pertbl_tokens,
        unpack_analysis,
    )

    nmb = mbw * mbh
    nparts = DEVICE_TOKEN_PARTS
    max_ops, max_bytes = _token_budgets(nmb, nparts)
    pf = jnp.asarray(np.stack(probs).reshape(len(probs), -1).astype(np.int32))
    (meta8_d, lead_d, tok_d, tok_n_d, state_d, n_ops_d,
     lv8_d, esc_pos_d, esc_val_d, esc_over_d) = (
        encode_analysis_batch_v2_pertbl_tokens(
            Y, U, V, P, tables, pf, mbw, mbh, n_try, do_trellis,
            nparts, max_ops, max_bytes, sid,
        )
    )
    if chain is not None:
        chain()
    meta8 = np.asarray(meta8_d)
    lead = np.asarray(lead_d)
    tok_n = np.asarray(tok_n_d)
    n_ops = np.asarray(n_ops_d)
    bottom = np.asarray(state_d[0])
    bit_num = np.asarray(state_d[2])
    tok = np.asarray(tok_d)
    _xfer_down(meta8, lead, tok_n, n_ops, bottom, bit_num, tok)

    arrays_list, parts_list = [], []
    zero_y = np.zeros((nmb, 16, 16), np.int32)
    zero_uv = np.zeros((nmb, 8, 16), np.int32)
    zero_y2 = np.zeros((nmb, 16), np.int32)
    for i in range(len(planes)):
        ok = (n_ops[i] <= max_ops).all() and (tok_n[i] <= max_bytes).all()
        if not ok or bool(np.asarray(esc_over_d[i])):  # pragma: no cover
            arr = unpack_analysis(
                np.asarray(lv8_d[i]), meta8[i, :, :18],
                np.asarray(esc_pos_d[i]), np.asarray(esc_val_d[i]),
            )
            arrays_list.append(arr)
            parts_list.append(None)
            continue
        parts = [
            assemble_lane(
                int(lead[i, p]), tok[i, p], int(tok_n[i, p]),
                int(bottom[i, p]), int(bit_num[i, p]),
            )
            for p in range(nparts)
        ]
        arrays_list.append(
            dict(
                y_levels=zero_y, uv_levels=zero_uv, y2_levels=zero_y2,
                bpred=meta8[i, :, :16].astype(np.int32),
                luma_mode=meta8[i, :, 16].astype(np.int32),
                chroma_mode=meta8[i, :, 17].astype(np.int32),
            )
        )
        parts_list.append((parts, meta8[i, :, 18].astype(bool)))
    return arrays_list, probs, parts_list


def dispatch_seg_results(planes, quality: int, mbw, mbh):
    """Dispatch the device alpha analysis for segmentation; returns a
    zero-arg closure that fetches + finishes (k-means on host).

    Split from compute_seg_results so a pipeline can enqueue the alpha
    kernel EARLY (before the current batch's pass-2 kernel) and collect
    the ~1.5 KB/img result later with a near-zero wait."""
    qi = quality_to_quant_index(quality)
    if mbw * mbh >= 256:
        try:
            import jax.numpy as jnp

            from ..ops.analysis2 import analyze_alphas_batch

            Y = jnp.asarray(np.stack([p[0] for p in planes]))
            U = jnp.asarray(np.stack([p[1] for p in planes]))
            V = jnp.asarray(np.stack([p[2] for p in planes]))
            final, uv = analyze_alphas_batch(Y, U, V, mbw, mbh)
            joint_dev = jnp.concatenate(
                [final.astype(jnp.int32), uv[:, None].astype(jnp.int32)], axis=1
            )

            def finishf():
                # One d2h RPC for both results (~25 ms latency per fetch).
                joint = np.asarray(joint_dev)
                final_h, uv_h = joint[:, :-1], joint[:, -1]
                return list(
                    _host_pool().map(
                        lambda i: setup_segments_from_alphas(
                            final_h[i], int(uv_h[i]), qi
                        ),
                        range(len(planes)),
                    )
                )

            return finishf
        except Exception as e:  # pragma: no cover - fall back to host pass
            from ..io.native import warn_once

            warn_once("analyze_alphas_batch(device)", e)
    seg = SegmentParams(qi)
    return lambda: list(
        _host_pool().map(
            lambda pl: setup_segments(pl[0], pl[1], pl[2], mbw, mbh, qi, seg),
            planes,
        )
    )


def compute_seg_results(planes, quality: int, mbw, mbh, device: bool = True):
    """Per-image k-means segmentation for a batch (the host half of
    analyze_frames_lossy_batch; pass the result back via seg_results= to
    overlap it with device work in a pipeline).

    The per-MB alpha analysis (the expensive part, ~22 ms/img numpy on
    this 2-core host) runs on-device by default (ops/analysis2, bit-equal
    to the host pass); only k-means + quant math stay on host (~1 ms)."""
    if not device:
        qi = quality_to_quant_index(quality)
        seg = SegmentParams(qi)
        return list(
            _host_pool().map(
                lambda pl: setup_segments(pl[0], pl[1], pl[2], mbw, mbh, qi, seg),
                planes,
            )
        )
    return dispatch_seg_results(planes, quality, mbw, mbh)()


def analyze_frames_lossy_batch(planes, quality: int, method: int, mbw, mbh,
                               two_pass: bool = True, segments: bool = False,
                               device_tokens: bool = None, seg_results=None):
    """Dispatch the batched device RD analysis (async; packed transfer).

    Mirrors the reference two-pass flow across a whole batch: pass 1 (no
    trellis, method<=3 decisions) collects per-image token statistics on the
    host, probabilities adapt per image, and pass 2 re-decides with each
    image's own cost tables (+ trellis at method>=4) as one vmapped kernel.

    Returns a zero-arg closure that fetches + unpacks into
    (per-image array dicts for each pass, per-image adapted probs) — split so
    a caller can overlap the device work of batch i+1 with the host entropy
    coding of batch i.
    """
    import jax
    import jax.numpy as jnp

    from ..ops.encode_wavefront import EncParams, EncTables
    from ..ops.encode_wavefront2 import (
        encode_analysis_batch_v2,
        encode_analysis_batch_v2_packed,
        encode_analysis_batch_v2_pertbl_packed,
    )
    from . import costs as C

    from ..ops.encode_wavefront import EncParamsSegs

    qi = quality_to_quant_index(quality)
    seg = SegmentParams(qi)
    n_try = 0 if method <= 1 else (3 if method <= 3 else (4 if method == 4 else 10))
    n_try1 = min(n_try, 3)
    Y = jnp.asarray(np.stack([p[0] for p in planes]))
    U = jnp.asarray(np.stack([p[1] for p in planes]))
    V = jnp.asarray(np.stack([p[2] for p in planes]))
    XFER["up"] += int(Y.nbytes + U.nbytes + V.nbytes)
    TB = EncTables.default()

    # Per-image k-means segment quantization (>= 256 MBs, like the
    # single-image encoder; the finisher recomputes the same maps for the
    # headers deterministically).  Off by default in the throughput path:
    # the segment-quantized kernel variant is bit-exact (single-image device
    # backend + tests) but its per-lane parameter selects currently blow the
    # remote XLA compile budget at batch scale.
    if segments and mbw * mbh >= 256:
        if seg_results is None:
            seg_results = compute_seg_results(planes, quality, mbw, mbh)
        P = EncParamsSegs.from_segments([r[3] for r in seg_results])
        sid = jnp.asarray(np.stack([r[2] for r in seg_results]))
    else:
        P = EncParams(seg)
        sid = None
        seg_results = None

    if not two_pass:
        packed1 = encode_analysis_batch_v2_packed(
            Y, U, V, P, TB, mbw, mbh, n_try1, method >= 4, sid
        )

        def fallback1():
            out = encode_analysis_batch_v2(
                Y, U, V, P, TB, mbw, mbh, n_try1, method >= 4, sid
            )
            out = {k: np.asarray(a).astype(np.int32) for k, a in out.items()}
            return [{k: out[k][i] for k in out} for i in range(len(planes))]

        def fetch1(chain=None, early_chain=None):
            # Same signature as the two-pass fetch so callers can use the
            # pipelined `xfer.submit(fetch, chain)` pattern either way
            # (ADVICE r3).  Nothing left to dispatch here, so the chained
            # next-batch dispatch runs first.
            if early_chain is not None:
                early_chain()
            if chain is not None:
                chain()
            return _fetch_packed(packed1, planes, fallback1), None, None, seg_results

        return fetch1

    # Two-pass: pass 1 returns only the on-device token statistics (a few
    # KB/image — the pass-1 levels never cross the tunnel); pass 2 re-decides
    # with per-image adapted cost tables.
    from ..ops.encode_wavefront2 import encode_analysis_stats_batch

    if device_tokens is None:
        device_tokens = os.environ.get("WEBP_TPU_DEVICE_TOKENS") == "1"
    dev_tokens = bool(device_tokens)

    stats = encode_analysis_stats_batch(Y, U, V, P, TB, mbw, mbh, n_try1, sid)

    def fetch(chain=None, early_chain=None):
        """Blocking half: fetch pass-1 stats, adapt, dispatch pass 2, fetch.

        `chain` (optional zero-arg callable) runs right after the pass-2
        kernel is dispatched — a pipelining hook so the caller can enqueue
        the NEXT batch's pass-1 kernel behind it and keep the device busy
        through this batch's downloads.  `early_chain` runs right after the
        pass-1 stats arrive, BEFORE pass 2 is dispatched — the hook for
        enqueueing the next batch's small segment-alpha kernel ahead of
        this batch's big pass-2 kernel, so the late chain's fetch of it
        returns without waiting through pass 2."""
        # One d2h RPC for both stat tensors (the tunnel charges ~25 ms
        # latency per fetch).
        both = np.asarray(jnp.stack(stats)).astype(np.int64)
        if early_chain is not None:
            early_chain()
        totals, ones = both[0], both[1]
        default = T.COEFF_PROBS_DEFAULT.copy()

        def probs_for(i):
            st = C.ProbaStats()
            st.total += totals[i]
            st.ones += ones[i]
            return st.updated_probs(default)

        probs = list(_host_pool().map(probs_for, range(len(planes))))
        from ..ops.encode_wavefront2 import enc_tables_from_probs

        tables = enc_tables_from_probs(jnp.asarray(np.stack(probs)))

        if dev_tokens:
            arrays_t, probs_t, parts_t = _fetch_tokens(
                Y, U, V, P, tables, probs, planes, mbw, mbh, n_try,
                method >= 4, sid, chain=chain,
            )
            return arrays_t, probs_t, parts_t, seg_results

        packed2 = encode_analysis_batch_v2_pertbl_packed(
            Y, U, V, P, tables, mbw, mbh, n_try, method >= 4, sid
        )
        # NOTE (r5): do NOT try to overlap the wire d2h with the chain's
        # device round-trip on a helper thread — the tunnel serializes all
        # RPCs, and a 1 s transfer in flight starves the chain's dispatches
        # (measured: rounds degrade 4 s -> 6-8 s).  Bytes and RPC count are
        # the only levers.
        if chain is not None:
            chain()

        def fallback2():  # pragma: no cover - escape overflow
            outs = []
            for i, p in enumerate(probs):
                if sid is None:
                    P_i, sid_i = P, None
                else:
                    P_i = jax.tree_util.tree_map(lambda a: a[i : i + 1], P)
                    sid_i = sid[i : i + 1]
                out = encode_analysis_batch_v2(
                    Y[i : i + 1], U[i : i + 1], V[i : i + 1], P_i,
                    EncTables.from_level_costs(C.cached_level_costs(p)),
                    mbw, mbh, n_try, method >= 4, sid_i,
                )
                outs.append({k: np.asarray(a[0]).astype(np.int32) for k, a in out.items()})
            return outs

        arrays2 = _fetch_packed(packed2, planes, fallback2)
        return arrays2, probs, None, seg_results

    return fetch


def probe_stage_times(planes, quality, method, mbw, mbh, segments=True,
                      seg_results=None, reps=3):
    """Blocking per-stage device timings of the two-pass encode path for
    roofline accounting (bench.py).  Re-dispatches the SAME jitted kernels
    (same shapes/params) the pipelined path uses, so after one pipelined
    round everything here is warm — no extra compiles.  Returns seconds
    per batch for p1 stats / p2 analysis (prepack) / sparse pack.
    """
    import time as _time

    import jax
    import jax.numpy as jnp

    from ..ops.encode_wavefront import EncParams, EncParamsSegs, EncTables
    from ..ops.encode_wavefront2 import (
        CAP_MB,
        _pack_levels_stage,
        _prepack_batch_pertbl,
        enc_tables_from_probs,
        encode_analysis_stats_batch,
    )
    from . import costs as C

    qi = quality_to_quant_index(quality)
    seg = SegmentParams(qi)
    n_try = 0 if method <= 1 else (3 if method <= 3 else (4 if method == 4 else 10))
    n_try1 = min(n_try, 3)
    Y = jnp.asarray(np.stack([p[0] for p in planes]))
    U = jnp.asarray(np.stack([p[1] for p in planes]))
    V = jnp.asarray(np.stack([p[2] for p in planes]))
    TB = EncTables.default()
    if segments and mbw * mbh >= 256:
        if seg_results is None:
            seg_results = compute_seg_results(planes, quality, mbw, mbh)
        P = EncParamsSegs.from_segments([r[3] for r in seg_results])
        sid = jnp.asarray(np.stack([r[2] for r in seg_results]))
    else:
        P, sid = EncParams(seg), None

    def best_of(fn):
        out = fn()
        jax.block_until_ready(out)
        ts = []
        for _ in range(reps):
            t0 = _time.time()
            out = fn()
            jax.block_until_ready(out)
            ts.append(_time.time() - t0)
        return min(ts), out

    t_p1, stats = best_of(
        lambda: encode_analysis_stats_batch(Y, U, V, P, TB, mbw, mbh, n_try1, sid)
    )
    totals, ones = (np.asarray(a).astype(np.int64) for a in stats)
    default = T.COEFF_PROBS_DEFAULT.copy()

    def probs_for(i):
        st = C.ProbaStats()
        st.total += totals[i]
        st.ones += ones[i]
        return st.updated_probs(default)

    probs = list(_host_pool().map(probs_for, range(len(planes))))
    tables = enc_tables_from_probs(jnp.asarray(np.stack(probs)))
    t_p2, pre = best_of(
        lambda: _prepack_batch_pertbl(
            Y, U, V, P, tables, mbw, mbh, n_try, method >= 4, sid
        )
    )
    lv8 = pre[0]
    t_pack, _ = best_of(lambda: _pack_levels_stage(lv8, CAP_MB))
    return {"p1_s": t_p1, "p2_s": t_p2, "pack_s": t_pack}


def encode_frames_lossy_batch(rgbs, quality: int = 75, method: int = 4,
                              two_pass: bool = True, segments: bool = False,
                              device_tokens: bool = None) -> list:
    """Encode same-geometry RGB frames with batched device analysis.

    The wavefront RD search runs as batched kernels (two-pass probability
    adaptation by default, matching `Vp8Encoder`); contexts and entropy
    coding finish per image on the host (thread pool). Returns VP8 payloads.
    """
    h, w = rgbs[0].shape[:2]
    planes = list(_host_pool().map(yuvops.rgb_to_yuv420, rgbs))
    mbw, mbh = (w + 15) // 16, (h + 15) // 16
    fetched = analyze_frames_lossy_batch(
        planes, quality, method, mbw, mbh, two_pass, segments, device_tokens
    )()
    return finish_frames_lossy_batch(
        planes, fetched, quality, method, w, h, segments
    )


def finish_frames_lossy_batch(planes, fetched, quality, method, w, h,
                              segments: bool = False,
                              num_partitions: int = None) -> list:
    """Host half of the batched encode: probs injection, contexts, entropy.

    `fetched` is (arrays, probs) from analyze_frames_lossy_batch — or
    (arrays, probs, parts) in the device-token flow, where parts[i] carries
    each image's pre-encoded coefficient partitions + skip flags: for the
    two-pass flow, `probs` carries each image's pass-1-adapted probabilities
    (from device statistics) and `arrays` the pass-2 decisions — together
    they reproduce the single-image two-pass flow exactly.  A 4th element
    (per-image k-means segment results from the analysis side) lets the
    finisher reuse them instead of recomputing ~46 ms/img of host DCT
    histograms."""
    seg_results = None
    if len(fetched) == 4:
        arrays_list, probs, parts_list, seg_results = fetched
    elif len(fetched) == 3:
        arrays_list, probs, parts_list = fetched
    else:
        arrays_list, probs = fetched
        parts_list = None

    def one(i):
        two_pass = probs is not None
        nparts = (
            DEVICE_TOKEN_PARTS
            if parts_list is not None and parts_list[i] is not None
            else (num_partitions or int(os.environ.get("WEBP_TPU_NUM_PARTITIONS", "1")))
        )
        enc = Vp8Encoder(
            quality, method, backend="device", two_pass=two_pass,
            num_partitions=nparts,
        )
        if two_pass:
            enc.probs_override = probs[i]
        if not segments:
            enc._setup_segments = lambda qi: Vp8Encoder._setup_segments_off(enc)
        elif seg_results is not None:
            def inject(qi, enc=enc, r=seg_results[i]):
                (enc.segments_enabled, enc.segments_update_map,
                 enc.segment_map, enc.segments_list, enc.seg_tree_probs) = r
            enc._setup_segments = inject
        if parts_list is not None and parts_list[i] is not None:
            enc.partitions_override, enc.skip_override = parts_list[i]
            enc.device_mb_headers = True
        y, u, v = planes[i]
        enc._analysis_arrays = lambda a=arrays_list[i]: dict(a)
        return enc.encode_yuv(y, u, v, w, h)

    return list(_host_pool().map(one, range(len(planes))))


def encode_frames_lossy_batch_mixed(rgbs, quality: int = 75, method: int = 4,
                                    two_pass: bool = True,
                                    segments: bool = False) -> list:
    """Batched encode for frames of MIXED geometries: one batched device
    dispatch per (h, w) bucket (each compiles once), results in input order."""
    groups = {}
    for i, im in enumerate(rgbs):
        groups.setdefault(im.shape[:2], []).append(i)
    out = [None] * len(rgbs)
    for _, idxs in groups.items():
        res = encode_frames_lossy_batch(
            [rgbs[i] for i in idxs], quality, method, two_pass, segments
        )
        for j, i in enumerate(idxs):
            out[i] = res[j]
    return out
