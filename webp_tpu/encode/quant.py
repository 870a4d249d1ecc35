"""Quantization machinery: quality curve, biased quant matrices, per-segment
lambdas, and the filter-level heuristic.

Parity references: `/root/reference/src/encoder/vp8.rs:37-55` (quality curve),
`src/encoder/cost.rs:234-447` (QFIX/bias/quantdiv/VP8Matrix/filter level),
`src/common/types.rs:804-855` (lambda formulas). Matrices are vectorized: a
whole [N, 16] batch of blocks quantizes in one numpy expression (the same
shape the Pallas kernel uses).
"""

from __future__ import annotations

import numpy as np

from ..common import vp8_tables as T
from . import tables as ET

QFIX = 17
RD_DISTO_MULT = 256
MAX_LEVEL = 2047


def rd_score(rate, disto, lam):
    """RD score in distortion units: floor(rate*lambda / 256) + disto.

    Equivalent resolution to libwebp's rate*lambda + 256*disto (divided
    through by 256 with one floor), but fits 32-bit lanes on device; the
    device kernel computes the identical value via a hi/lo split.
    """
    import numpy as _np

    return ((_np.asarray(rate, _np.int64) * lam) >> 8) + disto


def quality_to_quant_index(quality: int) -> int:
    c = quality / 100.0
    linear_c = c * (2.0 / 3.0) if c < 0.75 else 2.0 * c - 1.0
    comp = linear_c ** (1.0 / 3.0) if linear_c > 0 else 0.0
    q = round(127.0 * (1.0 - comp))
    return min(max(int(q), 0), 127)


def _bias(b: int) -> int:
    return ((b << QFIX) + 128) >> 8


FSTRENGTH_CUTOFF = 2


def compute_filter_level(quant_index: int, sharpness: int = 0, strength: int = 60,
                         beta: int = 0) -> int:
    """Loop-filter strength from the quantizer (libwebp filter_enc.c
    VP8SetupFilterStrength): base strength from the AC step, scaled by
    5*filter_strength (config default 60) and divided by (256 + beta)
    where beta is the segment's complexity in [0, 255] — busier segments
    get weaker filtering; below the cutoff the segment is not filtered at
    all (libwebp emits 0 for its finest segment at high quality)."""
    level0 = 5 * strength
    qstep = int(ET.VP8_AC_TABLE[quant_index]) >> 2
    base = int(ET.LEVELS_FROM_DELTA[min(sharpness, 7), min(qstep, 63)])
    f = (base * level0) // (256 + beta)
    if f < FSTRENGTH_CUTOFF:
        return 0
    return min(f, 63)


class Matrix:
    """Biased quantization matrix for one plane type ('y1' | 'y2' | 'uv')."""

    BIASES = {"y1": (96, 110), "y2": (96, 108), "uv": (110, 115)}

    def __init__(self, q_dc: int, q_ac: int, kind: str):
        dc_b, ac_b = self.BIASES[kind]
        q = np.full(16, q_ac, np.int64)
        q[0] = q_dc
        iq = (1 << QFIX) // q
        bias = np.full(16, _bias(ac_b), np.int64)
        bias[0] = _bias(dc_b)
        self.q = q
        self.iq = iq
        self.bias = bias
        self.zthresh = ((1 << QFIX) - 1 - bias) // iq
        self.sharpen = np.zeros(16, np.int64)
        if kind == "y1":
            self.sharpen = (ET.VP8_FREQ_SHARPENING.astype(np.int64) * q) >> 11

    def quantize(self, coeffs: np.ndarray) -> np.ndarray:
        """Quantize [..., 16] raster-order coefficient blocks -> levels."""
        c = coeffs.astype(np.int64)
        sign = c < 0
        level = (np.abs(c) * self.iq + self.bias) >> QFIX
        return np.where(sign, -level, level).astype(np.int32)

    def dequantize(self, levels: np.ndarray) -> np.ndarray:
        return (levels.astype(np.int64) * self.q).astype(np.int32)

    @property
    def avg_q(self) -> int:
        return int((self.q.sum() + 8) >> 4)


# Global chroma-DC quant boost (a header-level uvdc_delta): U/V DC blocks
# react badly to coarse quants (flat-chroma blocking), so chroma DC runs two
# index steps finer than luma. libwebp derives the same -2 from
# -4 * sns_strength/100 with its default sns=50 (our fixed tlambda strength);
# the reference leaves all uv deltas unwired (vp8.rs:154,455 always None).
DQ_UV_DC = -2


class SegmentParams:
    """Quantizers, matrices, and RD lambdas for one segment."""

    def __init__(self, quant_index: int, quantizer_delta: int = 0,
                 uv_ac_delta: int = 0, uv_dc_delta: int = None):
        qi = min(max(quant_index + quantizer_delta, 0), 127)
        self.quant_index = qi
        self.quantizer_level = quantizer_delta
        self.uv_ac_delta = uv_ac_delta
        self.uv_dc_delta = DQ_UV_DC if uv_dc_delta is None else uv_dc_delta
        self.lf_level = None  # per-segment loop-filter strength (setup_segments)
        self.ydc = int(T.DC_QUANT[qi])
        self.yac = int(T.AC_QUANT[qi])
        self.y2dc = int(T.DC_QUANT[qi]) * 2
        self.y2ac = max(int(T.AC_QUANT[qi]) * 155 // 100, 8)
        uvdc_i = min(max(qi + self.uv_dc_delta, 0), 127)
        uvac_i = min(max(qi + uv_ac_delta, 0), 127)
        # Clamped to 132 to stay consistent with decoder dequantization.
        self.uvdc = min(int(T.DC_QUANT[uvdc_i]), 132)
        self.uvac = int(T.AC_QUANT[uvac_i])

        self.y1 = Matrix(self.ydc, self.yac, "y1")
        self.y2 = Matrix(self.y2dc, self.y2ac, "y2")
        self.uv = Matrix(self.uvdc, self.uvac, "uv")

        q_i4 = (self.ydc + 15 * self.yac + 8) >> 4
        q_i16 = (self.y2dc + 15 * self.y2ac + 8) >> 4
        q_uv = (self.uvdc + 15 * self.uvac + 8) >> 4
        self.lambda_trellis_i4 = max((7 * q_i4 * q_i4) >> 3, 1)
        self.lambda_trellis_i16 = max((q_i16 * q_i16) >> 2, 1)
        self.lambda_trellis_uv = max((q_uv * q_uv) << 1, 1)
        self.lambda_i4 = max((3 * q_i4 * q_i4) >> 7, 1)
        self.lambda_i16 = max(3 * q_i16 * q_i16, 1)
        self.lambda_uv = max((3 * q_uv * q_uv) >> 6, 1)
        self.lambda_mode = max((q_i4 * q_i4) >> 7, 1)
        self.tlambda = (50 * q_i4) >> 5  # sns_strength=50
