"""Trellis DP vs a captured libwebp debug trace (VERDICT r2 item 6).

The reference validates its trellis bit-exact against vectors captured from
a libwebp debug log (`/root/reference/src/encoder/cost.rs:2598-2675`).  This
replays the same libwebp trace against our host trellis so a semantic error
shared by the host and device implementations (which are only diffed against
each other elsewhere) would be caught against ground truth.

libwebp trace (I4 AC block, Q such that q=[25,31...]):
  type=3 ctx0=0 lambda=840 first=0
  input (natural order): -282 6 3 -4 -3 -11 -4 -2 5 3 4 -1 2 -2 -3 -1
  q:  25 31 x15        iq: 5242 4228 x15
  last=1 thresh=240 skip_cost=89 skip_score=74760
  init: init_rate=576 init_score=483840
  out: -11 0 0 0 0 0 0 0 0 0 0 0 0 0 0 0
"""

import numpy as np

from webp_tpu.common import vp8_tables as T
from webp_tpu.encode import costs as C
from webp_tpu.encode.costs import bit_cost
from webp_tpu.encode.quant import Matrix
from webp_tpu.encode.trellis import trellis_quantize

LIBWEBP_INPUT = np.array(
    [[-282, 6, 3, -4, -3, -11, -4, -2, 5, 3, 4, -1, 2, -2, -3, -1]], np.int32
)
LIBWEBP_OUT = np.array([-11] + [0] * 15, np.int32)
LAMBDA = 840
CTYPE = 3  # I4 AC (luma without Y2)
CTX0 = 0
FIRST = 0


def test_trellis_matches_libwebp_trace():
    mtx = Matrix(25, 31, "y1")
    # The trace's matrix: iq must reproduce libwebp's integer values exactly.
    assert mtx.iq[0] == 5242 and mtx.iq[1] == 4228
    assert int(mtx.q[1]) * int(mtx.q[1]) // 4 == 240  # last-coefficient thresh

    lc = C.cached_level_costs(T.COEFF_PROBS_DEFAULT)
    # Intermediate scores from the trace: skip (EOB at first) and init rates.
    skip_cost = int(bit_cost(False, lc.p0[CTYPE, FIRST, CTX0]))
    init_rate = int(bit_cost(True, lc.p0[CTYPE, FIRST, CTX0]))
    assert skip_cost == 89
    assert skip_cost * LAMBDA == 74760
    assert init_rate == 576
    assert init_rate * LAMBDA == 483840

    out, has_nz = trellis_quantize(
        LIBWEBP_INPUT, mtx, LAMBDA, FIRST, lc, CTYPE, np.array([CTX0])
    )
    np.testing.assert_array_equal(out[0], LIBWEBP_OUT)
    assert bool(has_nz[0])
