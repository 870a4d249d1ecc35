"""Device trellis DP must match the host int64 implementation bit-exactly."""

import numpy as np
import pytest

pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from webp_tpu.common import vp8_tables as T
from webp_tpu.encode import costs as C
from webp_tpu.encode.quant import SegmentParams, quality_to_quant_index
from webp_tpu.encode.trellis import trellis_quantize
from webp_tpu.ops.encode_wavefront import EncTables
from webp_tpu.ops.trellis2 import trellis_par

ZZ = np.asarray(T.ZIGZAG)


def _zzvec(mtx, attr):
    v = np.empty(16, np.int64)
    v[:] = getattr(mtx, attr)[1]
    v[0] = getattr(mtx, attr)[0]
    return v


@pytest.mark.parametrize("unroll", [False, True])
@pytest.mark.parametrize("q", [10, 75])
@pytest.mark.parametrize("ctype,first,lam_attr,mtx_attr", [
    (0, 1, "lambda_trellis_i16", "y1"),
    (3, 0, "lambda_trellis_i4", "y1"),
    (2, 0, "lambda_trellis_i4", "uv"),
])
def test_trellis_par_matches_host(q, ctype, first, lam_attr, mtx_attr, unroll):
    qi = quality_to_quant_index(q)
    seg = SegmentParams(qi)
    mtx = getattr(seg, mtx_attr)
    lam = getattr(seg, lam_attr)
    lc = C.cached_level_costs(T.COEFF_PROBS_DEFAULT)
    tbl = EncTables.default()

    rng = np.random.RandomState(hash((q, ctype)) & 0xFFFF)
    N = 96
    blocks = []
    for mag in (2, 12, 120, 1500, 12000):
        b = rng.randint(-mag, mag + 1, (N // 6, 16))
        b[rng.rand(*b.shape) < 0.4] = 0
        blocks.append(b)
    blocks.append(np.zeros((N - 5 * (N // 6), 16), np.int64))
    coeffs = np.concatenate(blocks).astype(np.int32)
    ctx0 = rng.randint(0, 3, len(coeffs))

    want_lv, want_nz = trellis_quantize(
        coeffs.astype(np.int64), mtx, lam, first, lc, ctype, ctx0
    )

    got_lv, got_nz = trellis_par(
        jnp.asarray(coeffs),
        jnp.asarray(_zzvec(mtx, "q").astype(np.int32)),
        jnp.asarray(_zzvec(mtx, "iq").astype(np.int32)),
        jnp.asarray(mtx.sharpen[ZZ].astype(np.int32)),
        int(lam), ctype, first, jnp.asarray(ctx0.astype(np.int32)),
        tbl.cls_cost[ctype], tbl.eob_cost[ctype], tbl.init_cost[ctype],
        unroll=unroll,
    )
    np.testing.assert_array_equal(np.asarray(got_lv), want_lv)
    np.testing.assert_array_equal(np.asarray(got_nz), want_nz)


@pytest.mark.parametrize("q", [10, 75])
def test_trellis_spec3_matches_per_ctx(q):
    """The 3-way speculative DP must equal trellis_par run per ctx0."""
    from webp_tpu.ops.trellis2 import trellis_spec3

    qi = quality_to_quant_index(q)
    seg = SegmentParams(qi)
    tbl = EncTables.default()
    rng = np.random.RandomState(q)
    coeffs = rng.randint(-900, 900, (40, 16))
    coeffs[rng.rand(40, 16) < 0.4] = 0
    coeffs = coeffs.astype(np.int32)
    args = (
        jnp.asarray(_zzvec(seg.y1, "q").astype(np.int32)),
        jnp.asarray(_zzvec(seg.y1, "iq").astype(np.int32)),
        jnp.asarray(seg.y1.sharpen[ZZ].astype(np.int32)),
        int(seg.lambda_trellis_i16), 0, 1,
    )
    lv3, nz3 = trellis_spec3(
        jnp.asarray(coeffs), *args,
        tbl.cls_cost[0], tbl.eob_cost[0], tbl.init_cost[0],
    )
    for c in range(3):
        want_lv, want_nz = trellis_par(
            jnp.asarray(coeffs), *args, jnp.full(40, c, jnp.int32),
            tbl.cls_cost[0], tbl.eob_cost[0], tbl.init_cost[0],
        )
        np.testing.assert_array_equal(np.asarray(lv3[:, c]), np.asarray(want_lv))
        np.testing.assert_array_equal(np.asarray(nz3[:, c]), np.asarray(want_nz))
