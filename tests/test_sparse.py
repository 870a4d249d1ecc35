"""Sparse level-transfer wire format: host<->device pack/expand round trips.

The format (ops/sparse.py) carries the int8-clipped quantized levels as a
nonzero bitmap + compacted values; both the decoder upload and the encoder
download use it (decode/device.py, ops/encode_wavefront2.py).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from webp_tpu.ops import sparse


def _levels_like(rng, n, density):
    flat = np.zeros(n, np.int8)
    nz = rng.rand(n) < density
    flat[nz] = np.clip(rng.laplace(0, 9, nz.sum()), -127, 127).astype(np.int8)
    # laplace(0,9) can round to 0 -> keep only true nonzeros in the mask
    return flat


@pytest.mark.parametrize("density", [0.0, 0.05, 0.23, 0.31])
def test_host_pack_device_expand_roundtrip(density):
    rng = np.random.RandomState(11)
    n = 40 * 400
    cap = sparse.cap_for(40)
    flat = _levels_like(rng, n, density)
    bm, vals, ok = sparse.host_pack_levels(flat, cap)
    assert ok
    got = np.asarray(sparse.device_expand_levels(jnp.asarray(bm[None]), jnp.asarray(vals[None]), n))[0]
    assert np.array_equal(got, flat)
    # host-side expand agrees too
    assert np.array_equal(sparse.host_expand_levels(bm, vals, n), flat)


def test_device_pack_host_expand_roundtrip():
    rng = np.random.RandomState(5)
    n = 24 * 400
    cap = sparse.cap_for(24)
    flats = np.stack([_levels_like(rng, n, d) for d in (0.0, 0.1, 0.3)])
    bm, vals, over = (
        np.asarray(a) for a in sparse.device_pack_levels(jnp.asarray(flats), cap)
    )
    assert not over.any()
    for b in range(len(flats)):
        assert np.array_equal(sparse.host_expand_levels(bm[b], vals[b], n), flats[b])
        # device pack must agree with numpy packbits
        assert np.array_equal(bm[b], np.packbits(flats[b] != 0))


def test_overflow_flags():
    rng = np.random.RandomState(3)
    n = 8 * 400
    cap = sparse.cap_for(8)
    dense = np.ones(n, np.int8)  # 100% density > 32% budget
    _, _, ok = sparse.host_pack_levels(dense, cap)
    assert not ok
    _, _, over = sparse.device_pack_levels(jnp.asarray(dense[None]), cap)
    assert bool(np.asarray(over)[0])
    # exactly-at-cap does not overflow
    flat = np.zeros(n, np.int8)
    flat[rng.choice(n, cap, replace=False)] = 1
    bm, vals, ok = sparse.host_pack_levels(flat, cap)
    assert ok
    got = np.asarray(
        sparse.device_expand_levels(jnp.asarray(bm[None]), jnp.asarray(vals[None]), n)
    )[0]
    assert np.array_equal(got, flat)


def test_device_pack_mb_host_expand_roundtrip():
    rng = np.random.RandomState(9)
    nmb, S, cap_mb = 24, 400, 128
    lv = np.stack(
        [_levels_like(rng, nmb * S, d).reshape(nmb, S) for d in (0.0, 0.1, 0.23)]
    )
    bm, vals, over = (
        np.asarray(a)
        for a in sparse.device_pack_levels_mb(jnp.asarray(lv), cap_mb)
    )
    assert not over.any()
    assert vals.shape == (3, nmb, cap_mb)
    for b in range(len(lv)):
        got = sparse.host_expand_levels_mb(bm[b], vals[b], nmb, S)
        assert np.array_equal(got, lv[b])
        assert np.array_equal(bm[b], np.packbits(lv[b].reshape(-1) != 0))


def test_device_pack_mb_overflow_per_mb():
    nmb, S, cap_mb = 8, 400, 128
    lv = np.zeros((1, nmb, S), np.int8)
    lv[0, 3, : cap_mb + 1] = 5  # one MB over budget
    _, _, over = sparse.device_pack_levels_mb(jnp.asarray(lv), cap_mb)
    assert bool(np.asarray(over)[0])
    lv[0, 3, cap_mb] = 0  # exactly at cap: fine
    bm, vals, over = (
        np.asarray(a)
        for a in sparse.device_pack_levels_mb(jnp.asarray(lv), cap_mb)
    )
    assert not over.any()
    assert np.array_equal(
        sparse.host_expand_levels_mb(bm[0], vals[0], nmb, S), lv[0]
    )


def test_device_pack_mb_extreme_values():
    # +/-127 levels (the escape-clip values) survive the f32 matmul exactly
    nmb, S, cap_mb = 4, 400, 128
    lv = np.zeros((1, nmb, S), np.int8)
    lv[0, :, ::7] = -127
    lv[0, :, ::13] = 127
    bm, vals, over = (
        np.asarray(a)
        for a in sparse.device_pack_levels_mb(jnp.asarray(lv), cap_mb)
    )
    assert not over.any()
    assert np.array_equal(
        sparse.host_expand_levels_mb(bm[0], vals[0], nmb, S), lv[0]
    )
