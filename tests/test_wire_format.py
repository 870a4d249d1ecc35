"""Coalesced int4 d2h wire format: device pack <-> host expand round trip.

The encode analysis ships its levels over an uncompressed ~15-35 MB/s
tunnel, so the wire packs them to 4 bits with per-MB med escapes (|v|>7)
and an image-level |v|>127 escape list (ops/encode_wavefront2._wire_stage).
These tests pin byte-exact reconstruction through both the native C++ and
the numpy expanders, plus the overflow flags.
"""

import numpy as np
import pytest

pytest.importorskip("jax")
import jax.numpy as jnp

from webp_tpu.ops.encode_wavefront2 import (
    CAP_MB,
    MED_CAP,
    N_ESC,
    _numpy_wire_expand,
    _wire_stage,
    split_wire,
    unpack_analysis_wire,
    wire_bytes,
)
from webp_tpu.ops import sparse

rng = np.random.RandomState(0)


def _mk_levels(B, nmb, esc_per_img=3, med_rate=0.02):
    lv = np.zeros((B, nmb, 400), np.int32)
    for b in range(B):
        for m in range(nmb):
            n = rng.choice([0, 5, 90, 200, 256])
            pos = rng.choice(400, n, replace=False)
            mag = rng.choice([1, 1, 1, 1, 2, 2, 3], n)
            hot = rng.rand(n) < med_rate
            mag = np.where(hot, rng.randint(8, 100, n), mag)
            lv[b, m, pos] = mag * rng.choice([-1, 1], n)
        for _ in range(esc_per_img):
            m = rng.randint(nmb)
            lv[b, m, rng.randint(400)] = rng.choice([-1, 1]) * rng.randint(128, 900)
    return lv


def _mk_escapes(lv):
    B, nmb, _ = lv.shape
    esc_pos = np.full((B, nmb, N_ESC), -1, np.int16)
    esc_val = np.zeros((B, nmb, N_ESC), np.int16)
    for b in range(B):
        for m in range(nmb):
            big = np.flatnonzero(np.abs(lv[b, m]) > 127)
            esc_pos[b, m, : len(big)] = big
            esc_val[b, m, : len(big)] = lv[b, m, big]
    return esc_pos, esc_val


def test_wire_round_trip_exact():
    B, nmb = 3, 42
    lv = _mk_levels(B, nmb)
    lv8 = np.clip(lv, -128, 127).astype(np.int8)
    meta8 = rng.randint(0, 5, (B, nmb, 18)).astype(np.uint8)
    esc_pos, esc_val = _mk_escapes(lv)
    over = np.zeros(B, bool)
    w = np.asarray(
        _wire_stage(
            jnp.asarray(lv8), jnp.asarray(meta8), jnp.asarray(esc_pos),
            jnp.asarray(esc_val), jnp.asarray(over),
        )
    )
    assert w.shape[1] == wire_bytes(nmb)
    for b in range(B):
        assert not w[b, 0] and not w[b, 1]
        arrs = unpack_analysis_wire(w[b], nmb)
        got = np.concatenate(
            [
                arrs["y_levels"].reshape(nmb, 256),
                arrs["uv_levels"].reshape(nmb, 128),
                arrs["y2_levels"],
            ],
            axis=1,
        )
        np.testing.assert_array_equal(got, lv[b])
        np.testing.assert_array_equal(arrs["bpred"], meta8[b, :, :16])


def test_native_expand_matches_numpy():
    from webp_tpu.io import native

    if not native.available():
        pytest.skip("native library unavailable")
    nmb = 30
    lv = _mk_levels(1, nmb)[0]
    lv8 = np.clip(lv, -128, 127).astype(np.int8)
    bm, vals, ok = sparse.host_pack_levels_mb(lv8.reshape(-1), nmb, 400, CAP_MB)
    assert ok
    nib = vals.astype(np.int32) & 0xF
    vals4 = (nib[:, 0::2] | (nib[:, 1::2] << 4)).astype(np.uint8)
    med_idx = np.zeros((nmb, MED_CAP), np.uint8)
    med_val = np.zeros((nmb, MED_CAP), np.int8)
    for m in range(nmb):
        ks = np.flatnonzero(np.abs(vals[m].astype(np.int32)) > 7)
        med_idx[m, : len(ks)] = ks
        med_val[m, : len(ks)] = vals[m, ks]
    a = native.wire_expand_levels(bm, vals4, med_idx, med_val, nmb)
    b = _numpy_wire_expand(bm, vals4, med_idx, med_val, nmb)
    np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(a, np.clip(lv, -128, 127).astype(np.int16))


def test_overflow_flags():
    B, nmb = 1, 8
    # Every nonzero is a med escape -> med rank blows past MED_CAP.
    lv = np.zeros((B, nmb, 400), np.int32)
    lv[0, 0, :80] = 50
    lv8 = lv.astype(np.int8)
    meta8 = np.zeros((B, nmb, 18), np.uint8)
    esc_pos = np.full((B, nmb, N_ESC), -1, np.int16)
    esc_val = np.zeros((B, nmb, N_ESC), np.int16)
    w = np.asarray(
        _wire_stage(
            jnp.asarray(lv8), jnp.asarray(meta8), jnp.asarray(esc_pos),
            jnp.asarray(esc_val), jnp.asarray(np.zeros(B, bool)),
        )
    )
    sp_over, overflow, *_ = split_wire(w[0], nmb)
    assert sp_over and not overflow
