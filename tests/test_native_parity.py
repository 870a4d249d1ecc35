"""Native C++ hot paths vs their Python fallbacks (ADVICE r3, medium).

The VP8L encoder dispatches three hot loops to native/vp8l.cpp when the .so
is buildable (webp_tpu/encode/vp8l.py); in that environment the Python
fallbacks are never exercised (and vice versa), so any drift would silently
change emitted bitstreams between environments.  These tests run both sides
on the same seeded-random inputs — including the tricky cases named in the
advisory: limit-overflow Huffman histograms, last-column TR pixels, and
w==1 / h==1 edges.
"""

import numpy as np
import pytest

from webp_tpu.encode.vp8l import _cache_hits, _pick_predictors, build_code_lengths
from webp_tpu.io import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable"
)


def _kraft_ok(lengths, limit):
    used = lengths[lengths > 0]
    assert used.max(initial=0) <= limit
    assert np.sum(2.0 ** -used.astype(np.float64)) <= 1.0 + 1e-12


def test_huffman_lengths_random():
    rng = np.random.RandomState(42)
    for trial in range(60):
        limit = int(rng.choice([4, 7, 15]))
        # keep inputs in-contract: a depth<=limit code must exist, i.e. at
        # most 2^limit used symbols (the codec guarantees this: limit 7 is
        # only used for the 19-symbol code-length alphabet)
        n = int(rng.randint(2, 300))
        freqs = rng.randint(0, 1000, size=n).astype(np.int64)
        freqs[rng.rand(n) < rng.rand()] = 0
        used = np.flatnonzero(freqs)
        cap = 1 << limit
        if len(used) > cap:
            freqs[used[cap:]] = 0
        py = build_code_lengths(freqs, limit, allow_native=False)
        nat = build_code_lengths(freqs, limit, allow_native=True)
        assert np.array_equal(py, nat), (trial, n, limit)
        if (freqs > 0).sum() > 1:
            _kraft_ok(py, limit)


def test_huffman_lengths_infeasible_raises():
    # >2^limit used symbols: no valid code exists; both sides must refuse
    # (the native side used to walk counts[] out of bounds here).
    freqs = np.ones(40, np.int64)
    with pytest.raises(ValueError):
        build_code_lengths(freqs, 4, allow_native=False)
    with pytest.raises(ValueError):
        native.vp8l_huffman_lengths(freqs[None], np.array([0, 40]), 4)


def test_huffman_lengths_limit_overflow():
    # Exponential histogram: unconstrained Huffman depth ~n, forcing the
    # length-limited Kraft fixup on both sides.
    for n in (16, 24, 40):
        freqs = (2 ** np.arange(n, dtype=np.float64)).astype(np.int64)
        for limit in (7, 15):
            py = build_code_lengths(freqs, limit, allow_native=False)
            nat = build_code_lengths(freqs, limit, allow_native=True)
            assert np.array_equal(py, nat), (n, limit)
            _kraft_ok(py, limit)


def test_huffman_lengths_segmented_native_matches_python_segments():
    # The native entry takes [K, A] histograms with segment offsets; the
    # python builder works one segment at a time.  Compare per segment.
    rng = np.random.RandomState(7)
    A = 280 + 256 * 3 + 40
    offs = np.array([0, 280, 536, 792, 1048, 1088], np.int32)
    hist = rng.randint(0, 200, size=(3, A)).astype(np.int64)
    hist[rng.rand(*hist.shape) < 0.6] = 0
    nat = native.vp8l_huffman_lengths(hist, offs, 15)
    for k in range(hist.shape[0]):
        for s, e in zip(offs[:-1], offs[1:]):
            py = build_code_lengths(hist[k, s:e], 15, allow_native=False)
            assert np.array_equal(py, nat[k, s:e].astype(np.int64)), (k, s, e)


def test_cache_hits_random():
    rng = np.random.RandomState(3)
    for bits in (1, 4, 8, 11):
        # small value alphabet so hash buckets collide and repeat
        vals = rng.randint(0, 50, size=2000).astype(np.int64)
        packed = (0xFF000000 | vals * 0x010101).astype(np.int64)
        py_hits, py_hash = _cache_hits(packed, bits, allow_native=False)
        nat_hits, nat_hash = _cache_hits(packed, bits, allow_native=True)
        assert np.array_equal(py_hits, nat_hits), bits
        assert np.array_equal(py_hash, nat_hash), bits


def test_cache_hits_tiny():
    for n in (1, 2, 3):
        packed = np.full(n, 0xFF102030, np.int64)
        py = _cache_hits(packed, 5, allow_native=False)
        nat = _cache_hits(packed, 5, allow_native=True)
        assert np.array_equal(py[0], nat[0]) and np.array_equal(py[1], nat[1])


def _parity_pick(u, w, h, size_bits):
    sb_py, modes_py, res_py = _pick_predictors(u, w, h, size_bits, allow_native=False)
    sb_nat, modes_nat, res_nat = _pick_predictors(u, w, h, size_bits, allow_native=True)
    assert sb_py == sb_nat
    assert np.array_equal(modes_py, modes_nat), (w, h, size_bits)
    assert np.array_equal(res_py & 0xFF, res_nat & 0xFF), (w, h, size_bits)


def test_pick_predictors_random():
    rng = np.random.RandomState(11)
    for w, h in ((64, 48), (33, 17), (8, 8)):
        # smooth-ish content so different predictors actually compete
        u = rng.randint(0, 256, size=(h, w, 4))
        u = (u + np.arange(w)[None, :, None] * 2) % 256
        for size_bits in (2, 4):
            _parity_pick(u, w, h, size_bits)


def test_pick_predictors_edges():
    rng = np.random.RandomState(13)
    # w==1 and h==1 exercise the TR last-column wrap and the forced
    # L-row/T-column predictors with no interior at all.
    for w, h in ((1, 16), (16, 1), (1, 1), (2, 2), (129, 3)):
        u = rng.randint(0, 256, size=(h, w, 4))
        _parity_pick(u, w, h, 2)
