"""Device lane-parallel boolean encoder vs the host BoolEncoder.

The device kernel (ops/boolenc2.py) must produce byte-identical streams for
arbitrary (bit, prob) op sequences, including carry chains through 0xFF
runs and the prepend-0x01 overflow — the carry-lookahead reformulation is
only correct if it is EXACTLY base-256 addition.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from webp_tpu.encode.boolenc import BoolEncoder
from webp_tpu.ops.boolenc2 import assemble_lane, bool_encode_lanes


def _host_encode(bits, probs):
    enc = BoolEncoder()
    for b, p in zip(bits, probs):
        enc.write_bool(int(b), int(p))
    return enc.flush()


def _run_lanes(streams, max_bytes=None):
    T = max(len(b) for b, _ in streams)
    L = len(streams)
    bits = np.zeros((T, L), np.int32)
    probs = np.ones((T, L), np.int32)
    valid = np.zeros((T, L), np.int32)
    for l, (b, p) in enumerate(streams):
        bits[: len(b), l] = b
        probs[: len(p), l] = p
        valid[: len(b), l] = 1
    mb = max_bytes or (T // 4 + 16)
    lead, data, n, (bottom, rng, bit_num) = bool_encode_lanes(
        jnp.asarray(bits), jnp.asarray(probs), jnp.asarray(valid), mb
    )
    lead, data, n = np.asarray(lead), np.asarray(data), np.asarray(n)
    bottom, bit_num = np.asarray(bottom), np.asarray(bit_num)
    assert (n <= mb).all(), "max_bytes too small for test"
    return [
        assemble_lane(int(lead[l]), data[l], int(n[l]), int(bottom[l]), int(bit_num[l]))
        for l in range(L)
    ]


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_random_streams_match(seed):
    rng = np.random.RandomState(seed)
    streams = []
    for l in range(9):
        nops = int(rng.randint(1, 4000))
        bits = rng.randint(0, 2, nops)
        probs = rng.randint(1, 256, nops)
        streams.append((bits, probs))
    got = _run_lanes(streams)
    for l, (b, p) in enumerate(streams):
        want = _host_encode(b, p)
        assert got[l] == want, f"lane {l} mismatch"


def test_carry_chains_match():
    """Adversarial streams that maximize 0xFF runs and carries: long runs
    of bit=1 at prob 255 / bit=1 at prob 1 and alternations."""
    patterns = [
        (np.ones(3000, int), np.full(3000, 255)),
        (np.ones(3000, int), np.full(3000, 1)),
        (np.ones(2000, int), np.full(2000, 254)),
        (np.tile([1, 1, 1, 0], 700), np.tile([255, 255, 255, 1], 700)),
        (np.zeros(1200, int), np.full(1200, 1)),
        (np.tile([1, 0], 1500), np.tile([128, 128], 1500)),
    ]
    got = _run_lanes(patterns, max_bytes=4096)
    for l, (b, p) in enumerate(patterns):
        want = _host_encode(b, p)
        assert got[l] == want, f"pattern {l} mismatch"


def test_decodes_with_booldec():
    """Sanity: the device-encoded stream round-trips through BoolDecoder."""
    from webp_tpu.io.booldec import BoolDecoder

    rng = np.random.RandomState(7)
    nops = 2500
    bits = rng.randint(0, 2, nops)
    probs = rng.randint(1, 256, nops)
    [data] = _run_lanes([(bits, probs)])
    dec = BoolDecoder(data)
    for i in range(nops):
        assert dec.get_bit(int(probs[i])) == int(bits[i]), i
