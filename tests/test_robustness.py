"""Malformed-input robustness: decoding arbitrary/corrupted bytes must raise
`WebPError` (never crash, hang, or allocate unboundedly) — the fuzz contract
from the reference's cargo-fuzz targets (SURVEY §4.5)."""

import numpy as np
import pytest

import webp_tpu
from webp_tpu import WebPDecoder
from webp_tpu.errors import WebPError


def try_decode(data):
    try:
        d = WebPDecoder(data)
        if d.is_animated():
            for _ in range(min(d.num_frames, 4)):
                d.read_frame()
        else:
            d.read_image()
    except WebPError:
        pass
    except (ValueError, IndexError, OverflowError, ZeroDivisionError) as e:
        # Native fast paths surface ValueError; anything else is a bug.
        if not isinstance(e, ValueError):
            raise


def test_random_bytes():
    rng = np.random.RandomState(0)
    for n in (0, 1, 11, 64, 512):
        for _ in range(8):
            try_decode(rng.bytes(n))


def test_truncated_valid_files(fixtures):
    for rel in ("gallery1/1.webp", "gallery2/1_webp_ll.webp", "gallery2/1_webp_a.webp"):
        data = (fixtures / rel).read_bytes()
        for cut in (10, 20, 50, len(data) // 4, len(data) // 2, len(data) - 1):
            try_decode(data[:cut])


def test_bitflipped_files(fixtures):
    rng = np.random.RandomState(1)
    for rel in ("gallery1/1.webp", "gallery2/1_webp_ll.webp"):
        data = bytearray((fixtures / rel).read_bytes())
        for _ in range(6):
            corrupted = bytearray(data)
            for _ in range(4):
                pos = rng.randint(12, len(data))
                corrupted[pos] ^= 1 << rng.randint(8)
            try_decode(bytes(corrupted))


def test_header_variants():
    # RIFF with bogus sizes and unknown chunks.
    base = b"RIFF" + (1 << 30).to_bytes(4, "little") + b"WEBP"
    try_decode(base)
    try_decode(base + b"XXXX" + (8).to_bytes(4, "little") + b"\x00" * 8)
    try_decode(base + b"VP8 " + (0).to_bytes(4, "little"))
    try_decode(base + b"VP8L" + (1).to_bytes(4, "little") + b"\x2f")
    try_decode(base + b"VP8X" + (10).to_bytes(4, "little") + b"\x00" * 10)


def test_memory_limit(fixtures):
    data = (fixtures / "gallery1" / "1.webp").read_bytes()
    d = WebPDecoder(data)
    d.set_memory_limit(4)  # far smaller than the VP8 chunk
    with pytest.raises(WebPError):
        d.read_image()
