"""RIFF chunk vocabulary and header reading for the WebP container (L5).

Behavioral parity with `/root/reference/src/decoder/api.rs:144-197` (chunk enum)
and `:914-921` (chunk header). RIFF chunks are fourcc + u32le payload size; odd
payloads are padded by one byte.
"""

from __future__ import annotations

from ..io.cursor import Cursor
from ..errors import ChunkHeaderInvalid

# Known fourccs
RIFF = b"RIFF"
WEBP = b"WEBP"
VP8 = b"VP8 "
VP8L = b"VP8L"
VP8X = b"VP8X"
ANIM = b"ANIM"
ANMF = b"ANMF"
ALPH = b"ALPH"
ICCP = b"ICCP"
EXIF = b"EXIF"
XMP = b"XMP "

KNOWN_CHUNKS = {RIFF, WEBP, VP8, VP8L, VP8X, ANIM, ANMF, ALPH, ICCP, EXIF, XMP}


def is_known(fourcc: bytes) -> bool:
    return fourcc in KNOWN_CHUNKS


def read_chunk_header(cur: Cursor) -> tuple[bytes, int, int]:
    """Read (fourcc, size, size_rounded_to_even) from the cursor."""
    fourcc = cur.read_fourcc()
    size = cur.read_u32_le()
    return fourcc, size, size + (size & 1)


def expect_chunk(cur: Cursor, fourcc: bytes) -> tuple[int, int]:
    got, size, rounded = read_chunk_header(cur)
    if got != fourcc:
        raise ChunkHeaderInvalid(f"expected {fourcc!r}, got {got!r}")
    return size, rounded
