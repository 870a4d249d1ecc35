"""Canonical Huffman decoding for VP8L (L2 entropy layer).

Builds a single flat lookup table per tree: index = next `max_len` stream bits
(LSB-first), entry = (code_length << 16) | symbol. This trades memory
(<= 2^15 entries) for a branch-free decode, a better fit for later batch/C++
ports than the reference's two-level table
(`/root/reference/src/decoder/huffman.rs:47-174`). Codespace validation
(exactly-full Kraft sum) matches the reference.
"""

from __future__ import annotations

import numpy as np

from ..errors import BitstreamError

MAX_CODE_LENGTH = 15


def _bit_reverse(code: int, length: int) -> int:
    r = 0
    for _ in range(length):
        r = (r << 1) | (code & 1)
        code >>= 1
    return r


class HuffmanTable:
    """Decoder for one canonical-Huffman alphabet.

    ``single`` trees decode to a fixed symbol consuming zero bits (used by the
    1-symbol "simple" tree encoding and degenerate implicit trees).
    """

    __slots__ = ("single", "lut", "max_len")

    def __init__(self, single=None, lut=None, max_len=0):
        self.single = single
        self.lut = lut
        self.max_len = max_len

    @classmethod
    def from_single(cls, symbol: int) -> "HuffmanTable":
        return cls(single=symbol)

    @classmethod
    def from_pair(cls, zero: int, one: int) -> "HuffmanTable":
        lut = np.array([(1 << 16) | zero, (1 << 16) | one], dtype=np.uint32)
        return cls(lut=lut, max_len=1)

    @classmethod
    def from_code_lengths(cls, code_lengths) -> "HuffmanTable":
        lengths = np.asarray(code_lengths, dtype=np.int64)
        nonzero = np.flatnonzero(lengths)
        if nonzero.size == 0:
            raise BitstreamError("huffman tree with no symbols")
        if nonzero.size == 1:
            return cls.from_single(int(nonzero[0]))
        if lengths.max() > MAX_CODE_LENGTH:
            raise BitstreamError("code length exceeds 15")

        hist = np.bincount(lengths[nonzero], minlength=MAX_CODE_LENGTH + 1)
        max_len = int(np.max(lengths))

        # Kraft check: the code must fill the codespace exactly.
        used = 0
        for l in range(1, max_len + 1):
            used = (used << 1) + int(hist[l])
        if used != (1 << max_len):
            raise BitstreamError("invalid huffman code (over/under-subscribed)")

        # Canonical MSB-first code assignment, then bit-reversed into the
        # LSB-first lookup table with stride fills.
        first_code = np.zeros(MAX_CODE_LENGTH + 2, dtype=np.int64)
        code = 0
        for l in range(1, max_len + 1):
            first_code[l] = code
            code = (code + int(hist[l])) << 1

        lut = np.zeros(1 << max_len, dtype=np.uint32)
        next_code = first_code.copy()
        for sym in nonzero:
            l = int(lengths[sym])
            c = int(next_code[l])
            next_code[l] += 1
            rev = _bit_reverse(c, l)
            lut[rev :: 1 << l] = (l << 16) | int(sym)
        return cls(lut=lut, max_len=max_len)

    @property
    def is_single(self) -> bool:
        return self.single is not None

    def read_symbol(self, br) -> int:
        if self.single is not None:
            return self.single
        entry = int(self.lut[br.acc & ((1 << self.max_len) - 1)])
        br.consume(entry >> 16)
        return entry & 0xFFFF

    def peek_symbol(self, br):
        """(length, symbol) without consuming; None only for safety parity."""
        if self.single is not None:
            return (0, self.single)
        entry = int(self.lut[br.acc & ((1 << self.max_len) - 1)])
        return (entry >> 16, entry & 0xFFFF)
