"""LSB-first bit reader for VP8L streams.

Semantics match the reference 64-bit `BitReader`
(`/root/reference/src/decoder/lossless.rs:722-799`): `fill()` tops the buffer
up from the byte stream, `peek(n)` returns the low n bits, `consume(n)` errors
only when fewer than n bits remain in the whole stream. Pure-Python host
implementation; the C++ fast path supersedes it on the hot decode loop.
"""

from __future__ import annotations

from ..errors import BitstreamError


class LsbBitReader:
    __slots__ = ("data", "pos", "acc", "nbits")

    def __init__(self, data):
        self.data = bytes(data)
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def fill(self) -> None:
        """Top up the accumulator to >=56 bits or end-of-stream."""
        data, pos, nbits = self.data, self.pos, self.nbits
        if pos + 8 <= len(data):
            lookahead = int.from_bytes(data[pos : pos + 8], "little")
            take = (63 - nbits) >> 3
            self.acc |= (lookahead << nbits) & 0xFFFFFFFFFFFFFFFF
            self.pos = pos + take
            self.nbits = nbits | 56
        else:
            acc = self.acc
            while pos < len(data) and nbits < 56:
                acc |= data[pos] << nbits
                nbits += 8
                pos += 1
            self.acc, self.pos, self.nbits = acc, pos, nbits

    def peek(self, n: int) -> int:
        return self.acc & ((1 << n) - 1)

    def peek_full(self) -> int:
        return self.acc

    def consume(self, n: int) -> None:
        if self.nbits < n:
            raise BitstreamError("out of bits")
        self.acc >>= n
        self.nbits -= n

    def read_bits(self, n: int) -> int:
        if self.nbits < n:
            self.fill()
        v = self.acc & ((1 << n) - 1)
        self.consume(n)
        return v
