"""VP8 boolean (arithmetic) encoder — RFC 6386 §7.3.

Carry-propagating range coder; round-trips exactly against
`webp_tpu.io.booldec.BoolDecoder`. Parity reference:
`/root/reference/src/encoder/arithmetic.rs:19-195`.

Tree writing uses precomputed paths (value -> [(bit, node_index)...]) built
once per tree shape, instead of the reference's per-call backward walk.
"""

from __future__ import annotations


def tree_paths(tree) -> dict:
    """Map each leaf value to its ((bit, prob_node) ...) path from a start
    index. Returns {start_index: {value: path}} for all even start indices."""
    paths = {}

    def walk(i, prefix, out):
        for bit in (0, 1):
            t = tree[i + bit]
            path = prefix + ((bit, i >> 1),)
            if t <= 0:
                out[-t] = path
            else:
                walk(t, path, out)

    # Start index 0 is the full tree; index 2 skips the first branch (used by
    # the DCT token tree when EOB cannot occur).
    for start in range(0, len(tree), 2):
        out = {}
        walk(start, (), out)
        paths[start] = out
    return paths


class BoolEncoder:
    def __init__(self):
        self.out = bytearray()
        self.bottom = 0
        self.range = 255
        self.bit_num = 24

    def _carry(self):
        i = len(self.out) - 1
        while i >= 0:
            if self.out[i] < 255:
                self.out[i] += 1
                return
            self.out[i] = 0
            i -= 1
        self.out[0:0] = b"\x01"

    def write_bool(self, bit, prob: int):
        split = 1 + (((self.range - 1) * prob) >> 8)
        if bit:
            self.bottom += split
            self.range -= split
        else:
            self.range = split
        while self.range < 128:
            self.range <<= 1
            if self.bottom & (1 << 31):
                self._carry()
            self.bottom = (self.bottom << 1) & 0xFFFFFFFF
            self.bit_num -= 1
            if self.bit_num == 0:
                self.out.append((self.bottom >> 24) & 0xFF)
                self.bottom &= (1 << 24) - 1
                self.bit_num = 8

    def write_flag(self, flag):
        self.write_bool(1 if flag else 0, 128)

    def write_literal(self, num_bits: int, value: int):
        for bit in range(num_bits - 1, -1, -1):
            self.write_bool((value >> bit) & 1, 128)

    def write_optional_signed(self, num_bits: int, value: int, present: bool = None):
        """Matches decoder get_optional_signed: flag, |v|, sign(1=negative)."""
        if present is None:
            present = value != 0
        self.write_flag(present)
        if present:
            self.write_literal(num_bits, abs(value))
            self.write_flag(value < 0)

    def write_with_path(self, path, probs):
        for bit, node in path:
            self.write_bool(bit, int(probs[node]))

    def flush(self) -> bytes:
        c = self.bit_num
        v = self.bottom
        if v & (1 << (32 - c)):
            self._carry()
        v = (v << (c & 7)) & 0xFFFFFFFF
        c = (c >> 3) - 1
        while c >= 0:
            v = (v << 8) & 0xFFFFFFFF
            c -= 1
        for _ in range(4):
            self.out.append((v >> 24) & 0xFF)
            v = (v << 8) & 0xFFFFFFFF
        return bytes(self.out)
