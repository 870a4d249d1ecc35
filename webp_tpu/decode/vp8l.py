"""VP8L (lossless WebP) decoder core.

Host-side entropy decode producing an ARGB pixel tensor, followed by inverse
transforms (see `webp_tpu.ops.vp8l_transforms`). Bitstream semantics match the
reference decoder (`/root/reference/src/decoder/lossless.rs:92-719`) and the
public VP8L specification; this is a fresh implementation, not a translation.

Layout note: pixels are carried as a flat uint8 array [h*w*4] in R,G,B,A byte
order (matching the output format), with the "green" channel at byte 1.
"""

from __future__ import annotations

import numpy as np

from ..errors import BitstreamError, InconsistentImageSizes, InvalidSignature
from ..io.bitreader import LsbBitReader
from .huffman import HuffmanTable
from ..ops import vp8l_transforms as vt

CODE_LENGTH_CODES = 19
# Order in which code-length-code lengths are stored (VP8L spec §"Code lengths").
CODE_LENGTH_CODE_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

GREEN, RED, BLUE, ALPHA, DIST = range(5)
ALPHABET_SIZE = (256 + 24, 256, 256, 256, 40)

# 2D short-distance map: distance codes 1..120 address a neighborhood around
# the current pixel (VP8L spec; reference lossless.rs:26-42).
DISTANCE_MAP = (
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
)


def subsample_size(size: int, bits: int) -> int:
    return (size + (1 << bits) - 1) >> bits


class ColorCache:
    __slots__ = ("bits", "cache")

    def __init__(self, bits: int):
        self.bits = bits
        self.cache = np.zeros((1 << bits, 4), dtype=np.uint8)

    def insert(self, r: int, g: int, b: int, a: int) -> None:
        argb = (int(a) << 24) | (int(r) << 16) | (int(g) << 8) | int(b)
        idx = ((0x1E35A7BD * argb) & 0xFFFFFFFF) >> (32 - self.bits)
        self.cache[idx] = (r, g, b, a)

    def lookup(self, index: int) -> np.ndarray:
        return self.cache[index]


class _HuffmanInfo:
    __slots__ = ("xsize", "color_cache", "image", "bits", "mask", "groups")

    def __init__(self, xsize, color_cache, image, bits, mask, groups):
        self.xsize = xsize
        self.color_cache = color_cache
        self.image = image  # np.uint16 per meta-block group index, or None
        self.bits = bits
        self.mask = mask
        self.groups = groups  # list of 5-tuples of HuffmanTable

    def group_at(self, x: int, y: int):
        if self.bits == 0:
            return self.groups[0]
        pos = (y >> self.bits) * self.xsize + (x >> self.bits)
        return self.groups[self.image[pos]]


class LosslessDecoder:
    def __init__(self, data):
        self.br = LsbBitReader(data)
        self.transforms = {}
        self.transform_order = []
        self.width = 0
        self.height = 0

    def decode_entropy(self, width: int, height: int, implicit_dims: bool):
        """Run header/transform/entropy decode WITHOUT applying the inverse
        transforms. Returns (data flat [h*tw*4], transformed_width); the
        transform list is left on self.transform_order / self.transforms.
        The device pipeline (decode/vp8l_device.py) applies the transforms
        batched on the accelerator."""
        if implicit_dims:
            self.width, self.height = width, height
        else:
            if self.br.read_bits(8) != 0x2F:
                raise InvalidSignature("bad VP8L signature byte")
            self.width = self.br.read_bits(14) + 1
            self.height = self.br.read_bits(14) + 1
            if self.width != width or self.height != height:
                raise InconsistentImageSizes("VP8L header dims mismatch")
            self.br.read_bits(1)  # alpha hint
            if self.br.read_bits(3) != 0:
                raise InvalidSignature("bad VP8L version")

        transformed_width = self._read_transforms()
        data = self._decode_image_stream(transformed_width, self.height, True)
        return data, transformed_width

    def decode(self, width: int, height: int, implicit_dims: bool) -> np.ndarray:
        """Decode to a flat [h*w*4] uint8 RGBA array."""
        data, transformed_width = self.decode_entropy(width, height, implicit_dims)
        width_now = transformed_width
        for t in reversed(self.transform_order):
            kind, payload = self.transforms[t]
            if kind == "predictor":
                size_bits, pred_data = payload
                vt.inverse_predictor(data, width_now, self.height, size_bits, pred_data)
            elif kind == "color":
                size_bits, tf_data = payload
                vt.inverse_color_transform(data, width_now, self.height, size_bits, tf_data)
            elif kind == "subtract_green":
                vt.inverse_subtract_green(data)
            elif kind == "color_index":
                table_size, table = payload
                data = vt.inverse_color_indexing(
                    data, width_now, self.height, self.width, table_size, table
                )
                width_now = self.width
        return data

    # -- transforms --------------------------------------------------------

    def _read_transforms(self) -> int:
        xsize = self.width
        while self.br.read_bits(1) == 1:
            ttype = self.br.read_bits(2)
            if ttype in self.transforms:
                raise BitstreamError("duplicate transform")
            self.transform_order.append(ttype)
            if ttype == 0:  # predictor
                size_bits = self.br.read_bits(3) + 2
                bw = subsample_size(xsize, size_bits)
                bh = subsample_size(self.height, size_bits)
                sub = self._decode_image_stream(bw, bh, False)
                self.transforms[ttype] = ("predictor", (size_bits, sub))
            elif ttype == 1:  # color
                size_bits = self.br.read_bits(3) + 2
                bw = subsample_size(xsize, size_bits)
                bh = subsample_size(self.height, size_bits)
                sub = self._decode_image_stream(bw, bh, False)
                self.transforms[ttype] = ("color", (size_bits, sub))
            elif ttype == 2:
                self.transforms[ttype] = ("subtract_green", None)
            else:  # color indexing (palette)
                table_size = self.br.read_bits(8) + 1
                table = self._decode_image_stream(table_size, 1, False)
                # Palette entries are delta-coded against the previous entry.
                table = np.cumsum(table.reshape(-1, 4).astype(np.uint32), axis=0).astype(np.uint8)
                if table_size <= 2:
                    bits = 3
                elif table_size <= 4:
                    bits = 2
                elif table_size <= 16:
                    bits = 1
                else:
                    bits = 0
                xsize = subsample_size(xsize, bits)
                self.transforms[ttype] = ("color_index", (table_size, table))
        return xsize

    # -- entropy groups ----------------------------------------------------

    def _decode_image_stream(self, xsize: int, ysize: int, is_argb: bool) -> np.ndarray:
        cache_bits = self._read_color_cache_bits()
        cache = ColorCache(cache_bits) if cache_bits else None
        info = self._read_huffman_codes(is_argb, xsize, ysize, cache)
        return self._decode_image_data(xsize, ysize, info)

    def _read_color_cache_bits(self):
        if self.br.read_bits(1) == 1:
            bits = self.br.read_bits(4)
            if not 1 <= bits <= 11:
                raise BitstreamError(f"invalid color cache bits {bits}")
            return bits
        return None

    def _read_huffman_codes(self, read_meta, xsize, ysize, cache) -> _HuffmanInfo:
        num_groups = 1
        bits = 0
        hx = hy = 1
        entropy_image = None
        if read_meta and self.br.read_bits(1) == 1:
            bits = self.br.read_bits(3) + 2
            hx = subsample_size(xsize, bits)
            hy = subsample_size(ysize, bits)
            sub = self._decode_image_stream(hx, hy, False).reshape(-1, 4)
            # Group index is (R<<8)|G of the entropy image.
            entropy_image = (sub[:, 0].astype(np.uint16) << 8) | sub[:, 1]
            num_groups = int(entropy_image.max()) + 1

        groups = []
        for _ in range(num_groups):
            group = []
            for j in range(5):
                size = ALPHABET_SIZE[j]
                if j == 0 and cache is not None:
                    size += 1 << cache.bits
                group.append(self._read_huffman_code(size))
            groups.append(tuple(group))

        mask = (1 << bits) - 1 if bits else 0xFFFFFFFF
        return _HuffmanInfo(hx, cache, entropy_image, bits, mask, groups)

    def _read_huffman_code(self, alphabet_size: int) -> HuffmanTable:
        if self.br.read_bits(1) == 1:  # simple code
            num_symbols = self.br.read_bits(1) + 1
            first_8bit = self.br.read_bits(1)
            zero_symbol = self.br.read_bits(8 if first_8bit else 1)
            if zero_symbol >= alphabet_size:
                raise BitstreamError("symbol out of alphabet")
            if num_symbols == 1:
                return HuffmanTable.from_single(zero_symbol)
            one_symbol = self.br.read_bits(8)
            if one_symbol >= alphabet_size:
                raise BitstreamError("symbol out of alphabet")
            return HuffmanTable.from_pair(zero_symbol, one_symbol)

        cl_lengths = [0] * CODE_LENGTH_CODES
        num_codes = 4 + self.br.read_bits(4)
        for i in range(num_codes):
            cl_lengths[CODE_LENGTH_CODE_ORDER[i]] = self.br.read_bits(3)
        lengths = self._read_code_lengths(cl_lengths, alphabet_size)
        return HuffmanTable.from_code_lengths(lengths)

    def _read_code_lengths(self, cl_lengths, num_symbols: int):
        table = HuffmanTable.from_code_lengths(cl_lengths)
        if self.br.read_bits(1) == 1:
            length_nbits = 2 + 2 * self.br.read_bits(3)
            max_minus_two = self.br.read_bits(length_nbits)
            if max_minus_two > num_symbols - 2:
                raise BitstreamError("bad max_symbol")
            max_symbol = 2 + max_minus_two
        else:
            max_symbol = num_symbols

        lengths = [0] * num_symbols
        prev_len = 8
        symbol = 0
        br = self.br
        while symbol < num_symbols:
            if max_symbol == 0:
                break
            max_symbol -= 1
            br.fill()
            code_len = table.read_symbol(br)
            if code_len < 16:
                lengths[symbol] = code_len
                symbol += 1
                if code_len != 0:
                    prev_len = code_len
            else:
                slot = code_len - 16
                if slot == 0:
                    repeat = br.read_bits(2) + 3
                    fill_len = prev_len
                elif slot == 1:
                    repeat = br.read_bits(3) + 3
                    fill_len = 0
                elif slot == 2:
                    repeat = br.read_bits(7) + 11
                    fill_len = 0
                else:
                    raise BitstreamError("bad code-length symbol")
                if symbol + repeat > num_symbols:
                    raise BitstreamError("code-length repeat overflows alphabet")
                for _ in range(repeat):
                    lengths[symbol] = fill_len
                    symbol += 1
        return lengths

    # -- main symbol loop --------------------------------------------------

    def _decode_image_data(self, width: int, height: int, info: _HuffmanInfo) -> np.ndarray:
        num_values = width * height
        data = np.zeros(num_values * 4, dtype=np.uint8)
        br = self.br
        cache = info.color_cache

        group = info.groups[0]
        index = 0
        next_block_start = 0
        while index < num_values:
            br.fill()
            if index >= next_block_start:
                x = index % width
                y = index // width
                next_block_start = min(x | info.mask, width - 1) + y * width + 1
                group = info.group_at(x, y)
                g_tree, r_tree, b_tree, a_tree, d_tree = group

                # Constant-region fast path: when the four pixel trees are all
                # single-symbol, the block is a solid fill.
                if (
                    g_tree.is_single
                    and r_tree.is_single
                    and b_tree.is_single
                    and a_tree.is_single
                ):
                    code = g_tree.read_symbol(br)
                    if code < 256:
                        n = num_values - index if info.bits == 0 else next_block_start - index
                        r = r_tree.read_symbol(br)
                        b = b_tree.read_symbol(br)
                        a = a_tree.read_symbol(br)
                        px = np.array([r, code, b, a], dtype=np.uint8)
                        data[index * 4 : (index + n) * 4] = np.tile(px, n)
                        if cache is not None:
                            cache.insert(r, code, b, a)
                        index += n
                        continue
            else:
                g_tree, r_tree, b_tree, a_tree, d_tree = group

            code = g_tree.read_symbol(br)
            if code < 256:
                g = code
                r = r_tree.read_symbol(br)
                b = b_tree.read_symbol(br)
                if br.nbits < 15:
                    br.fill()
                a = a_tree.read_symbol(br)
                base = index * 4
                data[base] = r
                data[base + 1] = g
                data[base + 2] = b
                data[base + 3] = a
                if cache is not None:
                    cache.insert(r, g, b, a)
                index += 1
            elif code < 280:
                length = self._read_prefix_coded(code - 256)
                dist_symbol = d_tree.read_symbol(br)
                dist_code = self._read_prefix_coded(dist_symbol)
                dist = self._plane_code_to_distance(width, dist_code)
                if index < dist or num_values - index < length:
                    raise BitstreamError("backref out of range")
                if dist >= length:
                    src = data[(index - dist) * 4 : (index - dist + length) * 4]
                    data[index * 4 : (index + length) * 4] = src
                else:
                    for i in range(length * 4):
                        data[index * 4 + i] = data[(index - dist) * 4 + i]
                if cache is not None and dist != 1:
                    block = data[index * 4 : (index + length) * 4]
                    for i in range(length):
                        cache.insert(*block[i * 4 : i * 4 + 4])
                elif cache is not None:
                    cache.insert(*data[index * 4 : index * 4 + 4])
                index += length
            else:
                if cache is None:
                    raise BitstreamError("color cache symbol without cache")
                data[index * 4 : index * 4 + 4] = cache.lookup(code - 280)
                index += 1
        return data

    def _read_prefix_coded(self, prefix_code: int) -> int:
        """Length/distance prefix code + extra bits (lossless.rs:643-658)."""
        if prefix_code < 4:
            return prefix_code + 1
        extra_bits = (prefix_code - 2) >> 1
        offset = (2 + (prefix_code & 1)) << extra_bits
        if self.br.nbits < extra_bits:
            self.br.fill()
        bits = self.br.peek(extra_bits)
        self.br.consume(extra_bits)
        return offset + bits + 1

    @staticmethod
    def _plane_code_to_distance(xsize: int, plane_code: int) -> int:
        if plane_code > 120:
            return plane_code - 120
        xoff, yoff = DISTANCE_MAP[plane_code - 1]
        return max(xoff + yoff * xsize, 1)


def decode_lossless(data, width: int, height: int, implicit_dims: bool = False,
                    allow_native: bool = True) -> np.ndarray:
    """Decode a VP8L stream to an [h, w, 4] uint8 RGBA array."""
    if allow_native:
        try:
            from ..io import native

            if native.available():
                return native.vp8l_decode(bytes(data), width, height, implicit_dims)
        except Exception:
            # Fall through to the Python decoder, which raises precise
            # DecodingError types for malformed streams.
            pass
    dec = LosslessDecoder(data)
    flat = dec.decode(width, height, implicit_dims)
    return flat.reshape(height, width, 4)
