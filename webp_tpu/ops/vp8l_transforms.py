"""Inverse VP8L transforms (predictor / color / subtract-green / color-index).

Vectorized numpy implementations with bit-exact semantics per the VP8L spec and
the reference (`/root/reference/src/decoder/lossless_transform.rs`). Predictor
modes that only reference the previous row are whole-row vector ops; modes with
a left-pixel recurrence run as per-pixel scans (these are the host-side serial
tail; the TPU batch path handles multi-image parallelism above this level).

Pixel layout: flat uint8 [h*w*4] in R,G,B,A order (index/green at byte 1).
"""

from __future__ import annotations

import numpy as np

from ..errors import BitstreamError


def _subsample(size: int, bits: int) -> int:
    return (size + (1 << bits) - 1) >> bits


def _avg2(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return ((a.astype(np.uint16) + b.astype(np.uint16)) // 2).astype(np.uint8)


def inverse_subtract_green(data: np.ndarray) -> None:
    px = data.reshape(-1, 4)
    px[:, 0] += px[:, 1]
    px[:, 2] += px[:, 1]


def inverse_color_transform(
    data: np.ndarray, width: int, height: int, size_bits: int, tf_data: np.ndarray
) -> None:
    img = data.reshape(height, width, 4)
    bw = _subsample(width, size_bits)
    tf = tf_data.reshape(-1, bw, 4)

    # Expand per-block transform coefficients to per-pixel maps.
    bx = np.arange(width) >> size_bits
    by = np.arange(height) >> size_bits
    red_to_blue = tf[by][:, bx, 0].astype(np.int8).astype(np.int32)
    green_to_blue = tf[by][:, bx, 1].astype(np.int8).astype(np.int32)
    green_to_red = tf[by][:, bx, 2].astype(np.int8).astype(np.int32)

    green = img[:, :, 1].astype(np.int8).astype(np.int32)
    red = img[:, :, 0].astype(np.int32) + ((green_to_red * green) >> 5)
    red &= 0xFF
    blue = img[:, :, 2].astype(np.int32) + ((green_to_blue * green) >> 5)
    blue += (red_to_blue * red.astype(np.int8).astype(np.int32)) >> 5
    img[:, :, 0] = red.astype(np.uint8)
    img[:, :, 2] = (blue & 0xFF).astype(np.uint8)


def inverse_color_indexing(
    data: np.ndarray,
    packed_width: int,
    height: int,
    final_width: int,
    table_size: int,
    table: np.ndarray,
) -> np.ndarray:
    """Expand palette indices (possibly sub-byte packed) to RGBA pixels."""
    img = data.reshape(height, packed_width, 4)
    indices = img[:, :, 1]  # index lives in the green channel

    # Out-of-range palette indices decode as transparent black per spec.
    full_table = np.zeros((256, 4), dtype=np.uint8)
    full_table[:table_size] = table.reshape(-1, 4)[:table_size]

    if table_size > 16:
        out = full_table[indices]
        return out.reshape(-1)

    if table_size <= 2:
        w_bits = 3
    elif table_size <= 4:
        w_bits = 2
    else:
        w_bits = 1
    px_per_byte = 1 << w_bits
    bits_per_px = 8 >> w_bits
    mask = (1 << bits_per_px) - 1

    x = np.arange(final_width)
    packed_col = x >> w_bits
    shift = (x & (px_per_byte - 1)) * bits_per_px
    sub_idx = (indices[:, packed_col] >> shift[None, :]) & mask
    return full_table[sub_idx].reshape(-1)


# -- predictor transform ---------------------------------------------------

# Modes whose predictor depends only on the (final) previous row; these apply
# as whole-segment vector ops.
_ROW_PARALLEL_MODES = {0, 1, 2, 3, 4, 8, 9}


def inverse_predictor(
    data: np.ndarray, width: int, height: int, size_bits: int, pred_data: np.ndarray
) -> None:
    img = data.reshape(height, width, 4)
    bw = _subsample(width, size_bits)
    pred_img = pred_data.reshape(-1, bw, 4)

    # Top-left pixel: opaque-black predictor (add 0xff to alpha only).
    img[0, 0, 3] = (int(img[0, 0, 3]) + 255) & 0xFF
    # Rest of row 0: left predictor == per-channel wrapping prefix sum.
    if width > 1:
        img[0] = np.cumsum(img[0].astype(np.uint32), axis=0).astype(np.uint8)
    # Column 0 of remaining rows: top predictor == prefix sum down the column.
    if height > 1:
        img[:, 0] = np.cumsum(img[:, 0].astype(np.uint32), axis=0).astype(np.uint8)

    for y in range(1, height):
        prow = img[y - 1]
        row = img[y]
        # Top-right neighbors: previous row shifted left; the last column's
        # "top-right" aliases the current row's first pixel (already final).
        trow = np.empty_like(prow)
        trow[:-1] = prow[1:]
        trow[-1] = row[0]
        pred_row = pred_img[y >> size_bits]

        for block_x in range(bw):
            mode = int(pred_row[block_x, 1])
            xs = max(block_x << size_bits, 1)
            xe = min((block_x + 1) << size_bits, width)
            if xs >= xe:
                continue
            if mode == 0:
                row[xs:xe, 3] += 255
            elif mode == 1:
                base = row[xs - 1].astype(np.uint32)
                row[xs:xe] = (
                    base + np.cumsum(row[xs:xe].astype(np.uint32), axis=0)
                ).astype(np.uint8)
            elif mode == 2:
                row[xs:xe] += prow[xs:xe]
            elif mode == 3:
                row[xs:xe] += trow[xs:xe]
            elif mode == 4:
                row[xs:xe] += prow[xs - 1 : xe - 1]
            elif mode == 8:
                row[xs:xe] += _avg2(prow[xs - 1 : xe - 1], prow[xs:xe])
            elif mode == 9:
                row[xs:xe] += _avg2(prow[xs:xe], trow[xs:xe])
            else:
                _apply_sequential(mode, row, prow, trow, xs, xe)


def _apply_sequential(mode, row, prow, trow, xs, xe):
    """Left-recurrent predictor modes, scanned pixel by pixel."""
    left = row[xs - 1].astype(np.int32)
    if mode == 5:
        for x in range(xs, xe):
            pred = (((left + trow[x]) // 2) + prow[x]) // 2
            left = (row[x] + pred) & 0xFF
            row[x] = left.astype(np.uint8)
    elif mode == 6:
        for x in range(xs, xe):
            pred = (left + prow[x - 1]) // 2
            left = (row[x] + pred) & 0xFF
            row[x] = left.astype(np.uint8)
    elif mode == 7:
        for x in range(xs, xe):
            pred = (left + prow[x]) // 2
            left = (row[x] + pred) & 0xFF
            row[x] = left.astype(np.uint8)
    elif mode == 10:
        for x in range(xs, xe):
            pred = ((left + prow[x - 1]) // 2 + (prow[x].astype(np.int32) + trow[x]) // 2) // 2
            left = (row[x] + pred) & 0xFF
            row[x] = left.astype(np.uint8)
    elif mode == 11:
        for x in range(xs, xe):
            t = prow[x].astype(np.int32)
            tl = prow[x - 1].astype(np.int32)
            p = left + t - tl
            p_left = int(np.abs(p - left).sum())
            p_top = int(np.abs(p - t).sum())
            pred = left if p_left < p_top else t
            left = (row[x] + pred) & 0xFF
            row[x] = left.astype(np.uint8)
    elif mode == 12:
        for x in range(xs, xe):
            t = prow[x].astype(np.int32)
            tl = prow[x - 1].astype(np.int32)
            pred = np.clip(left + t - tl, 0, 255)
            left = (row[x] + pred) & 0xFF
            row[x] = left.astype(np.uint8)
    elif mode == 13:
        for x in range(xs, xe):
            t = prow[x].astype(np.int32)
            tl = prow[x - 1].astype(np.int32)
            a = (left + t) // 2
            # (a - tl) / 2 truncates toward zero in the reference (Rust i16 div).
            d = a - tl
            half = np.where(d >= 0, d // 2, -((-d) // 2))
            pred = np.clip(a + half, 0, 255)
            left = (row[x] + pred) & 0xFF
            row[x] = left.astype(np.uint8)
    else:
        raise BitstreamError(f"invalid predictor mode {mode}")
