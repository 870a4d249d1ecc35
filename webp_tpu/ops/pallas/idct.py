"""Pallas TPU kernel: fused inverse DCT + DC-only select over coefficient
blocks.

Layout is lane-packed for the VPU: coefficients arrive as [16, N] (position
major, block minor) so each butterfly line is a full-width vector op across
128-lane tiles — no padding waste from the tiny 4x4 block shape. The math is
the exact RFC 6386 §14.3 integer IDCT (same `_mul16` decomposition as
`jax_ops.idct4x4`, verified bit-exact by tests/test_pallas.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

C1 = 20091
C2 = 35468

TILE_N = 1024


def _mul16(a, c):
    hi = a >> 12
    lo = a & 0xFFF
    return (hi * c + ((lo * c) >> 12)) >> 4


def _idct_rows(rows):
    """rows: list of 16 [N] vectors (raster positions) -> 16 output vectors."""
    out_cols = []
    # Column pass: position p = 4*row + col; operate per column c on rows.
    for c in range(4):
        r0, r1, r2, r3 = rows[c], rows[4 + c], rows[8 + c], rows[12 + c]
        a1 = r0 + r2
        b1 = r0 - r2
        c1 = _mul16(r1, C2) - (r3 + _mul16(r3, C1))
        d1 = (r1 + _mul16(r1, C1)) + _mul16(r3, C2)
        out_cols.append((a1 + d1, b1 + c1, b1 - c1, a1 - d1))
    # Row pass with rounding.
    out = [None] * 16
    for r in range(4):
        c0, c1_, c2_, c3 = (out_cols[c][r] for c in range(4))
        a1 = c0 + c2_
        b1 = c0 - c2_
        cc = _mul16(c1_, C2) - (c3 + _mul16(c3, C1))
        dd = (c1_ + _mul16(c1_, C1)) + _mul16(c3, C2)
        out[4 * r + 0] = (a1 + dd + 4) >> 3
        out[4 * r + 1] = (b1 + cc + 4) >> 3
        out[4 * r + 2] = (b1 - cc + 4) >> 3
        out[4 * r + 3] = (a1 - dd + 4) >> 3
    return out


def _kernel(coeff_ref, has_ac_ref, out_ref):
    rows = [coeff_ref[i, :] for i in range(16)]
    full = _idct_rows(rows)
    dc = (rows[0] + 4) >> 3
    ac = has_ac_ref[0, :] != 0
    for i in range(16):
        out_ref[i, :] = jnp.where(ac, full[i], dc)


@jax.jit
def idct_dequant_select(coeffs_t: jnp.ndarray, has_ac: jnp.ndarray) -> jnp.ndarray:
    """coeffs_t: [16, N] int32 (N a multiple of TILE_N), has_ac: [1, N] int32.

    Returns [16, N] residuals: full IDCT where has_ac else DC-only fill.
    """
    n = coeffs_t.shape[1]
    grid = (n // TILE_N,)
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((16, n), jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((16, TILE_N), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_N), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((16, TILE_N), lambda i: (0, i), memory_space=pltpu.VMEM),
    )(coeffs_t, has_ac)


def idct_blocks_pallas(coeffs: jnp.ndarray, has_ac: jnp.ndarray) -> jnp.ndarray:
    """[N_blocks, 16] coeffs + [N_blocks] has_ac -> [N_blocks, 16] residuals.

    Pads to the tile size, runs the lane-packed kernel, unpads.
    """
    n = coeffs.shape[0]
    n_pad = -(-n // TILE_N) * TILE_N
    ct = jnp.zeros((16, n_pad), jnp.int32).at[:, :n].set(coeffs.T.astype(jnp.int32))
    ha = jnp.zeros((1, n_pad), jnp.int32).at[0, :n].set(has_ac.astype(jnp.int32))
    out = idct_dequant_select(ct, ha)
    return out[:, :n].T
