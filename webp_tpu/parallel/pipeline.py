"""Sharded batch codec pipeline.

`decode_batch_sharded` runs the full per-image device decode (IDCT, wavefront
reconstruction, wavefront loop filter) data-parallel over the mesh's `data`
axis, then converts YUV->RGB with the luma/chroma planes sharded over the
`band` axis: each band owns a horizontal stripe and exchanges one chroma
boundary row with its neighbors via `lax.ppermute` (the fancy upsampler's
stencil reaches one chroma row up/down). This is the tile-band + halo-exchange
design from SURVEY §7, with collectives riding ICI.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import PartitionSpec as P

from ..ops import jax_ops
from ..ops.jax_loopfilter import loop_filter_frame
from ..ops.wavefront import reconstruct_frame


def _exchange_rows(plane, axis):
    """Bring in the neighbor bands' boundary rows: returns (prev_last, next_first).

    Edge bands clamp to their own boundary row (mirroring the global edge
    clamp of the upsampler).
    """
    n = jax.lax.psum(1, axis)
    idx = jax.lax.axis_index(axis)
    down = [(i, (i + 1) % n) for i in range(n)]
    up = [(i, (i - 1) % n) for i in range(n)]
    prev_last = jax.lax.ppermute(plane[-1:], axis, down)
    next_first = jax.lax.ppermute(plane[:1], axis, up)
    prev_last = jnp.where(idx == 0, plane[:1], prev_last)
    next_first = jnp.where(idx == n - 1, plane[-1:], next_first)
    return prev_last, next_first


def _banded_upsample(c_local, band_axis):
    """Fancy-upsample a band of a chroma plane to 2x rows with halo rows."""
    cl, cw = c_local.shape
    prev_last, next_first = _exchange_rows(c_local, band_axis)
    ext = jnp.concatenate([prev_last, c_local, next_first], axis=0)  # [cl+2, cw]

    height = 2 * cl
    width = 2 * cw
    r = jnp.arange(height)
    x = jnp.arange(width)
    mr = r // 2 + 1  # +1 for the halo offset
    fr = jnp.where(r % 2 == 1, r // 2 + 2, r // 2)
    mc = x // 2
    fc = jnp.clip(jnp.where(x % 2 == 1, x // 2 + 1, x // 2 - 1), 0, cw - 1)
    ci = ext.astype(jnp.int32)
    main = ci[mr, :][:, mc]
    sec_col = ci[mr, :][:, fc]
    sec_row = ci[fr, :][:, mc]
    tert = ci[fr, :][:, fc]
    return ((9 * main + 3 * sec_col + 3 * sec_row + tert + 8) >> 4).astype(jnp.uint8)


def make_decode_batch_sharded(mesh, mbw: int, mbh: int, simple: bool = False):
    """Build the jitted sharded batch-decode step for a fixed geometry."""
    H, W = mbh * 16, mbw * 16

    data_spec = P("data")

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(data_spec,) * 9,
        out_specs=(data_spec, data_spec, data_spec),
        check_rep=False,
    )
    def recon_stage(coeffs, has_ac, luma_mode, bpred, chroma_mode, level, interior, hev, do_sub):
        def one(args):
            c, ac, lm, bp, cm, lv, it, hv, ds = args
            full = jax_ops.idct4x4(c)
            dc = (c[..., 0:1] + 4) >> 3
            res = jnp.where(ac[..., None], full, jnp.broadcast_to(dc, full.shape))
            y, u, v = reconstruct_frame(res, lm, bp, cm, mbw, mbh)
            return loop_filter_frame(y, u, v, lv, it, hv, ds, mbw, mbh, simple)

        return jax.vmap(one)(
            (coeffs, has_ac, luma_mode, bpred, chroma_mode, level, interior, hev, do_sub)
        )

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P("data", "band"), P("data", "band"), P("data", "band")),
        out_specs=P("data", "band"),
        check_rep=False,
    )
    def color_stage(y, u, v):
        # y: [b_local, band rows, W]; chroma at half resolution.
        up_u = jax.vmap(lambda c: _banded_upsample(c, "band"))(u)
        up_v = jax.vmap(lambda c: _banded_upsample(c, "band"))(v)
        return jax_ops.yuv_to_rgb(y, up_u, up_v).reshape(y.shape[0], y.shape[1], -1)

    @jax.jit
    def step(coeffs, has_ac, luma_mode, bpred, chroma_mode, level, interior, hev, do_sub):
        y, u, v = recon_stage(
            coeffs, has_ac, luma_mode, bpred, chroma_mode, level, interior, hev, do_sub
        )
        rgb = color_stage(y, u, v)
        return rgb.reshape(y.shape[0], H, W, 3)

    return step


def make_encode_analysis_sharded(mesh, mbw: int, mbh: int):
    """Data-parallel batched encoder front half: RGB->YUV + forward DCT of the
    DC-mode residual grid (the FLOP-dense analysis stage), sharded over images
    with per-band row sharding for the color conversion."""

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P("data"),),
        out_specs=(P("data"), P("data")),
        check_rep=False,
    )
    def step_inner(rgb):
        y, u, v = jax.vmap(jax_ops.rgb_to_yuv420)(rgb)
        yb = (
            y.reshape(y.shape[0], mbh, 16, mbw, 16)
            .transpose(0, 1, 3, 2, 4)
            .reshape(y.shape[0], mbh * mbw, 256)
        )
        blocks = (
            yb.reshape(-1, 4, 4, 4, 4).transpose(0, 1, 3, 2, 4).reshape(yb.shape[0], -1, 16)
        )
        dct = jax_ops.dct4x4(blocks.astype(jnp.int32) - 128)
        return dct, u

    return jax.jit(lambda rgb: step_inner(rgb))
