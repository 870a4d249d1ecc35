"""Sharded batch codec pipelines (jax.sharding Mesh + shard_map).

Two parallel axes, matching SURVEY §2.4:

- `data`: images of a batch are independent — decode and encode analysis
  shard over it with no collectives.
- `band`: horizontal stripes of MB rows within an image.  The wavefront's
  cross-row dataflow (one recon border row, one filter margin row per step,
  and the chroma upsampler's one-row stencil) crosses band boundaries, so the
  banded kernels exchange exactly those rows with `lax.ppermute` each step —
  halos ride ICI while all heavy math stays local.

`tests/test_sharded.py` asserts byte-equality of every sharded path with the
single-device kernels on real bitstreams (8-device CPU mesh).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import PartitionSpec as P

from ..ops import jax_ops
from ..ops.loopfilter2 import filter_init_state, filter_step
from ..ops.wavefront2 import (
    assemble_plane_v2,
    make_schedule_gather,
    recon_init_state,
    recon_step,
    schedule_mb_data,
)


def _band_shifts(axis: str):
    """Row-shift helpers that pull boundary rows from neighbor bands.

    ppermute leaves non-receiving devices with zeros — exactly the local
    shifts' edge convention, so band 0 / band n-1 behave like frame edges.
    """
    def shift_down(a):
        nb = jax.lax.psum(1, axis)
        prev_last = jax.lax.ppermute(
            a[-1:], axis, [(i, i + 1) for i in range(nb - 1)]
        )
        return jnp.concatenate([prev_last, a[:-1]], axis=0)

    def shift_up(a):
        nb = jax.lax.psum(1, axis)
        next_first = jax.lax.ppermute(
            a[:1], axis, [(i + 1, i) for i in range(nb - 1)]
        )
        return jnp.concatenate([a[1:], next_first], axis=0)

    return shift_down, shift_up


def decode_wavefront_banded(residuals, lmode, bpred, cmode, level, interior,
                            hev_t, do_sub, mesh, mbw: int, mbh: int,
                            simple: bool):
    """Reconstruction + loop filter with MB rows sharded over `band`.

    Inputs are per-MB dense arrays [B, nmb, ...]; returns (y, u, v) uint8
    planes.  Each band owns mbh/n_band wavefront rows; per step the ring
    borders (1 recon row, 4 filter margin rows, 3 emission rows) cross band
    boundaries via ppermute.
    """
    n_band = mesh.shape["band"]
    assert mbh % n_band == 0, (mbh, n_band)
    r_loc = mbh // n_band
    T, idx = make_schedule_gather(mbw, mbh)

    res_s = schedule_mb_data(residuals.astype(jnp.int32), idx)
    lm_s = schedule_mb_data(lmode.astype(jnp.int32), idx)
    bp_s = schedule_mb_data(bpred.astype(jnp.int32), idx)
    cm_s = schedule_mb_data(cmode.astype(jnp.int32), idx)
    lv_s = schedule_mb_data(level.astype(jnp.int32), idx)
    it_s = schedule_mb_data(interior.astype(jnp.int32), idx)
    hv_s = schedule_mb_data(hev_t.astype(jnp.int32), idx)
    ds_s = schedule_mb_data(do_sub, idx)

    B = residuals.shape[0]
    spec = P(None, "band")

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(spec,) * 8,
        out_specs=(spec, spec, spec),
        check_rep=False,
    )
    def run(res, lm, bp, cm, lv, it, hv, ds):
        shift_down, shift_up = _band_shifts("band")
        row0 = jax.lax.axis_index("band") * r_loc

        state = recon_init_state(r_loc, B)

        def rstep(state, inp):
            t, r_, l_, b_, c_ = inp
            return recon_step(
                state, t, r_, l_, b_, c_, mbw, shift=shift_down, row0=row0
            )

        _, (ys, us, vs) = jax.lax.scan(
            rstep, state, (jnp.arange(T), res, lm, bp, cm)
        )

        def pad2(a):
            return jnp.concatenate(
                [a, jnp.zeros((2,) + a.shape[1:], a.dtype)], axis=0
            )

        fstate = filter_init_state(r_loc, B, simple)

        def fstep(state, inp):
            t, ry, ru, rv, l_, i_, h_, d_ = inp
            return filter_step(
                state, t, ry, ru, rv, l_, i_, h_, d_, mbw, simple,
                shift=shift_down, shift_up=shift_up, row0=row0, r_total=mbh,
            )

        _, outs = jax.lax.scan(
            fstep, fstate,
            (jnp.arange(T + 2), pad2(ys), pad2(us), pad2(vs),
             pad2(lv), pad2(it), pad2(hv), pad2(ds)),
        )
        if simple:
            oy = outs[0]
            return oy[2:], us, vs
        oy, ou, ov = outs
        return oy[2:], ou[2:], ov[2:]

    oy, ou, ov = run(res_s, lm_s, bp_s, cm_s, lv_s, it_s, hv_s, ds_s)
    return (
        assemble_plane_v2(oy, mbw, mbh, 16).astype(jnp.uint8),
        assemble_plane_v2(ou, mbw, mbh, 8).astype(jnp.uint8),
        assemble_plane_v2(ov, mbw, mbh, 8).astype(jnp.uint8),
    )


def make_decode_batch_sharded(mesh, mbw: int, mbh: int, simple: bool,
                              width: int, height: int):
    """Data-parallel batched levels-mode decode over the mesh's `data` axis.

    Takes the packed int8 transfer format of `decode.device.parse_levels_batch`
    (i8buf, esc_pos, esc_val, qtab, u8buf) sharded over images; each device
    runs the full single-chip pipeline on its shard.
    """
    from ..decode.device import _decode_core

    nmb = mbw * mbh

    @jax.jit
    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P("data"),) * 5,
        out_specs=P("data"),
        check_rep=False,
    )
    def step(i8buf, esc_pos, esc_val, qtab, u8buf):
        lv = i8buf.astype(jnp.int16)
        lv = lv.at[jnp.arange(lv.shape[0])[:, None], esc_pos].set(
            esc_val, mode="drop"
        )
        levels = lv.reshape(lv.shape[0], nmb, 25, 16)
        return _decode_core(
            levels, qtab, u8buf, mbw, mbh, simple, width, height, "scan"
        )

    return step


def make_encode_analysis_sharded(mesh, mbw: int, mbh: int, n_try: int,
                                 do_trellis: bool = False):
    """Data-parallel batched encoder RD analysis over the `data` axis.

    Each device runs the lane-aligned v2 wavefront on its image shard; the
    host finishes entropy coding per image (see encode.vp8).
    """
    from ..ops.encode_wavefront2 import encode_analysis_batch_v2

    def step(ybufs, ubufs, vbufs, params_tree, tables_tree):
        run = shard_map(
            lambda y, u, v: encode_analysis_batch_v2.__wrapped__(
                y, u, v, params_tree, tables_tree, mbw, mbh, n_try, do_trellis
            ),
            mesh=mesh,
            in_specs=(P("data"),) * 3,
            out_specs=P("data"),
            check_rep=False,
        )
        return jax.jit(run)(ybufs, ubufs, vbufs)

    return step


def make_encode_twopass_sharded(mesh, mbw: int, mbh: int, n_try1: int,
                                n_try: int, do_trellis: bool):
    """Data-parallel FLAGSHIP two-pass encode kernels over the `data` axis:
    pass-1 stats and pass-2 prepack, both with per-image segment params /
    segment maps / adapted cost tables (the bench configuration, not the
    simplified single-pass one).  The host half (probability adaptation,
    contexts, entropy) is unchanged — __graft_entry__ asserts the finished
    payloads are byte-equal to the unsharded flow.
    """
    from ..ops.encode_wavefront2 import (
        _prepack_batch_pertbl,
        encode_analysis_stats_batch,
    )

    def stats_step(Y, U, V, params_tree, tables_tree, sid):
        run = shard_map(
            lambda y, u, v, p, s: encode_analysis_stats_batch.__wrapped__(
                y, u, v, p, tables_tree, mbw, mbh, n_try1, s
            ),
            mesh=mesh,
            in_specs=(P("data"),) * 5,
            out_specs=(P("data"), P("data")),
            check_rep=False,
        )
        return jax.jit(run)(Y, U, V, params_tree, sid)

    def prepack_step(Y, U, V, params_tree, tables_batched, sid):
        run = shard_map(
            lambda y, u, v, p, t, s: _prepack_batch_pertbl.__wrapped__(
                y, u, v, p, t, mbw, mbh, n_try, do_trellis, s
            ),
            mesh=mesh,
            in_specs=(P("data"),) * 6,
            out_specs=(P("data"),) * 5,
            check_rep=False,
        )
        return jax.jit(run)(Y, U, V, params_tree, tables_batched, sid)

    return stats_step, prepack_step


def make_encode_tokens_sharded(mesh, mbw: int, mbh: int, nparts: int,
                               max_ops: int, max_bytes: int):
    """Data-parallel device token coding + bitstream all_gather.

    Each device runs the full levels->partition-bitstream pipeline
    (ops/token_ops.encode_coeff_partitions) on its image shard, then the
    finished byte tensors all_gather over the `data` axis so any host in a
    multi-host mesh can mux the RIFF container for the whole batch — the
    per-partition bitstream collective of SURVEY §2.4.5.
    """
    from ..ops.token_ops import encode_coeff_partitions

    @jax.jit
    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P("data"),) * 5,
        out_specs=(P(), P(), P(), P(), P()),
        check_rep=False,
    )
    def step(y2_levels, y_levels, uv_levels, luma_mode, probs_flat):
        def one(y2, yl, uv, lm, pf):
            lead, tok, tok_n, state, _n_ops = (
                encode_coeff_partitions.__wrapped__(
                    y2, yl, uv, lm, pf, mbw, mbh, nparts, max_ops, max_bytes
                )
            )
            # state = (bottom, range, bit_num): bottom + bit_num finish the
            # byte assembly on the host (ops/boolenc2.assemble_lane).
            return lead, tok, tok_n, state[0], state[2]

        lead, tok, tok_n, bottom, bit_num = jax.vmap(one)(
            y2_levels, y_levels, uv_levels, luma_mode, probs_flat
        )
        ag = lambda a: jax.lax.all_gather(a, "data", tiled=True)
        return ag(lead), ag(tok), ag(tok_n), ag(bottom), ag(bit_num)

    return step
