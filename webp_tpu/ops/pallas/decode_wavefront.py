"""Pallas TPU kernels driving the lane-aligned decode wavefront.

The step functions in `ops/wavefront2.py` and `ops/loopfilter2.py` are pure
dense [R, B, ...] jnp with no per-lane dynamic indexing, so they run
unchanged inside a Pallas kernel: grid=(T,), the scheduled per-step inputs
streamed HBM->VMEM by BlockSpec index maps, and the cross-step ring-buffer
state held in VMEM scratch for the whole frame (no HBM round-trip per step —
this is what removes the ~1 ms/step latency floor of the lax.scan drivers).

Bit-exact with the scan drivers (tests/test_wavefront2.py runs both).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..wavefront2 import (
    recon_step,
    recon_init_state,
    make_schedule_gather,
    schedule_mb_data,
    assemble_plane_v2,
)
from ..loopfilter2 import filter_step, filter_init_state


def _interpret_default():
    return jax.default_backend() == "cpu"


# ---------------------------------------------------------------------------
# Reconstruction kernel
# ---------------------------------------------------------------------------

_RECON_STATE_KEYS = ("rbot_y", "rbot_u", "rbot_v", "left_y", "left_u", "left_v")


def _recon_kernel(w13_ref, r13_ref, res_ref, lm_ref, bp_ref, cm_ref,
                  oy_ref, ou_ref, ov_ref, *scratch, mbw: int):
    t = pl.program_id(0)
    state_refs = dict(zip(_RECON_STATE_KEYS, scratch))

    @pl.when(t == 0)
    def _init():
        for k in ("rbot_y", "rbot_u", "rbot_v"):
            state_refs[k][:] = jnp.full_like(state_refs[k], 127)
        for k in ("left_y", "left_u", "left_v"):
            state_refs[k][:] = jnp.full_like(state_refs[k], 129)

    state = {k: r[:] for k, r in state_refs.items()}
    new_state, (ry, ru, rv) = recon_step(
        state, t, res_ref[0], lm_ref[0], bp_ref[0], cm_ref[0], mbw,
        unroll_i4=True, w13=w13_ref[:], r13=r13_ref[:],
    )
    oy_ref[0] = ry
    ou_ref[0] = ru
    ov_ref[0] = rv
    for k, r in state_refs.items():
        r[:] = new_state[k]


def recon_pallas(res_s, lm_s, bp_s, cm_s, mbw: int, interpret=None):
    """Scheduled [T, R, B, ...] inputs -> scheduled recon blocks.

    Returns (ys [T, R, B, 16, 16], us, vs [T, R, B, 8, 8]) int32.
    """
    if interpret is None:
        interpret = _interpret_default()
    T, R, B = lm_s.shape
    dt = res_s.dtype

    def row_spec(shape):
        return pl.BlockSpec((1,) + shape, lambda t: (t,) + (0,) * len(shape),
                            memory_space=pltpu.ANY if False else pltpu.VMEM)

    init = recon_init_state(R, B, dt)
    scratch_shapes = [pltpu.VMEM(init[k].shape, dt) for k in _RECON_STATE_KEYS]
    out_shape = [
        jax.ShapeDtypeStruct((T, R, B, 16, 16), dt),
        jax.ShapeDtypeStruct((T, R, B, 8, 8), dt),
        jax.ShapeDtypeStruct((T, R, B, 8, 8), dt),
    ]
    from ..wavefront2 import _W13, _R13

    def const_spec(shape):
        return pl.BlockSpec(shape, lambda t: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(_recon_kernel, mbw=mbw),
        grid=(T,),
        in_specs=[
            const_spec(_W13.shape),
            const_spec(_R13.shape),
            row_spec((R, B, 24, 16)),
            row_spec((R, B)),
            row_spec((R, B, 16)),
            row_spec((R, B)),
        ],
        out_specs=[
            row_spec((R, B, 16, 16)),
            row_spec((R, B, 8, 8)),
            row_spec((R, B, 8, 8)),
        ],
        out_shape=out_shape,
        scratch_shapes=scratch_shapes,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(_W13, _R13, res_s, lm_s, bp_s, cm_s)


# ---------------------------------------------------------------------------
# Loop-filter kernel
# ---------------------------------------------------------------------------


def _filter_kernel(ry_ref, ru_ref, rv_ref, lv_ref, it_ref, hv_ref, ds_ref,
                   oy_ref, ou_ref, ov_ref, *scratch,
                   mbw: int, simple: bool, keys):
    t = pl.program_id(0)
    state_refs = dict(zip(keys, scratch))

    @pl.when(t == 0)
    def _init():
        for r in state_refs.values():
            r[:] = jnp.zeros_like(r)

    state = {k: r[:] for k, r in state_refs.items()}
    new_state, outs = filter_step(
        state, t, ry_ref[0], ru_ref[0], rv_ref[0],
        lv_ref[0], it_ref[0], hv_ref[0], ds_ref[0], mbw, simple,
    )
    oy_ref[0] = outs[0]
    if not simple:
        ou_ref[0] = outs[1]
        ov_ref[0] = outs[2]
    else:
        ou_ref[0] = ru_ref[0]  # chroma passes through (unused downstream)
        ov_ref[0] = rv_ref[0]
    for k, r in state_refs.items():
        r[:] = new_state[k]


def filter_pallas(ys, us, vs, lv_s, it_s, hv_s, ds_s, mbw: int, simple: bool,
                  interpret=None):
    """Scheduled recon blocks + params -> scheduled final filtered blocks.

    Inputs are [T, R, B, ...]; internally padded with 2 flush steps.  Output
    step t holds the final blocks of diag t-2.
    """
    if interpret is None:
        interpret = _interpret_default()
    T, R, B = lv_s.shape
    dt = ys.dtype

    def pad2(a):
        return jnp.concatenate([a, jnp.zeros((2,) + a.shape[1:], a.dtype)], axis=0)

    ys, us, vs = pad2(ys), pad2(us), pad2(vs)
    lv_s, it_s, hv_s, ds_s = pad2(lv_s), pad2(it_s), pad2(hv_s), pad2(ds_s)

    init = filter_init_state(R, B, simple, dt)
    keys = tuple(init.keys())

    def row_spec(shape):
        return pl.BlockSpec((1,) + shape, lambda t: (t,) + (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    out_shape = [
        jax.ShapeDtypeStruct((T + 2, R, B, 16, 16), dt),
        jax.ShapeDtypeStruct((T + 2, R, B, 8, 8), dt),
        jax.ShapeDtypeStruct((T + 2, R, B, 8, 8), dt),
    ]
    scratch_shapes = [pltpu.VMEM(init[k].shape, dt) for k in keys]
    oy, ou, ov = pl.pallas_call(
        functools.partial(_filter_kernel, mbw=mbw, simple=simple, keys=keys),
        grid=(T + 2,),
        in_specs=[
            row_spec((R, B, 16, 16)),
            row_spec((R, B, 8, 8)),
            row_spec((R, B, 8, 8)),
            row_spec((R, B)),
            row_spec((R, B)),
            row_spec((R, B)),
            row_spec((R, B)),
        ],
        out_specs=[
            row_spec((R, B, 16, 16)),
            row_spec((R, B, 8, 8)),
            row_spec((R, B, 8, 8)),
        ],
        out_shape=out_shape,
        scratch_shapes=scratch_shapes,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(ys, us, vs, lv_s, it_s, hv_s, ds_s)
    return oy, ou, ov


# ---------------------------------------------------------------------------
# Full pipeline: scheduled gathers -> recon -> filter -> planes
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit, static_argnames=("mbw", "mbh", "simple", "interpret")
)
def decode_planes_pallas(residuals, luma_mode, bpred, chroma_mode,
                         level, interior, hev_t, do_sub,
                         mbw: int, mbh: int, simple: bool, interpret=None):
    """[B, nmb, ...] per-MB tensors -> filtered (y, u, v) uint8 planes."""
    _, idx = make_schedule_gather(mbw, mbh)
    res_s = schedule_mb_data(residuals.astype(jnp.int32), idx)
    lm_s = schedule_mb_data(luma_mode.astype(jnp.int32), idx)
    bp_s = schedule_mb_data(bpred.astype(jnp.int32), idx)
    cm_s = schedule_mb_data(chroma_mode.astype(jnp.int32), idx)

    ys, us, vs = recon_pallas(res_s, lm_s, bp_s, cm_s, mbw, interpret=interpret)

    lv_s = schedule_mb_data(level.astype(jnp.int32), idx)
    it_s = schedule_mb_data(interior.astype(jnp.int32), idx)
    hv_s = schedule_mb_data(hev_t.astype(jnp.int32), idx)
    ds_s = schedule_mb_data(do_sub, idx)

    oy, ou, ov = filter_pallas(ys, us, vs, lv_s, it_s, hv_s, ds_s, mbw, simple,
                               interpret=interpret)
    if simple:
        # Chroma passes through untouched: use recon stream (no emit lag).
        y = assemble_plane_v2(oy[2:], mbw, mbh, 16)
        u = assemble_plane_v2(us, mbw, mbh, 8)
        v = assemble_plane_v2(vs, mbw, mbh, 8)
    else:
        y = assemble_plane_v2(oy[2:], mbw, mbh, 16)
        u = assemble_plane_v2(ou[2:], mbw, mbh, 8)
        v = assemble_plane_v2(ov[2:], mbw, mbh, 8)
    return y.astype(jnp.uint8), u.astype(jnp.uint8), v.astype(jnp.uint8)
