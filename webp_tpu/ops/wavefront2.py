"""Lane-aligned wavefront reconstruction (decode side), v2.

The round-1 wavefront (`wavefront.py`) vmapped a ragged diagonal of MBs and
routed state through per-lane dynamic gathers/scatters — ~1 ms of dispatch
and relayout per scan step on TPU.  This version restructures the schedule so
that *every MB row advances together*: at step t, row r works on MB
x = t - 2r (masked invalid outside [0, mbw)).  All cross-row data flow becomes
a static shift along the row axis plus a 3-slot ring buffer indexed by t mod 3
— there is no per-lane dynamic indexing anywhere, so each step is a short
sequence of dense [R, B, ...] vector ops.  The same step function runs under
`lax.scan` (CPU tests / fallback) and inside a Pallas TPU kernel with
grid=(T,) and the state held in VMEM scratch (`pallas_wavefront.py`).

Semantics are bit-exact with `wavefront.reconstruct_frame` (RFC 6386
§12.2/12.3; reference decoder `/root/reference/src/decoder/vp8.rs:736-867`,
border rules `/root/reference/src/common/prediction.rs:15-128`), enforced by
`tests/test_wavefront2.py` over the full golden corpus.

Schedule identities used below (diag of MB (x, y) is d = x + 2y):
  - row r's MB at step t is x = t - 2r
  - a0..a15 (above)  = bottom row of (x,   r-1): written by row r-1 at t-2
  - tr0..tr3         = bottom row of (x+1, r-1)[0:4]: written at t-1
  - tl               = bottom row of (x-1, r-1)[15]:  written at t-3
so a 3-deep ring of bottom rows per row, read at slots (t-2, t-1, t-3) mod 3
and written at slot t mod 3 (reads happen before the write), carries every
cross-row dependency.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .wavefront import _BPRED_W_np, _BPRED_R_np

# [13, 160] / [160] integer B-predictor matrices (see wavefront.py): all ten
# 4x4 B-mode predictions are (b13 @ W + R) >> 3 with b13 = [tl, a0..7, l0..3].
# numpy on purpose (see ops/token_stats.py: module-level jnp constants can
# bind to a trace when first imported inside a jitted body)
_W13 = _BPRED_W_np.astype(np.float32)
_R13 = _BPRED_R_np


def make_schedule_gather(mbw: int, mbh: int):
    """Indices routing [nmb, ...] per-MB data into scheduled [T, R, ...] form.

    Returns (T, idx [T, R] int32 into nmb (clamped for invalid slots)).
    """
    T = mbw + 2 * (mbh - 1)
    t = np.arange(T)[:, None]
    r = np.arange(mbh)[None, :]
    x = t - 2 * r
    idx = np.clip(x, 0, mbw - 1) + r * mbw
    return T, jnp.asarray(idx.astype(np.int32))


def schedule_mb_data(a, idx):
    """[B, nmb, ...] -> [T, R, B, ...] scheduled layout (one device gather)."""
    g = a[:, idx]  # [B, T, R, ...]
    return jnp.moveaxis(g, 0, 2)


def _clip255(v):
    return jnp.clip(v, 0, 255)


def _predict_b_batch(b13, modes, w13=None, r13=None):
    """b13 [R, B, 13] int32, modes [R, B] -> selected predictions [R, B, 16]."""
    if w13 is None:
        w13, r13 = _W13, _R13
    R, B = modes.shape
    # Integer-valued float32 matmul is exact here (|sum| < 2^15 << 2^24).
    preds = jnp.dot(
        b13.reshape(R * B, 13).astype(jnp.float32), w13,
        preferred_element_type=jnp.float32,
    ).astype(jnp.int32).reshape(R, B, 160)
    preds = jnp.clip((preds + r13) >> 3, 0, 255)  # [R, B, 160]
    oh = jax.nn.one_hot(modes, 10, dtype=jnp.int32)  # [R, B, 10]
    return (preds.reshape(R, B, 10, 16) * oh[..., None]).sum(axis=2)


def _whole_pred(a, left, tl, mode, has_above, has_left, size: int):
    """DC/V/H/TM whole-block prediction.

    a [R, B, size] above, left [R, B, size], tl [R, B], mode [R, B] in 0..3.
    Returns [R, B, size, size].
    """
    shf = (2 if size == 8 else 3) + has_above.astype(jnp.int32) + has_left.astype(jnp.int32)
    total = jnp.where(has_left, left.sum(-1), 0) + jnp.where(has_above, a.sum(-1), 0)
    dc = jnp.where(has_above | has_left, (total + (1 << (shf - 1))) >> shf, 128)
    R, B = mode.shape
    dc_blk = jnp.broadcast_to(dc[..., None, None], (R, B, size, size))
    v_blk = jnp.broadcast_to(a[..., None, :], (R, B, size, size))
    h_blk = jnp.broadcast_to(left[..., :, None], (R, B, size, size))
    tm_blk = _clip255(left[..., :, None] + a[..., None, :] - tl[..., None, None])
    m = mode[..., None, None]
    return jnp.where(
        m == 0, dc_blk, jnp.where(m == 1, v_blk, jnp.where(m == 2, h_blk, tm_blk))
    )


def _shift_down_rows(a):
    """Row r receives row r-1's value; row 0 receives zeros. Axis 0 = R."""
    return jnp.concatenate([jnp.zeros_like(a[:1]), a[:-1]], axis=0)


# Ring-buffer access without dynamic_slice/scatter: Pallas TPU (Mosaic) has
# no lowering for dynamic indexing on *values*, so 3-slot rings are read and
# written with selects keyed on the (traced) slot scalar.

def ring_read(ring, slot):
    return jnp.where(slot == 0, ring[0], jnp.where(slot == 1, ring[1], ring[2]))


def ring_write(ring, slot, val):
    idx = jax.lax.broadcasted_iota(jnp.int32, (3,) + (1,) * (ring.ndim - 1), 0)
    return jnp.where(idx == slot, val[None].astype(ring.dtype), ring)


def _blocks_to_spatial(blk, n: int):
    """[R, B, n*n, 16] raster blocks -> [R, B, n*4, n*4] spatial.

    Concat-of-static-slices form (Mosaic has no 6D transpose lowering).
    """
    R, B = blk.shape[:2]
    rows = []
    for by in range(n):
        rows.append(
            jnp.concatenate(
                [blk[:, :, by * n + bx].reshape(R, B, 4, 4) for bx in range(n)],
                axis=-1,
            )
        )
    return jnp.concatenate(rows, axis=-2)


def recon_init_state(mbh: int, batch: int, dtype=jnp.int32):
    R, B = mbh, batch
    return dict(
        rbot_y=jnp.full((3, R, B, 16), 127, dtype),
        rbot_u=jnp.full((3, R, B, 8), 127, dtype),
        rbot_v=jnp.full((3, R, B, 8), 127, dtype),
        left_y=jnp.full((R, B, 16), 129, dtype),
        left_u=jnp.full((R, B, 8), 129, dtype),
        left_v=jnp.full((R, B, 8), 129, dtype),
    )


def recon_step(state, t, res, lmode, bpred, cmode, mbw: int, unroll_i4: bool = True,
               w13=None, r13=None, shift=None, row0=0):
    """One lane-aligned wavefront step.

    state: see recon_init_state. t: scalar step index.
    res   [R, B, 24, 16] residual blocks (16Y + 4U + 4V) for MB (t-2r, r).
    lmode [R, B], bpred [R, B, 16], cmode [R, B].
    Returns (new_state, (recon_y [R,B,16,16], recon_u, recon_v [R,B,8,8])).

    `shift`/`row0` support band sharding over the row axis: `shift` replaces
    the local row shift with one that pulls the boundary row from the
    neighboring shard (ppermute), and `row0` offsets the global row index.

    Every op here is Pallas-TPU-lowerable: static slices, concats, selects,
    broadcasts and one small matmul — no dynamic_slice / scatter on values.
    """
    del unroll_i4  # the I4 loop is always statically unrolled
    if shift is None:
        shift = _shift_down_rows
    R, B = lmode.shape
    # Masks are built from 2-D int32 (Mosaic cannot reshape 1-D bool vectors).
    rows = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0) + row0
    x = t - 2 * rows  # [R, 1] -> broadcasts over B
    at_x0 = x == 0
    at_y0 = rows == 0
    at_right = x == mbw - 1

    s0 = t % 3
    s1 = (t + 2) % 3  # == (t - 1) % 3 for t >= 0
    s2 = (t + 1) % 3  # == (t - 2) % 3

    # --- luma borders ------------------------------------------------------
    a16 = shift(ring_read(state["rbot_y"], s2))  # [R, B, 16]
    tr4 = shift(ring_read(state["rbot_y"], s1))[..., :4]
    tl = shift(ring_read(state["rbot_y"], s0))[..., 15]  # [R, B]
    tr4 = jnp.where(at_right[..., None], a16[..., 15:16], tr4)
    a16 = jnp.where(at_y0[..., None], 127, a16)
    tr4 = jnp.where(at_y0[..., None], 127, tr4)
    tl = jnp.where(at_y0, 127, jnp.where(at_x0, 129, tl))
    left16 = jnp.where(at_x0[..., None], 129, state["left_y"])

    has_above = ~at_y0 & jnp.ones((R, B), bool)
    has_left = ~at_x0 & jnp.ones((R, B), bool)

    # --- I16 path -----------------------------------------------------------
    pred16 = _whole_pred(a16, left16, tl, jnp.minimum(lmode, 3), has_above, has_left, 16)
    res_y_sp = _blocks_to_spatial(res[:, :, :16], 4)
    recon16 = _clip255(pred16 + res_y_sp)

    # --- I4 path: 16 sub-blocks, state as per-subblock [R, B, 4, 4] pieces --
    # (no workspace tensor: borders are assembled by static picks from the
    # MB borders and already-computed neighbor sub-blocks).
    blocks = [[None] * 4 for _ in range(4)]
    for i in range(16):
        sby, sbx = i // 4, i % 4
        c0 = sbx * 4
        if sby == 0:
            a4 = a16[..., c0 : c0 + 4]
            a47 = tr4 if sbx == 3 else a16[..., c0 + 4 : c0 + 8]
            tl_s = tl[..., None] if sbx == 0 else a16[..., c0 - 1 : c0]
        else:
            a4 = blocks[sby - 1][sbx][..., 3, :]
            # Top-right replication: sub-blocks in column 3 use the MB-level
            # TR pixels for every row (create_border_luma rows 4/8/12).
            a47 = tr4 if sbx == 3 else blocks[sby - 1][sbx + 1][..., 3, :]
            tl_s = (
                left16[..., sby * 4 - 1 : sby * 4]
                if sbx == 0
                else blocks[sby - 1][sbx - 1][..., 3, 3:4]
            )
        if sbx == 0:
            l4 = left16[..., sby * 4 : sby * 4 + 4]
        else:
            l4 = blocks[sby][sbx - 1][..., :, 3]
        b13 = jnp.concatenate([tl_s, a4, a47, l4], axis=-1)  # [R, B, 13]
        pred = _predict_b_batch(b13, bpred[:, :, i], w13, r13)  # [R, B, 16]
        blocks[sby][sbx] = _clip255(pred + res[:, :, i]).reshape(R, B, 4, 4)

    i4_y = jnp.concatenate(
        [jnp.concatenate(brow, axis=-1) for brow in blocks], axis=-2
    )
    is_b = (lmode == 4)[..., None, None]
    recon_y = jnp.where(is_b, i4_y, recon16)

    # --- chroma -------------------------------------------------------------
    def chroma(name_b, name_l, res_c):
        a8 = shift(ring_read(state[name_b], s2))
        tlc = shift(ring_read(state[name_b], s0))[..., 7]
        a8 = jnp.where(at_y0[..., None], 127, a8)
        tlc = jnp.where(at_y0, 127, jnp.where(at_x0, 129, tlc))
        left8 = jnp.where(at_x0[..., None], 129, state[name_l])
        pred = _whole_pred(a8, left8, tlc, cmode, has_above, has_left, 8)
        return _clip255(pred + _blocks_to_spatial(res_c, 2))

    recon_u = chroma("rbot_u", "left_u", res[:, :, 16:20])
    recon_v = chroma("rbot_v", "left_v", res[:, :, 20:24])

    new_state = dict(
        rbot_y=ring_write(state["rbot_y"], s0, recon_y[..., 15, :]),
        rbot_u=ring_write(state["rbot_u"], s0, recon_u[..., 7, :]),
        rbot_v=ring_write(state["rbot_v"], s0, recon_v[..., 7, :]),
        left_y=recon_y[..., :, 15].astype(state["left_y"].dtype),
        left_u=recon_u[..., :, 7].astype(state["left_u"].dtype),
        left_v=recon_v[..., :, 7].astype(state["left_v"].dtype),
    )
    return new_state, (recon_y, recon_u, recon_v)


def assemble_plane_v2(stacked, mbw: int, mbh: int, size: int):
    """[T, R, B, size, size] scheduled outputs -> [B, mbh*size, mbw*size]."""
    t_idx = jnp.asarray(
        (np.arange(mbw)[None, :] + 2 * np.arange(mbh)[:, None]).astype(np.int32)
    )  # [mbh, mbw]
    # stacked[t_idx[y, x], y] -> [mbh, mbw, B, size, size]
    mbs = stacked[t_idx, jnp.arange(mbh)[:, None]]
    return (
        mbs.transpose(2, 0, 3, 1, 4)
        .reshape(stacked.shape[2], mbh * size, mbw * size)
    )


@functools.partial(jax.jit, static_argnames=("mbw", "mbh", "simple"))
def decode_frames_fused_v2(residuals, luma_mode, bpred, chroma_mode,
                           level, interior, hev_t, do_sub,
                           mbw: int, mbh: int, simple: bool):
    """Reconstruction + loop filter in ONE lax.scan.

    The two-scan form (reconstruct_frames_v2 then loop_filter_frames_v2)
    materializes the full [T, R, B, ...] recon stream to HBM, assembles
    planes, and re-schedules them — ~170 MB of HBM round-trip per
    768x512x32 batch.  Here filter_step consumes recon_step's outputs
    directly inside the scan (the filter's 2-step emit lag is internal to
    its ring state), so only the final filtered stream is written.
    Bit-exact with the two-scan form.
    """
    from .loopfilter2 import filter_init_state, filter_step

    B = residuals.shape[0]
    T, idx = make_schedule_gather(mbw, mbh)

    def pad2(a):
        return jnp.concatenate([a, jnp.zeros((2,) + a.shape[1:], a.dtype)], axis=0)

    res_s = pad2(schedule_mb_data(residuals, idx))
    lm_s = pad2(schedule_mb_data(luma_mode, idx))
    bp_s = pad2(schedule_mb_data(bpred, idx))
    cm_s = pad2(schedule_mb_data(chroma_mode, idx))
    lv_s = pad2(schedule_mb_data(level.astype(jnp.int32), idx))
    it_s = pad2(schedule_mb_data(interior.astype(jnp.int32), idx))
    hv_s = pad2(schedule_mb_data(hev_t.astype(jnp.int32), idx))
    ds_s = pad2(schedule_mb_data(do_sub, idx))

    rstate = recon_init_state(mbh, B, residuals.dtype)
    fstate = filter_init_state(mbh, B, simple)
    rkeys, fkeys = tuple(rstate), tuple(fstate)

    def step(state, inp):
        t, res, lm, bp, cm, lv, it, hv, ds = inp
        nrs, (ry, ru, rv) = recon_step(
            {k: state[k] for k in rkeys}, t, res, lm, bp, cm, mbw
        )
        nfs, outs = filter_step(
            {k: state[k] for k in fkeys}, t, ry, ru, rv, lv, it, hv, ds,
            mbw, simple,
        )
        # In simple mode chroma is never filtered: emit the recon stream.
        emit = outs if not simple else (outs[0], ru, rv)
        return {**nrs, **nfs}, emit

    _, (fy, cu, cv) = jax.lax.scan(
        step, {**rstate, **fstate},
        (jnp.arange(T + 2), res_s, lm_s, bp_s, cm_s, lv_s, it_s, hv_s, ds_s),
        unroll=2,
    )
    y = assemble_plane_v2(fy[2:], mbw, mbh, 16).astype(jnp.uint8)
    if simple:
        u = assemble_plane_v2(cu[:T], mbw, mbh, 8).astype(jnp.uint8)
        v = assemble_plane_v2(cv[:T], mbw, mbh, 8).astype(jnp.uint8)
    else:
        u = assemble_plane_v2(cu[2:], mbw, mbh, 8).astype(jnp.uint8)
        v = assemble_plane_v2(cv[2:], mbw, mbh, 8).astype(jnp.uint8)
    return y, u, v


@functools.partial(jax.jit, static_argnames=("mbw", "mbh", "unroll_i4"))
def reconstruct_frames_v2(residuals, luma_mode, bpred, chroma_mode, mbw: int, mbh: int,
                          unroll_i4: bool = False):
    """Batched lane-aligned reconstruction under lax.scan.

    residuals [B, nmb, 24, 16] int32, luma_mode [B, nmb], bpred [B, nmb, 16],
    chroma_mode [B, nmb] -> (y [B, mbh*16, mbw*16], u, v) uint8.
    """
    B = residuals.shape[0]
    T, idx = make_schedule_gather(mbw, mbh)
    res_s = schedule_mb_data(residuals, idx)      # [T, R, B, 24, 16]
    lm_s = schedule_mb_data(luma_mode, idx)       # [T, R, B]
    bp_s = schedule_mb_data(bpred, idx)           # [T, R, B, 16]
    cm_s = schedule_mb_data(chroma_mode, idx)     # [T, R, B]

    state = recon_init_state(mbh, B, residuals.dtype)

    def step(state, inp):
        t, res, lm, bp, cm = inp
        return recon_step(state, t, res, lm, bp, cm, mbw, unroll_i4=unroll_i4)

    _, (ys, us, vs) = jax.lax.scan(
        step, state, (jnp.arange(T), res_s, lm_s, bp_s, cm_s)
    )
    return (
        assemble_plane_v2(ys, mbw, mbh, 16).astype(jnp.uint8),
        assemble_plane_v2(us, mbw, mbh, 8).astype(jnp.uint8),
        assemble_plane_v2(vs, mbw, mbh, 8).astype(jnp.uint8),
    )
