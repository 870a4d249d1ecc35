"""Device token op-stream builder vs the host block writer.

ops/token_ops.block_ops must emit the exact (prob, bit) sequence that
Vp8Encoder._write_block feeds the boolean coder, for every (plane, first,
ctx) combination and level pattern; combined with ops/boolenc2 it must
reproduce a full coefficient-partition bitstream byte for byte.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from webp_tpu.common import vp8_tables as T
from webp_tpu.ops.token_ops import SLOTS, block_ops


class _OpRecorder:
    """Stands in for BoolEncoder; records (bit, prob) pairs."""

    def __init__(self):
        self.ops = []

    def write_bool(self, bit, prob):
        self.ops.append((int(bit), int(prob)))

    def write_with_path(self, path, probs):
        for bit, node in path:
            self.write_bool(bit, int(probs[node]))


def _host_block_ops(levels, plane, first, ctx, probs):
    from webp_tpu.encode.vp8 import Vp8Encoder

    rec = _OpRecorder()
    Vp8Encoder._write_block(None, rec, levels, plane, first, ctx, probs)
    return rec.ops


def _levels_cases(rng, n):
    cases = []
    for _ in range(n):
        lv = np.zeros(16, np.int64)
        kind = rng.randint(5)
        if kind == 0:
            pass  # empty
        elif kind == 1:
            k = rng.randint(1, 16)
            lv[:k] = rng.randint(-4, 5, k)
        elif kind == 2:
            lv[rng.randint(16)] = rng.randint(1, 2048) * rng.choice([-1, 1])
        elif kind == 3:
            lv = rng.randint(-80, 81, 16)
        else:
            lv = rng.choice([0, 0, 0, 1, -1, 2, -2, 5, -7, 12, 40, -70, 600], 16)
        cases.append(lv)
    return cases


def test_block_ops_match_host():
    rng = np.random.RandomState(3)
    probs = rng.randint(1, 256, (4, 8, 3, 11)).astype(np.uint8)
    pf = jnp.asarray(probs.reshape(-1).astype(np.int32))

    cases = []
    metas = []
    for plane, first in ((0, 1), (1, 0), (2, 0), (3, 0)):
        for ctx in (0, 1, 2):
            for lv in _levels_cases(rng, 12):
                if first == 1:
                    pass  # DC position may still carry a (skipped) value
                cases.append(lv)
                metas.append((plane, first, ctx))

    lv_arr = jnp.asarray(np.stack(cases).astype(np.int32))
    pl = jnp.asarray(np.array([m[0] for m in metas], np.int32))
    fi = jnp.asarray(np.array([m[1] for m in metas], np.int32))
    cx = jnp.asarray(np.array([m[2] for m in metas], np.int32))
    prob, bit, valid = (np.asarray(a) for a in block_ops(lv_arr, pl, fi, cx, pf))
    assert prob.shape == (len(cases), SLOTS)

    for i, (lv, (plane, first, ctx)) in enumerate(zip(cases, metas)):
        lvh = lv.copy()
        if first == 1:
            lvh[0] = 0  # the host writer assumes DC rides Y2; device masks it
        want = _host_block_ops(lvh, plane, first, ctx, probs)
        sel = valid[i] != 0
        got = list(zip(bit[i][sel].tolist(), prob[i][sel].tolist()))
        assert got == want, (i, plane, first, ctx, lv)


def test_block_ops_roundtrip_boolenc():
    """block_ops + bool_encode_lanes == BoolEncoder over whole blocks."""
    from webp_tpu.encode.boolenc import BoolEncoder
    from webp_tpu.ops.boolenc2 import assemble_lane, bool_encode_lanes

    rng = np.random.RandomState(9)
    probs = rng.randint(1, 256, (4, 8, 3, 11)).astype(np.uint8)
    pf = jnp.asarray(probs.reshape(-1).astype(np.int32))
    blocks = [rng.randint(-90, 91, 16) * rng.randint(0, 2, 16) for _ in range(40)]
    lv = jnp.asarray(np.stack(blocks).astype(np.int32))
    n = len(blocks)
    pl = jnp.asarray(np.full(n, 3, np.int32))
    fi = jnp.asarray(np.zeros(n, np.int32))
    cx = jnp.asarray(rng.randint(0, 3, n).astype(np.int32))

    prob, bit, valid = block_ops(lv, pl, fi, cx, pf)
    # one lane: all blocks concatenated in order
    p1 = np.asarray(prob).reshape(-1)
    b1 = np.asarray(bit).reshape(-1)
    v1 = np.asarray(valid).reshape(-1)
    lead, data, nb, (bottom, rngs, bit_num) = bool_encode_lanes(
        jnp.asarray(b1[:, None]), jnp.asarray(p1[:, None]),
        jnp.asarray(v1.astype(np.int32)[:, None]), v1.sum() // 4 + 64,
    )
    got = assemble_lane(
        int(np.asarray(lead)[0]), np.asarray(data)[0], int(np.asarray(nb)[0]),
        int(np.asarray(bottom)[0]), int(np.asarray(bit_num)[0]),
    )

    enc = BoolEncoder()
    from webp_tpu.encode.vp8 import Vp8Encoder

    for i, blk in enumerate(blocks):
        Vp8Encoder._write_block(None, enc, blk, 3, 0, int(np.asarray(cx)[i]), probs)
    want = enc.flush()
    assert got == want


@pytest.mark.parametrize("nparts", [1, 2, 4])
def test_coeff_partitions_match_host(nparts):
    """Full device pipeline (contexts -> op streams -> lane boolenc) must
    reproduce the host's coefficient partition bytes exactly."""
    from webp_tpu.encode.boolenc import BoolEncoder
    from webp_tpu.encode.vp8 import Vp8Encoder, derive_skip_and_contexts, token_stream
    from webp_tpu.ops.boolenc2 import assemble_lane
    from webp_tpu.ops.token_ops import encode_coeff_partitions

    rng = np.random.RandomState(11)
    mbw, mbh = 6, 5
    nmb = mbw * mbh
    arrays = dict(
        y_levels=(rng.randint(-30, 31, (nmb, 16, 16))
                  * (rng.rand(nmb, 16, 16) < 0.2)).astype(np.int32),
        uv_levels=(rng.randint(-20, 21, (nmb, 8, 16))
                   * (rng.rand(nmb, 8, 16) < 0.15)).astype(np.int32),
        y2_levels=(rng.randint(-500, 501, (nmb, 16))
                   * (rng.rand(nmb, 16) < 0.4)).astype(np.int32),
        luma_mode=rng.choice([0, 1, 2, 3, 4], nmb).astype(np.int32),
        bpred=np.zeros((nmb, 16), np.int32),
        chroma_mode=np.zeros(nmb, np.int32),
    )
    # a few fully skipped MBs
    for i in rng.choice(nmb, 4, replace=False):
        arrays["y_levels"][i] = 0
        arrays["uv_levels"][i] = 0
        arrays["y2_levels"][i] = 0
    # B-mode MBs carry no Y2
    arrays["y2_levels"][arrays["luma_mode"] == 4] = 0
    probs = rng.randint(1, 256, (4, 8, 3, 11)).astype(np.uint8)

    # Host: the writer's partition loop.
    ctx = derive_skip_and_contexts(arrays, mbw, mbh)
    levels, meta = token_stream(arrays, ctx, mbw, mbh)
    want = []
    for p in range(nparts):
        enc = BoolEncoder()
        psel = (meta[:, 3] % nparts) == p
        for lv, m in zip(levels[psel], meta[psel]):
            Vp8Encoder._write_block(None, enc, lv, int(m[0]), int(m[1]), int(m[2]), probs)
        want.append(enc.flush())

    # Device.
    lead, data, n_bytes, (bottom, rngs, bit_num), n_ops = encode_coeff_partitions(
        jnp.asarray(arrays["y2_levels"]), jnp.asarray(arrays["y_levels"]),
        jnp.asarray(arrays["uv_levels"]), jnp.asarray(arrays["luma_mode"]),
        jnp.asarray(probs.reshape(-1).astype(np.int32)),
        mbw, mbh, nparts, max_ops=nmb * 25 * 40, max_bytes=8192,
    )
    lead, data, n_bytes = np.asarray(lead), np.asarray(data), np.asarray(n_bytes)
    bottom, bit_num = np.asarray(bottom), np.asarray(bit_num)
    for p in range(nparts):
        got = assemble_lane(
            int(lead[p]), data[p], int(n_bytes[p]), int(bottom[p]), int(bit_num[p])
        )
        assert got == want[p], f"partition {p} of {nparts}"


@pytest.mark.slow
def test_batch_device_tokens_byte_equal():
    """encode_frames_lossy_batch(device_tokens=True) == the host writer at
    8 partitions, byte for byte (same analysis, same adapted probs)."""
    from webp_tpu.encode import vp8 as E

    rng = np.random.RandomState(6)
    base = np.kron(
        rng.randint(0, 256, (6, 8, 3)).astype(np.uint8), np.ones((16, 16, 1), np.uint8)
    )
    imgs = [
        np.clip(base.astype(np.int32) + rng.randint(-5, 6, base.shape), 0, 255).astype(np.uint8)
        for _ in range(2)
    ]
    h, w = imgs[0].shape[:2]
    mbw, mbh = w // 16, h // 16
    planes = [E.yuvops.rgb_to_yuv420(im) for im in imgs]

    got = E.encode_frames_lossy_batch(imgs, 75, 4, device_tokens=True)

    # Expectation: same fetched analysis, host token writer at 8 partitions.
    fetched = E.analyze_frames_lossy_batch(
        planes, 75, 4, mbw, mbh, device_tokens=False
    )()
    arrays_list, probs = fetched[0], fetched[1]
    want = []
    for i in range(len(imgs)):
        enc = E.Vp8Encoder(75, 4, backend="device", two_pass=True,
                           num_partitions=E.DEVICE_TOKEN_PARTS)
        enc.probs_override = probs[i]
        enc._setup_segments = lambda qi, e=enc: E.Vp8Encoder._setup_segments_off(e)
        enc._analysis_arrays = lambda a=arrays_list[i]: dict(a)
        y, u, v = planes[i]
        want.append(enc.encode_yuv(y, u, v, w, h))
    assert got == want


def test_mb_headers_match_host():
    """Device MB-header encoding continues a host-written frame header's
    boolean state and reproduces the host writer's partition 0 exactly."""
    import webp_tpu.ops.predict as pr
    from webp_tpu.common import vp8_tables as T
    from webp_tpu.encode.boolenc import BoolEncoder, tree_paths
    from webp_tpu.encode.vp8 import _BPRED_PATHS, _SEG_PATHS, _UV_PATHS, _YMODE_PATHS
    from webp_tpu.ops.boolenc2 import assemble_lane
    from webp_tpu.ops.token_ops import encode_mb_headers

    rng = np.random.RandomState(13)
    for trial, write_segments in ((0, True), (1, False)):
        mbw, mbh = 5, 4
        nmb = mbw * mbh
        lm = rng.choice([0, 1, 2, 3, 4, 4], nmb).astype(np.int32)
        bpred = rng.randint(0, 10, (nmb, 16)).astype(np.int32)
        cm = rng.randint(0, 4, nmb).astype(np.int32)
        sid = rng.randint(0, 4, nmb).astype(np.int32)
        skipped = (rng.rand(nmb) < 0.3).astype(np.int32)
        seg_probs = [30, 128, 200]
        skip_prob = 77

        # Host: fake frame header bits, then the MB loop (python fallback).
        enc = BoolEncoder()
        for _ in range(37):
            enc.write_bool(rng.randint(2), rng.randint(1, 256))
        import copy

        dev_init = (
            np.uint32(enc.bottom), np.int32(enc.range), np.int32(enc.bit_num)
        )
        prefix = bytes(enc.out)

        top_bpred = np.full((mbw, 4), pr.B_DC, np.int32)
        for mby in range(mbh):
            left_bpred = np.full(4, pr.B_DC, np.int32)
            for mbx in range(mbw):
                i = mby * mbw + mbx
                if write_segments:
                    enc.write_with_path(_SEG_PATHS[int(sid[i])], seg_probs)
                enc.write_bool(int(skipped[i]), skip_prob)
                enc.write_with_path(_YMODE_PATHS[int(lm[i])], T.KEYFRAME_YMODE_PROBS)
                if lm[i] == 4:
                    for sy in range(4):
                        for sx in range(4):
                            m = int(bpred[i, sy * 4 + sx])
                            probs_ctx = T.KEYFRAME_BPRED_MODE_PROBS[
                                int(top_bpred[mbx, sx]), int(left_bpred[sy])
                            ]
                            enc.write_with_path(_BPRED_PATHS[m], probs_ctx)
                            top_bpred[mbx, sx] = m
                            left_bpred[sy] = m
                else:
                    bmode = (pr.B_DC, pr.B_VE, pr.B_HE, pr.B_TM)[int(lm[i])]
                    top_bpred[mbx] = bmode
                    left_bpred[:] = bmode
                enc.write_with_path(_UV_PATHS[int(cm[i])], T.KEYFRAME_UV_MODE_PROBS)
        want = enc.flush()

        lead, data, nb, state, n_ops = encode_mb_headers(
            jnp.asarray(lm), jnp.asarray(bpred), jnp.asarray(cm),
            jnp.asarray(sid), jnp.asarray(skipped),
            jnp.asarray(np.asarray(seg_probs, np.int32)),
            jnp.asarray(np.int32(skip_prob)),
            tuple(jnp.asarray(s) for s in dev_init),
            mbw, mbh, write_segments, max_ops=nmb * 120, max_bytes=4096,
        )
        got = assemble_lane(
            int(np.asarray(lead)), np.asarray(data), int(np.asarray(nb)),
            int(np.asarray(state[0])), int(np.asarray(state[2])),
            prefix=prefix,
        )
        assert got == want, f"trial {trial}"
