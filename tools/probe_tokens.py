"""Bisect the device-token path: op building vs boolean scan vs byte pack.

One JSON line of per-stage ms/img at bench geometry.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

BATCH = 8  # smaller batch: stages scale linearly, compiles faster


def main():
    import jax
    import jax.numpy as jnp

    from bench import make_test_images
    from webp_tpu.common import vp8_tables as T
    from webp_tpu.encode import vp8 as E
    from webp_tpu.ops import yuv as yuvops
    from webp_tpu.ops.boolenc2 import bool_encode_lanes
    from webp_tpu.ops.token_ops import (
        SLOTS,
        block_ops,
        compute_contexts_dev,
        encode_coeff_partitions,
    )

    imgs = make_test_images(BATCH)
    h, w = imgs[0].shape[:2]
    mbw, mbh = (w + 15) // 16, (h + 15) // 16
    nmb = mbw * mbh
    planes = list(E._host_pool().map(yuvops.rgb_to_yuv420, imgs))
    arrays, probs, parts, segr = E.analyze_frames_lossy_batch(
        planes, 75, 4, mbw, mbh, segments=False
    )()
    pf = jnp.asarray(
        np.stack(probs).reshape(len(probs), -1).astype(np.int32)
    )
    y2 = jnp.asarray(np.stack([a["y2_levels"] for a in arrays]))
    yl = jnp.asarray(np.stack([a["y_levels"] for a in arrays]))
    uv = jnp.asarray(np.stack([a["uv_levels"] for a in arrays]))
    lm = jnp.asarray(np.stack([a["luma_mode"] for a in arrays]))

    nparts = 8
    max_ops, max_bytes = E._token_budgets(nmb, nparts)
    res = {}

    def timeit(name, fn, reps=2):
        out = fn()
        jax.block_until_ready(out)
        ts = []
        for _ in range(reps):
            t0 = time.time()
            out = fn()
            jax.block_until_ready(out)
            ts.append(time.time() - t0)
        res[name] = round(min(ts) / BATCH * 1e3, 2)
        print(name, res[name], flush=True)
        return out

    # full path
    full = jax.jit(
        jax.vmap(
            lambda a, b, c, d, p: encode_coeff_partitions.__wrapped__(
                a, b, c, d, p, mbw, mbh, nparts, max_ops, max_bytes
            )
        )
    )
    timeit("full_tokens_ms", lambda: full(y2, yl, uv, lm, pf))

    # op building + partition layout only (no boolenc)
    import webp_tpu.ops.token_ops as TO

    def ops_only_one(y2_l, y_l, uv_l, lm_l, pf_l):
        skipped = (
            (y_l == 0).all((-2, -1)) & (uv_l == 0).all((-2, -1)) & (y2_l == 0).all(-1)
        )
        y2c, yc, uvc, hy2, fy = TO.compute_contexts_dev(
            lm_l, y2_l, y_l, uv_l, mbw, mbh
        )
        levels = jnp.concatenate([y2_l[:, None], y_l, uv_l], axis=1)
        plane = jnp.zeros((nmb, 25), jnp.int32).at[:, 0].set(1)
        plane = plane.at[:, 1:17].set(jnp.where(hy2, 0, 3)[:, None]).at[:, 17:].set(2)
        first = jnp.zeros((nmb, 25), jnp.int32).at[:, 1:17].set(fy[:, None])
        ctxs = jnp.concatenate([y2c[:, None], yc, uvc], axis=1)
        blk_ok = jnp.ones((nmb, 25), bool).at[:, 0].set(hy2) & (~skipped)[:, None]
        prob, bit, valid = TO.block_ops(levels, plane, first, ctxs, pf_l)
        valid = valid & blk_ok[..., None]
        return prob.astype(jnp.uint8).sum(), bit.astype(jnp.uint8).sum(), valid.sum()

    ops_only = jax.jit(jax.vmap(ops_only_one))
    timeit("op_build_ms", lambda: ops_only(y2, yl, uv, lm, pf))

    # boolean scan + byte pack alone at the production stream shape
    Tlen = ((mbh + nparts - 1) // nparts) * mbw * 25 * SLOTS
    rng = np.random.RandomState(0)
    bb = jnp.asarray(rng.randint(0, 2, (BATCH, Tlen, nparts), dtype=np.uint8))
    pp = jnp.asarray(rng.randint(1, 256, (BATCH, Tlen, nparts), dtype=np.uint8))
    dens = rng.rand(BATCH, Tlen, nparts) < 0.062
    vv = jnp.asarray(dens.astype(np.uint8))
    be = jax.jit(
        jax.vmap(lambda b, p, v: bool_encode_lanes(b, p, v, max_bytes)),
        static_argnums=(),
    )
    timeit("boolenc_full_ms", lambda: be(bb, pp, vv))
    res["stream_T"] = Tlen
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
