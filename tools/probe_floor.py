"""Isolate the pass-2 floor: raw analysis (no packing) vs device_pack_levels
vs the escape extraction. One JSON line."""

import json
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

BATCH = 32


def main():
    import jax
    import jax.numpy as jnp

    from bench import make_test_images
    from webp_tpu.encode import vp8 as E
    from webp_tpu.encode.quant import SegmentParams, quality_to_quant_index
    from webp_tpu.ops import yuv as yuvops
    from webp_tpu.ops.encode_wavefront import EncParams, EncTables
    from webp_tpu.ops.encode_wavefront2 import encode_analysis_batch_v2
    from webp_tpu.ops.sparse import cap_for, device_pack_levels

    imgs = make_test_images(BATCH)
    h, w = imgs[0].shape[:2]
    mbw, mbh = (w + 15) // 16, (h + 15) // 16
    nmb = mbw * mbh
    pool = E._host_pool()
    planes = list(pool.map(yuvops.rgb_to_yuv420, imgs))

    qi = quality_to_quant_index(75)
    P = EncParams(SegmentParams(qi))
    TB = EncTables.default()
    Y = jnp.asarray(np.stack([p[0] for p in planes]))
    U = jnp.asarray(np.stack([p[1] for p in planes]))
    V = jnp.asarray(np.stack([p[2] for p in planes]))

    res = {}

    def timeit(name, fn):
        out = fn()
        leaves = out.values() if isinstance(out, dict) else (
            out if isinstance(out, (tuple, list)) else [out]
        )
        for a in leaves:
            a.block_until_ready()
        t0 = time.time()
        out = fn()
        leaves = out.values() if isinstance(out, dict) else (
            out if isinstance(out, (tuple, list)) else [out]
        )
        for a in leaves:
            a.block_until_ready()
        res[name] = round((time.time() - t0) / BATCH * 1e3, 2)
        print(name, res[name], flush=True)
        return out

    raw = partial(
        jax.jit, static_argnames=("mbw", "mbh", "n_try", "do_trellis")
    )(encode_analysis_batch_v2)

    out = timeit(
        "analysis_raw_m4_trellis",
        lambda: raw(Y, U, V, P, TB, mbw=mbw, mbh=mbh, n_try=4, do_trellis=True),
    )
    out = timeit(
        "analysis_raw_i16only_trellis",
        lambda: raw(Y, U, V, P, TB, mbw=mbw, mbh=mbh, n_try=0, do_trellis=True),
    )

    rng = np.random.RandomState(0)
    dense = np.where(
        rng.rand(BATCH, nmb * 400) < 0.23,
        rng.randint(-90, 90, (BATCH, nmb * 400)),
        0,
    ).astype(np.int8)
    lv8 = jnp.asarray(dense)
    packer = jax.jit(partial(device_pack_levels, cap=cap_for(nmb)))
    timeit("pack_levels_alone", lambda: packer(lv8))

    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
