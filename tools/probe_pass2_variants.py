"""Isolate what makes pass-2 slow: sparse compaction vs trellis vs I4 width.

Times encode_analysis_batch_v2 (dense out) and _pertbl_packed (sparse out)
at several (n_try, trellis) points. One JSON line.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

BATCH = 32


def main():
    import jax.numpy as jnp

    from bench import make_test_images
    from webp_tpu.common import vp8_tables as T
    from webp_tpu.encode import vp8 as E
    from webp_tpu.encode.quant import SegmentParams, quality_to_quant_index
    from webp_tpu.ops import yuv as yuvops
    from webp_tpu.ops.encode_wavefront import EncParams
    from webp_tpu.ops.encode_wavefront2 import (
        enc_tables_from_probs,
        encode_analysis_batch_v2_packed,
        encode_analysis_batch_v2_pertbl_packed,
    )

    imgs = make_test_images(BATCH)
    h, w = imgs[0].shape[:2]
    mbw, mbh = (w + 15) // 16, (h + 15) // 16
    pool = E._host_pool()
    planes = list(pool.map(yuvops.rgb_to_yuv420, imgs))

    qi = quality_to_quant_index(75)
    P = EncParams(SegmentParams(qi))
    Y = jnp.asarray(np.stack([p[0] for p in planes]))
    U = jnp.asarray(np.stack([p[1] for p in planes]))
    V = jnp.asarray(np.stack([p[2] for p in planes]))
    probs = jnp.asarray(
        np.broadcast_to(T.COEFF_PROBS_DEFAULT.astype(np.uint8), (BATCH, 4, 8, 3, 11)).copy()
    )
    tables = enc_tables_from_probs(probs)

    res = {}

    def timeit(name, fn):
        out = fn()
        leaves = out.values() if isinstance(out, dict) else out
        for a in leaves:
            a.block_until_ready()
        t0 = time.time()
        out = fn()
        leaves = out.values() if isinstance(out, dict) else out
        for a in leaves:
            a.block_until_ready()
        res[name] = round((time.time() - t0) / BATCH * 1e3, 2)
        print(name, res[name], flush=True)

    from webp_tpu.ops.encode_wavefront import EncTables
    TB = EncTables.default()
    timeit(
        "shared_packed_m4_trellis",
        lambda: encode_analysis_batch_v2_packed(Y, U, V, P, TB, mbw, mbh, 4, True, None),
    )
    timeit(
        "pertbl_packed_m4_trellis",
        lambda: encode_analysis_batch_v2_pertbl_packed(Y, U, V, P, tables, mbw, mbh, 4, True, None),
    )
    timeit(
        "pertbl_packed_m4_notrellis",
        lambda: encode_analysis_batch_v2_pertbl_packed(Y, U, V, P, tables, mbw, mbh, 4, False, None),
    )
    timeit(
        "pertbl_packed_i16only_trellis",
        lambda: encode_analysis_batch_v2_pertbl_packed(Y, U, V, P, tables, mbw, mbh, 0, True, None),
    )
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
