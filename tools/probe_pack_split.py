"""Time the split p2 stages separately: prepack (analysis) vs sparse pack.

Verifies the round-3 diagnosis that the pack was recomputing the analysis:
if the pack on a MATERIALIZED lv8 is itself expensive, the diagnosis was
wrong and the pack algorithm (cumsum+searchsorted) needs replacing.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

BATCH = 32


def main():
    import jax
    import jax.numpy as jnp

    from bench import make_test_images
    from webp_tpu.common import vp8_tables as T
    from webp_tpu.encode import costs as C
    from webp_tpu.encode import vp8 as E
    from webp_tpu.encode.quant import SegmentParams, quality_to_quant_index
    from webp_tpu.ops import yuv as yuvops
    from webp_tpu.ops.encode_wavefront import EncParams, EncTables
    from webp_tpu.ops.encode_wavefront2 import (
        CAP_MB,
        _pack_levels_stage,
        _prepack_batch_pertbl,
        enc_tables_from_probs,
        encode_analysis_stats_batch,
    )

    imgs = make_test_images(BATCH)
    h, w = imgs[0].shape[:2]
    mbw, mbh = (w + 15) // 16, (h + 15) // 16
    pool = E._host_pool()
    planes = list(pool.map(yuvops.rgb_to_yuv420, imgs))
    nmb = mbw * mbh

    qi = quality_to_quant_index(75)
    P = EncParams(SegmentParams(qi))
    TB = EncTables.default()
    Y = jnp.asarray(np.stack([p[0] for p in planes]))
    U = jnp.asarray(np.stack([p[1] for p in planes]))
    V = jnp.asarray(np.stack([p[2] for p in planes]))

    stats = encode_analysis_stats_batch(Y, U, V, P, TB, mbw, mbh, 3, None)
    totals, ones = (np.asarray(a).astype(np.int64) for a in stats)
    default = T.COEFF_PROBS_DEFAULT.copy()

    def probs_for(i):
        st = C.ProbaStats()
        st.total += totals[i]
        st.ones += ones[i]
        return st.updated_probs(default)

    probs = list(pool.map(probs_for, range(BATCH)))
    tables = enc_tables_from_probs(jnp.asarray(np.stack(probs)))

    res = {}

    def timeit(name, fn, reps=3):
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

    pre = timeit(
        "prepack_pertbl_ms",
        lambda: _prepack_batch_pertbl(Y, U, V, P, tables, mbw, mbh, 4, True, None),
    )
    lv8 = pre[0]
    timeit("pack_on_materialized_ms", lambda: _pack_levels_stage(lv8, CAP_MB))
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
