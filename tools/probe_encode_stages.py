"""Split encode_analysis_plus_fetch into device-compute vs wire time.

Times, at bench geometry/batch: pass-1 stats kernel, host prob adaptation,
pass-2 pertbl_packed kernel (block on DEVICE arrays only), then the host
fetch+unpack of the packed/sparse outputs. Prints one JSON line.
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
        enc_tables_from_probs,
        encode_analysis_batch_v2_pertbl_packed,
        encode_analysis_stats_batch,
        unpack_analysis_sparse,
    )

    imgs = make_test_images(BATCH)
    h, w = imgs[0].shape[:2]
    mbw, mbh = (w + 15) // 16, (h + 15) // 16
    pool = E._host_pool()
    planes = list(pool.map(yuvops.rgb_to_yuv420, imgs))

    qi = quality_to_quant_index(75)
    P = EncParams(SegmentParams(qi))
    TB = EncTables.default()
    Y = jnp.asarray(np.stack([p[0] for p in planes]))
    U = jnp.asarray(np.stack([p[1] for p in planes]))
    V = jnp.asarray(np.stack([p[2] for p in planes]))

    # ---- warm everything once ----
    stats = encode_analysis_stats_batch(Y, U, V, P, TB, mbw, mbh, 3, None)
    stats[0].block_until_ready()
    totals, ones = (np.asarray(a).astype(np.int64) for a in stats)
    default = T.COEFF_PROBS_DEFAULT.copy()

    def probs_for(i):
        st = C.ProbaStats()
        st.total += totals[i]
        st.ones += ones[i]
        return st.updated_probs(default)

    probs = list(pool.map(probs_for, range(BATCH)))
    tables = enc_tables_from_probs(jnp.asarray(np.stack(probs)))
    packed = encode_analysis_batch_v2_pertbl_packed(
        Y, U, V, P, tables, mbw, mbh, 4, True, None
    )
    packed[1].block_until_ready()

    res = {}
    # ---- timed runs ----
    t0 = time.time()
    stats = encode_analysis_stats_batch(Y, U, V, P, TB, mbw, mbh, 3, None)
    stats[0].block_until_ready()
    res["pass1_stats_device_ms"] = (time.time() - t0) / BATCH * 1e3

    t0 = time.time()
    totals, ones = (np.asarray(a).astype(np.int64) for a in stats)
    probs = list(pool.map(probs_for, range(BATCH)))
    tj = jnp.asarray(np.stack(probs))
    res["probs_adapt_host_ms"] = (time.time() - t0) / BATCH * 1e3

    t0 = time.time()
    tables = enc_tables_from_probs(tj)
    packed = encode_analysis_batch_v2_pertbl_packed(
        Y, U, V, P, tables, mbw, mbh, 4, True, None
    )
    for a in packed:
        a.block_until_ready()
    res["pass2_device_ms"] = (time.time() - t0) / BATCH * 1e3

    lv8, bitmap, vals, sp_over, meta8, esc_pos, esc_val, overflow = packed
    sizes = {
        "bitmap": bitmap.nbytes // BATCH,
        "vals": vals.nbytes // BATCH,
        "meta8": meta8.nbytes // BATCH,
        "esc": (esc_pos.nbytes + esc_val.nbytes) // BATCH,
    }
    t0 = time.time()
    arrs = [np.asarray(a) for a in (bitmap, vals, meta8, esc_pos, esc_val)]
    res["fetch_wire_ms"] = (time.time() - t0) / BATCH * 1e3

    t0 = time.time()
    outs = list(
        pool.map(
            lambda i: unpack_analysis_sparse(
                arrs[0][i], arrs[1][i], arrs[2][i], arrs[3][i], arrs[4][i]
            ),
            range(BATCH),
        )
    )
    res["unpack_host_ms"] = (time.time() - t0) / BATCH * 1e3

    res = {k: round(v, 2) for k, v in res.items()}
    res["wire_bytes_per_img"] = sizes
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
