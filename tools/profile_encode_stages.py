"""Break the two-pass batched encode into device/host/transfer terms.

Prints one JSON line with per-image ms for each sub-stage so the 100+ ms
steady-state encode is attributable (VERDICT r2 items 1/2/10).
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

BATCH = 32


def t(fn, *a, **k):
    t0 = time.time()
    out = fn(*a, **k)
    return out, time.time() - t0


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
    )

    imgs = make_test_images(BATCH)
    h, w = imgs[0].shape[:2]
    mbw, mbh = (w + 15) // 16, (h + 15) // 16
    planes = list(E._host_pool().map(yuvops.rgb_to_yuv420, imgs))

    qi = quality_to_quant_index(75)
    P = EncParams(SegmentParams(qi))
    TB = EncTables.default()
    Y = jnp.asarray(np.stack([p[0] for p in planes]))
    U = jnp.asarray(np.stack([p[1] for p in planes]))
    V = jnp.asarray(np.stack([p[2] for p in planes]))

    stages = {}

    # ---- pass 1: stats kernel ----
    stats = encode_analysis_stats_batch(Y, U, V, P, TB, mbw, mbh, 3, None)
    jax.block_until_ready(stats)  # warm
    for name, reps in (("p1_stats_device", 3),):
        ts = []
        for _ in range(reps):
            t0 = time.time()
            s = encode_analysis_stats_batch(Y, U, V, P, TB, mbw, mbh, 3, None)
            jax.block_until_ready(s)
            ts.append(time.time() - t0)
        stages[name] = min(ts)

    t0 = time.time()
    totals, ones = (np.asarray(a).astype(np.int64) for a in stats)
    stages["p1_stats_fetch"] = time.time() - t0

    default = T.COEFF_PROBS_DEFAULT.copy()

    def probs_for(i):
        st = C.ProbaStats()
        st.total += totals[i]
        st.ones += ones[i]
        return st.updated_probs(default)

    t0 = time.time()
    probs = list(E._host_pool().map(probs_for, range(BATCH)))
    stages["host_prob_adapt"] = time.time() - t0

    t0 = time.time()
    tables = enc_tables_from_probs(jnp.asarray(np.stack(probs)))
    jax.block_until_ready(tables)
    stages["tables_build_upload"] = time.time() - t0

    # ---- pass 2: RD kernel (device compute only) ----
    packed = encode_analysis_batch_v2_pertbl_packed(
        Y, U, V, P, tables, mbw, mbh, 4, True
    )
    jax.block_until_ready(packed)  # warm
    ts = []
    for _ in range(3):
        t0 = time.time()
        pk = encode_analysis_batch_v2_pertbl_packed(
            Y, U, V, P, tables, mbw, mbh, 4, True
        )
        jax.block_until_ready(pk)
        ts.append(time.time() - t0)
    stages["p2_rd_device"] = min(ts)

    # ---- fetch: sparse download ----
    lv8, bitmap, vals, sp_over, meta8, esc_pos, esc_val, overflow = packed
    t0 = time.time()
    host = [np.asarray(a) for a in (bitmap, vals, meta8, esc_pos, esc_val,
                                    sp_over, overflow)]
    stages["sparse_fetch"] = time.time() - t0
    stages["sparse_fetch_bytes_per_img"] = sum(a.nbytes for a in host) / BATCH

    from webp_tpu.ops.encode_wavefront2 import unpack_analysis_sparse

    t0 = time.time()
    arrays = list(
        E._host_pool().map(
            lambda i: unpack_analysis_sparse(
                host[0][i], host[1][i], host[2][i], host[3][i], host[4][i]
            ),
            range(BATCH),
        )
    )
    stages["host_unpack"] = time.time() - t0

    t0 = time.time()
    vp8s = E.finish_frames_lossy_batch(planes, (arrays, probs), 75, 4, w, h)
    stages["host_entropy"] = time.time() - t0

    out = {
        k: (round(v * 1e3 / BATCH, 2) if not k.endswith("bytes_per_img") else int(v))
        for k, v in stages.items()
    }
    out["sum_ms"] = round(
        sum(v for k, v in out.items() if k.endswith(("device", "fetch", "adapt",
                                                     "upload", "unpack", "entropy"))
            and isinstance(v, float)), 2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
