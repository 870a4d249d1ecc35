"""Measure encode variants on the attached TPU: segments=True and
device_tokens=True warmup + steady-state cost vs the bench default.

Usage: python tools/measure_variants.py [variant ...]
  variants: base, segments, dev_tokens (default: all three)
Prints one JSON line per variant.
"""

import json
import sys
import time
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

BATCH = 32
ROUNDS = 3


def main():
    variants = sys.argv[1:] or ["base", "segments", "dev_tokens"]
    from bench import make_test_images

    from webp_tpu.encode import vp8 as E
    from webp_tpu.ops import yuv as yuvops

    imgs = make_test_images(BATCH)
    h, w = imgs[0].shape[:2]
    mbw, mbh = (w + 15) // 16, (h + 15) // 16
    pool = E._host_pool()
    planes = list(pool.map(yuvops.rgb_to_yuv420, imgs))
    xfer = ThreadPoolExecutor(max_workers=2)

    for name in variants:
        kw = {}
        if name == "segments":
            kw = dict(segments=True)
        elif name == "dev_tokens":
            kw = dict(device_tokens=True)
        segs = name == "segments"
        t0 = time.time()
        arrays = E.analyze_frames_lossy_batch(planes, 75, 4, mbw, mbh, **kw)()
        warm = time.time() - t0
        t0 = time.time()
        vp8s = E.finish_frames_lossy_batch(planes, arrays, 75, 4, w, h,
                                           segments=segs)
        t_host = (time.time() - t0) / BATCH

        t0 = time.time()
        fut = xfer.submit(E.analyze_frames_lossy_batch(planes, 75, 4, mbw, mbh, **kw))
        prev = None
        for r in range(ROUNDS):
            nxt = (
                xfer.submit(E.analyze_frames_lossy_batch(planes, 75, 4, mbw, mbh, **kw))
                if r + 1 < ROUNDS
                else None
            )
            if prev is not None:
                E.finish_frames_lossy_batch(planes, prev, 75, 4, w, h,
                                            segments=segs)
            prev = fut.result()
            fut = nxt
        E.finish_frames_lossy_batch(planes, prev, 75, 4, w, h, segments=segs)
        t_enc = (time.time() - t0) / (ROUNDS * BATCH)
        print(
            json.dumps(
                {
                    "variant": name,
                    "warmup_s": round(warm, 1),
                    "t_encode_ms_per_img": round(t_enc * 1e3, 2),
                    "t_host_entropy_ms": round(t_host * 1e3, 2),
                    "webp_bytes": len(vp8s[0]),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
