"""Benchmark: Kodak-geometry (768x512) decode + Q75 method-4 encode.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline (BASELINE.md): reference Rust codec, single x86 thread —
4.2 ms decode + 65 ms encode per 768x512 image => 14.45 images/s.

Measures steady-state batched throughput on the attached accelerator:
 - encode: device wavefront RD analysis (batched) + host probability
   adaptation, contexts, and native token/header coding per image.
 - decode: native host entropy pass + one batched device call (IDCT,
   wavefront reconstruction, wavefront loop filter, color conversion).
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np

BASELINE_IMAGES_PER_S = 1.0 / (0.0042 + 0.065)
BATCH = 8


def make_test_images(n):
    golden = Path("/root/reference/tests/reference/gallery1/3.png")
    rng = np.random.RandomState(7)
    if golden.exists():
        from PIL import Image

        base = np.asarray(Image.open(golden))[:512, :768, :3]
    else:
        base = np.kron(
            rng.randint(0, 255, size=(32, 48, 3), dtype=np.uint8),
            np.ones((16, 16, 1), dtype=np.uint8),
        ).astype(np.uint8)
    return [
        np.clip(base.astype(np.int32) + rng.randint(-4, 5, base.shape), 0, 255).astype(np.uint8)
        for _ in range(n)
    ]


def main():
    imgs = make_test_images(BATCH)

    from webp_tpu.container import chunks as ck
    from webp_tpu.container.demux import WebPDecoder
    from webp_tpu.decode.device import decode_vp8_batch_device
    from webp_tpu.encode.vp8 import encode_frames_lossy_batch

    def encode_all():
        return encode_frames_lossy_batch(imgs, 75, 4)

    # Warmup: compiles the encoder kernel for this geometry.
    t0 = time.time()
    vp8s = encode_all()
    warm_encode = time.time() - t0

    t0 = time.time()
    vp8s = encode_all()
    t_encode = (time.time() - t0) / BATCH

    def wrap(v):
        c = b"VP8 " + len(v).to_bytes(4, "little") + v + (b"\x00" if len(v) & 1 else b"")
        return b"RIFF" + (4 + len(c)).to_bytes(4, "little") + b"WEBP" + c

    payloads = [WebPDecoder(wrap(v))._chunk_bytes(ck.VP8) for v in vp8s]

    decode_vp8_batch_device(payloads)  # warmup/compile
    t0 = time.time()
    n_reps = 3
    for _ in range(n_reps):
        rgb = decode_vp8_batch_device(payloads)
    t_decode = (time.time() - t0) / (n_reps * BATCH)

    per_image = t_encode + t_decode
    images_per_s = 1.0 / per_image
    print(
        json.dumps(
            {
                "metric": "images/sec/chip (768x512 decode + Q75-m4 encode, batch=8)",
                "value": round(images_per_s, 4),
                "unit": "images/s",
                "vs_baseline": round(images_per_s / BASELINE_IMAGES_PER_S, 4),
                "detail": {
                    "t_encode_s_per_img": round(t_encode, 4),
                    "t_decode_s_per_img": round(t_decode, 4),
                    "warmup_encode_s": round(warm_encode, 2),
                    "webp_bytes": len(vp8s[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
