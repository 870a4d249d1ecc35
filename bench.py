"""Benchmark: Kodak-geometry (768x512) decode + Q75 method-4 encode.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline (BASELINE.md): reference Rust codec, single x86 thread —
4.2 ms decode + 65 ms encode per 768x512 image => 14.45 images/s.

Decode here = host entropy pass + device pipeline (batched IDCT, wavefront
reconstruction, wavefront loop filter, color conversion) on the attached
accelerator. Encode = full RD encoder. Numbers are steady-state (after one
warmup) over a small batch.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np

BASELINE_IMAGES_PER_S = 1.0 / (0.0042 + 0.065)


def make_test_image():
    """768x512 RGB: crop of the reference corpus golden if present."""
    golden = Path("/root/reference/tests/reference/gallery1/3.png")
    if golden.exists():
        from PIL import Image

        img = np.asarray(Image.open(golden))[:512, :768]
        if img.shape[0] == 512 and img.shape[1] == 768:
            return np.ascontiguousarray(img[:, :, :3])
    rng = np.random.RandomState(7)
    base = rng.randint(0, 255, size=(32, 48, 3), dtype=np.uint8)
    img = np.kron(base, np.ones((16, 16, 1), dtype=np.uint8))
    return img.astype(np.uint8)


def main():
    img = make_test_image()

    from webp_tpu.encode.api import Encoder

    # --- encode ---
    t0 = time.time()
    webp = Encoder.new_rgb(img).with_quality(75).with_method(4).encode()
    t_encode = time.time() - t0

    # --- decode: host entropy + device pipeline ---
    from webp_tpu.container import chunks as ck
    from webp_tpu.container.demux import WebPDecoder
    from webp_tpu.decode.device import decode_vp8_frame_device

    d = WebPDecoder(webp)
    vp8 = d._chunk_bytes(ck.VP8)

    # Warmup (compiles the device pipeline).
    decode_vp8_frame_device(vp8)
    n = 3
    t0 = time.time()
    for _ in range(n):
        frame, rgb = decode_vp8_frame_device(vp8)
    t_decode = (time.time() - t0) / n

    per_image = t_encode + t_decode
    images_per_s = 1.0 / per_image
    print(
        json.dumps(
            {
                "metric": "images/sec/chip (768x512 decode + Q75-m4 encode)",
                "value": round(images_per_s, 4),
                "unit": "images/s",
                "vs_baseline": round(images_per_s / BASELINE_IMAGES_PER_S, 4),
                "detail": {
                    "t_encode_s": round(t_encode, 4),
                    "t_decode_s": round(t_decode, 4),
                    "webp_bytes": len(webp),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
