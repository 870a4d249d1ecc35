"""Replay another encoder's parsed per-MB decisions through our pipeline.

Isolates mode-decision quality from coefficient-coding quality: parse a
libwebp bitstream, force its luma/bpred/chroma modes and segment map into
our python-backend encoder, and compare (size, PSNR) against the original.
If the replay matches libwebp, our coefficient coding is at parity and any
equal-size gap is mode decisions; if not, the quantization/coding path owns
the difference.

Usage: JAX_PLATFORMS=cpu python tools/replay_modes.py [quality]
"""

import io
import sys
from pathlib import Path

import numpy as np
from PIL import Image

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import webp_tpu.encode.vp8 as E
from webp_tpu.common import vp8_tables as T
from webp_tpu.container import chunks as ck
from webp_tpu.container.demux import WebPDecoder
from webp_tpu.decode.vp8 import Vp8Decoder
from webp_tpu.encode.quant import SegmentParams, quality_to_quant_index
from webp_tpu.metrics import psnr
from webp_tpu.ops.yuv import rgb_to_yuv420


def wrap(v):
    c = b"VP8 " + len(v).to_bytes(4, "little") + v + (b"\x00" if len(v) & 1 else b"")
    return b"RIFF" + (4 + len(c)).to_bytes(4, "little") + b"WEBP" + c


def main(q=90):
    img = np.asarray(
        Image.open("/root/reference/tests/reference/gallery1/1.png").convert("RGB")
    )[:256, :320].copy()
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "WEBP", quality=q, method=4)
    lw = buf.getvalue()
    rgb_lib = np.asarray(Image.open(io.BytesIO(lw)).convert("RGB"))
    print(f"libwebp q{q}: size {len(lw)} psnr {psnr(img, rgb_lib):.3f}")

    payload = WebPDecoder(lw)._chunk_bytes(ck.VP8)
    d = Vp8Decoder(payload)
    d.parse(allow_native=False)

    # Rebuild libwebp's segment quants as base-index + per-segment delta
    # (the header signals deltas vs the base yac index).
    AC = np.asarray(T.AC_QUANT)
    base_qi = quality_to_quant_index(q)
    seg_qis = [int(np.argmin(np.abs(AC - s.yac))) for s in d.segments]
    seg_list = [SegmentParams(base_qi, sq - base_qi) for sq in seg_qis]
    counts = np.bincount(d.segment_ids, minlength=4)

    def proba(a, b):
        t = a + b
        return int((255 * a + t // 2) // t) if t else 255

    stp = [
        proba(counts[0] + counts[1], counts[2] + counts[3]),
        proba(counts[0], counts[1]),
        proba(counts[2], counts[3]),
    ]

    enc = E.Vp8Encoder(q, 4, backend="python", two_pass=True)

    def inject(qi, e=enc):
        e.segments_enabled = True
        e.segments_update_map = True
        e.segment_map = d.segment_ids.astype(np.int32)
        e.segments_list = seg_list
        e.seg_tree_probs = stp

    enc._setup_segments = inject
    enc.mode_override = (d.luma_mode, d.bpred, d.chroma_mode)
    y, u, v = rgb_to_yuv420(img)
    vp8 = enc.encode_yuv(y, u, v, 320, 256)
    dec = np.asarray(Image.open(io.BytesIO(wrap(vp8))).convert("RGB"))
    print(
        f"replay (libwebp modes+segmap, our coeffs): size {len(vp8) + 20} "
        f"psnr {psnr(img, dec):.3f}"
    )


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 90)
