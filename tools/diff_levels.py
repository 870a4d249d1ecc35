"""Diff our coefficient levels against libwebp's under IDENTICAL decisions.

Round-3 finding (NOTES): with libwebp's modes + segment map replayed through
our pipeline, our bitstream comes out smaller but lower-PSNR (U -1.02 dB).
This tool finds the mechanism: encode the crop with libwebp, replay its
modes/segmap through our python-backend encoder, parse BOTH bitstreams with
the decoder's unfolded-levels debug mode, and diff the raw quantized levels
plane by plane / MB by MB.

Usage: JAX_PLATFORMS=cpu python tools/diff_levels.py [quality]
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


def parse_levels(webp_bytes):
    d = Vp8Decoder(WebPDecoder(webp_bytes)._chunk_bytes(ck.VP8))
    d.parse(debug_levels=True)
    return d


def main(q=90, image="/root/reference/tests/reference/gallery1/1.png",
         crop=(256, 320)):
    img = np.asarray(Image.open(image).convert("RGB"))
    if crop:
        img = img[: crop[0], : crop[1]]
    h16, w16 = (img.shape[0] // 16) * 16, (img.shape[1] // 16) * 16
    img = img[:h16, :w16].copy()
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "WEBP", quality=q, method=4)
    lw = buf.getvalue()
    dl = parse_levels(lw)

    # --- replay libwebp's decisions through our encoder (replay_modes.py) ---
    qd = dl.quant_deltas
    print(f"libwebp header: yac_abs {int(dl.yac_abs)} deltas {qd}")
    # Exact per-segment quant indices from the parsed header.  SegmentParams
    # deltas must be RELATIVE TO OUR writer's base (self.quant_index =
    # quality_to_quant_index(q), emitted as yac_abs) or header and recon
    # disagree and PSNR collapses.
    lib_seg_qis = [
        s.quantizer_level + (int(dl.yac_abs) if s.delta_values else 0)
        for s in dl.segments
    ]
    base_qi = quality_to_quant_index(q)
    seg_list = [
        SegmentParams(base_qi, sq - base_qi, uv_ac_delta=qd["uvac"],
                      uv_dc_delta=qd["uvdc"])
        for sq in lib_seg_qis
    ]
    # also replay libwebp's per-segment loop-filter strengths
    for sp, s in zip(seg_list, dl.segments):
        sp.lf_level = s.loopfilter_level + (
            dl.filter_level if s.delta_values else 0
        )
    print("lib seg lf:", [sp.lf_level for sp in seg_list])
    counts = np.bincount(dl.segment_ids, minlength=4)

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
        e.segment_map = dl.segment_ids.astype(np.int32)
        e.segments_list = seg_list
        e.seg_tree_probs = stp

    enc._setup_segments = inject
    enc.mode_override = (dl.luma_mode, dl.bpred, dl.chroma_mode)
    y, u, v = rgb_to_yuv420(img)
    ours = wrap(enc.encode_yuv(y, u, v, img.shape[1], img.shape[0]))
    do = parse_levels(ours)

    rgb_lib = np.asarray(Image.open(io.BytesIO(lw)).convert("RGB"))
    rgb_our = np.asarray(Image.open(io.BytesIO(ours)).convert("RGB"))
    print(f"libwebp: {len(lw)} B  psnr {psnr(img, rgb_lib):.3f}")
    print(f"ours:    {len(ours)} B  psnr {psnr(img, rgb_our):.3f}")
    # per-plane PSNR in the coded YUV domain (against the source planes)
    y, u, v = rgb_to_yuv420(img)
    h, w = img.shape[:2]
    fl = Vp8Decoder(WebPDecoder(lw)._chunk_bytes(ck.VP8)).decode()
    fo = Vp8Decoder(WebPDecoder(ours)._chunk_bytes(ck.VP8)).decode()
    for name, src, a, b in (
        ("Y", y[:h, :w], fl.ybuf[:h, :w], fo.ybuf[:h, :w]),
        ("U", u[: (h + 1) // 2, : (w + 1) // 2],
         fl.ubuf[: (h + 1) // 2, : (w + 1) // 2],
         fo.ubuf[: (h + 1) // 2, : (w + 1) // 2]),
        ("V", v[: (h + 1) // 2, : (w + 1) // 2],
         fl.vbuf[: (h + 1) // 2, : (w + 1) // 2],
         fo.vbuf[: (h + 1) // 2, : (w + 1) // 2]),
    ):
        print(
            f"  {name}-psnr lib {psnr(src, np.asarray(a)):.3f} "
            f"ours {psnr(src, np.asarray(b)):.3f} "
            f"(d {psnr(src, np.asarray(b)) - psnr(src, np.asarray(a)):+.3f})"
        )
    assert np.array_equal(dl.luma_mode, do.luma_mode)
    assert np.array_equal(dl.segment_ids, do.segment_ids)

    La, Lb = dl.levels, do.levels  # [nmb, 25, 16]
    groups = {"Y": range(0, 16), "U": range(16, 20), "V": range(20, 24), "Y2": [24]}
    for name, idx in groups.items():
        a, b = La[:, list(idx)], Lb[:, list(idx)]
        nza, nzb = (a != 0).sum(), (b != 0).sum()
        # energy by coefficient position (zigzag order not applied — slots)
        print(
            f"{name}: nz lib {nza} ours {nzb} ({(nzb-nza)/max(nza,1)*100:+.1f}%)  "
            f"|lvl|sum lib {np.abs(a).sum()} ours {np.abs(b).sum()}  "
            f"DC-nz lib {(a[..., 0] != 0).sum()} ours {(b[..., 0] != 0).sum()}"
        )
    # per-slot histogram of level deltas for chroma
    for name, idx in (("U", range(16, 20)), ("V", range(20, 24))):
        a, b = La[:, list(idx)], Lb[:, list(idx)]
        d = b.astype(np.int64) - a
        nz = d != 0
        print(
            f"{name} diffs: cells {nz.sum()}  mean delta {d[nz].mean() if nz.any() else 0:.3f}  "
            f"ours-smaller {(d[nz] * np.sign(a[nz]) < 0).sum()} ours-bigger "
            f"{(d[nz] * np.sign(a[nz]) > 0).sum()}"
        )
    # FIRST raster-divergent MB: all earlier MBs identical => identical
    # recon borders => identical prediction and residual input, so any
    # difference here is pure quantization mechanics on the same input.
    dall = np.abs(La.astype(np.int64) - Lb).sum((1, 2))
    first = int(np.argmax(dall > 0)) if (dall > 0).any() else -1
    mbw = dl.mbw
    if first >= 0:
        i = first
        print(f"\nFIRST divergent MB {i} (x={i%mbw}, y={i//mbw}) "
              f"seg={dl.segment_ids[i]} mode={dl.luma_mode[i]} |d|={dall[i]}")
        names = [f"Y{j}" for j in range(16)] + [f"U{j}" for j in range(4)] + \
                [f"V{j}" for j in range(4)] + ["Y2"]
        for bi in range(25):
            if not np.array_equal(La[i, bi], Lb[i, bi]):
                print(f" {names[bi]} lib:", La[i, bi].tolist())
                print(f" {names[bi]} our:", Lb[i, bi].tolist())
    # top divergent MBs in U for context
    dU = np.abs(La[:, 16:20].astype(np.int64) - Lb[:, 16:20]).sum((1, 2))
    order = np.argsort(-dU)
    for i in order[:2]:
        print(f"\nMB {i} (x={i%mbw}, y={i//mbw}) |dU|={dU[i]} seg={dl.segment_ids[i]} "
              f"mode={dl.luma_mode[i]}")
        print(" lib U0:", La[i, 16].tolist())
        print(" our U0:", Lb[i, 16].tolist())


if __name__ == "__main__":
    q = int(sys.argv[1]) if len(sys.argv) > 1 else 90
    image = sys.argv[2] if len(sys.argv) > 2 else \
        "/root/reference/tests/reference/gallery1/1.png"
    crop = None
    if len(sys.argv) > 3:
        ch, cw = (int(x) for x in sys.argv[3].split("x"))
        crop = (ch, cw)
    elif len(sys.argv) <= 2:
        crop = (256, 320)
    main(q, image, crop)
