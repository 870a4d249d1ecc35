"""Mode-override replay harness regression (tools/replay_modes.py mechanism).

Parses one of our own bitstreams and replays its per-MB decisions through
the python backend with mode_override forced; the re-encode must land at
~the same size and PSNR as the free-search encode (the decisions being
identical, only probability-adaptation noise differs).  Guards the
diagnostic hook used for libwebp coefficient-pipeline comparisons.
"""

import io

import numpy as np
import pytest
from PIL import Image

from conftest import load_png

import webp_tpu.encode.vp8 as E
from webp_tpu.container import chunks as ck
from webp_tpu.container.demux import WebPDecoder
from webp_tpu.decode.vp8 import Vp8Decoder
from webp_tpu.metrics import psnr
from webp_tpu.ops.yuv import rgb_to_yuv420


def _wrap(v):
    c = b"VP8 " + len(v).to_bytes(4, "little") + v + (b"\x00" if len(v) & 1 else b"")
    return b"RIFF" + (4 + len(c)).to_bytes(4, "little") + b"WEBP" + c


@pytest.mark.slow
def test_self_replay_reproduces_quality(goldens):
    img = load_png(goldens / "gallery1" / "1.png")[:64, :96].copy()
    y, u, v = rgb_to_yuv420(img)

    base_enc = E.Vp8Encoder(80, 4, backend="python", two_pass=True)
    base = base_enc.encode_yuv(y, u, v, 96, 64)
    d = Vp8Decoder(WebPDecoder(_wrap(base))._chunk_bytes(ck.VP8))
    d.parse(allow_native=False)

    enc = E.Vp8Encoder(80, 4, backend="python", two_pass=True)
    enc.mode_override = (d.luma_mode, d.bpred, d.chroma_mode)
    replay = enc.encode_yuv(y, u, v, 96, 64)

    dec_b = np.asarray(Image.open(io.BytesIO(_wrap(base))).convert("RGB"))
    dec_r = np.asarray(Image.open(io.BytesIO(_wrap(replay))).convert("RGB"))
    p_b, p_r = psnr(img, dec_b), psnr(img, dec_r)
    assert abs(len(replay) - len(base)) < 0.05 * len(base), (len(base), len(replay))
    assert abs(p_r - p_b) < 0.25, (p_b, p_r)
