"""Differential entropy-path testing: the python and C++ boolean decoders
must produce identical mode/coefficient tensors on the whole lossy corpus
(pattern: the reference keeps a second arithmetic decoder purely to diff
against, /root/reference/src/decoder/bit_reader.rs:672-778).
"""

import numpy as np
import pytest

from webp_tpu.container import chunks as ck
from webp_tpu.container.demux import WebPDecoder
from webp_tpu.decode.vp8 import Vp8Decoder
from webp_tpu.io import native

LOSSY = [
    ("gallery1", "1.webp"),
    ("gallery1", "2.webp"),
    ("gallery1", "3.webp"),
    ("gallery1", "4.webp"),
    ("gallery1", "5.webp"),
    ("gallery2", "1_webp_a.webp"),
    ("regression", "dark.webp"),
    ("animated", "random_lossy.webp"),
]

FIELDS = [
    "luma_mode", "chroma_mode", "segment_ids", "bpred", "skipped",
    "non_zero_dct", "has_ac", "coeffs",
]


def _vp8_payload(path):
    payload = WebPDecoder(path.read_bytes())._chunk_bytes(ck.VP8)
    if payload is None:
        pytest.skip(f"{path.name} has no VP8 chunk (lossless)")
    return payload


@pytest.mark.parametrize("sub,name", LOSSY)
def test_native_and_python_entropy_agree(fixtures, sub, name):
    if not native.available():
        pytest.skip("native library unavailable")
    path = fixtures / sub / name
    if not path.exists():
        pytest.skip(f"{path} missing")
    payload = _vp8_payload(path)

    dn = Vp8Decoder(bytes(payload))
    dn.parse(allow_native=True)
    dp = Vp8Decoder(bytes(payload))
    dp.parse(allow_native=False)

    assert (dn.width, dn.height) == (dp.width, dp.height)
    assert dn.filter_level == dp.filter_level
    assert dn.filter_type == dp.filter_type
    for f in FIELDS:
        np.testing.assert_array_equal(
            np.asarray(getattr(dn, f)), np.asarray(getattr(dp, f)), err_msg=f
        )


@pytest.mark.parametrize("sub,name", LOSSY)
def test_levels_mode_matches_coeff_mode(fixtures, sub, name):
    """The int16 levels-mode batch parse must dequantize to the same coeff
    tensors the legacy native path produces (Y2 fold checked via device
    decode tests; here: modes, skip, and per-position dequant of Y/UV)."""
    if not native.available():
        pytest.skip("native library unavailable")
    path = fixtures / sub / name
    if not path.exists():
        pytest.skip(f"{path} missing")
    payload = _vp8_payload(path)

    from webp_tpu.decode.device import parse_levels_batch, _u8_fields

    dn = Vp8Decoder(bytes(payload))
    dn.parse(allow_native=True)

    batch = parse_levels_batch([payload])
    nmb = dn.mbw * dn.mbh
    fields, _ = _u8_fields(nmb)

    def f8(namef):
        off, width = fields[namef]
        v = batch["u8buf"][0, off : off + nmb * width]
        return v if width == 1 else v.reshape(nmb, width)

    np.testing.assert_array_equal(f8("luma_mode"), dn.luma_mode)
    np.testing.assert_array_equal(f8("chroma_mode"), dn.chroma_mode)
    np.testing.assert_array_equal(f8("skipped").astype(bool), dn.skipped)
    np.testing.assert_array_equal(f8("segment_ids"), dn.segment_ids)

    levels = batch["i16buf"][0, : nmb * 400].reshape(nmb, 25, 16).astype(np.int64)
    qtab = batch["qtab"][0].reshape(4, 25, 16).astype(np.int64)
    sid = f8("segment_ids").astype(np.int64)
    deq = levels * qtab[sid]
    # Y blocks: AC positions 1.. must match the coeff-mode output for I16 MBs
    # (DC comes from the Y2 fold there); whole blocks for I4 MBs.
    i4 = dn.luma_mode == 4
    np.testing.assert_array_equal(deq[:, :16, 1:], dn.coeffs[:, :16, 1:])
    np.testing.assert_array_equal(deq[i4][:, :16, 0], dn.coeffs[i4][:, :16, 0])
    # Chroma blocks match everywhere.
    np.testing.assert_array_equal(deq[:, 16:24], dn.coeffs[:, 16:24])
