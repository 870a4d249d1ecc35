"""Sharded pipelines must be byte-equal to the single-device kernels on REAL
bitstreams (VERDICT round-1 item 4: values, not shapes). Runs on the virtual
8-device CPU mesh from conftest."""

import numpy as np
import pytest

pytest.importorskip("jax")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from webp_tpu.container import chunks as ck
from webp_tpu.container.demux import WebPDecoder
from webp_tpu.decode.device import decode_vp8_batch_device, parse_levels_batch
from webp_tpu.decode.vp8 import Vp8Decoder
from webp_tpu.io import native
from webp_tpu.parallel.mesh import make_mesh
from webp_tpu.parallel.pipeline import (
    decode_wavefront_banded,
    make_decode_batch_sharded,
    make_encode_analysis_sharded,
)

from conftest import load_png


def _payload(fixtures, sub, name):
    p = WebPDecoder((fixtures / sub / name).read_bytes())._chunk_bytes(ck.VP8)
    assert p is not None
    return p


@pytest.fixture(scope="module")
def devices_ok():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")


def test_data_parallel_decode_equals_unsharded(fixtures, devices_ok):
    if not native.available():
        pytest.skip("native library unavailable")
    payload = _payload(fixtures, "gallery1", "2.webp")
    payloads = [payload] * 8

    want = decode_vp8_batch_device(payloads)

    pb = parse_levels_batch(payloads)
    h0 = pb["headers"][0]
    mesh = make_mesh(n_data=4, n_band=1)
    step = make_decode_batch_sharded(
        mesh, int(h0[2]), int(h0[3]), bool(h0[4]), int(h0[0]), int(h0[1])
    )
    got = np.asarray(
        step(
            jnp.asarray(pb["i8buf"]), jnp.asarray(pb["esc_pos"]),
            jnp.asarray(pb["esc_val"]), jnp.asarray(pb["qtab"]),
            jnp.asarray(pb["u8buf"]),
        )
    )
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("name", ["2.webp", "4.webp"])
def test_banded_wavefront_equals_scalar(fixtures, devices_ok, name):
    if not native.available():
        pytest.skip("native library unavailable")
    payload = _payload(fixtures, "gallery1", name)
    dec = Vp8Decoder(bytes(payload))
    dec.parse(allow_native=True)
    level, interior, hev = dec.filter_params_arrays()
    do_sub = (dec.luma_mode == 4) | (~dec.skipped & dec.non_zero_dct)

    from webp_tpu.ops import jax_ops

    coeffs = jnp.asarray(dec.coeffs)
    full = jax_ops.idct4x4(coeffs)
    dc = (coeffs[..., 0:1] + 4) >> 3
    residuals = jnp.where(
        jnp.asarray(dec.has_ac)[..., None], full, jnp.broadcast_to(dc, full.shape)
    )[None]

    n_band = 4 if dec.mbh % 4 == 0 else (2 if dec.mbh % 2 == 0 else 1)
    if n_band == 1:
        pytest.skip("geometry not band-divisible")
    mesh = make_mesh(n_data=1, n_band=n_band)
    y, u, v = decode_wavefront_banded(
        residuals,
        jnp.asarray(dec.luma_mode)[None], jnp.asarray(dec.bpred)[None],
        jnp.asarray(dec.chroma_mode)[None], jnp.asarray(level)[None],
        jnp.asarray(interior)[None], jnp.asarray(hev)[None],
        jnp.asarray(do_sub)[None], mesh, dec.mbw, dec.mbh,
        bool(dec.filter_type),
    )
    ref = dec.decode()
    np.testing.assert_array_equal(np.asarray(y)[0], ref.ybuf)
    np.testing.assert_array_equal(np.asarray(u)[0], ref.ubuf)
    np.testing.assert_array_equal(np.asarray(v)[0], ref.vbuf)


def test_sharded_encode_analysis_equals_unsharded(goldens, devices_ok):
    from webp_tpu.encode.quant import SegmentParams, quality_to_quant_index
    from webp_tpu.ops.encode_wavefront import EncParams, EncTables
    from webp_tpu.ops.encode_wavefront2 import encode_analysis_batch_v2
    from webp_tpu.ops.yuv import rgb_to_yuv420

    src = load_png(goldens / "gallery1" / "1.png")[:64, :96].copy()
    rng = np.random.RandomState(0)
    imgs = [
        np.clip(src.astype(np.int32) + rng.randint(-4, 5, src.shape), 0, 255).astype(
            np.uint8
        )
        for _ in range(8)
    ]
    planes = [rgb_to_yuv420(im) for im in imgs]
    Y = jnp.asarray(np.stack([p[0] for p in planes]))
    U = jnp.asarray(np.stack([p[1] for p in planes]))
    V = jnp.asarray(np.stack([p[2] for p in planes]))
    mbw, mbh = 6, 4
    qi = quality_to_quant_index(75)
    P, TB = EncParams(SegmentParams(qi)), EncTables.default()

    want = encode_analysis_batch_v2(Y, U, V, P, TB, mbw, mbh, 3, False)
    mesh = make_mesh(n_data=8, n_band=1)
    step = make_encode_analysis_sharded(mesh, mbw, mbh, 3, False)
    got = step(Y, U, V, P, TB)
    for k in want:
        np.testing.assert_array_equal(np.asarray(got[k]), np.asarray(want[k]), err_msg=k)


def test_sharded_token_encode_all_gather():
    """Device token coding under shard_map: every device encodes its image
    shard's partitions and the bitstreams all_gather over `data` — equal to
    the unsharded per-image encoding."""
    import jax.numpy as jnp

    from webp_tpu.ops.token_ops import encode_coeff_partitions
    from webp_tpu.parallel.mesh import make_mesh
    from webp_tpu.parallel.pipeline import make_encode_tokens_sharded

    rng = np.random.RandomState(4)
    mbw, mbh, B, nparts = 4, 4, 8, 2
    nmb = mbw * mbh
    y2 = (rng.randint(-60, 61, (B, nmb, 16)) * (rng.rand(B, nmb, 16) < 0.3)).astype(np.int32)
    yl = (rng.randint(-25, 26, (B, nmb, 16, 16)) * (rng.rand(B, nmb, 16, 16) < 0.2)).astype(np.int32)
    uv = (rng.randint(-15, 16, (B, nmb, 8, 16)) * (rng.rand(B, nmb, 8, 16) < 0.15)).astype(np.int32)
    lm = rng.choice([0, 1, 2, 3, 4], (B, nmb)).astype(np.int32)
    y2[np.broadcast_to((lm == 4)[..., None], y2.shape)] = 0
    probs = rng.randint(1, 256, (B, 4 * 8 * 3 * 11)).astype(np.int32)

    mesh = make_mesh(n_data=8, n_band=1)
    max_ops, max_bytes = nmb * 420, 4096
    step = make_encode_tokens_sharded(mesh, mbw, mbh, nparts, max_ops, max_bytes)
    lead_s, tok_s, tokn_s, bot_s, bn_s = (np.asarray(a) for a in step(
        jnp.asarray(y2), jnp.asarray(yl), jnp.asarray(uv),
        jnp.asarray(lm), jnp.asarray(probs),
    ))

    for b in range(B):
        lead, tok, tok_n, state, _ = encode_coeff_partitions(
            jnp.asarray(y2[b]), jnp.asarray(yl[b]), jnp.asarray(uv[b]),
            jnp.asarray(lm[b]), jnp.asarray(probs[b]),
            mbw, mbh, nparts, max_ops, max_bytes,
        )
        assert np.array_equal(lead_s[b], np.asarray(lead)), b
        assert np.array_equal(tokn_s[b], np.asarray(tok_n)), b
        assert np.array_equal(tok_s[b], np.asarray(tok)), b
        assert np.array_equal(bot_s[b], np.asarray(state[0])), b
        assert np.array_equal(bn_s[b], np.asarray(state[2])), b
