"""Device token statistics must match the host ProbaStats bit-for-bit."""

import numpy as np
import pytest

pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from webp_tpu.common import vp8_tables as T
from webp_tpu.encode import costs as C
from webp_tpu.encode.contexts import compute_contexts
from webp_tpu.encode.vp8 import token_stream
from webp_tpu.ops.token_stats import compute_contexts_j, token_stats_device


def _host_stats(arrays, mbw, mbh):
    skipped = (
        (arrays["y_levels"] == 0).all(axis=(1, 2))
        & (arrays["uv_levels"] == 0).all(axis=(1, 2))
        & (arrays["y2_levels"] == 0).all(axis=1)
    )
    arrays = dict(arrays, skipped=skipped)
    ctx = compute_contexts(
        arrays["luma_mode"], arrays["y2_levels"], arrays["y_levels"],
        arrays["uv_levels"], skipped, mbw, mbh,
    )
    stats = C.ProbaStats()
    levels, meta = token_stream(arrays, ctx, mbw, mbh)
    for t in range(4):
        sel = meta[:, 0] == t
        if sel.any():
            # group by (first, ctx) batches for record_blocks
            for f in (0, 1):
                s2 = sel & (meta[:, 1] == f)
                if s2.any():
                    stats.record_blocks(levels[s2], t, f, meta[s2, 2])
    return skipped, ctx, stats


def _rand_arrays(rng, nmb, mag):
    lm = rng.choice([0, 1, 2, 3, 4], nmb, p=[0.3, 0.1, 0.1, 0.1, 0.4]).astype(np.int64)
    def lv(shape):
        a = rng.randint(-mag, mag + 1, shape)
        a[rng.rand(*shape) < 0.6] = 0
        return a.astype(np.int64)
    y2 = lv((nmb, 16))
    y2[lm == 4] = 0
    y = lv((nmb, 16, 16))
    y[lm != 4, :, 0] = 0  # I16 MBs carry no Y DC in the Y plane
    return dict(
        luma_mode=lm, y2_levels=y2, y_levels=y, uv_levels=lv((nmb, 8, 16)),
        chroma_mode=np.zeros(nmb, np.int64), bpred=np.zeros((nmb, 16), np.int64),
    )


@pytest.mark.parametrize("mag", [1, 4, 90])
def test_device_stats_match_host(mag):
    mbw, mbh = 6, 5
    nmb = mbw * mbh
    rng = np.random.RandomState(mag)
    arrays = _rand_arrays(rng, nmb, mag)
    skipped, ctx, stats = _host_stats(arrays, mbw, mbh)

    # contexts
    y2c, yc, uvc = compute_contexts_j(
        jnp.asarray(arrays["luma_mode"])[None],
        jnp.asarray(arrays["y2_levels"])[None],
        jnp.asarray(arrays["y_levels"])[None],
        jnp.asarray(arrays["uv_levels"])[None],
        mbw, mbh,
    )
    np.testing.assert_array_equal(np.asarray(y2c)[0], ctx["y2_ctx"], err_msg="y2_ctx")
    np.testing.assert_array_equal(np.asarray(yc)[0], ctx["y_ctx"], err_msg="y_ctx")
    np.testing.assert_array_equal(np.asarray(uvc)[0], ctx["uv_ctx"], err_msg="uv_ctx")

    tot, ones = token_stats_device(
        jnp.asarray(arrays["luma_mode"])[None],
        jnp.asarray(arrays["y2_levels"])[None],
        jnp.asarray(arrays["y_levels"])[None],
        jnp.asarray(arrays["uv_levels"])[None],
        jnp.asarray(skipped)[None],
        mbw, mbh,
    )
    np.testing.assert_array_equal(np.asarray(tot)[0], stats.total, err_msg="totals")
    np.testing.assert_array_equal(np.asarray(ones)[0], stats.ones, err_msg="ones")


def test_device_stats_match_host_on_real_encode(goldens):
    from conftest import load_png
    from webp_tpu.encode.vp8 import Vp8Encoder
    from webp_tpu.encode.quant import SegmentParams, quality_to_quant_index

    src = load_png(goldens / "gallery1" / "1.png")[:80, :96].copy()
    enc = Vp8Encoder(75, 3)
    h, w = src.shape[:2]
    enc.mbw, enc.mbh = (w + 15) // 16, (h + 15) // 16
    enc.width, enc.height = w, h
    from webp_tpu.ops.yuv import rgb_to_yuv420

    enc.ybuf, enc.ubuf, enc.vbuf = rgb_to_yuv420(src)
    qi = quality_to_quant_index(75)
    enc.quant_index = qi
    enc.seg = SegmentParams(qi)
    enc.probs = T.COEFF_PROBS_DEFAULT.copy()
    enc.level_costs = C.LevelCosts(enc.probs)
    enc.stats = C.ProbaStats()
    enc._setup_segments(qi)
    arrays = enc._analysis_arrays()

    skipped, ctx, stats = _host_stats(arrays, enc.mbw, enc.mbh)
    tot, ones = token_stats_device(
        jnp.asarray(arrays["luma_mode"])[None],
        jnp.asarray(arrays["y2_levels"])[None],
        jnp.asarray(arrays["y_levels"])[None],
        jnp.asarray(arrays["uv_levels"])[None],
        jnp.asarray(skipped)[None],
        enc.mbw, enc.mbh,
    )
    np.testing.assert_array_equal(np.asarray(tot)[0], stats.total)
    np.testing.assert_array_equal(np.asarray(ones)[0], stats.ones)


def test_enc_tables_from_probs_matches_host():
    """Device-built cost tables must equal the host LevelCosts/EncTables."""
    from webp_tpu.ops.encode_wavefront import EncTables
    from webp_tpu.ops.encode_wavefront2 import enc_tables_from_probs, stack_enc_tables

    rng = np.random.RandomState(2)
    probs = [
        np.clip(rng.randint(1, 255, (4, 8, 3, 11)), 1, 254).astype(np.uint8)
        for _ in range(3)
    ]
    probs[0] = T.COEFF_PROBS_DEFAULT.astype(np.uint8)
    want = stack_enc_tables(
        [EncTables.from_level_costs(C.LevelCosts(p)) for p in probs]
    )
    got = enc_tables_from_probs(jnp.asarray(np.stack(probs)))
    import jax

    for (wl, gl) in zip(jax.tree_util.tree_leaves(want), jax.tree_util.tree_leaves(got)):
        np.testing.assert_array_equal(np.asarray(gl), np.asarray(wl))
