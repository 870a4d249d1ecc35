"""Benchmark: Kodak-geometry (768x512) decode + Q75 method-4 encode.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline", "detail"}.
Baseline (BASELINE.md): reference Rust codec, single x86 thread —
4.2 ms decode + 65 ms encode per 768x512 image => 14.45 images/s.

Measures steady-state pipelined throughput on the attached accelerator:
 - encode: batched device wavefront RD analysis with host probability
   adaptation / contexts / native token+header coding of batch i
   overlapping the device analysis of batch i+1.  Segment quantization
   (k-means, reference parity at >=256 MBs) and the device token coder
   are controlled by env vars (defaults chosen by measurement, see
   NOTES.md): WEBP_TPU_BENCH_SEGMENTS=0/1, WEBP_TPU_DEVICE_TOKENS=0/1.
 - decode: threaded native host entropy parse + one batched device call
   (escape scatter, dequant, IDCT, wavefront recon, wavefront loop filter,
   color conversion), batches pipelined the same way.  The headline decode
   number leaves pixels device-resident (the TPU-native consumption model —
   downstream stages read them on-device); the host-fetch cost is reported
   separately in detail.stages.

Trustworthiness (VERDICT r2 item 2): every steady-state number is the
median over WEBP_TPU_BENCH_ROUNDS pipelined rounds with the relative
spread (max-min)/median reported alongside; warmup compiles hit the
persistent XLA compilation cache (.jax_cache/, wired in webp_tpu/__init__),
so round 2 of any run — and every later process — skips them; and
`bytes_per_image` reports actual host<->device traffic both directions so
transfer-bound stages are attributable.
"""

import json
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np

BASELINE_IMAGES_PER_S = 1.0 / (0.0042 + 0.065)
# 64 beats 32 since the round-4 pack fix: every device stage is
# latency-bound, so a bigger batch amortizes the wavefront scan's fixed
# per-step cost across more images (32: ~12.7 img/s, 64: ~15.0, 96: ~14.4
# measured; round 3's "batch 64 worse" verdict was an artifact of the old
# searchsorted level pack).
BATCH = int(os.environ.get("WEBP_TPU_BENCH_BATCH", "64"))
ROUNDS = int(os.environ.get("WEBP_TPU_BENCH_ROUNDS", "9"))
SEGMENTS = os.environ.get("WEBP_TPU_BENCH_SEGMENTS", "1") == "1"
# The container's 8-coefficient-partition hook (SURVEY §2.4.1): spreads the
# serial boolean-coder tail across 8 independent streams per image (+0.1%
# bytes measured; decodes identically).  The flagship runs it ON.
NPARTS = int(os.environ.get("WEBP_TPU_BENCH_PARTS", "8"))
MPIX = 768 * 512 / 1e6


def make_test_images(n):
    """n distinct-content 768x512 crops rotating through ALL 5 gallery1
    photos (VERDICT r3 item 10: a homogeneous corpus flatters the
    skip/segment distribution).  Images 1/2 are 550px wide — reflect-pad
    to the bench geometry so every batch slot compiles identically."""
    gallery = sorted(Path("/root/reference/tests/reference/gallery1").glob("[0-9].png"))
    rng = np.random.RandomState(7)
    bases = []
    if gallery:
        from PIL import Image

        for p in gallery:
            a = np.asarray(Image.open(p))[:512, :768, :3]
            if a.shape != (512, 768, 3):
                a = np.pad(
                    a,
                    ((0, 512 - a.shape[0]), (0, 768 - a.shape[1]), (0, 0)),
                    mode="reflect",
                )
            bases.append(a)
    if not bases:
        bases = [
            np.kron(
                rng.randint(0, 255, size=(32, 48, 3), dtype=np.uint8),
                np.ones((16, 16, 1), dtype=np.uint8),
            ).astype(np.uint8)
        ]
    return [
        np.clip(
            bases[i % len(bases)].astype(np.int32) + rng.randint(-4, 5, bases[0].shape),
            0,
            255,
        ).astype(np.uint8)
        for i in range(n)
    ]


def spread(xs):
    med = statistics.median(xs)
    return (max(xs) - min(xs)) / med if med else 0.0


# v5e (TPU v5 lite) single-chip peaks used for roofline accounting.
PEAK_FLOPS = 197e12  # bf16 MXU
PEAK_HBM = 819e9  # bytes/s


def roofline(mbw, mbh, t_p1, t_p2, t_pack, t_dec):
    """Per-device-stage modeled flops + HBM bytes vs measured time
    (VERDICT r3 item 8).  Models are order-of-magnitude lower bounds of
    the algorithmic work, derived from the per-MB operation counts below;
    they exist to show WHICH resource bounds each stage, not to be exact.

    Per 768x512 image (nmb = 1536):
      p1 stats: ~3 I16 + 3-mode I4 + UV trials/MB, DCT+quant+recon ~=
        160k flops/MB; reads YUV (0.6 MB) + writes stats (few KB);
        intermediates ~8 passes over the frame ~= 6 MB.
      p2 RD: 4-try I4 + trellis ~= 260k flops/MB; ~15 MB HBM traffic
        (candidate tensors + lv8 write).
      pack: per-MB one-hot contraction 400*CAP_MB*2 flops/MB; reads lv8
        (0.6 MB) + writes vals (0.4 MB).
      decode scan: dequant+IDCT+predict+filter+upsample ~= 120k flops/MB;
        ~6 frame passes ~= 7 MB.
    A stage is "latency-bound" when BOTH utilizations are <5%: the cost is
    scan-step/dispatch overhead (the wavefront lax.scan runs mbw + 2*mbh
    sequential steps), not compute or bandwidth.
    """
    from webp_tpu.ops.encode_wavefront2 import CAP_MB

    nmb = mbw * mbh
    stages = {
        "p1_stats": (160e3 * nmb, 6e6, t_p1),
        "p2_rd": (260e3 * nmb, 15e6, t_p2),
        "pack": (400 * CAP_MB * 2 * nmb, 1.5e6, t_pack),
        "decode_scan": (120e3 * nmb, 7e6, t_dec),
    }
    out = {}
    for name, (flops, hbm, t) in stages.items():
        if not t or t <= 0:
            continue
        fu = flops / t / PEAK_FLOPS
        bu = hbm / t / PEAK_HBM
        bound = (
            "latency" if (fu < 0.05 and bu < 0.05) else ("hbm" if bu > fu else "compute")
        )
        out[name] = {
            "model_gflop": round(flops / 1e9, 3),
            "model_hbm_mb": round(hbm / 1e6, 1),
            "measured_ms": round(t * 1e3, 2),
            "mfu_pct": round(fu * 100, 3),
            "hbm_util_pct": round(bu * 100, 3),
            "bound": bound,
        }
    return out


def main():
    imgs = make_test_images(BATCH)

    from webp_tpu.container import chunks as ck
    from webp_tpu.container.demux import WebPDecoder
    from webp_tpu.decode import device as D
    from webp_tpu.encode import vp8 as E
    from webp_tpu.ops import yuv as yuvops

    h, w = imgs[0].shape[:2]
    mbw, mbh = (w + 15) // 16, (h + 15) // 16
    pool = E._host_pool()
    analyze = lambda: E.analyze_frames_lossy_batch(
        planes, 75, 4, mbw, mbh, segments=SEGMENTS
    )
    finish = lambda fetched: E.finish_frames_lossy_batch(
        planes, fetched, 75, 4, w, h, segments=SEGMENTS, num_partitions=NPARTS
    )

    # ---------------- encode ----------------
    t0 = time.time()
    planes = list(pool.map(yuvops.rgb_to_yuv420, imgs))
    t_rgb2yuv = (time.time() - t0) / BATCH

    t0 = time.time()
    arrays = analyze()()
    warm_encode = time.time() - t0
    t0 = time.time()
    vp8s = finish(arrays)
    t_enc_host = (time.time() - t0) / BATCH

    # stage probes (one round each, unpipelined)
    t0 = time.time()
    fetch = analyze()
    t_enc_dispatch = time.time() - t0  # upload + launch (async)
    t0 = time.time()
    arrays = fetch()
    t_enc_fetch = (time.time() - t0) / BATCH  # device compute + down transfer

    # Steady state: an explicit 3-stage software pipeline with deterministic
    # device-stream order (stats(i), pass2(i), stats(i+1), pass2(i+1), ...).
    #  - k-means for batch i+1 runs in the host pool (a lane of its own),
    #  - the fetch closure's `chain` hook dispatches batch i+1's pass-1
    #    kernel IMMEDIATELY after batch i's pass-2 kernel is enqueued, so
    #    the device stays busy through batch i's downloads,
    #  - host entropy coding of batch i-1 runs on the main thread.
    # (One free-running lane per stage; racing two dispatch lanes makes the
    # stream order nondeterministic and shows up as bimodal round times.)
    from concurrent.futures import ThreadPoolExecutor

    xfer = ThreadPoolExecutor(max_workers=1)
    dec_lane = ThreadPoolExecutor(max_workers=1)
    E.XFER.update(up=0, down=0)
    enc_times = []
    seg_of = (
        (lambda: E.compute_seg_results(planes, 75, mbw, mbh))
        if SEGMENTS
        else (lambda: None)
    )
    analyze_with = lambda segs: E.analyze_frames_lossy_batch(
        planes, 75, 4, mbw, mbh, segments=SEGMENTS, seg_results=segs
    )
    fetch_i = analyze_with(seg_of())
    prev_arrays = None
    holder = {}

    # Both hooks run ON the xfer thread, so EVERY device dispatch (segment
    # alpha analysis, pass 1, pass 2) goes through this single lane in a
    # fixed order — ADVICE r4: a second dispatch lane races the stream
    # order and shows up as bimodal round times.  early() enqueues the
    # NEXT batch's small alpha kernel BEFORE this batch's pass-2 kernel;
    # chain() then collects it with a near-zero wait, runs k-means, and
    # dispatches the next pass-1 — all ahead of this batch's ~1 s wire
    # download.
    def early():
        holder["seg_fin"] = (
            E.dispatch_seg_results(planes, 75, mbw, mbh)
            if SEGMENTS
            else (lambda: None)
        )

    def chain():
        holder["next"] = analyze_with(holder.pop("seg_fin")())

    for r in range(-1, ROUNDS):  # round -1 is untimed pipeline fill
        t0 = time.time()
        more = r + 1 < ROUNDS
        fut = xfer.submit(
            fetch_i, chain if more else None, early if more else None
        )
        if prev_arrays is not None:
            vp8s = finish(prev_arrays)
        prev_arrays = fut.result()
        fetch_i = holder.get("next")
        if r >= 0:
            enc_times.append(time.time() - t0)
    t0 = time.time()
    vp8s = finish(prev_arrays)
    enc_tail = time.time() - t0
    # rounds after the first overlap host+device fully; the first round and
    # the tail host pass are pipeline fill/drain.
    t_encode = statistics.median(enc_times) / BATCH + t_rgb2yuv
    enc_spread = spread(enc_times)
    enc_up = E.XFER["up"] / ((ROUNDS + 1) * BATCH)
    enc_down = E.XFER["down"] / ((ROUNDS + 1) * BATCH)

    # ---------------- decode ----------------
    def wrap(v):
        c = b"VP8 " + len(v).to_bytes(4, "little") + v + (b"\x00" if len(v) & 1 else b"")
        return b"RIFF" + (4 + len(c)).to_bytes(4, "little") + b"WEBP" + c

    payloads = [WebPDecoder(wrap(v))._chunk_bytes(ck.VP8) for v in vp8s]

    # block_until_ready is a NO-OP on the tunneled device runtime (measured
    # r5: 0.1 ms after dispatching a multi-second kernel) — every decode
    # timing below forces completion with a 1-element fetch instead.
    def sync(handle):
        np.asarray(handle[(0,) * handle.ndim])

    t0 = time.time()
    rgb = D.dispatch_decode_batch(payloads)
    sync(rgb)
    warm_decode = time.time() - t0

    # stage probes
    t0 = time.time()
    batch = D.parse_levels_batch(payloads)
    t_dec_parse = (time.time() - t0) / BATCH
    t0 = time.time()
    rgb = D.dispatch_decode_batch(payloads)
    t_dec_dispatch = (time.time() - t0) / BATCH  # parse + upload + launch
    sync(rgb)
    t_dec_device = (time.time() - t0) / BATCH - t_dec_dispatch
    t0 = time.time()
    host_rgb = np.asarray(rgb)
    t_dec_fetch = (time.time() - t0) / BATCH

    # steady state, pipelined, device-resident output: host parse + upload of
    # batch i+1 runs in a worker thread while the device decodes batch i.
    # Round -1 is untimed pipeline fill (VERDICT r3: round 0 used to carry
    # residual warmup and inflated the decode spread to 1.4).
    D.XFER.update(up=0, down=0)
    dec_times = []
    warm_fut = dec_lane.submit(D.dispatch_decode_batch, payloads)
    warm_handle = warm_fut.result()
    # enqueue round 0 BEFORE blocking the warm round so its host parse +
    # upload overlap the warm round's device execution — otherwise round 0
    # pays the full ~250 ms parse serially and doubles the decode spread.
    fut = dec_lane.submit(D.dispatch_decode_batch, payloads)
    sync(warm_handle)
    for r in range(ROUNDS):
        t0 = time.time()
        handle = fut.result()
        fut = (
            dec_lane.submit(D.dispatch_decode_batch, payloads)
            if r + 1 < ROUNDS
            else None
        )
        sync(handle)
        dec_times.append(time.time() - t0)
    t_decode = statistics.median(dec_times) / BATCH
    dec_spread = spread(dec_times)
    dec_up = D.XFER["up"] / ((ROUNDS + 1) * BATCH)

    # steady state, HOST delivery (the Rust-comparable consumption model):
    # the device ships packed YUV420 (half the bytes of RGB across the
    # ~35 MB/s uncompressed d2h tunnel) and the host converts with the
    # native bit-exact fancy upsampler while the next batch parses/decodes.
    hd_times = []
    warm_handle = dec_lane.submit(D.dispatch_decode_batch, payloads, "yuv").result()
    fut = dec_lane.submit(D.dispatch_decode_batch, payloads, "yuv")
    packed = np.asarray(warm_handle)  # fill round (untimed)
    host_rgb2 = D.yuv_packed_to_rgb(packed, mbw, mbh, w, h)
    for r in range(ROUNDS):
        t0 = time.time()
        handle = fut.result()
        fut = (
            dec_lane.submit(D.dispatch_decode_batch, payloads, "yuv")
            if r + 1 < ROUNDS
            else None
        )
        packed = np.asarray(handle)
        host_rgb2 = D.yuv_packed_to_rgb(packed, mbw, mbh, w, h)
        hd_times.append(time.time() - t0)
    t_decode_host = statistics.median(hd_times) / BATCH
    hd_spread = spread(hd_times)

    # ---------------- lossless (VP8L) round trip: device transforms ------
    # Entropy on host (C++), inverse transforms (subtract-green + predictor
    # wavefront + color) batched on the device; plus the host encode cost
    # (VERDICT r2 item 8).
    from webp_tpu.decode.vp8l import decode_lossless
    from webp_tpu.decode.vp8l_device import decode_lossless_batch_device

    ll_path = Path("/root/reference/tests/images/gallery2/1_webp_ll.webp")
    ll_stages = {}
    # The remote compiler's warmup varies 120..500 s between runs even with
    # a fully-warm persistent cache (tunnel variance); only skip the
    # lossless stage on a truly pathological run — its kernels are small
    # and cached, so it adds ~2 s when healthy.
    if warm_encode > 900 or warm_decode > 300:
        ll_stages = {"lossless_stage": "skipped (slow-compiler run)"}
    elif ll_path.exists():
        try:
            wd = WebPDecoder(ll_path.read_bytes())
            ll_payload = wd._chunk_bytes(ck.VP8L)
            lw, lh = wd.dimensions()
            LB = 8
            decode_lossless_batch_device([ll_payload] * LB, lw, lh)  # warm
            t0 = time.time()
            out = decode_lossless_batch_device(
                [ll_payload] * LB, lw, lh, device_out=True
            )
            out.block_until_ready()
            t_ll_dev = (time.time() - t0) / LB
            t0 = time.time()
            decode_lossless(ll_payload, lw, lh, allow_native=False)
            t_ll_np = time.time() - t0
            from webp_tpu.encode.api import encode_lossless_rgba
            from webp_tpu.decode.vp8l import decode_lossless as _dl

            rgba = np.asarray(WebPDecoder(ll_path.read_bytes()).read_image())
            if rgba.shape[2] == 3:
                rgba = np.dstack([rgba, np.full(rgba.shape[:2], 255, np.uint8)])
            encode_lossless_rgba(rgba)  # warm any lazy state
            t0 = time.time()
            ll_bytes = encode_lossless_rgba(rgba)
            t_ll_enc = time.time() - t0
            ll_stages = {
                "lossless_device_ms": round(t_ll_dev * 1e3, 2),
                "lossless_host_numpy_ms": round(t_ll_np * 1e3, 2),
                "lossless_device_speedup_vs_numpy": round(t_ll_np / t_ll_dev, 1),
                "lossless_encode_ms": round(t_ll_enc * 1e3, 1),
                "lossless_encode_bytes": len(ll_bytes),
            }
        except Exception as e:  # pragma: no cover - keep the headline metric
            ll_stages = {"lossless_stage": f"failed: {e}"}

    # ---------------- roofline accounting (VERDICT r3 item 8) -----------
    # Re-times the warm encode kernels stage-by-stage with blocking, then
    # scores each device stage against v5e peak flops/bandwidth.
    try:
        st = E.probe_stage_times(planes, 75, 4, mbw, mbh, segments=SEGMENTS)
        roof = roofline(
            mbw,
            mbh,
            st["p1_s"] / BATCH,
            st["p2_s"] / BATCH,
            st["pack_s"] / BATCH,
            t_dec_device,
        )
    except Exception as e:  # pragma: no cover - keep the headline metric
        roof = {"error": str(e)}

    per_image = t_encode + t_decode
    images_per_s = 1.0 / per_image
    stages = {
        "rgb2yuv_host_ms": round(t_rgb2yuv * 1e3, 2),
        "encode_dispatch_ms_batch": round(t_enc_dispatch * 1e3, 2),
        "encode_analysis_plus_fetch_ms": round(t_enc_fetch * 1e3, 2),
        "encode_host_entropy_ms": round(t_enc_host * 1e3, 2),
        "decode_host_parse_ms": round(t_dec_parse * 1e3, 2),
        "decode_dispatch_ms": round(t_dec_dispatch * 1e3, 2),
        "decode_device_ms": round(t_dec_device * 1e3, 2),
        "decode_fetch_to_host_ms": round(t_dec_fetch * 1e3, 2),
        "decode_host_delivery_ms": round(t_decode_host * 1e3, 2),
        "decode_host_delivery_spread": round(hd_spread, 3),
        "decode_mpix_per_s_device_resident": round(MPIX / t_decode, 1),
        "decode_mpix_per_s_host_delivery": round(MPIX / t_decode_host, 1),
        "encode_mpix_per_s": round(MPIX / t_encode, 1),
        "roofline": roof,
        **ll_stages,
    }
    tokens_on = os.environ.get("WEBP_TPU_DEVICE_TOKENS") == "1"
    print(
        json.dumps(
            {
                "metric": (
                    f"images/sec/chip (768x512 mixed gallery1 corpus decode + Q75-m4 "
                    f"encode: two-pass+trellis, "
                    f"segments {'on' if SEGMENTS else 'off'}, "
                    f"{NPARTS} coeff partitions, "
                    f"device tokens {'on' if tokens_on else 'off'}, "
                    f"batch={BATCH}, pipelined, decoded pixels device-resident)"
                ),
                "value": round(images_per_s, 4),
                "unit": "images/s",
                "vs_baseline": round(images_per_s / BASELINE_IMAGES_PER_S, 4),
                # Same pipeline but decoding all the way into host memory
                # (RGB bytes delivered host-side, matching the Rust
                # baseline's delivery model), measured as its own pipelined
                # steady-state loop: device ships packed YUV420, the native
                # converter produces bit-exact RGB on the host.
                "vs_baseline_host_delivery": round(
                    (1.0 / (t_encode + t_decode_host)) / BASELINE_IMAGES_PER_S,
                    4,
                ),
                "detail": {
                    "t_encode_s_per_img": round(t_encode, 4),
                    "t_decode_s_per_img": round(t_decode, 4),
                    "spread": {
                        "encode_rel": round(enc_spread, 3),
                        "decode_rel": round(dec_spread, 3),
                        "rounds": ROUNDS,
                        "encode_round_s": [round(t, 3) for t in enc_times],
                        "decode_round_s": [round(t, 3) for t in dec_times],
                    },
                    "bytes_per_image": {
                        "encode_up": int(enc_up),
                        "encode_down": int(enc_down),
                        "decode_up": int(dec_up),
                        "decode_down_headline": 0,
                        "decode_down_host_delivery": int(packed[0].nbytes),
                        "decode_down_if_rgb_fetched": int(host_rgb[0].nbytes),
                    },
                    "warmup_encode_s": round(warm_encode, 2),
                    "warmup_decode_s": round(warm_decode, 2),
                    "webp_bytes": len(vp8s[0]),
                    "stages": stages,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
