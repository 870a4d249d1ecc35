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


@pytest.mark.skipif(os.environ.get("WEBP_TPU_TEST_REAL_TPU"), reason="CPU-only smoke")
def test_two_process_distributed_mesh(tmp_path):
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
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", _WORKER],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
            )
        )
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out.decode(errors="replace"))
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
        assert "OK total=" in out, out[-2000:]
