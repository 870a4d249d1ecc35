"""Pallas kernel bit-exactness (interpret mode on CPU; compiled on TPU)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from webp_tpu.ops import jax_ops


def test_pallas_idct_exact(monkeypatch):
    from webp_tpu.ops.pallas import idct as pidct

    # CPU test runs the kernel in interpreter mode.
    import jax.experimental.pallas as pl

    orig = pl.pallas_call
    if jax.devices()[0].platform != "tpu":
        monkeypatch.setattr(
            pl, "pallas_call", lambda *a, **k: orig(*a, interpret=True, **k)
        )

    rng = np.random.RandomState(0)
    coeffs = rng.randint(-(2**13), 2**13, size=(1500, 16)).astype(np.int32)
    has_ac = rng.rand(1500) > 0.5

    got = np.asarray(pidct.idct_blocks_pallas(jnp.asarray(coeffs), jnp.asarray(has_ac)))
    full = np.asarray(jax_ops.idct4x4(jnp.asarray(coeffs)))
    dc = (coeffs[:, 0:1] + 4) >> 3
    want = np.where(has_ac[:, None], full, np.broadcast_to(dc, full.shape))
    np.testing.assert_array_equal(got, want)
