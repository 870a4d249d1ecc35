"""Device-mesh helpers for scale-out.

The codec scales over two axes (SURVEY §2.4 / §7):
  data — independent images (pure data parallelism; wavefronts stay local)
  band — horizontal tile bands inside an image, with halo exchange of
         boundary rows over ICI for the stages with row-local stencils
         (chroma upsampling, and later band-parallel filtering).
Multi-host runs use the standard JAX runtime: the same mesh spans hosts with
DCN between slices; nothing below distinguishes the two.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(n_data: int = None, n_band: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_band
    assert n_data * n_band <= len(devices), (n_data, n_band, len(devices))
    dev_array = np.array(devices[: n_data * n_band]).reshape(n_data, n_band)
    return Mesh(dev_array, axis_names=("data", "band"))
