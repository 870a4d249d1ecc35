"""Test configuration.

Sharding/mesh tests run on a virtual 8-device CPU mesh; set the XLA flags
before JAX initializes. Golden fixtures come from the reference repo's test
corpus mounted read-only at /root/reference/tests.
"""

import os
import sys
from pathlib import Path

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# Tests run on a virtual 8-device CPU mesh. The environment's sitecustomize
# registers the remote TPU backend and pins jax_platforms via config (env vars
# alone don't override it), so force CPU here before any backend is
# initialized. Set WEBP_TPU_TEST_REAL_TPU=1 to run on the real chip instead.
if not os.environ.get("WEBP_TPU_TEST_REAL_TPU"):
    try:
        import jax

        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass

import numpy as np
import pytest

FIXTURES = Path("/root/reference/tests/images")
GOLDENS = Path("/root/reference/tests/reference")


def load_png(path):
    from PIL import Image

    with Image.open(path) as im:
        return np.asarray(im)


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: compile-heavy test; deselect with -m 'not slow' for quick runs",
    )


@pytest.fixture(scope="session")
def fixtures():
    if not FIXTURES.exists():
        pytest.skip("reference fixture corpus not available")
    return FIXTURES


@pytest.fixture(scope="session")
def goldens():
    if not GOLDENS.exists():
        pytest.skip("reference golden corpus not available")
    return GOLDENS
