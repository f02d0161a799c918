"""Test configuration.

Tests run on CPU with a virtual 8-device mesh (the reference's "fake
backend" analog — SURVEY.md §4: the RTL dummy_* stubs + ddr_mdl).  Env vars
must be set before jax initializes a backend, hence here at import time.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


@pytest.fixture(scope="session")
def stereo_pair():
    """Real 640x480 stereo pair decoded from the reference's golden
    simulation data (data/ref_rect_{l,r}.zip)."""
    left = np.load(os.path.join(FIXTURES, "rect_left.npy"))
    right = np.load(os.path.join(FIXTURES, "rect_right.npy"))
    return left, right


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
