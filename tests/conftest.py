"""Test configuration.

Tests run on CPU with a virtual 8-device mesh (the reference's "fake
backend" analog — SURVEY.md §4: the RTL dummy_* stubs + ddr_mdl).  Env vars
must be set before jax initializes a backend, hence here at import time.
"""

import os

# Force CPU: the session environment may pin JAX to a remote TPU (axon
# tunnel, registered by a sitecustomize that calls jax.config.update before
# we run), where eager per-op dispatch makes tests pathologically slow and
# TPU transcendental approximations shift tolerances.  Both the env var and
# the live config entry must be overridden.  Set TPUSLAM_TEST_TPU=1 to
# deliberately run the suite against real hardware.
if not os.environ.get("TPUSLAM_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax as _jax
    _jax.config.update("jax_platforms", "cpu")
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
def kitti_camera():
    """KITTI seq-00-like stereo projection matrices (f=718.856, B=0.54m)."""
    from tpuslam.geometry.camera import StereoCameraModel
    f, cx, cy, B = 718.856, 607.1928, 185.2157, 0.54
    P0 = np.array([[f, 0, cx, 0], [0, f, cy, 0], [0, 0, 1, 0]], np.float64)
    P1 = P0.copy()
    P1[0, 3] = -f * B
    return StereoCameraModel(P_l=P0, P_r=P1, width=1241, height=376)


@pytest.fixture()
def rng():
    # function-scoped: every test sees the same deterministic stream
    # regardless of which other tests ran before it
    return np.random.default_rng(0)
