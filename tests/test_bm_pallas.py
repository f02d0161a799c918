"""Pallas StereoBM strip kernel vs the XLA reference path.

The Pallas kernel (stereo_bm_pallas) must be BIT-IDENTICAL to stereo_bm —
same winner/uniqueness/texture/subpixel integer semantics, matching the
reference's cv::StereoBM configuration (src/slam/src/core/main.cpp:197-216).
Runs in interpreter mode on CPU.
"""

import numpy as np
import pytest

from tpuslam.config import StereoBMConfig
from tpuslam.kernels.stereo_bm import stereo_bm
from tpuslam.kernels.stereo_bm_pallas import stereo_bm_pallas


def _shifted_pair(rng, h, w, max_d=12):
    """Right image is the left shifted by a spatially varying disparity,
    so the matcher has real structure to lock onto."""
    left = rng.integers(0, 256, (h, w), dtype=np.uint8)
    # smooth the noise a little so SAD has a basin
    left = ((left.astype(np.int32) +
             np.roll(left, 1, 1) + np.roll(left, 1, 0)) // 3).astype(np.uint8)
    right = np.empty_like(left)
    for y in range(h):
        d = 4 + int(6 * np.sin(y / 7.0))
        right[y] = np.roll(left[y], -d)
    return left, right


@pytest.mark.parametrize("speckle", [False, True])
def test_pallas_matches_xla(rng, speckle):
    cfg = StereoBMConfig(num_disparities=16, block_size=9)
    left, right = _shifted_pair(rng, 64, 256)
    ref = np.asarray(stereo_bm(left, right, cfg, with_speckle=speckle))
    got = np.asarray(stereo_bm_pallas(left, right, cfg,
                                      with_speckle=speckle))
    assert got.dtype == ref.dtype
    np.testing.assert_array_equal(got, ref)


def test_pallas_matches_xla_unaligned_shape(rng):
    # W not a multiple of 128, H not a multiple of the strip height
    cfg = StereoBMConfig(num_disparities=16, block_size=9)
    left, right = _shifted_pair(rng, 53, 197)
    ref = np.asarray(stereo_bm(left, right, cfg, with_speckle=False))
    got = np.asarray(stereo_bm_pallas(left, right, cfg, with_speckle=False))
    np.testing.assert_array_equal(got, ref)


def test_pallas_matches_xla_full_config(rng):
    # the reference's full 64-disparity / 21-window configuration on a
    # reduced frame (kept small: interpreter mode)
    cfg = StereoBMConfig()  # ndisp 64, block 21
    left, right = _shifted_pair(rng, 48, 384, max_d=40)
    ref = np.asarray(stereo_bm(left, right, cfg, with_speckle=False))
    got = np.asarray(stereo_bm_pallas(left, right, cfg, with_speckle=False))
    np.testing.assert_array_equal(got, ref)


def test_ftruncdiv_exact():
    """_ftruncdiv must equal integer floor-division for every operand
    class BM pass 3 produces — including adversarial near-integer
    quotients where the rounded f32 divide lands on the wrong side."""
    import jax.numpy as jnp
    from tpuslam.kernels.stereo_bm_pallas import _ftruncdiv
    rng = np.random.default_rng(3)
    a = rng.integers(0, 7_000_000, 20000).astype(np.int64)
    b = rng.integers(1, 120_000, 20000).astype(np.int64)
    # adversarial: exact multiples and off-by-one around them
    m = rng.integers(1, 2600, 2000).astype(np.int64)
    d = rng.integers(1, 2600, 2000).astype(np.int64)
    a = np.concatenate([a, m * d, m * d + 1, np.maximum(m * d - 1, 0)])
    b = np.concatenate([b, d, d, d])
    got = np.asarray(_ftruncdiv(jnp.asarray(a, jnp.float32),
                                jnp.asarray(b, jnp.float32)))
    np.testing.assert_array_equal(got.astype(np.int64), a // b)
