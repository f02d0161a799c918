"""SGBM kernel vs the OpenCV oracle + depth-method dispatch.

The kernel implements the classic OpenCV SGBM (MODE_HH) semantics the
reference binary linked (main.cpp:218-244).  The cv2 available here
(5.0, `stereo` module rewrite) differs from that lineage by a subpixel
step on a minority of pixels, so the oracle asserts tight agreement
bands rather than bit equality; the JAX kernel's own spec (the NumPy
transcription in the module docstring) is exercised implicitly because
both test configs share every code path.
"""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from tpuslam.config import DepthMethod, SGBMConfig, SlamConfig  # noqa: E402
from tpuslam.kernels.sgbm import sgbm_np  # noqa: E402


def _pair(seed=0, h=96, w=320, shift=7):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 255, (h, w + 2 * shift + 8)).astype(np.uint8)
    base = cv2.GaussianBlur(base, (5, 5), 1.5)
    left = base[:, shift:shift + w].copy()
    right = base[:, 2 * shift:2 * shift + w].copy()
    return left, right


class TestSgbmOracle:
    def test_reference_config_matches_opencv(self):
        """Full reference parameterization (minD -64, D 128, block 11,
        P1 100, P2 1000, uniq 15, disp12 32, speckle 1000/16)."""
        left, right = _pair(seed=3)
        cfg = SGBMConfig()
        mine = sgbm_np(left, right, cfg)
        m = cv2.StereoSGBM_create(
            cfg.min_disparity, cfg.num_disparities, cfg.block_size,
            cfg.p1, cfg.p2, cfg.disp12_max_diff, cfg.prefilter_cap,
            cfg.uniqueness_ratio, cfg.speckle_window_size,
            cfg.speckle_range, cv2.STEREO_SGBM_MODE_HH)
        ref = m.compute(left, right)

        invalid = (cfg.min_disparity - 1) * 16
        v = ref > invalid
        assert v.mean() > 0.3                      # oracle found matches
        exact = (mine == ref)[v].mean()
        assert exact > 0.9, f"exact-on-valid {exact:.3f}"
        vm = mine > invalid
        both = v & vm
        same_d = ((mine // 16) == (ref // 16))[both].mean()
        assert same_d > 0.98, f"same-integer-d {same_d:.3f}"

    def test_simple_config_close_to_opencv(self):
        left, right = _pair(seed=0, shift=5)
        cfg = SGBMConfig(min_disparity=0, num_disparities=32, block_size=5,
                         p1=8, p2=32, disp12_max_diff=-1,
                         uniqueness_ratio=0, speckle_window_size=0)
        mine = sgbm_np(left, right, cfg, with_speckle=False)
        m = cv2.StereoSGBM_create(0, 32, 5, 8, 32, disp12MaxDiff=-1,
                                  preFilterCap=0, uniquenessRatio=0,
                                  speckleWindowSize=0, speckleRange=0,
                                  mode=cv2.STEREO_SGBM_MODE_HH)
        ref = m.compute(left, right)
        reg = (slice(None), slice(32, left.shape[1]))
        d = mine[reg].astype(int) - ref[reg].astype(int)
        assert (d == 0).mean() > 0.6
        assert (np.abs(d) <= 1).mean() > 0.85
        same_d = ((mine[reg] // 16) == (ref[reg] // 16)).mean()
        assert same_d > 0.9

    def test_recovers_constant_shift(self):
        """Pure sanity: a constant integer shift is recovered exactly on
        nearly every interior pixel."""
        left, right = _pair(seed=7, shift=6)
        cfg = SGBMConfig(min_disparity=0, num_disparities=32, block_size=5,
                         p1=8, p2=32, disp12_max_diff=1,
                         uniqueness_ratio=10, speckle_window_size=100,
                         speckle_range=2)
        mine = sgbm_np(left, right, cfg)
        interior = mine[8:-8, 48:-8]
        valid = interior > -16
        assert valid.mean() > 0.9
        assert (np.abs(interior[valid] - 6 * 16) <= 8).mean() > 0.99


class TestDepthDispatch:
    def _frame(self, cfg, seq):
        from tpuslam.geometry.camera import StereoCameraModel
        from tpuslam.io.dataset import StereoImageDataset
        from tpuslam.runtime.pipeline import extract_features
        import os
        camera = StereoCameraModel.load_kitti(
            os.path.join(seq, "calib.txt"))
        ds = StereoImageDataset(left_dir=os.path.join(seq, "image_0"),
                                right_dir=os.path.join(seq, "image_1"))
        it = ds[0]
        return extract_features(it["left"], it["right"], camera, cfg), \
            camera

    @pytest.fixture(scope="class")
    def seq(self, tmp_path_factory):
        from tpuslam.io.synthetic import make_sequence
        d = tmp_path_factory.mktemp("depthseq")
        return make_sequence(str(d), n_frames=3, width=320, height=240,
                             f=260.0, baseline=0.12, speed=0.3, seed=5)

    def test_sgbm_dispatch_produces_3d(self, seq):
        cfg = SlamConfig(depth_method=DepthMethod.SGBM).replace(
            sgbm=SGBMConfig(min_disparity=0, num_disparities=64))
        frame, camera = self._frame(cfg, seq)
        n3 = np.isfinite(frame.kpts3d).all(axis=1).sum()
        assert frame.disparity is not None
        assert n3 > 100

    def test_lk_dispatch_produces_3d(self, seq):
        cfg = SlamConfig(depth_method=DepthMethod.LK)
        frame, camera = self._frame(cfg, seq)
        assert frame.disparity is None
        n3 = np.isfinite(frame.kpts3d).all(axis=1).sum()
        assert n3 > 100

    def test_lk_3d_agrees_with_bm_3d(self, seq):
        """The sparse LK depths and the dense BM depths describe the same
        scene: matched finite keypoints agree in Z."""
        cfg_bm = SlamConfig()
        cfg_lk = SlamConfig(depth_method=DepthMethod.LK)
        f_bm, _ = self._frame(cfg_bm, seq)
        f_lk, _ = self._frame(cfg_lk, seq)
        n = min(len(f_bm.kpts), len(f_lk.kpts))
        # keypoints are identical (same detector); compare 3D where both
        # are finite
        assert np.allclose(f_bm.kpts[:n, :2], f_lk.kpts[:n, :2])
        ok = (np.isfinite(f_bm.kpts3d[:n]).all(axis=1) &
              np.isfinite(f_lk.kpts3d[:n]).all(axis=1))
        assert ok.sum() > 50
        dz = np.abs(f_bm.kpts3d[:n][ok][:, 0] - f_lk.kpts3d[:n][ok][:, 0])
        z = np.abs(f_bm.kpts3d[:n][ok][:, 0])
        assert np.median(dz / np.maximum(z, 1e-6)) < 0.05
