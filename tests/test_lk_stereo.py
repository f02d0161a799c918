"""LK stereo correspondence tests (CvLKStereo twin).

Oracles: scipy convolution for the pyramid/derivative stages; known
synthetic shifts (integer and subpixel) for the tracker; the dense BM
disparity for cross-kernel consistency on the real golden stereo pair.
"""

import numpy as np
import pytest

from tpuslam.kernels.lk_stereo import (build_lk_pyramid,
                                       compute_correspondences, lk_stereo,
                                       pyr_down, scharr_deriv)


class TestPyramid:
    def test_pyr_down_vs_scipy(self, stereo_pair):
        from scipy.ndimage import correlate
        left, _ = stereo_pair
        k1 = np.array([1, 4, 6, 4, 1], np.float64) / 16.0
        k = np.outer(k1, k1)
        sm = correlate(left.astype(np.float64), k, mode="mirror")
        oracle = np.clip(np.round(sm[::2, ::2]), 0, 255)
        ours = np.asarray(pyr_down(left)).astype(np.float64)
        # rounding of exact-half values may differ by 1
        assert (np.abs(ours - oracle) <= 1).all()
        assert (ours == oracle).mean() > 0.99

    def test_scharr_vs_numpy(self, stereo_pair):
        from scipy.ndimage import correlate
        left, _ = stereo_pair
        kx = np.outer([3, 10, 3], [-1, 0, 1]).astype(np.float64)
        d = np.asarray(scharr_deriv(left))
        oracle_dx = correlate(left.astype(np.float64), kx, mode="mirror")
        oracle_dy = correlate(left.astype(np.float64), kx.T, mode="mirror")
        assert np.array_equal(d[..., 0], oracle_dx.astype(np.int16))
        assert np.array_equal(d[..., 1], oracle_dy.astype(np.int16))

    def test_pyramid_shapes(self, stereo_pair):
        left, _ = stereo_pair
        pyr = build_lk_pyramid(left, 5)
        assert len(pyr) == 6
        assert pyr[0][0].shape == (480, 640)
        assert pyr[1][0].shape == (240, 320)
        assert pyr[5][0].shape == (15, 20)


def _textured_points(img, n=64, margin=40, seed=0):
    """Pick well-textured points away from borders."""
    from tpuslam.kernels.gftt import gftt_response, select_keypoints
    eig = np.asarray(gftt_response(img, 3))
    kpts = select_keypoints(eig, max_features=n * 4, quality_level=0.01,
                            min_distance=15, use_local_max=True)
    m = ((kpts[:, 0] > margin) & (kpts[:, 0] < img.shape[1] - margin)
         & (kpts[:, 1] > margin) & (kpts[:, 1] < img.shape[0] - margin))
    return kpts[m][:n, :2].astype(np.float32)


class TestTracker:
    def test_integer_shift(self, stereo_pair):
        left, _ = stereo_pair
        shift = 7
        right = np.zeros_like(left)
        right[:, :-shift] = left[:, shift:]  # disparity = +7 everywhere
        pts = _textured_points(left)
        valid = np.ones(len(pts), bool)
        nxt, status, err = lk_stereo(left, right, pts, valid)
        nxt = np.asarray(nxt)
        disp = pts[:, 0] - nxt[:, 0]
        ok = np.asarray(status)
        assert ok.mean() > 0.8
        assert np.median(np.abs(disp[ok] - shift)) < 0.05
        # y never moves (epipolar constraint)
        assert np.array_equal(nxt[:, 1], pts[:, 1])

    def test_subpixel_shift(self, stereo_pair):
        from tpuslam.kernels.rectify import remap_bilinear
        left, _ = stereo_pair
        shift = 3.37
        h, w = left.shape
        mx = (np.arange(w)[None, :] + shift).astype(np.float32)
        mx = np.broadcast_to(mx, (h, w))
        my = np.broadcast_to(np.arange(h, dtype=np.float32)[:, None],
                             (h, w))
        right = np.asarray(remap_bilinear(left, mx, my)).astype(np.uint8)
        pts = _textured_points(left)
        valid = np.ones(len(pts), bool)
        nxt, status, _ = lk_stereo(left, right, pts, valid)
        disp = pts[:, 0] - np.asarray(nxt)[:, 0]
        ok = np.asarray(status)
        assert ok.mean() > 0.8
        assert np.median(np.abs(disp[ok] - shift)) < 0.15

    def test_real_pair_vs_dense_bm(self, stereo_pair):
        """LK disparities agree with the dense SAD-BM disparity map."""
        from tpuslam.config import StereoBMConfig
        from tpuslam.kernels.stereo_bm import stereo_bm
        left, right = stereo_pair
        disp_map = np.asarray(stereo_bm(left, right, StereoBMConfig()))
        pts, status, _ = None, None, None
        kpts = _textured_points(left, n=96)
        valid = np.ones(len(kpts), bool)
        nxt, status, _ = lk_stereo(left, right, kpts, valid)
        lk_disp = kpts[:, 0] - np.asarray(nxt)[:, 0]
        bm16 = disp_map[kpts[:, 1].astype(int), kpts[:, 0].astype(int)]
        both = np.asarray(status) & (bm16 > 0) & (lk_disp > 0.5) & \
            (lk_disp <= 128)
        assert both.sum() >= 20
        d = np.abs(lk_disp[both] - bm16[both] / 16.0)
        assert np.median(d) < 1.0

    def test_disparity_gate(self, stereo_pair):
        left, _ = stereo_pair
        pts = _textured_points(left)
        valid = np.ones(len(pts), bool)
        # identical images -> disparity ~0 -> gated out (<= 0.5)
        nxt, status, err = compute_correspondences(left, left, pts, valid)
        assert status.sum() == 0

    def test_invalid_points_masked(self, stereo_pair):
        left, right = stereo_pair
        pts = np.zeros((8, 2), np.float32)
        pts[:4] = _textured_points(left)[:4]
        valid = np.array([True] * 4 + [False] * 4)
        _, status, _ = lk_stereo(left, right, pts, valid)
        assert not np.asarray(status)[4:].any()
