"""Rectification kernel + HW xsobel golden tests.

Golden strategy (SURVEY.md §4): the reference ships the PL pipeline's
intermediate results — ref_rect (rectified frames) and ref_xsbl (their
X-Sobel prefilter).  ref_xsbl == xsbl2(ref_rect) gives a true
hardware-golden test for the prefilter.  The rectifier has no shipped
(input, output) pair (the raw sim stimulus img_001 is a different
capture than the golden rect frames), so it is validated by properties:
fixed-point-vs-float map agreement, HW-vs-float warp agreement, identity
calibration, and warp against a scipy oracle.
"""

import os

import numpy as np
import pytest

from tpuslam.kernels.rectify import (REFERENCE_CALIB, RectCamera,
                                     StereoRectifier, rect_map_fixed,
                                     rect_map_float, remap_bilinear,
                                     remap_bilinear_hw)
from tpuslam.kernels.stereo_bm import prefilter_xsobel_hw

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


class TestXsobelGolden:
    @pytest.mark.parametrize("side", ["left", "right"])
    def test_hw_prefilter_matches_golden(self, side):
        rect = np.load(os.path.join(FIXTURES, f"rect_{side}.npy"))
        gold = np.load(os.path.join(FIXTURES, f"xsbl_{side}.npy"))
        ours = np.asarray(prefilter_xsobel_hw(rect))
        assert np.array_equal(ours, gold), (
            f"{(ours != gold).sum()} mismatching pixels")


class TestRectMap:
    def test_fixed_vs_float_map(self):
        """The s.24 fixed-point map tracks the float map to < 1/16 px."""
        cam = REFERENCE_CALIB[0]
        mx_fix, my_fix = rect_map_fixed(cam, 480, 640)
        f = (cam.f[0] / 2**16, cam.f[1] / 2**16)
        f_rect = (2**32 / cam.f2inv[0], 2**32 / cam.f2inv[1])
        c_rect = (cam.c2_f2[0] / 2**24 * f_rect[0],
                  cam.c2_f2[1] / 2**24 * f_rect[1])
        R = cam.rot.astype(np.float64) / 2**24
        mx_f, my_f = rect_map_float(f, cam.c, f_rect, c_rect, R, 480, 640)
        assert np.abs(mx_fix / 32.0 - mx_f).max() < 1 / 16
        assert np.abs(my_fix / 32.0 - my_f).max() < 1 / 16

    def test_identity_calibration(self):
        """Identity rotation + equal intrinsics -> map is the identity."""
        cam = RectCamera.from_float(f=(500.0, 500.0), c=(320, 240),
                                    f_rect=(500.0, 500.0),
                                    c_rect=(320.0, 240.0), R=np.eye(3))
        mx, my = rect_map_fixed(cam, 480, 640)
        xs = np.arange(640)[None, :] * 32
        ys = np.arange(480)[:, None] * 32
        assert np.abs(mx - xs).max() <= 1           # half-LSB rounding
        assert np.abs(my - np.broadcast_to(ys, (480, 640))).max() <= 1


class TestWarp:
    def test_hw_warp_identity_map(self, stereo_pair):
        left, _ = stereo_pair
        mx = (np.arange(640)[None, :] * 32).astype(np.int16)
        mx = np.broadcast_to(mx, (480, 640))
        my = (np.arange(480)[:, None] * 32).astype(np.int16)
        my = np.broadcast_to(my, (480, 640))
        out = np.asarray(remap_bilinear_hw(left, mx, my))
        # interior must be exact; last row/col invalid (x0+1 out of range)
        assert np.array_equal(out[:-1, :-1], left[:-1, :-1])
        assert (out[-1] == 0).all() and (out[:, -1] == 0).all()

    def test_hw_warp_vs_float_warp(self, stereo_pair, rng):
        left, _ = stereo_pair
        mx_f = rng.uniform(0, 639, (480, 640)).astype(np.float32)
        my_f = rng.uniform(0, 479, (480, 640)).astype(np.float32)
        mx_i = np.round(mx_f * 32).astype(np.int16)
        my_i = np.round(my_f * 32).astype(np.int16)
        hw = np.asarray(remap_bilinear_hw(left, mx_i, my_i)).astype(float)
        fl = np.asarray(remap_bilinear(left, mx_i / 32.0, my_i / 32.0))
        m = (hw > 0) & (fl > 0)
        assert np.abs(hw[m] - fl[m]).max() <= 1.0 + 1e-3

    def test_float_warp_vs_scipy_oracle(self, stereo_pair, rng):
        from scipy.ndimage import map_coordinates
        left, _ = stereo_pair
        mx = rng.uniform(1, 638, (64, 64)).astype(np.float32)
        my = rng.uniform(1, 478, (64, 64)).astype(np.float32)
        ours = np.asarray(remap_bilinear(left, mx, my))
        oracle = map_coordinates(left.astype(np.float32),
                                 [my, mx], order=1)
        np.testing.assert_allclose(ours, oracle, atol=1e-2)


class TestRectifier:
    def test_reference_rig_end_to_end(self):
        """Rectify the raw sim stimulus with the firmware's baked-in
        calibration; output must be a valid frame (finite, in-range,
        mostly nonzero) and differ from the input (nontrivial warp)."""
        raw_l = np.load(os.path.join(FIXTURES, "raw_left.npy"))
        raw_r = np.load(os.path.join(FIXTURES, "raw_right.npy"))
        rect = StereoRectifier.from_reference_calib()
        out_l, out_r = rect(raw_l, raw_r)
        out_l = np.asarray(out_l)
        assert out_l.shape == (480, 640) and out_l.dtype == np.uint8
        assert (out_l > 0).mean() > 0.9
        assert not np.array_equal(out_l, raw_l)
