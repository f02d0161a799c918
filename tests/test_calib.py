"""Stereo calibration tests against a synthetic rig oracle.

The renderer produces chessboard views under exactly-known K/dist/R/T;
the full chain (detect -> calibrate -> rectify -> YAML) must recover
them.  Mirrors the reference tool's role
(/root/reference/src/stereo_calib/stereo_calib.cpp) without OpenCV.
"""

import os

import numpy as np
import pytest

from tpuslam.calib import (find_chessboard, project_points, q_matrix,
                           render_chessboard, stereo_calibrate,
                           stereo_rectify)
from tpuslam.calib.calibrate import _rvec
from tpuslam.calib.chessboard import _rodrigues

K1 = np.array([[520.0, 0, 321.0], [0, 518.0, 242.0], [0, 0, 1]])
K2 = np.array([[515.0, 0, 318.0], [0, 516.0, 239.0], [0, 0, 1]])
R_LR = _rodrigues(np.array([0.004, -0.02, 0.006]))
T_LR = np.array([-0.061, 0.001, 0.002])
D1 = [0.06, -0.04, 0, 0]
D2 = [0.05, -0.03, 0, 0]


def _make_views(n=8, seed=1):
    rng = np.random.default_rng(seed)
    cl, cr, truths = [], [], []
    for _ in range(n):
        rvec = rng.uniform(-0.35, 0.35, 3)
        rvec[2] = rng.uniform(-0.25, 0.25)
        tvec = np.array([rng.uniform(-0.08, -0.02),
                         rng.uniform(-0.07, -0.02),
                         rng.uniform(0.35, 0.6)])
        img_l, true_l = render_chessboard(K1, rvec, tvec, dist=D1)
        Rr = R_LR @ _rodrigues(rvec)
        tr = R_LR @ tvec + T_LR
        img_r, _ = render_chessboard(K2, _rvec(Rr), tr, dist=D2)
        a, oka = find_chessboard(img_l)
        b, okb = find_chessboard(img_r)
        if oka and okb:
            cl.append(a)
            cr.append(b)
            truths.append(true_l)
    return cl, cr, truths


@pytest.fixture(scope="module")
def views():
    return _make_views()


class TestDetection:
    def test_corner_accuracy(self, views):
        cl, cr, truths = views
        assert len(cl) >= 6
        for det, true in zip(cl, truths):
            err = np.linalg.norm(det - true, axis=1)
            assert err.max() < 1.0  # ordered match, subpixel accurate
            assert err.mean() < 0.5


class TestStereoCalibrate:
    @pytest.fixture(scope="class")
    def calib(self, views):
        cl, cr, _ = views
        return stereo_calibrate(cl, cr, 9, 6, 0.025, (640, 480))

    def test_intrinsics_recovered(self, calib):
        assert calib["rms"] < 0.5
        assert abs(calib["K1"][0, 0] - K1[0, 0]) / K1[0, 0] < 0.02
        assert abs(calib["K1"][0, 2] - K1[0, 2]) < 8
        assert abs(calib["K2"][1, 1] - K2[1, 1]) / K2[1, 1] < 0.02

    def test_distortion_sign_and_scale(self, calib):
        assert calib["D1"][0] == pytest.approx(D1[0], abs=0.03)
        assert calib["D1"][1] == pytest.approx(D1[1], abs=0.05)

    def test_baseline_recovered(self, calib):
        b_est = np.linalg.norm(calib["T"])
        b_true = np.linalg.norm(T_LR)
        assert abs(b_est - b_true) < 0.001  # < 1 mm
        # direction
        assert calib["T"][0] < 0

    def test_rectification_aligns_rows(self, calib, views):
        """After rectification, corresponding corners land on (nearly)
        equal rows — the epipolar property the whole SLAM front-end
        depends on."""
        R1, R2, P1, P2 = stereo_rectify(
            calib["K1"], calib["D1"], calib["K2"], calib["D2"],
            (640, 480), calib["R"], calib["T"])
        assert P2[0, 3] < 0  # right camera: negative f*Tx

        cl, cr, _ = views
        for a, b in zip(cl[:3], cr[:3]):
            ya = _rectified_y(a, calib["K1"], calib["D1"], R1, P1)
            yb = _rectified_y(b, calib["K2"], calib["D2"], R2, P2)
            assert np.abs(ya - yb).mean() < 0.5

    def test_q_matrix(self, calib):
        R1, R2, P1, P2 = stereo_rectify(
            calib["K1"], calib["D1"], calib["K2"], calib["D2"],
            (640, 480), calib["R"], calib["T"])
        Q = q_matrix(P1, P2)
        # reprojecting disparity d of a point at depth Z: Z = f*B/d
        f = P1[0, 0]
        B = -P2[0, 3] / f
        d = 10.0
        v = Q @ np.array([320, 240, d, 1.0])
        assert v[2] / v[3] == pytest.approx(f * B / d, rel=1e-6)


def _rectified_y(corners, K, D, R, P):
    """Undistort + rotate + reproject corner pixels (per definition)."""
    xn = (corners[:, 0] - K[0, 2]) / K[0, 0]
    yn = (corners[:, 1] - K[1, 2]) / K[1, 1]
    k1, k2, p1, p2 = (list(D) + [0] * 4)[:4]
    xu, yu = xn.copy(), yn.copy()
    for _ in range(10):
        r2 = xu * xu + yu * yu
        rad = 1 + k1 * r2 + k2 * r2 * r2
        dx = 2 * p1 * xu * yu + p2 * (r2 + 2 * xu * xu)
        dy = p1 * (r2 + 2 * yu * yu) + 2 * p2 * xu * yu
        xu = (xn - dx) / rad
        yu = (yn - dy) / rad
    rays = np.stack([xu, yu, np.ones_like(xu)], axis=1) @ R.T
    return rays[:, 1] / rays[:, 2] * P[1, 1] + P[1, 2]


class TestYamlRoundtrip:
    def test_opencv_yaml(self, tmp_path):
        from tpuslam.calib import read_opencv_yaml, write_opencv_yaml
        mats = {"M1": K1, "T": T_LR.reshape(3, 1)}
        p = str(tmp_path / "x.yml")
        write_opencv_yaml(p, mats)
        back = read_opencv_yaml(p)
        np.testing.assert_allclose(back["M1"], K1)
        np.testing.assert_allclose(back["T"], T_LR.reshape(3, 1))

    def test_camera_info_feeds_slam_loader(self, tmp_path):
        """The calibration output plugs into StereoCameraModel.load."""
        from tpuslam.calib import write_camera_info_yaml
        from tpuslam.geometry.camera import StereoCameraModel
        P1 = np.array([[518, 0, 319.5, 0], [0, 518, 239.5, 0],
                       [0, 0, 1, 0]], np.float64)
        P2 = P1.copy()
        P2[0, 3] = -518 * 0.06
        lp = str(tmp_path / "left.yml")
        rp = str(tmp_path / "right.yml")
        write_camera_info_yaml(lp, 640, 480, P1, np.eye(3))
        write_camera_info_yaml(rp, 640, 480, P2, np.eye(3))
        model = StereoCameraModel.load_opencv_yaml(lp, rp)
        assert model.baseline() == pytest.approx(0.06, rel=1e-9)
        assert model.width == 640


class TestCalibCli:
    def test_cli_end_to_end(self, tmp_path):
        from PIL import Image
        from tpuslam.cli.stereo_calib import run
        rng = np.random.default_rng(3)
        ld = tmp_path / "image_0"
        rd = tmp_path / "image_1"
        ld.mkdir()
        rd.mkdir()
        n = 0
        for i in range(7):
            rvec = rng.uniform(-0.3, 0.3, 3)
            tvec = np.array([rng.uniform(-0.08, -0.02),
                             rng.uniform(-0.07, -0.02),
                             rng.uniform(0.35, 0.6)])
            img_l, _ = render_chessboard(K1, rvec, tvec, dist=D1)
            Rr = R_LR @ _rodrigues(rvec)
            tr = R_LR @ tvec + T_LR
            img_r, _ = render_chessboard(K2, _rvec(Rr), tr, dist=D2)
            Image.fromarray(img_l).save(str(ld / f"{i:03d}.png"))
            Image.fromarray(img_r).save(str(rd / f"{i:03d}.png"))
            n += 1
        res = run(str(tmp_path), quiet=True)
        assert res["rms"] < 0.6
        for f in ("intrinsics.yml", "extrinsics.yml", "left_camera.yml",
                  "right_camera.yml"):
            assert os.path.exists(str(tmp_path / f)), f
