import numpy as np
import pytest

from tpuslam.geometry import transform as T
from tpuslam.geometry.camera import StereoCameraModel, project_disparity_to_3d
from tpuslam.geometry.kitti_metric import calc_kitti_sequence_errors, ate_rmse


def random_se3(rng, scale=1.0):
    t = T.from_rpy_xyz(*(rng.uniform(-scale, scale, 3)),
                       *(rng.uniform(-0.5, 0.5, 3)))
    return t


def test_compose_inverse_roundtrip(rng):
    for _ in range(20):
        a = random_se3(rng)
        b = random_se3(rng)
        ab = T.compose(a, b)
        ainv = T.inverse(a)
        back = T.compose(ainv, ab)
        np.testing.assert_allclose(back, b, atol=1e-4)


def test_compose_renormalizes_rotation(rng):
    # after many float32 composes the rotation must remain orthonormal
    t = T.identity()
    step = T.from_rpy_xyz(0.1, 0.02, 0.0, 0.001, 0.02, 0.003)
    for _ in range(2000):
        t = T.compose(t, step)
    R = t[:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-4)


def test_quat_roundtrip(rng):
    for _ in range(50):
        t = random_se3(rng)
        q = T.rot_to_quat(t[:3, :3])
        R = T.quat_to_rot(q)
        np.testing.assert_allclose(R, t[:3, :3], atol=1e-5)


def test_rpy_roundtrip():
    roll, pitch, yaw = 0.2, -0.3, 0.7
    t = T.from_rpy_xyz(1, 2, 3, roll, pitch, yaw)
    r, p, y = T.get_rpy(t)
    np.testing.assert_allclose([r, p, y], [roll, pitch, yaw], atol=1e-5)


def test_null_conventions():
    assert T.is_null(T.NULL)
    assert T.is_null(None)
    assert not T.is_null(T.identity())


def test_kitti_calib_loader(tmp_path):
    calib = tmp_path / "calib.txt"
    # KITTI seq 00 values
    calib.write_text(
        "P0: 7.188560000000e+02 0 6.071928000000e+02 0 "
        "0 7.188560000000e+02 1.852157000000e+02 0 0 0 1 0\n"
        "P1: 7.188560000000e+02 0 6.071928000000e+02 -3.861448000000e+02 "
        "0 7.188560000000e+02 1.852157000000e+02 0 0 0 1 0\n")
    m = StereoCameraModel.load_kitti(str(calib))
    assert m.width == 1241 and m.height == 376
    assert abs(m.fx_l - 718.856) < 1e-6
    assert abs(m.baseline() - 3.861448e2 / 718.856) < 1e-9

    m2 = StereoCameraModel.load_kitti(str(calib), do_resize=True)
    assert m2.width == 640
    assert abs(m2.fx_l - 718.856 * 640 / 1241) < 1e-6
    # baseline is invariant under horizontal rescale
    assert abs(m2.baseline() - m.baseline()) < 1e-9


def test_project_disparity_to_3d():
    m = StereoCameraModel(
        P_l=np.array([[700.0, 0, 320, 0], [0, 700, 240, 0], [0, 0, 1, 0]]),
        P_r=np.array([[700.0, 0, 320, -350], [0, 700, 240, 0], [0, 0, 1, 0]]),
        width=640, height=480)
    # baseline 0.5m, disparity 35px -> Z = B*f/d = 0.5*700/35 = 10m
    pts = project_disparity_to_3d([[320, 240]], [35.0], m)
    np.testing.assert_allclose(pts[0], [0, 0, 10.0], atol=1e-5)
    # zero disparity -> NaN
    pts = project_disparity_to_3d([[320, 240]], [0.0], m)
    assert np.all(np.isnan(pts[0]))


def test_kitti_metric_perfect_and_scaled():
    # straight 1000m trajectory, 10 Hz, 1 m/frame
    n = 1001
    gt = np.tile(np.eye(4), (n, 1, 1))
    gt[:, 2, 3] = np.arange(n, dtype=np.float64)
    t_err, r_err = calc_kitti_sequence_errors(gt, gt)
    assert t_err == 0.0 and r_err == 0.0

    # 1% translation scale error
    res = gt.copy()
    res[:, 2, 3] *= 1.01
    t_err, r_err = calc_kitti_sequence_errors(gt, res)
    assert abs(t_err - 1.0) < 0.05
    assert r_err < 1e-6

    assert ate_rmse(gt, res) == pytest.approx(
        np.sqrt(np.mean((np.arange(n) * 0.01) ** 2)), rel=1e-6)
