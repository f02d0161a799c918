import numpy as np

from tpuslam.geometry import transform as T
from tpuslam.io.dataset import (
    list_images, import_poses, save_poses, load_poses)


def test_list_images_length_then_ascii(tmp_path):
    # Directory.cpp comparator: length first, then ASCII
    for name in ["10.png", "2.png", "1.png", "100.png", "a.png"]:
        (tmp_path / name).write_bytes(b"")
    out = list_images(str(tmp_path))
    assert out == ["1.png", "2.png", "a.png", "10.png", "100.png"]


def test_import_poses_conjugation(tmp_path):
    # identity GT pose stays identity under p*P*p^-1
    f = tmp_path / "poses.txt"
    f.write_text("1 0 0 5 0 1 0 0 0 0 1 2\n")
    poses = import_poses(str(f))
    assert len(poses) == 1
    p = poses[0]
    # optical (x right, y down, z fwd) -> robot (x fwd, y left, z up):
    # optical translation (5,0,2) maps to robot (2,-5,0)
    np.testing.assert_allclose(p[:3, 3], [2, -5, 0], atol=1e-5)
    np.testing.assert_allclose(p[:3, :3], np.eye(3), atol=1e-5)


def test_poses_csv_roundtrip(tmp_path):
    poses = {1: T.identity(), 2: T.from_rpy_xyz(1, 2, 3, 0.1, 0.2, 0.3)}
    path = str(tmp_path / "poses.csv")
    save_poses(path, poses)
    loaded = load_poses(path)
    assert set(loaded) == {1, 2}
    np.testing.assert_allclose(loaded[2], poses[2], atol=1e-5)
