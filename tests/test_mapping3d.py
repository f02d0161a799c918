"""Occupancy grid + OctoMap .bt serialization tests.

Oracle strategy (SURVEY.md §4): the .bt writer is validated by
round-tripping through an independent reader, by hand-checked structural
cases (pruning of complete blocks), and the projection kernel against a
NumPy re-derivation of Stereo.cpp:157-182.
"""

import os

import numpy as np
import pytest

from tpuslam.mapping3d import (OccupancyGrid, coords_to_keys,
                               insert_depth_frame, keys_to_coords,
                               pack_keys, read_bt, unpack_keys, write_bt)
from tpuslam.mapping3d.octree_bt import TREE_MAX_VAL, _serialize


def test_key_roundtrip():
    rng = np.random.default_rng(0)
    pts = rng.uniform(-100, 100, (1000, 3))
    keys = coords_to_keys(pts, 0.1)
    centers = keys_to_coords(keys, 0.1)
    # voxel center within half a voxel of the original point
    assert np.abs(centers - pts).max() <= 0.05 + 1e-9
    packed = pack_keys(keys)
    assert np.array_equal(unpack_keys(packed), keys)


def test_single_voxel_bt(tmp_path):
    path = str(tmp_path / "one.bt")
    key = np.array([[TREE_MAX_VAL, TREE_MAX_VAL, TREE_MAX_VAL]], np.uint16)
    n = write_bt(path, key, 0.1)
    # one voxel -> a chain of 16 nodes root..leaf (root + 15 inner + leaf)
    assert n == 17
    with open(path, "rb") as f:
        header = f.readline()
    assert header == b"# Octomap OcTree binary file\n"
    keys2, res = read_bt(path)
    assert res == pytest.approx(0.1)
    assert np.array_equal(keys2, key)


def test_full_block_prunes(tmp_path):
    """A complete 2x2x2 aligned voxel block collapses into one leaf."""
    base = TREE_MAX_VAL  # even -> aligned at depth-15 boundary
    keys = np.array([[base + dx, base + dy, base + dz]
                     for dx in (0, 1) for dy in (0, 1) for dz in (0, 1)],
                    np.uint16)
    data, n_full = _serialize(keys)
    # drop one voxel: the block can't prune, so the tree is strictly bigger
    data2, n_partial = _serialize(keys[:-1])
    assert n_partial > n_full
    path = str(tmp_path / "block.bt")
    write_bt(path, keys, 0.05)
    keys2, _ = read_bt(path)
    assert np.array_equal(
        np.sort(pack_keys(keys2)), np.sort(pack_keys(keys)))


def test_random_voxels_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    pts = rng.uniform(-20, 20, (5000, 3))
    grid = OccupancyGrid(0.1)
    grid.update_points(pts)
    path = str(tmp_path / "rand.bt")
    n = grid.write_bt(path)
    assert n > 0
    keys2, res = read_bt(path)
    assert res == pytest.approx(0.1)
    assert np.array_equal(np.sort(pack_keys(keys2)),
                          np.sort(pack_keys(grid.occupied_keys)))


def test_projection_matches_numpy_oracle(kitti_camera):
    """Device projection == Stereo.cpp math re-derived in NumPy."""
    from tpuslam.geometry.camera import project_disparity_to_3d
    from tpuslam.geometry import transform as T

    cam = kitti_camera
    h, w, scale = 16, 32, 4
    rng = np.random.default_rng(2)
    disp_dec = (rng.uniform(0, 64, (h, w)) * 16).astype(np.int16)
    disp_dec[0, :] = 0  # invalid rows stay masked
    pose = T.from_rpy_xyz(1.0, 2.0, 0.5, 0.02, -0.01, 0.3)

    grid = OccupancyGrid(0.1)
    insert_depth_frame(grid, disp_dec, scale, pose, cam, range_max=5.0)

    # oracle: per-pixel loop as in main.cpp:520-552
    uv = np.array([[c * scale, r * scale] for r in range(h)
                   for c in range(w)], np.float32)
    d = disp_dec.astype(np.float32).ravel() / 16.0
    pts = project_disparity_to_3d(uv, d, cam)
    valid = (d > 0) & np.isfinite(pts).all(axis=1)
    pts_r = T.transform_points(cam.local_transform, pts[valid])
    pts_w = T.transform_points(pose, pts_r)
    vnorm = np.linalg.norm(pts_w - pose[:3, 3], axis=1)
    pts_w = pts_w[vnorm <= 25.0]  # reference's norm<=range^2 quirk
    oracle = OccupancyGrid(0.1)
    oracle.update_points(pts_w)
    assert np.array_equal(np.sort(pack_keys(grid.occupied_keys)),
                          np.sort(pack_keys(oracle.occupied_keys)))
    assert grid.num_occupied > 0


def test_empty_grid(tmp_path):
    grid = OccupancyGrid(0.1)
    path = str(tmp_path / "empty.bt")
    n = grid.write_bt(path)
    assert n == 0
    keys, _ = read_bt(path)
    assert len(keys) == 0
