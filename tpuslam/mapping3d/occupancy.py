"""Occupancy-grid mapping: dense disparity -> world voxels -> .bt file.

Behavioral twin of buildOccupancyGridMap
(/root/reference/src/slam/src/core/main.cpp:495-561): for every *full*
map node (weight != -1), reproject its stored decimated x16 disparity
map through the optimized pose, range-gate, and mark the hit voxels
occupied in a 0.1 m OctoMap tree; write `slam.bt`.

TPU-first split: the O(pixels) reprojection of every node runs as one
jitted device program (optionally batched over nodes); only the sparse
voxel-set dedupe (np.unique on packed 48-bit keys) and the final octree
serialization stay on host.

Quirk replicated on purpose: the reference gates points with
`v.norm() <= rangeMax * rangeMax` (main.cpp:500-501,545) — it compares
the *norm* against the *squared* range, so with rangeMax = 5.0 the
effective radius is 25 m.  We keep that exact behavior (`range_gate =
range_max ** 2` compared against the distance) so maps match.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry import transform as T
from ..geometry.camera import StereoCameraModel
from .octree_bt import coords_to_keys, pack_keys, unpack_keys, write_bt


@functools.partial(jax.jit, static_argnames=("scale",))
def _project_disparity_grid(disp_dec: jnp.ndarray, full_pose: jnp.ndarray,
                            origin: jnp.ndarray, cam: jnp.ndarray,
                            range_gate: jnp.ndarray, scale: int):
    """Decimated x16 int16 disparity -> world points + validity mask.

    cam = [cx_l, cy_l, fx_l, c(=cx_r-cx_l), wx_n, wy_n] as in
    Stereo.cpp:157-182; full_pose = optimized_pose @ local_transform
    (3,4); origin = sensor origin (optimized pose translation,
    main.cpp:520).
    """
    d = disp_dec.astype(jnp.float32) / 16.0
    h, w = disp_dec.shape
    u = (jnp.arange(w, dtype=jnp.float32) * scale)[None, :]
    v = (jnp.arange(h, dtype=jnp.float32) * scale)[:, None]
    cx_l, cy_l, fx_l, c, wx_n, wy_n = (cam[0], cam[1], cam[2], cam[3],
                                       cam[4], cam[5])
    denom = d + c
    Wx = wx_n / denom
    Wy = wy_n / denom
    x = (u - cx_l) * Wx
    y = (v - cy_l) * Wy
    z = fx_l * Wx
    pts_opt = jnp.stack([x, y, z], axis=-1)          # (h,w,3) optical
    R = full_pose[:3, :3]
    t = full_pose[:3, 3]
    pts_w = pts_opt @ R.T + t                         # (h,w,3) world
    dist = jnp.linalg.norm(pts_w - origin, axis=-1)
    finite = jnp.isfinite(pts_w).all(axis=-1)
    mask = (d > 0.0) & finite & (dist <= range_gate)
    pts_w = jnp.where(mask[..., None], pts_w, 0.0)
    return pts_w, mask


class OccupancyGrid:
    """Sparse occupied-voxel set with OctoMap .bt export.

    Covers the used OctoMap surface (OcTree(res), coordToKeyChecked,
    updateNode(key, true), writeBinary) — see octree_bt.py.
    """

    def __init__(self, resolution: float = 0.1):
        self.resolution = float(resolution)
        self._chunks: list[np.ndarray] = []
        self._packed = np.zeros((0,), np.uint64)

    def update_points(self, points: np.ndarray,
                      mask: np.ndarray | None = None) -> None:
        pts = np.asarray(points, np.float64).reshape(-1, 3)
        if mask is not None:
            pts = pts[np.asarray(mask).reshape(-1)]
        if len(pts) == 0:
            return
        keys = coords_to_keys(pts, self.resolution)
        self._chunks.append(np.unique(pack_keys(keys)))

    def _consolidate(self) -> np.ndarray:
        if self._chunks:
            allp = np.concatenate([self._packed] + self._chunks)
            self._packed = np.unique(allp)
            self._chunks = []
        return self._packed

    @property
    def occupied_keys(self) -> np.ndarray:
        return unpack_keys(self._consolidate())

    @property
    def num_occupied(self) -> int:
        return len(self._consolidate())

    def occupied_centers(self) -> np.ndarray:
        from .octree_bt import keys_to_coords
        return keys_to_coords(self.occupied_keys, self.resolution)

    def write_bt(self, path: str) -> int:
        return write_bt(path, self.occupied_keys, self.resolution)


def _cam_vector(camera: StereoCameraModel) -> np.ndarray:
    wx_n = camera.Tx_l / camera.fx_l - camera.Tx_r / camera.fx_r
    wy_n = camera.Tx_l / camera.fy_l - camera.Tx_r / camera.fy_r
    return np.array([camera.cx_l, camera.cy_l, camera.fx_l,
                     camera.cx_r - camera.cx_l, wx_n, wy_n], np.float32)


def insert_depth_frame(grid: OccupancyGrid, disp_dec: np.ndarray,
                       disp_scale: int, pose: np.ndarray,
                       camera: StereoCameraModel,
                       range_max: float = 5.0) -> None:
    """Insert one node's decimated disparity map into the grid."""
    full_pose = T.compose(pose, camera.local_transform).astype(np.float32)
    origin = pose[:3, 3].astype(np.float32)
    cam = _cam_vector(camera)
    # reference quirk: norm gated against range^2 (main.cpp:500-501,545)
    gate = np.float32(range_max * range_max)
    pts, mask = _project_disparity_grid(
        jnp.asarray(disp_dec), jnp.asarray(full_pose[:3]),
        jnp.asarray(origin), jnp.asarray(cam), gate, int(disp_scale))
    grid.update_points(np.asarray(pts), np.asarray(mask))


def build_occupancy_grid_map(mapper, optimized_poses: dict,
                             camera: StereoCameraModel,
                             out_path: str = "slam.bt",
                             resolution: float = 0.1,
                             range_max: float = 5.0) -> OccupancyGrid:
    """Twin of buildOccupancyGridMap (main.cpp:495-561)."""
    grid = OccupancyGrid(resolution)
    for node_id in sorted(optimized_poses):
        node = mapper.nodes.get(node_id)
        if node is None or node.weight == -1:
            continue
        frame = node.frame
        if getattr(frame, "disparity_dec", None) is None:
            continue
        insert_depth_frame(grid, np.asarray(frame.disparity_dec),
                           frame.disp_scale,
                           np.asarray(optimized_poses[node_id], np.float64),
                           camera, range_max)
    if out_path:
        grid.write_bt(out_path)
    return grid
