"""KITTI odometry benchmark metric.

Behavioral twin of /root/reference/src/slam/src/rtabmap/KITTI.cpp (the
official devkit logic): per-segment translation %% and rotation deg/m errors
over 100..800 m segments starting every 10 frames, averaged.  This is the
acceptance metric of the whole framework.
"""

from __future__ import annotations

import numpy as np

SEGMENT_LENGTHS = (100.0, 200.0, 300.0, 400.0, 500.0, 600.0, 700.0, 800.0)
STEP_SIZE = 10  # every second at 10 Hz (KITTI.cpp:103)


def _trajectory_distances(poses: np.ndarray) -> np.ndarray:
    # KITTI.cpp:52-65
    d = np.linalg.norm(np.diff(poses[:, :3, 3], axis=0), axis=1)
    return np.concatenate([[0.0], np.cumsum(d)])


def _rotation_error(pose_error: np.ndarray) -> float:
    # KITTI.cpp:77-84
    d = 0.5 * (np.trace(pose_error[:3, :3]) - 1.0)
    return float(np.arccos(np.clip(d, -1.0, 1.0)))


def _translation_error(pose_error: np.ndarray) -> float:
    return float(np.linalg.norm(pose_error[:3, 3]))


def calc_kitti_sequence_errors(poses_gt, poses_result):
    """Returns (t_err %%, r_err deg/m).  reference: KITTI.cpp:90-154."""
    poses_gt = np.asarray(poses_gt, dtype=np.float64)
    poses_result = np.asarray(poses_result, dtype=np.float64)
    assert poses_gt.shape == poses_result.shape, \
        f"gt {poses_gt.shape} vs result {poses_result.shape}"

    dist = _trajectory_distances(poses_gt)
    t_errs, r_errs = [], []
    n = len(poses_gt)
    for first in range(0, n, STEP_SIZE):
        for length in SEGMENT_LENGTHS:
            # lastFrameFromSegmentLength (KITTI.cpp:66-74)
            beyond = np.nonzero(dist[first:] > dist[first] + length)[0]
            if beyond.size == 0:
                continue
            last = first + int(beyond[0])
            delta_gt = np.linalg.inv(poses_gt[first]) @ poses_gt[last]
            delta_res = np.linalg.inv(poses_result[first]) @ poses_result[last]
            pose_error = np.linalg.inv(delta_res) @ delta_gt
            r_errs.append(_rotation_error(pose_error) / length)
            t_errs.append(_translation_error(pose_error) / length)

    if not t_errs:
        return float("nan"), float("nan")
    t_err = float(np.mean(t_errs)) * 100.0        # %
    r_err = float(np.mean(r_errs)) * 180.0 / np.pi  # deg/m
    return t_err, r_err


def ate_rmse(poses_gt, poses_result) -> float:
    """Absolute trajectory error (RMSE of translation), no alignment.

    Not in the reference binary but part of the north-star acceptance
    criteria (BASELINE.json).
    """
    poses_gt = np.asarray(poses_gt, dtype=np.float64)
    poses_result = np.asarray(poses_result, dtype=np.float64)
    d = poses_gt[:, :3, 3] - poses_result[:, :3, 3]
    return float(np.sqrt(np.mean(np.sum(d * d, axis=1))))
