"""Sensor frame container.

Behavioral twin of the reference SensorData
(/root/reference/src/slam/src/core/SensorData.cpp): stereo pair, dense
disparity, keypoints 2D/3D, descriptors, GT pose.  Keypoint arrays are
kept both unpadded (host bookkeeping) and padded to a static capacity
(device matching) so repeated matching calls never recompile.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

CAPACITY = 1536  # static device capacity (>= 1500 GFTT budget)


@dataclass
class Frame:
    stamp: float = 0.0
    image_left: np.ndarray | None = None       # (H,W) uint8
    image_right: np.ndarray | None = None
    disparity: np.ndarray | None = None        # (H,W) int16, x16 fixed point
    kpts: np.ndarray = field(
        default_factory=lambda: np.zeros((0, 3), np.float32))  # x,y,response
    kpts3d: np.ndarray = field(
        default_factory=lambda: np.zeros((0, 3), np.float32))  # robot frame
    desc: np.ndarray = field(
        default_factory=lambda: np.zeros((0, 32), np.uint8))
    gt_pose: np.ndarray | None = None          # (4,4)
    frame_id: int = -1
    # decimated disparity kept on map nodes for occupancy mapping
    # (SensorData::setFeatures decimates x4 — SensorData.cpp:50-58)
    disparity_dec: np.ndarray | None = None    # (H//4,W//4) int16
    disp_scale: int = 4

    _desc_padded: np.ndarray | None = None
    _valid_padded: np.ndarray | None = None

    @property
    def n_kpts(self) -> int:
        return len(self.kpts)

    def desc_padded(self, cap: int = CAPACITY):
        """(cap,32) uint8 descriptors + (cap,) bool validity, cached."""
        if self._desc_padded is None or len(self._desc_padded) != cap:
            d = np.zeros((cap, 32), np.uint8)
            v = np.zeros((cap,), bool)
            n = min(len(self.desc), cap)
            d[:n] = self.desc[:n]
            v[:n] = True
            self._desc_padded, self._valid_padded = d, v
        return self._desc_padded, self._valid_padded

    def memory_used(self) -> int:
        """Self-reported bytes (SensorData::registerMemoryUsed twin,
        SensorData.cpp:82-107)."""
        total = 0
        for a in (self.image_left, self.image_right, self.disparity,
                  self.disparity_dec, self.kpts, self.kpts3d, self.desc,
                  self._desc_padded, self._valid_padded):
            if a is not None:
                total += a.nbytes
        return total

    def clear_raw_data(self):
        """Drop pixel data once features are extracted
        (SensorData::clearRawData, SensorData.cpp)."""
        self.image_left = None
        self.image_right = None
        self.disparity = None

    def set_decimated_disparity(self):
        """Stride-4 disparity subsample, kept per full map node
        (SensorData::setFeatures, SensorData.cpp:50-58)."""
        if self.disparity is not None:
            h, w = self.disparity.shape
            s = self.disp_scale
            self.disparity_dec = np.ascontiguousarray(
                self.disparity[:(h // s) * s:s, :(w // s) * s:s])

    def clear_features(self):
        """Intermediate mapper nodes drop features + decimated disparity
        (Mapper.cpp:73-86, SensorData::clearFeatures)."""
        self.kpts = np.zeros((0, 3), np.float32)
        self.kpts3d = np.zeros((0, 3), np.float32)
        self.desc = np.zeros((0, 32), np.uint8)
        self.disparity_dec = None
        self._desc_padded = None
        self._valid_padded = None


def limit_keypoints(responses: np.ndarray, max_keypoints: int) -> np.ndarray:
    """Boolean mask keeping the `max_keypoints` highest |response| points.

    Twin of SensorData::limitKeypoints (SensorData.cpp:109-133).  The
    reference's multimap reverse iteration breaks response ties toward the
    *larger* index; np.argsort(kind="stable") on -|r| breaks toward the
    smaller, so we sort on (-|r|, -index) to match.
    """
    n = len(responses)
    if max_keypoints <= 0 or n <= max_keypoints:
        return np.ones(n, bool)
    order = np.lexsort((-np.arange(n), -np.abs(responses)))
    keep = np.zeros(n, bool)
    keep[order[:max_keypoints]] = True
    return keep
