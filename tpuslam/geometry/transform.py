"""SE3 rigid transforms as (4,4) float32 numpy arrays.

Behavioral twin of the reference `Transform` class
(/root/reference/src/slam/src/core/Transform.cpp):

  * composition is a 4x4 matmul followed by quaternion re-normalization of
    the rotation block (Transform.cpp:190-200) — this renorm is load-bearing:
    it keeps long odometry chains orthonormal in float32,
  * inverse is a full 4x4 matrix inverse (Transform.cpp:112-125),
  * a "null" transform is the all-zeros matrix (Transform.cpp:88-95); we keep
    that convention (NULL constant + is_null) because the odometry state
    machine uses null-ness as a Lost/no-guess flag.

All functions accept batched (..., 4, 4) arrays so the same code paths can be
vmapped on device via jax.numpy; the default dtype is float32 like the
reference's CV_32FC1 storage.
"""

from __future__ import annotations

import numpy as np

NULL = np.zeros((4, 4), dtype=np.float32)


def identity() -> np.ndarray:
    return np.eye(4, dtype=np.float32)


def is_null(t) -> bool:
    return t is None or not np.any(t)


def from_3x4(m) -> np.ndarray:
    t = np.zeros((4, 4), dtype=np.float32)
    t[:3, :4] = np.asarray(m, dtype=np.float32).reshape(3, 4)
    t[3, 3] = 1.0
    return t


def rot_to_quat(R):
    """Rotation matrix -> quaternion (w, x, y, z). Shepperd's method, batched.

    Matches Eigen's Quaternion(Matrix3) construction used by the reference
    for the renormalizing compose (robust for all branches).
    """
    R = np.asarray(R)
    b = R.shape[:-2]
    q = np.zeros(b + (4,), dtype=np.float64)
    Rd = R.astype(np.float64)
    t = np.trace(Rd, axis1=-2, axis2=-1)

    # branchless batched Shepperd: compute all four candidates, pick stable one
    m00, m01, m02 = Rd[..., 0, 0], Rd[..., 0, 1], Rd[..., 0, 2]
    m10, m11, m12 = Rd[..., 1, 0], Rd[..., 1, 1], Rd[..., 1, 2]
    m20, m21, m22 = Rd[..., 2, 0], Rd[..., 2, 1], Rd[..., 2, 2]

    # candidate 0: trace
    s0 = np.sqrt(np.maximum(t + 1.0, 1e-30)) * 2
    q0 = np.stack([0.25 * s0, (m21 - m12) / s0, (m02 - m20) / s0,
                   (m10 - m01) / s0], axis=-1)
    # candidate 1: m00 largest
    s1 = np.sqrt(np.maximum(1.0 + m00 - m11 - m22, 1e-30)) * 2
    q1 = np.stack([(m21 - m12) / s1, 0.25 * s1, (m01 + m10) / s1,
                   (m02 + m20) / s1], axis=-1)
    # candidate 2: m11 largest
    s2 = np.sqrt(np.maximum(1.0 + m11 - m00 - m22, 1e-30)) * 2
    q2 = np.stack([(m02 - m20) / s2, (m01 + m10) / s2, 0.25 * s2,
                   (m12 + m21) / s2], axis=-1)
    # candidate 3: m22 largest
    s3 = np.sqrt(np.maximum(1.0 + m22 - m00 - m11, 1e-30)) * 2
    q3 = np.stack([(m10 - m01) / s3, (m02 + m20) / s3, (m12 + m21) / s3,
                   0.25 * s3], axis=-1)

    cond0 = t > 0
    diag = np.stack([m00, m11, m22], axis=-1)
    arg = np.argmax(diag, axis=-1)
    q = np.where(cond0[..., None], q0,
                 np.where((arg == 0)[..., None], q1,
                          np.where((arg == 1)[..., None], q2, q3)))
    q = q / np.linalg.norm(q, axis=-1, keepdims=True)
    return q


def quat_to_rot(q):
    """Quaternion (w, x, y, z) -> rotation matrix. Batched."""
    q = np.asarray(q, dtype=np.float64)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    n = w * w + x * x + y * y + z * z
    s = np.where(n > 0, 2.0 / np.maximum(n, 1e-30), 0.0)
    wx, wy, wz = s * w * x, s * w * y, s * w * z
    xx, xy, xz = s * x * x, s * x * y, s * x * z
    yy, yz, zz = s * y * y, s * y * z, s * z * z
    R = np.stack([
        np.stack([1 - (yy + zz), xy - wz, xz + wy], axis=-1),
        np.stack([xy + wz, 1 - (xx + zz), yz - wx], axis=-1),
        np.stack([xz - wy, yz + wx, 1 - (xx + yy)], axis=-1),
    ], axis=-2)
    return R


def compose(a, b) -> np.ndarray:
    """a * b with rotation re-orthonormalization (Transform.cpp:190-200)."""
    m = (np.asarray(a, dtype=np.float32) @ np.asarray(b, dtype=np.float32))
    q = rot_to_quat(m[..., :3, :3])
    m = m.copy()
    m[..., :3, :3] = quat_to_rot(q).astype(np.float32)
    return m.astype(np.float32)


def inverse(t) -> np.ndarray:
    """Full 4x4 inverse (Transform.cpp:112-125)."""
    return np.linalg.inv(np.asarray(t, dtype=np.float32)).astype(np.float32)


def from_rpy_xyz(x, y, z, roll, pitch, yaw) -> np.ndarray:
    """Translation + roll/pitch/yaw to matrix (Transform.cpp:67-86)."""
    A, B = np.cos(yaw), np.sin(yaw)
    C, D = np.cos(pitch), np.sin(pitch)
    E, F = np.cos(roll), np.sin(roll)
    DE, DF = D * E, D * F
    t = np.array([
        [A * C, A * DF - B * E, B * F + A * DE, x],
        [B * C, A * E + B * DF, B * DE - A * F, y],
        [-D, C * F, C * E, z],
        [0.0, 0.0, 0.0, 1.0],
    ], dtype=np.float32)
    return t


def get_rpy(t):
    """Matrix to roll/pitch/yaw (Transform.cpp:127-133)."""
    t = np.asarray(t)
    roll = np.arctan2(t[..., 2, 1], t[..., 2, 2])
    pitch = np.arcsin(np.clip(-t[..., 2, 0], -1.0, 1.0))
    yaw = np.arctan2(t[..., 1, 0], t[..., 0, 0])
    return roll, pitch, yaw


def translation_norm(t) -> float:
    t = np.asarray(t)
    return float(np.linalg.norm(t[:3, 3]))


def transform_points(t, pts):
    """Apply (4,4) transform to (N,3) points (Stereo.cpp:189-198)."""
    t = np.asarray(t, dtype=np.float32)
    pts = np.asarray(pts, dtype=np.float32)
    return pts @ t[:3, :3].T + t[:3, 3]
