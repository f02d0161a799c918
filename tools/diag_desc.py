"""Descriptor-stability root-cause diagnostic.

Projects frame A's 3D keypoints into frame B's camera with the exact GT
motion, then reports (a) how many of A's keypoints are re-detected by
GFTT in B (nearest-kpt pixel distance), and (b) the Hamming distance
between descriptors of true re-detections.  Separates detector
instability from descriptor instability.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np


def main():
    dz = float(sys.argv[1]) if len(sys.argv) > 1 else 5.0
    from tpuslam.io.synthetic import BoxWorld
    from tpuslam.config import SlamConfig
    from tpuslam.geometry.camera import StereoCameraModel
    from tpuslam.runtime.pipeline import extract_features

    w, h, f, B = 320, 240, 260.0, 0.54
    cx, cy = (w - 1) / 2, (h - 1) / 2
    poses = [np.eye(4) for _ in range(2)]
    poses[1][2, 3] = 100.0
    world = BoxWorld(poses, seed=13)
    cfg = SlamConfig()
    P0 = np.array([[f, 0, cx, 0], [0, f, cy, 0], [0, 0, 1, 0]])
    P1 = P0.copy()
    P1[0, 3] = -f * B
    camera = StereoCameraModel(P_l=P0, P_r=P1, width=w, height=h)
    off = np.eye(4)
    off[0, 3] = B

    def frame_at(z):
        p = np.eye(4)
        p[2, 3] = z
        left = world.render(p, f, cx, cy, h, w)
        right = world.render(p @ off, f, cx, cy, h, w)
        return extract_features(left, right, camera, cfg, stamp=z,
                                frame_id=int(z * 10))

    za, zb = 10.0, 10.0 + dz
    fa, fb = frame_at(za), frame_at(zb)

    # kpts3d are in the ROBOT frame (local_transform applied); transform
    # camera-frame geometry directly instead: lift via disparity in cam A.
    lt = camera.local_transform  # robot <- cam optical
    R_lt, t_lt = lt[:3, :3], lt[:3, 3]
    pts_cam_a = (fa.kpts3d - t_lt) @ R_lt   # rows: (p - t) @ R == R^T p
    ok = np.isfinite(pts_cam_a).all(axis=1)
    # camera B is at z += dz in world; world==camA frame at za
    pts_cam_b = pts_cam_a - np.array([0.0, 0.0, dz])
    u = pts_cam_b[:, 0] / pts_cam_b[:, 2] * f + cx
    v = pts_cam_b[:, 1] / pts_cam_b[:, 2] * f + cy
    ok &= (pts_cam_b[:, 2] > 1.0) & (u >= 0) & (u < w) & (v >= 0) & (v < h)

    kb = fb.kpts[:, :2]
    d2 = ((u[ok, None] - kb[None, :, 0]) ** 2 +
          (v[ok, None] - kb[None, :, 1]) ** 2)
    nn = np.argmin(d2, axis=1)
    nnd = np.sqrt(d2[np.arange(len(nn)), nn])
    print(f"A kpts {fa.n_kpts} (finite3d+proj {int(np.sum(ok))}), "
          f"B kpts {fb.n_kpts}")
    for thr in (1.0, 1.5, 2.5):
        print(f"  re-detected within {thr}px: "
              f"{int(np.sum(nnd < thr))} ({np.mean(nnd < thr):.1%})")

    # Hamming of true pairs (within 1.5 px)
    pair = nnd < 1.5
    da = fa.desc[ok][pair]
    db = fb.desc[nn[pair]]
    ham = np.unpackbits(da ^ db, axis=1).sum(axis=1)
    if len(ham):
        print(f"  true-pair Hamming: p25={np.percentile(ham,25):.0f} "
              f"med={np.median(ham):.0f} p75={np.percentile(ham,75):.0f}")
    # random-pair reference
    rb = fb.desc[np.random.default_rng(0).integers(0, len(fb.desc),
                                                   len(da))]
    rham = np.unpackbits(da ^ rb, axis=1).sum(axis=1)
    if len(rham):
        print(f"  random-pair Hamming: med={np.median(rham):.0f}")
    # depth distribution of pairs
    if np.sum(pair):
        zs = pts_cam_a[ok][pair][:, 2]
        print(f"  pair depth: p25={np.percentile(zs,25):.1f} "
              f"med={np.median(zs):.1f} p75={np.percentile(zs,75):.1f}")


if __name__ == "__main__":
    main()
