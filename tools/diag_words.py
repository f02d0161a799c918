"""Word-stability diagnostic: how well do ORB words re-match across a
viewpoint offset (the loop-closure revisit geometry)?

Renders two frames `dz` apart, extracts features with the host front-end,
then (a) global NNDR matches them, (b) simulates the dictionary insert:
frame A's descriptors become words, frame B's descriptors query them.
Loop closure needs a healthy shared-word count (tf-idf >= 0.2 needs
roughly >= 60 shared words at N~200 nodes).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np


def main():
    dz = float(sys.argv[1]) if len(sys.argv) > 1 else 3.0
    from tpuslam.io.synthetic import BoxWorld
    from tpuslam.config import SlamConfig
    from tpuslam.geometry.camera import StereoCameraModel
    from tpuslam.runtime.pipeline import extract_features
    from tpuslam.mapping.dictionary import VWDictionary

    w, h, f, B = 320, 240, 260.0, 0.54
    cx, cy = (w - 1) / 2, (h - 1) / 2
    poses = [np.eye(4) for _ in range(2)]
    poses[1][2, 3] = 100.0   # size the box like the metric-scale run
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

    fa = frame_at(10.0)
    fb = frame_at(10.0 + dz)
    print(f"kpts A={fa.n_kpts} B={fb.n_kpts}")

    # (a) global NNDR 0.8 Hamming match
    from tpuslam.kernels import matching as M
    va = np.ones(len(fa.desc), bool)
    vb = np.ones(len(fb.desc), bool)
    d1, i1, d2, _ = M.knn2_hamming(fa.desc, va, fb.desc, vb)
    acc = np.asarray(d1) < cfg.matching.nndr * np.asarray(d2)
    print(f"global NNDR matches A->B: {int(np.sum(acc))}")

    # (b) dictionary simulation
    vwd = VWDictionary(cfg.mapper.dict_nndr)
    wa = vwd.add_new_words(fa.desc, 1)
    nw0 = len(vwd)
    wb = vwd.add_new_words(fb.desc, 2)
    shared = sum(1 for x in wb if x < nw0)
    print(f"dict after A: {nw0} words; B adds {len(vwd) - nw0} new, "
          f"shares {shared} ({shared / max(len(wb), 1):.1%})")

    # tf-idf estimate at N nodes
    for N in (40, 200):
        lik = shared * np.log10(N / 2.0) / max(len(wa), 1)
        print(f"  est likelihood at N={N}: {lik:.3f} (thr 0.2)")


if __name__ == "__main__":
    main()
