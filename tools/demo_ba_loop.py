"""Global-BA measurement artifact: bundle adjustment vs VO-only on the
209-frame out-and-back loop, loop closure disabled (the reference's
`-lc 0` operating point, Parameters.cpp).

History worth keeping: while the fused VO still carried the bf16
pose-chain corruption (ATE 1.18 m over the loop), the global solve over
cross-leg word tracks IMPROVED it to 0.92 m / t_err 0.78 % — bundle
adjustment earns its keep exactly when odometry is noisier than the
landmark noise floor.  After the matmul-precision fix the VO itself sits
BELOW that floor (ATE ~0.39 m; word-track landmarks initialize from
single-view stereo depth), so BA is correctly near-neutral-to-slightly-
worse here and the artifact's job is to keep measuring that boundary
honestly on the current build.

Run: python tools/demo_ba_loop.py   (uses the real TPU; ~4 min)
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tpuslam.runtime.cache import enable_persistent_cache  # noqa: E402
enable_persistent_cache()

import numpy as np  # noqa: E402


def main():
    from tpuslam.io.synthetic import (make_sequence,
                                      out_and_back_trajectory)
    from tpuslam.config import SlamConfig
    from tpuslam.geometry.camera import StereoCameraModel
    from tpuslam.io.dataset import StereoImageDataset
    from tpuslam.runtime.fast_pipeline import FastSlamPipeline
    from tpuslam.mapping.mapper import Mapper
    from tpuslam.mapping.ba_window import refine_trajectory_global_ba
    from tpuslam.geometry.kitti_metric import (ate_rmse,
                                               calc_kitti_sequence_errors)
    import dataclasses

    d = os.environ.get("DEMO_SEQ") or tempfile.mkdtemp(prefix="bademo")
    if not os.path.exists(os.path.join(d, "calib.txt")):
        poses = out_and_back_trajectory(n_forward=104, speed=1.0)
        make_sequence(d, poses=poses, width=320, height=240,
                      f=260.0, baseline=0.54, seed=13)
    cfg = SlamConfig()
    # loop closure off: raise the hypothesis threshold out of reach
    cfg = dataclasses.replace(
        cfg, mapper=dataclasses.replace(cfg.mapper, loop_thr=10.0))
    camera = StereoCameraModel.load_kitti(
        os.path.join(d, "calib.txt"), image_size=(320, 240))
    ds = StereoImageDataset(
        left_dir=os.path.join(d, "image_0"),
        right_dir=os.path.join(d, "image_1"),
        times_path=os.path.join(d, "times.txt"),
        gt_path=os.path.join(d, "poses.txt"))
    items = [ds[i] for i in range(len(ds))]
    pipe = FastSlamPipeline(camera, cfg, chunk=40, capacity=1024)
    mapper = Mapper(camera, cfg.mapper, cfg.matching, cfg.pnp)
    infos = pipe.run(items, mapper=mapper)
    assert not any(i.lost for i in infos[1:])
    assert not mapper.loop_closures

    vo_poses = {nid: mapper.nodes[nid].pose for nid in sorted(mapper.nodes)}
    refined = refine_trajectory_global_ba(mapper, vo_poses, camera)
    ids = sorted(vo_poses)
    gt = np.stack([mapper.nodes[i].frame.gt_pose for i in ids])
    for name, pd in (("vo-only", vo_poses), ("vo+global_ba", refined)):
        est = np.stack([pd[i] for i in ids])
        te, re_ = calc_kitti_sequence_errors(gt, est)
        print(f"{name:<14} ATE={ate_rmse(gt, est):.3f} m  "
              f"t_err={te:.3f} %  r_err={re_:.6f}")


if __name__ == "__main__":
    main()
