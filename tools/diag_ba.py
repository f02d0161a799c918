"""BA divergence diagnostic: per-window track/residual/pose-delta stats
on the bench sequence (bench r3: refine_trajectory_ba wrecked ATE 3->33 m).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tpuslam.runtime.cache import enable_persistent_cache  # noqa: E402
enable_persistent_cache()

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import bench  # noqa: E402


def main():
    seq = bench.ensure_sequence()
    from tpuslam.config import SlamConfig
    from tpuslam.geometry.camera import StereoCameraModel
    from tpuslam.io.dataset import StereoImageDataset
    from tpuslam.runtime.fast_pipeline import FastSlamPipeline
    from tpuslam.mapping.mapper import Mapper
    from tpuslam.mapping.ba_window import extract_window
    from tpuslam.optim.ba import ba_solve
    from tpuslam.geometry import transform as T

    cfg = SlamConfig()
    camera = StereoCameraModel.load_kitti(
        os.path.join(seq, "calib.txt"), image_size=(1241, 376))
    ds = StereoImageDataset(
        left_dir=os.path.join(seq, "image_0"),
        right_dir=os.path.join(seq, "image_1"),
        times_path=os.path.join(seq, "times.txt"),
        gt_path=os.path.join(seq, "poses.txt"))
    items = [ds[i] for i in range(120)]
    pipe = FastSlamPipeline(camera, cfg, chunk=40)
    mapper = Mapper(camera, cfg.mapper, cfg.matching, cfg.pnp)
    pipe.run(items, mapper=mapper)

    poses = {nid: mapper.nodes[nid].pose for nid in sorted(mapper.nodes)}
    full_ids = [nid for nid in sorted(poses)
                if mapper.nodes[nid].weight >= 0 and mapper.nodes[nid].words]
    print(f"full nodes: {len(full_ids)}")
    intr = jnp.asarray([camera.fx_l, camera.fy_l, camera.cx_l,
                        camera.cy_l], jnp.float32)
    local_t = camera.local_transform

    window, stride = 8, 4
    for s in range(0, max(len(full_ids) - window, 0) + 1, stride):
        ids = full_ids[s:s + window]
        win = extract_window(mapper, ids, camera, poses=poses)
        if win is None:
            print(f"win {s}: none")
            continue
        nv = int(win.obs_valid.sum())
        # residuals BEFORE
        def residuals(Tcw, lms):
            pc = (np.einsum('oij,oj->oi',
                            Tcw[win.obs_cam][:, :3, :3],
                            lms[win.obs_lm]) + Tcw[win.obs_cam][:, :3, 3])
            u = pc[:, 0] / pc[:, 2] * camera.fx_l + camera.cx_l
            v = pc[:, 1] / pc[:, 2] * camera.fy_l + camera.cy_l
            r = np.hypot(u - win.obs_uv[:, 0], v - win.obs_uv[:, 1])
            return r[win.obs_valid[:len(r)]], pc[:, 2][win.obs_valid[:len(r)]]
        r0, z0 = residuals(win.Tcw, win.lms)
        Tcw_new, lms_new, info = ba_solve(
            jnp.asarray(win.Tcw), jnp.asarray(win.lms), intr,
            jnp.asarray(win.obs_cam), jnp.asarray(win.obs_lm),
            jnp.asarray(win.obs_uv), jnp.asarray(win.obs_valid),
            n_cams=win.Tcw.shape[0], n_lms=win.lms.shape[0],
            iterations=8, huber_delta=4.0)
        Tcw_new = np.asarray(Tcw_new, np.float64)
        r1, _ = residuals(Tcw_new, np.asarray(lms_new))
        dpose = [np.linalg.norm(np.linalg.inv(Tcw_new[i])[:3, 3] -
                                np.linalg.inv(win.Tcw[i].astype(np.float64))[:3, 3])
                 for i in range(len(ids))]
        print(f"win {s}: lms={win.n_landmarks} obs={nv} "
              f"res med {np.median(r0):.2f}->{np.median(r1):.2f} "
              f"p90 {np.percentile(r0, 90):.1f}->{np.percentile(r1, 90):.1f} "
              f"z med {np.median(z0):.1f} max dpose {max(dpose):.2f} m")


if __name__ == "__main__":
    main()


def end_to_end():
    """refine_trajectory_ba on the bench mapper + KITTI metrics."""
    seq = bench.ensure_sequence()
    from tpuslam.config import SlamConfig
    from tpuslam.geometry.camera import StereoCameraModel
    from tpuslam.io.dataset import StereoImageDataset
    from tpuslam.runtime.fast_pipeline import FastSlamPipeline
    from tpuslam.mapping.mapper import Mapper
    from tpuslam.mapping.ba_window import refine_trajectory_ba
    from tpuslam.geometry.kitti_metric import calc_kitti_sequence_errors

    cfg = SlamConfig()
    camera = StereoCameraModel.load_kitti(
        os.path.join(seq, "calib.txt"), image_size=(1241, 376))
    ds = StereoImageDataset(
        left_dir=os.path.join(seq, "image_0"),
        right_dir=os.path.join(seq, "image_1"),
        times_path=os.path.join(seq, "times.txt"),
        gt_path=os.path.join(seq, "poses.txt"))
    items = [ds[i] for i in range(120)]
    pipe = FastSlamPipeline(camera, cfg, chunk=40)
    mapper = Mapper(camera, cfg.mapper, cfg.matching, cfg.pnp)
    pipe.run(items, mapper=mapper)
    poses = {nid: mapper.nodes[nid].pose for nid in sorted(mapper.nodes)}
    gt = np.stack([np.vstack([it["ground_truth"], [0, 0, 0, 1]])
                   if it["ground_truth"].shape == (3, 4)
                   else it["ground_truth"] for it in items])
    ids = sorted(poses)
    gt_n = gt[[i - 1 for i in ids]]
    for name, pd in (("vo", poses),
                     ("ba", refine_trajectory_ba(mapper, poses, camera))):
        est = np.stack([pd[i] for i in ids])
        ate = float(np.sqrt(np.mean(np.sum(
            (est[:, :3, 3] - gt_n[:, :3, 3]) ** 2, axis=1))))
        te, re_ = calc_kitti_sequence_errors(gt_n, est)
        print(f"{name}: ATE={ate:.3f} t_err={te:.3f}% r_err={re_:.6f}")


if __name__ == "__main__" and os.environ.get("DIAG_BA_E2E"):
    end_to_end()
