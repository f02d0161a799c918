"""Per-frame diagnostic of the fused VO on the bench sequence.

Dumps the matches/inliers/keyframe/lost trace the driver bench summarizes,
to identify which frames degrade and why (VERDICT r3 item 1).  Run on the
real chip: `python tools/diag_bench.py [n_frames]`.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 120
    import bench
    bench.N_FRAMES = max(bench.N_FRAMES, n)
    seq = bench.ensure_sequence()

    from tpuslam.runtime.cache import enable_persistent_cache
    enable_persistent_cache()
    from tpuslam.config import SlamConfig
    from tpuslam.geometry.camera import StereoCameraModel
    from tpuslam.io.dataset import StereoImageDataset
    from tpuslam.runtime.fast_pipeline import FastSlamPipeline

    cfg = SlamConfig()
    camera = StereoCameraModel.load_kitti(
        os.path.join(seq, "calib.txt"), image_size=(1241, 376))
    ds = StereoImageDataset(
        left_dir=os.path.join(seq, "image_0"),
        right_dir=os.path.join(seq, "image_1"),
        times_path=os.path.join(seq, "times.txt"),
        gt_path=os.path.join(seq, "poses.txt"))
    items = [ds[i] for i in range(min(n, len(ds)))]

    pipe = FastSlamPipeline(camera, cfg, chunk=40)
    t0 = time.perf_counter()
    infos = pipe.run(items)
    dt = time.perf_counter() - t0
    print(f"# {len(items)} frames in {dt:.2f} s ({len(items)/dt:.2f} fps)")

    gt = np.stack([np.vstack([it["ground_truth"], [0, 0, 0, 1]])
                   if it["ground_truth"].shape == (3, 4)
                   else it["ground_truth"] for it in items])
    est = np.stack([i.pose for i in infos])
    for i, info in enumerate(infos):
        step_est = np.linalg.norm(info.transform[:3, 3]) \
            if info.transform is not None else float("nan")
        perr = np.linalg.norm(est[i][:3, 3] - gt[i][:3, 3])
        print(f"f{i:03d} lost={int(info.lost)} kf={int(info.keyframe_added)} "
              f"matches={info.num_matches:4d} inliers={info.num_inliers:4d} "
              f"step={step_est:.3f} poserr={perr:.3f}")

    n_lost = sum(1 for i in infos[1:] if i.lost)
    inl = sorted(i.num_inliers for i in infos[1:])
    ate = float(np.sqrt(np.mean(
        np.sum((est[:, :3, 3] - gt[:, :3, 3]) ** 2, axis=1))))
    from tpuslam.geometry.kitti_metric import calc_kitti_sequence_errors
    t_err, r_err = calc_kitti_sequence_errors(gt, est)
    print(f"# lost={n_lost} median_inliers={inl[len(inl)//2]} "
          f"ATE={ate:.3f} t_err={t_err:.3f}% r_err={r_err:.6f}")


if __name__ == "__main__":
    main()
