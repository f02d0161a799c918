"""Driver benchmark: end-to-end SLAM frames/sec on one chip.

Runs the full per-frame pipeline (disparity + GFTT + ORB + matching +
PnP VO + mapper) on a synthetic KITTI-geometry (1241x376) sequence and
prints ONE JSON line.  Baseline: the reference's implied real-time bound
of 30 fps on the Ultra96 (BASELINE.md — no absolute fps published
in-tree), so vs_baseline = fps / 30.
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
CACHE = os.path.join(REPO, ".bench_cache", "kittigeo")
N_FRAMES = 24
WARMUP = 4


def ensure_sequence():
    if not os.path.exists(os.path.join(CACHE, "calib.txt")):
        from tpuslam.io.synthetic import make_sequence
        os.makedirs(CACHE, exist_ok=True)
        make_sequence(CACHE, n_frames=N_FRAMES, width=1241, height=376,
                      f=718.856, baseline=0.54, speed=0.8,
                      yaw_rate=0.003, seed=11)
    return CACHE


def main():
    seq = ensure_sequence()

    from tpuslam.config import SlamConfig
    from tpuslam.geometry.camera import StereoCameraModel
    from tpuslam.io.dataset import StereoImageDataset
    from tpuslam.runtime.pipeline import extract_features
    from tpuslam.vo.odometry import Odometry
    from tpuslam.mapping.mapper import Mapper

    cfg = SlamConfig()
    camera = StereoCameraModel.load_kitti(
        os.path.join(seq, "calib.txt"), image_size=(1241, 376))
    ds = StereoImageDataset(
        left_dir=os.path.join(seq, "image_0"),
        right_dir=os.path.join(seq, "image_1"),
        times_path=os.path.join(seq, "times.txt"),
        gt_path=os.path.join(seq, "poses.txt"))

    odom = Odometry(camera, cfg.odometry, cfg.matching, cfg.pnp)
    mapper = Mapper(camera, cfg.mapper, cfg.matching, cfg.pnp)

    # preload images so disk IO is excluded from the timed region
    items = [ds[i] for i in range(min(N_FRAMES, len(ds)))]

    t_timed = 0.0
    n_timed = 0
    for i, item in enumerate(items):
        t0 = time.perf_counter()
        frame = extract_features(item["left"], item["right"], camera,
                                 cfg, stamp=item["stamp"], frame_id=i,
                                 gt_pose=item["ground_truth"])
        info = odom.process(frame)
        mapper.process(frame, info)
        dt = time.perf_counter() - t0
        if i >= WARMUP:
            t_timed += dt
            n_timed += 1
        print(f"# frame {i}: {dt*1000:.1f} ms, inliers "
              f"{info.num_inliers}", file=sys.stderr)

    fps = n_timed / t_timed
    print(json.dumps({
        "metric": "slam_e2e_fps_1241x376_1chip",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / 30.0, 3),
    }))


if __name__ == "__main__":
    main()
