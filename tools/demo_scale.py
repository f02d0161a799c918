"""Trajectory-scale demonstration: a 509-frame (713 m) out-and-back loop
at full KITTI geometry through the complete pipeline — fused VO, mapper
with STM/WM turnover and loop closure at a grown dictionary, robust
pose-graph optimization, occupancy grid.

This is the BASELINE config-4 ladder step on synthetic data (no KITTI in
the zero-egress environment): the working memory holds ~70 candidate
nodes and the dictionary ~50k words by the time the return leg closes
loops.  Run on the chip: python tools/demo_scale.py [n_forward]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tpuslam.runtime.cache import enable_persistent_cache  # noqa: E402
enable_persistent_cache()

import numpy as np  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    n_forward = int(sys.argv[1]) if len(sys.argv) > 1 else 254
    assert n_forward % 5 == 4, "align full-node revisits (n === 4 mod 5)"
    cache = os.path.join(REPO, ".bench_cache", f"loop{2 * n_forward + 1}")

    from tpuslam.io.synthetic import (make_sequence,
                                      out_and_back_trajectory)
    if not os.path.exists(os.path.join(cache, "calib.txt")):
        os.makedirs(cache, exist_ok=True)
        poses = out_and_back_trajectory(n_forward=n_forward, speed=1.4)
        make_sequence(cache, poses=poses, width=1241, height=376,
                      f=718.856, baseline=0.54, seed=21)
        print(f"# generated {2 * n_forward + 1} frames")

    from tpuslam.config import SlamConfig
    from tpuslam.geometry.camera import StereoCameraModel
    from tpuslam.io.dataset import StereoImageDataset
    from tpuslam.runtime.fast_pipeline import FastSlamPipeline
    from tpuslam.mapping.mapper import Mapper
    from tpuslam.optim import run_optimize_robust
    from tpuslam.geometry.kitti_metric import (ate_rmse,
                                               calc_kitti_sequence_errors)

    cfg = SlamConfig()
    camera = StereoCameraModel.load_kitti(
        os.path.join(cache, "calib.txt"), image_size=(1241, 376))
    ds = StereoImageDataset(
        left_dir=os.path.join(cache, "image_0"),
        right_dir=os.path.join(cache, "image_1"),
        times_path=os.path.join(cache, "times.txt"),
        gt_path=os.path.join(cache, "poses.txt"))
    items = [ds[i] for i in range(len(ds))]
    n = len(items)

    pipe = FastSlamPipeline(camera, cfg, chunk=40)
    staged = pipe.stage_chunks(items)
    pipe.run_staged(staged[:1], items[:pipe.chunk])   # warm
    pipe.reset()

    mapper = Mapper(camera, cfg.mapper, cfg.matching, cfg.pnp)
    mapper.async_lc = True
    t0 = time.perf_counter()
    infos = pipe.run_staged(staged, items, mapper=mapper)
    dt = time.perf_counter() - t0

    n_lost = sum(1 for i in infos[1:] if i.lost)
    inl = sorted(i.num_inliers for i in infos[1:])
    print(f"# {n} frames ({1.4 * (n - 1):.0f} m path) in {dt:.2f} s "
          f"= {n / dt:.2f} fps; lost={n_lost}, "
          f"median inliers={inl[len(inl) // 2]}")
    print(f"# mapper: {len(mapper.nodes)} nodes, "
          f"STM {len(mapper.stm)}, WM {len(mapper.working_mem)}, "
          f"dictionary {len(mapper.vwd)} words, "
          f"loop closures {len(mapper.loop_closures)}")
    mem = mapper.memory_used()
    print("# memory: " + ", ".join(f"{k}={v / 1e6:.1f} MB"
                                   for k, v in mem.items()))

    poses, links = mapper.get_graph()
    t0 = time.perf_counter()
    optimized, chi2 = run_optimize_robust(
        poses, links, cfg.optimizer.final_iterations, cfg.optimizer)
    t_opt = time.perf_counter() - t0

    gt = np.stack([np.vstack([it["ground_truth"], [0, 0, 0, 1]])
                   if it["ground_truth"].shape == (3, 4)
                   else it["ground_truth"] for it in items])
    ids = sorted(optimized)
    gt_n = gt[[i - 1 for i in ids]]
    for name, pd in (("vo", {i: mapper.nodes[i].pose for i in ids}),
                     ("posegraph", optimized)):
        est = np.stack([pd[i] for i in ids])
        te, re_ = calc_kitti_sequence_errors(gt_n, est)
        print(f"# {name}: ATE={ate_rmse(gt_n, est):.3f} m "
              f"t_err={te:.3f} % r_err={re_:.6f} deg/m")
    print(f"# graph: {len(poses)} vertices, {len(links)} links, "
          f"chi2={chi2:.3f}, optimize {t_opt:.2f} s")


if __name__ == "__main__":
    main()
