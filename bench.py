"""Driver benchmark: end-to-end SLAM frames/sec on one chip.

Runs the flagship fused pipeline (FastSlamPipeline: the whole per-frame
front-end + VO as ONE jitted lax.scan per 40-frame chunk — disparity via
the Pallas strip kernel on TPU, GFTT, ORB, guided matching, PnP — with the
host-side mapper/loop-closure overlapped against device compute) on a
synthetic KITTI-geometry (1241x376) sequence and prints ONE JSON line.

Baseline: the reference's implied real-time bound of 30 fps on the
Ultra96 (BASELINE.md — no absolute fps published in-tree), so
vs_baseline = fps / 30.
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
CACHE = os.path.join(REPO, ".bench_cache", "kittigeo80")
N_FRAMES = 80
CHUNK = 40


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
    from tpuslam.runtime.fast_pipeline import FastSlamPipeline
    from tpuslam.mapping.mapper import Mapper

    cfg = SlamConfig()
    camera = StereoCameraModel.load_kitti(
        os.path.join(seq, "calib.txt"), image_size=(1241, 376))
    ds = StereoImageDataset(
        left_dir=os.path.join(seq, "image_0"),
        right_dir=os.path.join(seq, "image_1"),
        times_path=os.path.join(seq, "times.txt"),
        gt_path=os.path.join(seq, "poses.txt"))

    # preload images so disk IO is excluded from the timed region
    items = [ds[i] for i in range(min(N_FRAMES, len(ds)))]

    pipe = FastSlamPipeline(camera, cfg, chunk=CHUNK)

    # warmup pass: compiles the fused chunk program (first XLA compile of
    # the full front-end is slow; steady-state is what we measure)
    t0 = time.perf_counter()
    pipe.run(items[:CHUNK])
    print(f"# warmup (compile + first chunk): "
          f"{time.perf_counter() - t0:.1f} s", file=sys.stderr)
    pipe.reset()

    mapper = Mapper(camera, cfg.mapper, cfg.matching, cfg.pnp)
    t0 = time.perf_counter()
    infos = pipe.run(items, mapper=mapper)
    dt = time.perf_counter() - t0
    fps = len(items) / dt

    n_lost = sum(1 for i in infos[1:] if i.lost)
    med_inl = sorted(i.num_inliers for i in infos[1:])[len(infos) // 2]
    print(f"# {len(items)} frames in {dt:.2f} s, lost={n_lost}, "
          f"median inliers={med_inl}", file=sys.stderr)

    print(json.dumps({
        "metric": "slam_e2e_fps_1241x376_1chip",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / 30.0, 3),
    }))


if __name__ == "__main__":
    main()
