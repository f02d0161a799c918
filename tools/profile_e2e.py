"""End-to-end bench-loop breakdown: upload / dispatch / collect / mapper
wall time per chunk, measured around the real FastSlamPipeline calls."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tpuslam.runtime.cache import enable_persistent_cache  # noqa: E402
enable_persistent_cache()

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import bench  # noqa: E402


def main():
    seq = bench.ensure_sequence()
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
    items = [ds[i] for i in range(120)]
    pipe = FastSlamPipeline(camera, cfg, chunk=40)
    pipe.run(items[:40])  # warm
    pipe.reset()

    # raw upload cost
    lefts = np.stack([b["left"] for b in items[:40]])
    t0 = time.perf_counter()
    dev = jnp.asarray(lefts)
    t1 = time.perf_counter()
    jax.block_until_ready(dev)
    t2 = time.perf_counter()
    s = int(jnp.sum(dev.astype(jnp.int32)))  # force real materialization
    t3 = time.perf_counter()
    print(f"upload 18MB: asarray {1e3*(t1-t0):.1f} ms, block "
          f"{1e3*(t2-t1):.1f} ms, sum-fetch {1e3*(t3-t2):.1f} ms")

    mapper = Mapper(camera, cfg.mapper, cfg.matching, cfg.pnp)
    t_disp = t_coll = t_map = 0.0
    pending = None
    t_all0 = time.perf_counter()
    for lo in range(0, 120, 40):
        batch = items[lo:lo + 40]
        l = np.stack([b["left"] for b in batch])
        r = np.stack([b["right"] for b in batch])
        st = np.array([b["stamp"] for b in batch])
        t0 = time.perf_counter()
        nxt = pipe.dispatch(l, r, st, len(batch))
        t_disp += time.perf_counter() - t0
        if pending is not None:
            t0 = time.perf_counter()
            res = pipe.collect(pending)
            t_coll += time.perf_counter() - t0
            t0 = time.perf_counter()
            for info, frame in res:
                mapper.process(frame, info)
            t_map += time.perf_counter() - t0
        pending = nxt
    t0 = time.perf_counter()
    res = pipe.collect(pending)
    t_coll += time.perf_counter() - t0
    t0 = time.perf_counter()
    for info, frame in res:
        mapper.process(frame, info)
    t_map += time.perf_counter() - t0
    total = time.perf_counter() - t_all0
    print(f"dispatch {t_disp:.2f}s  collect {t_coll:.2f}s  "
          f"mapper {t_map:.2f}s  total {total:.2f}s "
          f"({120 / total:.2f} fps)")


if __name__ == "__main__":
    main()
