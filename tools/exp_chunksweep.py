"""Chunk-size / mapper-overhead sweep on the real chip.

Times run_staged at several chunk sizes with and without the mapper to
locate the non-device wall overhead (dispatch, D2H, mapper drain).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tpuslam.runtime.cache import enable_persistent_cache  # noqa: E402
enable_persistent_cache()

import numpy as np  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SEQ = os.path.join(REPO, ".bench_cache", "kittigeo120")
N = 120


def main():
    from tpuslam.config import SlamConfig
    from tpuslam.geometry.camera import StereoCameraModel
    from tpuslam.io.dataset import StereoImageDataset
    from tpuslam.runtime.fast_pipeline import FastSlamPipeline
    from tpuslam.mapping.mapper import Mapper

    cfg = SlamConfig()
    camera = StereoCameraModel.load_kitti(
        os.path.join(SEQ, "calib.txt"), image_size=(1241, 376))
    ds = StereoImageDataset(
        left_dir=os.path.join(SEQ, "image_0"),
        right_dir=os.path.join(SEQ, "image_1"),
        times_path=os.path.join(SEQ, "times.txt"))
    items = [ds[i] for i in range(min(N, len(ds)))]

    chunks = [int(c) for c in (sys.argv[1:] or ["40", "60", "120"])]
    for chunk in chunks:
        pipe = FastSlamPipeline(camera, cfg, chunk=chunk)
        staged = pipe.stage_chunks(items)
        t0 = time.perf_counter()
        pipe.run_staged(staged[:1], items[:chunk])
        print(f"# chunk={chunk} warmup {time.perf_counter()-t0:.1f} s",
              flush=True)
        for mode in ("nomap", "map"):
            best = 1e9
            for _ in range(3):
                pipe.reset()
                mapper = None
                if mode == "map":
                    mapper = Mapper(camera, cfg.mapper, cfg.matching,
                                    cfg.pnp)
                    mapper.async_lc = True
                t0 = time.perf_counter()
                pipe.run_staged(staged, items, mapper=mapper,
                                mapper_async=mode == "map")
                best = min(best, time.perf_counter() - t0)
            print(f"# chunk={chunk:4d} {mode:6s} best {best*1e3:7.1f} ms "
                  f"= {len(items)/best:6.2f} fps", flush=True)


if __name__ == "__main__":
    main()
