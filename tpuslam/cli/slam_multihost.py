"""Multi-process SLAM entry point: frontend-sharded VO over
`jax.distributed` with the rank-partitioned map back-end.

The runnable form of BASELINE configs 4-5: launch one process per
host/rank; each extracts front-end features for its frame block on its
own accelerator(s), features are allgathered over DCN
(dist/multihost.py), every rank runs the deterministic VO, and the
persistent map (BoW dictionary + keyframe features) is sharded by rank
(dist/partitioned_map.py) so per-rank map memory scales ~1/P with
exact single-process semantics (asserted by tests/test_multihost.py).

  python -m tpuslam.cli.slam_multihost SEQ_DIR \
      -coord HOST:PORT -num-procs P -rank R [-replicated-map] \
      [-num-images N] [-out OUT_DIR]

Single-process (`-num-procs 1`) runs without jax.distributed.
Reference analog: the batch binary launch (doc/petalinux/run,
main.cpp:117-147) generalized across hosts.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def run(seq_dir: str, coord: str | None = None, num_procs: int = 1,
        rank: int = 0, out_dir: str | None = None,
        partitioned: bool = True, num_images: int = -1,
        quiet: bool = False) -> dict:
    import jax
    from ..config import SlamConfig
    from ..geometry.camera import StereoCameraModel
    from ..io.dataset import StereoImageDataset
    from ..dist import multihost as mh
    from ..dist.partitioned_map import PartitionedMapper
    from ..mapping.mapper import Mapper
    from ..optim import run_optimize_robust
    from ..vo.frame import Frame
    from ..vo.odometry import Odometry

    if num_procs > 1:
        mh.initialize(coord, num_procs, rank)
        assert jax.process_count() == num_procs

    cfg = SlamConfig()
    camera = StereoCameraModel.load_kitti(
        os.path.join(seq_dir, "calib.txt"))
    ds = StereoImageDataset(
        left_dir=os.path.join(seq_dir, "image_0"),
        right_dir=os.path.join(seq_dir, "image_1"),
        times_path=os.path.join(seq_dir, "times.txt"))
    n = len(ds) if num_images < 0 else min(num_images, len(ds))
    items = [ds[i] for i in range(n)]
    lefts = np.stack([it["left"] for it in items])
    rights = np.stack([it["right"] for it in items])
    stamps = np.array([it["stamp"] for it in items])

    # frontend: extract this rank's block, allgather over DCN
    p = jax.process_count()
    blocks = [mh.frame_block(n, p, i) for i in range(p)]
    mine = blocks[jax.process_index() if p > 1 else 0]
    feats = mh.extract_block_features(lefts[mine], rights[mine], camera,
                                      cfg)
    feats = mh.allgather_features(feats,
                                  [b.stop - b.start for b in blocks])

    # deterministic VO + rank-partitioned map over the gathered stream
    odom = Odometry(camera, cfg.odometry, cfg.matching, cfg.pnp)
    if partitioned and p > 1:
        mapper = PartitionedMapper(camera, cfg.mapper, cfg.matching,
                                   cfg.pnp)
    else:
        mapper = Mapper(camera, cfg.mapper, cfg.matching, cfg.pnp)
    for i in range(n):
        nk = int(feats["n_kpts"][i])
        frame = Frame(stamp=float(stamps[i]), frame_id=i,
                      kpts=feats["kpts"][i, :nk].astype(np.float32),
                      kpts3d=feats["pts3d"][i, :nk].astype(np.float32),
                      desc=feats["desc"][i, :nk])
        info = odom.process(frame)
        mapper.process(frame, info)
        if not quiet and i % 20 == 0:
            print(f"rank {rank}: frame {i}/{n}", flush=True)

    poses, links = mapper.get_graph()
    optimized, chi2 = run_optimize_robust(
        poses, links, cfg.optimizer.final_iterations, cfg.optimizer)
    chi2 = float(np.ravel(chi2)[-1]) if np.size(chi2) else 0.0

    result = dict(n_frames=n,
                  n_loop_closures=len(mapper.loop_closures),
                  chi2=chi2,
                  map_bytes=mapper.memory_used())
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
        ids = sorted(optimized)
        rows = np.stack([np.asarray(optimized[i], np.float64)[:3]
                         .reshape(-1) for i in ids])
        np.savetxt(os.path.join(out_dir, f"poses_rank{rank}.txt"), rows)
        with open(os.path.join(out_dir, f"result_rank{rank}.json"),
                  "w") as f:
            json.dump({k: v for k, v in result.items()
                       if k != "map_bytes"} |
                      {"map_bytes": {k: int(v) for k, v in
                                     result["map_bytes"].items()}}, f)
    result["poses"] = optimized
    return result


def main(argv=None):
    ap = argparse.ArgumentParser(
        description="multi-process SLAM (frontend-sharded + "
                    "rank-partitioned map)")
    ap.add_argument("seq_dir")
    ap.add_argument("-coord", default=None,
                    help="coordinator host:port (required for P > 1)")
    ap.add_argument("-num-procs", type=int, default=1)
    ap.add_argument("-rank", type=int, default=0)
    ap.add_argument("-out", default=None)
    ap.add_argument("-replicated-map", dest="partitioned",
                    action="store_false",
                    help="replicate the map on every rank instead of "
                         "sharding it")
    ap.add_argument("-num-images", type=int, default=-1)
    ap.add_argument("-quiet", action="store_true")
    a = ap.parse_args(argv)
    run(a.seq_dir, coord=a.coord, num_procs=a.num_procs, rank=a.rank,
        out_dir=a.out, partitioned=a.partitioned,
        num_images=a.num_images, quiet=a.quiet)


if __name__ == "__main__":
    main()
