"""Multi-host (DCN) scaling: frontend sharding across processes.

The reference's cross-domain communication fabric — mailbox registers +
shared-DDR banks between the A53, the R5, and the PL
(/root/reference/src/slam/src/core/FPGA.cpp:203-226,
src/StereoBM/src/main.c:37-76) — maps to two TPU transports (SURVEY.md
§2.7.4): ICI collectives inside one host's slice (dist/mesh.py) and DCN
between hosts, driven by `jax.distributed` + `multihost_utils`.

The workload split mirrors the reference's own asymmetry: the per-frame
front-end (disparity, corners, descriptors, 3D lift — the PL's job) is
embarrassingly parallel over frames and dominates the FLOPs, while the
back-end (VO state machine, mapper, pose graph — the A53's job) is
sequential and cheap.  So:

  * every process extracts features for a contiguous block of frames on
    its local devices (`extract_block_features`, reusing the fused VO's
    per-frame frontend),
  * only the compact per-frame feature arrays cross DCN
    (`allgather_features` — ~1.5k keypoints x (3+3+32) bytes per frame,
    not images),
  * every process then runs the identical deterministic host back-end on
    the gathered stream (`vo_from_features`), so no result broadcast is
    needed and any rank's trajectory is THE trajectory.

A 2-process run therefore produces bit-identical trajectories to a
1-process run (tests/test_multihost.py), and the sharded back-end steps
in dist/mesh.py run unchanged on a global (cross-host) mesh — XLA lowers
the same psum to DCN collectives when the mesh spans processes.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..config import SlamConfig
from ..geometry.camera import StereoCameraModel
from ..vo.frame import Frame
from ..vo.fused import FusedShapes, make_frontend_fn
from ..vo.odometry import Odometry


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """jax.distributed bootstrap (no-op when single-process).

    In a real deployment every host calls this with the rank-0 address;
    afterwards jax.devices() is the GLOBAL device list and meshes built
    from it span DCN.
    """
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def frame_block(n_frames: int, num_processes: int | None = None,
                process_id: int | None = None) -> slice:
    """Contiguous frame range owned by this process (balanced split;
    the first `n_frames % P` blocks take one extra frame)."""
    p = jax.process_count() if num_processes is None else num_processes
    i = jax.process_index() if process_id is None else process_id
    base, rem = divmod(n_frames, p)
    lo = i * base + min(i, rem)
    return slice(lo, lo + base + (1 if i < rem else 0))


def extract_block_features(lefts: np.ndarray, rights: np.ndarray,
                           camera: StereoCameraModel, cfg: SlamConfig,
                           shapes: FusedShapes = FusedShapes()) -> dict:
    """Run the device front-end over a local frame block.

    Returns a dict of np arrays with leading dim = len(lefts):
    kpts (B,C,3), pts3d (B,C,3), desc (B,C,32), n_kpts (B,).
    """
    frontend = make_frontend_fn(camera, cfg, shapes)

    @jax.jit
    def run(ls, rs):
        f = jax.lax.map(lambda ab: frontend(ab[0], ab[1]), (ls, rs))
        return dict(kpts=f["kpts"], pts3d=f["pts3d"], desc=f["desc"],
                    n_kpts=f["n_kpts"])

    out = run(jnp.asarray(lefts), jnp.asarray(rights))
    return {k: np.asarray(v) for k, v in out.items()}


def allgather_features(feats: dict, block_sizes: list[int]) -> dict:
    """Concatenate per-process feature blocks over DCN (frame order).

    `block_sizes[i]` is process i's frame count; blocks are padded to the
    max before the collective and trimmed after.  Single-process: no-op.
    """
    if jax.process_count() == 1:
        return feats
    from jax.experimental import multihost_utils

    bmax = max(block_sizes)
    padded = {}
    for k, v in feats.items():
        pad = np.zeros((bmax - v.shape[0],) + v.shape[1:], v.dtype)
        padded[k] = np.concatenate([v, pad], axis=0)
    gathered = multihost_utils.process_allgather(padded)  # (P, bmax, ...)
    out = {}
    for k, v in gathered.items():
        v = np.asarray(v)
        out[k] = np.concatenate(
            [v[i, :block_sizes[i]] for i in range(len(block_sizes))],
            axis=0)
    return out


def vo_from_features(feats: dict, stamps: np.ndarray,
                     camera: StereoCameraModel,
                     cfg: SlamConfig) -> np.ndarray:
    """Sequential host VO over a gathered feature stream -> (N,4,4) poses.

    Deterministic: every process that runs this on identical features
    produces identical trajectories (the single-process invariance the
    2-process test asserts)."""
    odom = Odometry(camera, cfg.odometry, cfg.matching, cfg.pnp)
    poses = []
    n = len(stamps)
    for i in range(n):
        nk = int(feats["n_kpts"][i])
        frame = Frame(stamp=float(stamps[i]), frame_id=i,
                      kpts=feats["kpts"][i, :nk].astype(np.float32),
                      kpts3d=feats["pts3d"][i, :nk].astype(np.float32),
                      desc=feats["desc"][i, :nk])
        info = odom.process(frame)
        poses.append(np.asarray(info.pose))
    return np.stack(poses)


def run_multihost_vo(lefts: np.ndarray, rights: np.ndarray,
                     stamps: np.ndarray, camera: StereoCameraModel,
                     cfg: SlamConfig,
                     shapes: FusedShapes = FusedShapes()) -> np.ndarray:
    """Full multi-host pipeline: shard frames -> extract local features
    -> allgather over DCN -> identical back-end everywhere.

    `lefts`/`rights` hold the FULL sequence on every process (each
    process reads only its block; in a real deployment each host would
    load only its slice of the dataset)."""
    n = len(stamps)
    p = jax.process_count()
    blocks = [frame_block(n, p, i) for i in range(p)]
    mine = blocks[jax.process_index()]
    feats = extract_block_features(lefts[mine], rights[mine], camera, cfg,
                                   shapes)
    sizes = [b.stop - b.start for b in blocks]
    feats = allgather_features(feats, sizes)
    return vo_from_features(feats, stamps, camera, cfg)
