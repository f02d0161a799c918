"""Worker process for the 2-process DCN test (not a pytest module).

Usage: python tests/_multihost_worker.py <seq_dir> <out_dir> <coord>
       <num_procs> <pid>

Initializes jax.distributed against the coordinator, runs the multi-host
frontend-sharded VO over the sequence, exercises the sharded pose-graph
step on the GLOBAL (cross-process) mesh, and writes results to
<out_dir>/rank<pid>.npz.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                           " --xla_force_host_platform_device_count=2")

import numpy as np  # noqa: E402
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main():
    seq, out_dir, coord, num_procs, pid = sys.argv[1:6]
    num_procs, pid = int(num_procs), int(pid)

    from tpuslam.dist import multihost as mh
    mh.initialize(coord, num_procs, pid)
    assert jax.process_count() == num_procs

    from tpuslam.config import SlamConfig
    from tpuslam.geometry.camera import StereoCameraModel
    from tpuslam.io.dataset import StereoImageDataset
    from tpuslam.vo.fused import FusedShapes

    cfg = SlamConfig()
    camera = StereoCameraModel.load_kitti(os.path.join(seq, "calib.txt"))
    ds = StereoImageDataset(left_dir=os.path.join(seq, "image_0"),
                            right_dir=os.path.join(seq, "image_1"),
                            times_path=os.path.join(seq, "times.txt"))
    items = [ds[i] for i in range(len(ds))]
    lefts = np.stack([it["left"] for it in items])
    rights = np.stack([it["right"] for it in items])
    stamps = np.array([it["stamp"] for it in items])

    poses = mh.run_multihost_vo(lefts, rights, stamps, camera, cfg,
                                FusedShapes(chunk=len(items)))

    # sharded pose-graph LM on the GLOBAL mesh (psum over DCN): a noisy
    # 8-vertex chain, 8 edges padded over 4 global devices
    from tpuslam.dist.mesh import make_mesh, sharded_pose_graph_step
    from tpuslam.optim import device as dev
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    n_v = 8
    gt = [np.eye(4, dtype=np.float32)]
    for i in range(n_v - 1):
        step = np.eye(4, dtype=np.float32)
        step[:3, 3] = [1.0, 0.1 * rng.standard_normal(), 0.0]
        gt.append(gt[-1] @ step)
    gt = np.stack(gt)
    noisy = gt.copy()
    noisy[1:, :3, 3] += 0.05 * rng.standard_normal((n_v - 1, 3))

    e_from = np.arange(n_v - 1, dtype=np.int32)
    e_to = e_from + 1
    Z = np.stack([np.linalg.inv(gt[a]) @ gt[b]
                  for a, b in zip(e_from, e_to)]).astype(np.float32)
    Omega = np.tile(np.eye(6, dtype=np.float32), (n_v - 1, 1, 1))
    # pad edges to a multiple of the global device count
    n_dev = len(jax.devices())
    n_e = ((n_v - 1 + n_dev - 1) // n_dev) * n_dev
    pad = n_e - (n_v - 1)
    e_from = np.concatenate([e_from, np.zeros(pad, np.int32)])
    e_to = np.concatenate([e_to, np.zeros(pad, np.int32)])
    Z = np.concatenate([Z, np.tile(np.eye(4, dtype=np.float32),
                                   (pad, 1, 1))])
    Omega = np.concatenate([Omega, np.zeros((pad, 6, 6), np.float32)])

    free_idx = np.full(n_v, -1, np.int32)
    free_idx[1:] = np.arange(n_v - 1)

    mesh = make_mesh(axis="edges")
    step_fn = sharded_pose_graph_step(mesh, n_v, n_v - 1, iterations=5)
    opt_poses, chis = step_fn(jnp.asarray(noisy), jnp.asarray(e_from),
                              jnp.asarray(e_to), jnp.asarray(Z),
                              jnp.asarray(Omega), jnp.asarray(free_idx))

    # --- partitioned map over the same feature stream (config 5) -------
    # every rank feeds the full gathered stream to a PartitionedMapper;
    # dictionary rows and keyframe features land only on their owner
    import dataclasses
    from tpuslam.config import MapperConfig
    from tpuslam.dist.partitioned_map import PartitionedMapper
    from tpuslam.runtime.pipeline import extract_features
    from tpuslam.vo.odometry import Odometry

    # map_update=1: every node is full, so node ids alternate owners and
    # both ranks end up holding a feature shard
    pcfg = dataclasses.replace(
        cfg, mapper=MapperConfig(map_update=1, max_stm_size=2))

    lik_pm: list = []      # (node_id, [(cand_id, value), ...]) per node

    class RecordingPM(PartitionedMapper):
        def _likelihood_allreduce(self, node, candidates):
            lik = super()._likelihood_allreduce(node, candidates)
            lik_pm.append((node.id, sorted(lik.items())))
            return lik

    odom = Odometry(camera, pcfg.odometry, pcfg.matching, pcfg.pnp)
    pm = RecordingPM(camera, pcfg.mapper, pcfg.matching, pcfg.pnp)
    frames, infos = [], []
    for i, it in enumerate(items):
        frame = extract_features(it["left"], it["right"], camera, pcfg,
                                 stamp=it["stamp"], frame_id=i)
        info = odom.process(frame)
        frames.append(frame)
        infos.append(info)
        pm.process(frame, info)
    owned_words = np.sort(np.fromiter(pm.vwd.words.keys(), np.int64))

    # single-process reference mapper over the SAME stream: the
    # partitioned run's word assignment, LC likelihoods (f64, computed
    # through the bit-cast allgather) and graph links must be
    # BIT-IDENTICAL on the real DCN transport
    from tpuslam.mapping.mapper import Mapper

    lik_sm: list = []

    class RecordingSM(Mapper):
        def compute_likelihood(self, node, ids):
            lik = super().compute_likelihood(node, ids)
            lik_sm.append((node.id, sorted(lik.items())))
            return lik

    sm = RecordingSM(camera, pcfg.mapper, pcfg.matching, pcfg.pnp)
    for frame, info in zip(frames, infos):
        sm.process(frame, info)

    def lik_flat(trace):
        ids = [nid for nid, kv in trace for _ in kv]
        cands = [c for _, kv in trace for c, _ in kv]
        vals = [v for _, kv in trace for _, v in kv]
        return (np.asarray(ids, np.int64), np.asarray(cands, np.int64),
                np.asarray(vals, np.float64))

    def links_flat(mapper):
        _, links = mapper.get_graph()
        rows = sorted((f, l.to_id, l.type) for f in links.keys()
                      for l in links.get(f))
        tfs = []
        for f in links.keys():
            for l in sorted(links.get(f), key=lambda x: (x.to_id, x.type)):
                tfs.append(np.asarray(l.transform, np.float64))
        return (np.asarray(rows, np.int64).reshape(-1, 3),
                np.stack(tfs) if tfs else np.zeros((0, 4, 4)))

    def words_flat(mapper):
        rows = []
        for nid in sorted(mapper.nodes):
            node = mapper.nodes[nid]
            if node.weight >= 0 and node.words:
                rows.extend((nid, w, k) for w, k in node.words)
        return np.asarray(rows, np.int64).reshape(-1, 3)

    pm_ids, pm_cands, pm_vals = lik_flat(lik_pm)
    sm_ids, sm_cands, sm_vals = lik_flat(lik_sm)
    pm_lrows, pm_ltfs = links_flat(pm)
    sm_lrows, sm_ltfs = links_flat(sm)

    np.savez(os.path.join(out_dir, f"rank{pid}.npz"),
             poses=poses, opt_poses=np.asarray(opt_poses),
             chis=np.asarray(chis), n_devices=n_dev,
             total_words=len(pm.vwd), owned_words=owned_words,
             owned_feat_bytes=pm.owned_feature_bytes(),
             pm_lik_ids=pm_ids, pm_lik_cands=pm_cands, pm_lik=pm_vals,
             sm_lik_ids=sm_ids, sm_lik_cands=sm_cands, sm_lik=sm_vals,
             pm_links=pm_lrows, pm_link_tfs=pm_ltfs,
             sm_links=sm_lrows, sm_link_tfs=sm_ltfs,
             pm_words=words_flat(pm), sm_words=words_flat(sm),
             n_lc_pm=len(pm.loop_closures), n_lc_sm=len(sm.loop_closures))
    print(f"rank {pid} done: {len(poses)} poses, "
          f"{n_dev} global devices, {len(pm.vwd)} words "
          f"({len(owned_words)} owned)", flush=True)


if __name__ == "__main__":
    main()
