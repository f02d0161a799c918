"""Partitioned map (BASELINE config 5): rank-sharded dictionary +
keyframe features must reproduce the single-process mapper exactly while
each rank holds only ~1/P of the persistent map state.

P=2 is simulated in-process: two PartitionedMapper instances run the
same frame stream on two threads, joined by a barrier-based allgather
(`ThreadComm`) standing in for `multihost_utils.process_allgather` — the
same lock-step collective pattern the real 2-process DCN path uses
(tests/test_multihost.py covers the genuine jax.distributed transport).
"""

import dataclasses
import os
import threading

import numpy as np
import pytest

from tpuslam.config import SlamConfig, MapperConfig


class ThreadComm:
    """Barrier-based allgather across P threads in one process."""

    def __init__(self, world: int):
        self.world = world
        self.slots = [None] * world
        self.barrier = threading.Barrier(world)
        self.lock = threading.Lock()

    def make(self, rank: int):
        def allgather(arr: np.ndarray) -> np.ndarray:
            with self.lock:
                self.slots[rank] = np.asarray(arr)
            self.barrier.wait()
            out = np.stack(self.slots)
            self.barrier.wait()   # all read before any next write
            return out
        return allgather


@pytest.fixture(scope="module")
def loop_run(tmp_path_factory):
    """Frames + per-frame odometry through the host pipeline on a small
    out-and-back loop (the test_slam_e2e configuration, which fires a
    loop closure at 29 frames)."""
    from tpuslam.io.synthetic import make_sequence, out_and_back_trajectory
    from tpuslam.io.dataset import StereoImageDataset
    from tpuslam.geometry.camera import StereoCameraModel
    from tpuslam.runtime.pipeline import extract_features
    from tpuslam.vo.odometry import Odometry

    out = str(tmp_path_factory.mktemp("partseq"))
    poses = out_and_back_trajectory(n_forward=14, speed=0.45)
    make_sequence(out, poses=poses, seed=7)
    cfg = SlamConfig()
    cfg = dataclasses.replace(
        cfg, mapper=MapperConfig(map_update=2, max_stm_size=3))
    camera = StereoCameraModel.load_kitti(os.path.join(out, "calib.txt"))
    ds = StereoImageDataset(left_dir=os.path.join(out, "image_0"),
                            right_dir=os.path.join(out, "image_1"),
                            times_path=os.path.join(out, "times.txt"))
    odom = Odometry(camera, cfg.odometry, cfg.matching, cfg.pnp)
    frames, infos = [], []
    for i in range(len(ds)):
        item = ds[i]
        frame = extract_features(item["left"], item["right"], camera, cfg,
                                 stamp=item["stamp"], frame_id=i)
        infos.append(odom.process(frame))
        frames.append(frame)
    return camera, cfg, frames, infos


def _run_single(camera, cfg, frames, infos):
    from tpuslam.mapping.mapper import Mapper
    m = Mapper(camera, cfg.mapper, cfg.matching, cfg.pnp)
    for fr, info in zip(frames, infos):
        m.process(fr, info)
    return m


def _run_partitioned(camera, cfg, frames, infos, world=2):
    from tpuslam.dist.partitioned_map import PartitionedMapper
    comm = ThreadComm(world)
    mappers = [None] * world
    errors = [None] * world

    def work(rank):
        try:
            m = PartitionedMapper(camera, cfg.mapper, cfg.matching,
                                  cfg.pnp, rank=rank, world=world,
                                  comm=comm.make(rank))
            for fr, info in zip(frames, infos):
                import copy
                m.process(copy.copy(fr), info)
            mappers[rank] = m
        except Exception as e:         # surface in the main thread
            import traceback
            errors[rank] = traceback.format_exc()
            raise

    threads = [threading.Thread(target=work, args=(r,))
               for r in range(world)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    assert all(e is None for e in errors), errors
    assert all(m is not None for m in mappers)
    return mappers


class TestPartitionedMap:
    def test_matches_single_process(self, loop_run):
        camera, cfg, frames, infos = loop_run
        single = _run_single(camera, cfg, frames, infos)
        m0, m1 = _run_partitioned(camera, cfg, frames, infos)

        # same loop closures, word population, and graph on every rank
        assert single.loop_closures, "fixture must close a loop"
        assert m0.loop_closures == single.loop_closures
        assert m1.loop_closures == single.loop_closures
        assert len(m0.vwd) == len(m1.vwd) == len(single.vwd)

        ps, ls = single.get_graph()
        p0, l0 = m0.get_graph()
        assert sorted(ps) == sorted(p0)
        for nid in ps:
            np.testing.assert_array_equal(ps[nid], p0[nid])
        assert len(ls) == len(l0)

        # word-for-word identical assignments on the shared nodes
        for nid in single.nodes:
            assert single.nodes[nid].words == m0.nodes[nid].words

    def test_state_is_partitioned(self, loop_run):
        camera, cfg, frames, infos = loop_run
        single = _run_single(camera, cfg, frames, infos)
        m0, m1 = _run_partitioned(camera, cfg, frames, infos)

        # dictionary rows split disjointly and completely
        assert m0.vwd._count + m1.vwd._count == len(single.vwd)
        own0 = set(m0.vwd.words)
        own1 = set(m1.vwd.words)
        assert not own0 & own1
        assert own0 | own1 == set(single.vwd.words)
        # owners hold the same reference maps as the single dictionary
        for wid, vw in single.vwd.words.items():
            shard = m0 if wid % 2 == 0 else m1
            assert shard.vwd.words[wid].references == vw.references

        # keyframe features exist only on the owner rank
        full = [n for n in single.nodes.values() if n.weight >= 0]
        assert full
        for node in full:
            owner, other = (m0, m1) if node.id % 2 == 0 else (m1, m0)
            assert len(owner.nodes[node.id].frame.desc) > 0
            cleared = other.nodes[node.id].frame.desc
            assert cleared is None or len(cleared) == 0

        # per-rank persistent feature memory is a real split
        s_bytes = sum(n.frame.memory_used()
                      for n in single.nodes.values())
        assert m0.owned_feature_bytes() < s_bytes
        assert m1.owned_feature_bytes() < s_bytes
        assert (m0.owned_feature_bytes() + m1.owned_feature_bytes()
                <= s_bytes)
