"""Mapper, dictionary, and full-pipeline loop-closure tests."""

import numpy as np
import pytest

from tpuslam.config import SlamConfig, MapperConfig
from tpuslam.geometry import transform as T
from tpuslam.mapping.dictionary import VWDictionary
from tpuslam.mapping.graph import (Link, MultiMap, NEIGHBOR, find_link,
                                   get_connected_graph)
from tpuslam.mapping.mapper import Mapper
from tpuslam.vo.frame import Frame
from tpuslam.vo.odometry import OdomInfo


class TestDictionary:
    def test_first_batch_all_unique(self, rng):
        vwd = VWDictionary()
        desc = rng.integers(0, 256, (10, 32), dtype=np.uint8)
        ids = vwd.add_new_words(desc, node_id=1)
        assert ids == list(range(10))
        assert len(vwd) == 10

    def test_duplicate_matches_existing(self, rng):
        vwd = VWDictionary()
        desc = rng.integers(0, 256, (10, 32), dtype=np.uint8)
        vwd.add_new_words(desc, node_id=1)
        # same descriptors again: clear matches -> addRef, no new words
        ids2 = vwd.add_new_words(desc[:5], node_id=2)
        assert ids2 == list(range(5))
        assert len(vwd) == 10
        assert vwd.get_word(0).references == {1: 1, 2: 1}

    def test_ambiguous_becomes_new_word(self):
        vwd = VWDictionary()
        a = np.zeros((1, 32), np.uint8)
        b = np.full((1, 32), 200, np.uint8)
        vwd.add_new_words(np.vstack([a, b]), node_id=1)
        # equidistant query: d1 == d2 > 0 -> d1 > 0.8*d2 -> NEW word
        mid = np.full((1, 32), 100, np.uint8)
        ids = vwd.add_new_words(mid, node_id=2)
        assert ids == [2]
        assert len(vwd) == 3
        # clear match: d1 == 0 -> matches existing word
        ids = vwd.add_new_words(a, node_id=3)
        assert ids == [0]
        assert len(vwd) == 3


def _fake_frame(rng, n_kpts=50, stamp=0.0):
    f = Frame(stamp=stamp)
    f.kpts = np.column_stack([
        rng.uniform(20, 600, n_kpts), rng.uniform(20, 400, n_kpts),
        rng.uniform(1, 100, n_kpts)]).astype(np.float32)
    f.kpts3d = rng.uniform(-5, 5, (n_kpts, 3)).astype(np.float32)
    f.desc = rng.integers(0, 256, (n_kpts, 32), dtype=np.uint8)
    return f


def _odom_info(pose):
    info = OdomInfo()
    info.pose = pose
    info.covariance = np.eye(6) * 0.01
    return info


class TestMapper:
    def test_cadence_and_stm(self, rng):
        from tpuslam.geometry.camera import StereoCameraModel
        cam = StereoCameraModel(P_l=np.eye(3, 4), P_r=np.eye(3, 4),
                                width=640, height=480)
        mapper = Mapper(cam, MapperConfig(map_update=5, max_stm_size=3))
        pose = T.identity()
        for i in range(30):
            frame = _fake_frame(rng, stamp=i * 0.1)
            mapper.process(frame, _odom_info(pose))
            pose = T.compose(pose, T.from_rpy_xyz(0.5, 0, 0, 0, 0, 0))

        # full node every 5 frames starting at frame 4 (the reference's
        # counter makes the first 4 frames intermediate)
        weights = [mapper.nodes[i].weight for i in sorted(mapper.nodes)]
        full_ids = [i for i in sorted(mapper.nodes)
                    if mapper.nodes[i].weight >= 0]
        assert full_ids == [5, 10, 15, 20, 25, 30]
        assert weights.count(-1) == 24

        # intermediate nodes lost their features
        assert mapper.nodes[1].frame.n_kpts == 0
        assert mapper.nodes[5].frame.n_kpts == 50

        # neighbor chain links complete
        for i in range(2, 31):
            assert find_link(MultiMap(), 0, 0) is None  # sanity of helper
            assert mapper.nodes[i].has_link(i - 1)

        # STM keeps <= 3 full nodes; older moved to WM
        n_full_stm = sum(1 for i in mapper.stm
                         if mapper.nodes[i].weight >= 0)
        assert n_full_stm <= 3
        assert len(mapper.working_mem) > 0

    def test_words_capped(self, rng):
        from tpuslam.geometry.camera import StereoCameraModel
        cam = StereoCameraModel(P_l=np.eye(3, 4), P_r=np.eye(3, 4),
                                width=640, height=480)
        cfg = MapperConfig(map_update=1, max_features_per_node=20)
        mapper = Mapper(cam, cfg)
        frame = _fake_frame(rng, n_kpts=50)
        mapper.process(frame, _odom_info(T.identity()))
        node = mapper.nodes[1]
        assert len(node.words) == 50
        pos_words = [w for w, _ in node.words if w >= 0]
        neg_words = [w for w, _ in node.words if w < 0]
        assert len(pos_words) == 20      # capped at 20 dictionary words
        assert len(neg_words) == 30      # rest got unique negative ids


class TestConnectedGraph:
    def test_pose_recompute_along_links(self):
        # chain 1 -> 2 -> 3 with poses inconsistent with links; output
        # poses must follow the links from node 1
        poses = {1: T.identity(),
                 2: T.from_rpy_xyz(99, 0, 0, 0, 0, 0),
                 3: T.from_rpy_xyz(77, 0, 0, 0, 0, 0)}
        step = T.from_rpy_xyz(1.0, 0, 0, 0, 0, 0)
        links = MultiMap()
        links.insert(1, Link(1, 2, NEIGHBOR, step, np.eye(6)))
        links.insert(2, Link(2, 3, NEIGHBOR, step, np.eye(6)))
        poses_out, links_out = get_connected_graph(1, poses, links)
        assert set(poses_out) == {1, 2, 3}
        np.testing.assert_allclose(poses_out[2][:3, 3], [1, 0, 0],
                                   atol=1e-6)
        np.testing.assert_allclose(poses_out[3][:3, 3], [2, 0, 0],
                                   atol=1e-6)
        assert len(links_out) == 2

    def test_disconnected_dropped(self):
        poses = {1: T.identity(), 2: T.identity(), 9: T.identity()}
        links = MultiMap()
        links.insert(1, Link(1, 2, NEIGHBOR, T.identity(), np.eye(6)))
        poses_out, _ = get_connected_graph(1, poses, links)
        assert set(poses_out) == {1, 2}
