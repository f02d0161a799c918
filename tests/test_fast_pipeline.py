"""FastSlamPipeline (fused on-device VO, chunked dispatch) end-to-end.

The fused path re-expresses the reference's per-frame loop
(src/slam/src/core/main.cpp:149-308) as a jitted lax.scan over frame
chunks; this test drives it through the public driver on a synthetic
sequence and checks trajectory accuracy and mapper integration.
"""

import dataclasses

import numpy as np
import pytest

from tpuslam.config import SlamConfig, MapperConfig


@pytest.fixture(scope="module")
def fwd_seq(tmp_path_factory):
    from tpuslam.io.synthetic import make_sequence
    from tpuslam.io.dataset import StereoImageDataset
    import os
    out = str(tmp_path_factory.mktemp("fastseq"))
    make_sequence(out, n_frames=12, width=320, height=240, f=250.0,
                  baseline=0.54, speed=0.4, yaw_rate=0.002, seed=3)
    ds = StereoImageDataset(
        left_dir=os.path.join(out, "image_0"),
        right_dir=os.path.join(out, "image_1"),
        times_path=os.path.join(out, "times.txt"),
        gt_path=os.path.join(out, "poses.txt"))
    return [ds[i] for i in range(len(ds))]


def _make_pipeline(items, chunk=6, capacity=384):
    from tpuslam.geometry.camera import StereoCameraModel
    from tpuslam.runtime.fast_pipeline import FastSlamPipeline
    h, w = items[0]["left"].shape
    f, cx, cy, B = 250.0, (w - 1) / 2.0, (h - 1) / 2.0, 0.54
    P0 = np.array([[f, 0, cx, 0], [0, f, cy, 0], [0, 0, 1, 0]], np.float64)
    P1 = P0.copy()
    P1[0, 3] = -f * B
    camera = StereoCameraModel(P_l=P0, P_r=P1, width=w, height=h)
    cfg = SlamConfig()
    cfg = dataclasses.replace(
        cfg, mapper=MapperConfig(map_update=2, max_stm_size=5))
    return FastSlamPipeline(camera, cfg, chunk=chunk, capacity=capacity), cfg


class TestFastPipeline:
    def test_vo_tracks_ground_truth(self, fwd_seq):
        pipe, _ = _make_pipeline(fwd_seq)
        infos = pipe.run(fwd_seq)
        assert len(infos) == len(fwd_seq)
        assert not any(i.lost for i in infos[1:]), \
            [i.num_inliers for i in infos]
        # straight-ish forward drive at 0.4 m/frame: final pose must land
        # within 10 cm of ground truth
        gt = fwd_seq[-1]["ground_truth"]
        est = infos[-1].pose
        err = np.linalg.norm(est[:3, 3] - gt[:3, 3])
        assert err < 0.10, f"final translation error {err:.3f} m"

    def test_mapper_integration(self, fwd_seq):
        from tpuslam.mapping.mapper import Mapper
        pipe, cfg = _make_pipeline(fwd_seq)
        mapper = Mapper(pipe.camera, cfg.mapper, cfg.matching, cfg.pnp)
        infos = pipe.run(fwd_seq, mapper=mapper)
        assert len(infos) == len(fwd_seq)
        poses, links = mapper.get_graph()
        assert len(poses) == len(fwd_seq)
        assert len(links) >= len(fwd_seq) - 1
        # full-node cadence (map_update=2): feature-bearing nodes exist
        full_nodes = [n for n in mapper.nodes.values() if n.weight >= 0]
        assert len(full_nodes) >= len(fwd_seq) // 2

    def test_async_mapper_consumer_identical(self, fwd_seq):
        """run_staged(mapper_async=True) (consumer-thread mapper overlap,
        the bench path) must produce identical trajectories and graphs to
        the synchronous path."""
        from tpuslam.mapping.mapper import Mapper
        pipe, cfg = _make_pipeline(fwd_seq)
        staged = pipe.stage_chunks(fwd_seq)

        m_sync = Mapper(pipe.camera, cfg.mapper, cfg.matching, cfg.pnp)
        infos_sync = pipe.run_staged(staged, fwd_seq, mapper=m_sync)
        pipe.reset()
        m_async = Mapper(pipe.camera, cfg.mapper, cfg.matching, cfg.pnp)
        infos_async = pipe.run_staged(staged, fwd_seq, mapper=m_async,
                                      mapper_async=True)

        assert len(infos_sync) == len(infos_async)
        for a, b in zip(infos_sync, infos_async):
            np.testing.assert_array_equal(a.pose, b.pose)
            assert a.num_inliers == b.num_inliers
        pa, la = m_sync.get_graph()
        pb, lb = m_async.get_graph()
        assert sorted(pa) == sorted(pb) and len(la) == len(lb)

    def test_chunk_boundary_continuity(self, fwd_seq):
        """Same sequence through different chunk sizes must agree: the
        carry (pose/velocity/keyframe features) crosses chunk boundaries
        losslessly."""
        pipe_a, _ = _make_pipeline(fwd_seq, chunk=6)
        pipe_b, _ = _make_pipeline(fwd_seq, chunk=12)
        pa = pipe_a.run(fwd_seq)[-1].pose
        pb = pipe_b.run(fwd_seq)[-1].pose
        np.testing.assert_allclose(pa, pb, rtol=0, atol=1e-4)
