"""Per-chunk device dictionary (mapping/chunk_dict.py) bit-equality.

The chunked device program must reproduce the incremental VWDictionary
path EXACTLY: same word ids, same references, same node word lists, same
graph — the only difference is where the search/append ran.
"""

import os

import numpy as np
import pytest

from tpuslam.config import SlamConfig


@pytest.fixture(scope="module")
def fwd_seq(tmp_path_factory):
    from tpuslam.io.synthetic import make_sequence
    from tpuslam.io.dataset import StereoImageDataset
    out = str(tmp_path_factory.mktemp("cdseq"))
    make_sequence(out, n_frames=12, width=320, height=240, f=250.0,
                  baseline=0.3, speed=0.4, seed=5)
    ds = StereoImageDataset(
        left_dir=os.path.join(out, "image_0"),
        right_dir=os.path.join(out, "image_1"),
        times_path=os.path.join(out, "times.txt"),
        gt_path=os.path.join(out, "poses.txt"))
    return [ds[i] for i in range(len(ds))]


def _run(items, device_dict, chunk=6):
    import dataclasses
    from tpuslam.geometry.camera import StereoCameraModel
    from tpuslam.runtime.fast_pipeline import FastSlamPipeline
    from tpuslam.mapping.mapper import Mapper
    from tpuslam.config import MapperConfig

    h, w = items[0]["left"].shape
    f, cx, cy, B = 250.0, (w - 1) / 2.0, (h - 1) / 2.0, 0.3
    P0 = np.array([[f, 0, cx, 0], [0, f, cy, 0], [0, 0, 1, 0]],
                  np.float64)
    P1 = P0.copy()
    P1[0, 3] = -f * B
    camera = StereoCameraModel(P_l=P0, P_r=P1, width=w, height=h)
    cfg = SlamConfig()
    # small frames: lower the per-node cap so the limit_keypoints path
    # (top-N by response, larger-index ties) is actually exercised
    cfg = dataclasses.replace(
        cfg, mapper=MapperConfig(map_update=2, max_features_per_node=96))
    pipe = FastSlamPipeline(camera, cfg, chunk=chunk, capacity=384,
                            device_dict=device_dict)
    mapper = Mapper(camera, cfg.mapper, cfg.matching, cfg.pnp)
    staged = pipe.stage_chunks(items)
    infos = pipe.run_staged(staged, items, mapper=mapper,
                            mapper_async=device_dict)
    if device_dict:
        assert pipe._dict_driver is not None, "driver not attached"
        assert not mapper.word_precomputed, "unconsumed decisions"
    return infos, mapper


class TestChunkDict:
    def test_bit_identical_to_incremental(self, fwd_seq):
        infos_a, m_a = _run(fwd_seq, device_dict=False)
        infos_b, m_b = _run(fwd_seq, device_dict=True)

        # trajectories identical (dictionary never feeds back into VO,
        # but keep the invariant visible)
        for a, b in zip(infos_a, infos_b):
            np.testing.assert_array_equal(a.pose, b.pose)

        # dictionary state
        assert m_a.vwd._count == m_b.vwd._count > 0
        assert m_a.vwd._last_word_id == m_b.vwd._last_word_id
        np.testing.assert_array_equal(
            m_a.vwd._train[:m_a.vwd._count],
            m_b.vwd._train[:m_b.vwd._count])
        np.testing.assert_array_equal(
            m_a.vwd._word_ids[:m_a.vwd._count],
            m_b.vwd._word_ids[:m_b.vwd._count])
        assert set(m_a.vwd.words) == set(m_b.vwd.words)
        for wid, vw in m_a.vwd.words.items():
            assert m_b.vwd.words[wid].references == vw.references

        # per-node word lists (incl. negative non-kept fillers)
        assert sorted(m_a.nodes) == sorted(m_b.nodes)
        for nid in m_a.nodes:
            assert m_a.nodes[nid].words == m_b.nodes[nid].words

        # graph equality
        pa, la = m_a.get_graph()
        pb, lb = m_b.get_graph()
        assert sorted(pa) == sorted(pb) and len(la) == len(lb)
