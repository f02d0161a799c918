"""run_ingest (native decode -> rotating buffers -> async H2D -> fused
chunks) must produce results identical to the staged path — it is the
bench's with-ingest row and the sensor->DDR DMA analog."""

import os

import numpy as np
import pytest

from tpuslam.config import SlamConfig


@pytest.fixture(scope="module")
def fwd_seq_dir(tmp_path_factory):
    from tpuslam.io.synthetic import make_sequence
    out = str(tmp_path_factory.mktemp("ingestseq"))
    make_sequence(out, n_frames=14, width=320, height=240, f=250.0,
                  baseline=0.3, speed=0.4, seed=5)
    return out


def test_ingest_matches_staged(fwd_seq_dir):
    pytest.importorskip("ctypes")
    from tpuslam.io.native_loader import NativeLoaderUnavailable, get_lib
    try:
        get_lib()
    except NativeLoaderUnavailable as e:
        pytest.skip(f"no native toolchain: {e}")

    from tpuslam.geometry.camera import StereoCameraModel
    from tpuslam.io.dataset import StereoImageDataset
    from tpuslam.runtime.fast_pipeline import FastSlamPipeline
    from tpuslam.mapping.mapper import Mapper

    ds = StereoImageDataset(
        left_dir=os.path.join(fwd_seq_dir, "image_0"),
        right_dir=os.path.join(fwd_seq_dir, "image_1"),
        times_path=os.path.join(fwd_seq_dir, "times.txt"))
    items = [ds[i] for i in range(len(ds))]
    h, w = items[0]["left"].shape
    f, cx, cy, B = 250.0, (w - 1) / 2.0, (h - 1) / 2.0, 0.3
    P0 = np.array([[f, 0, cx, 0], [0, f, cy, 0], [0, 0, 1, 0]],
                  np.float64)
    P1 = P0.copy()
    P1[0, 3] = -f * B
    camera = StereoCameraModel(P_l=P0, P_r=P1, width=w, height=h)
    cfg = SlamConfig()

    # 14 frames / chunk 6 exercises full chunks, buffer rotation back to
    # slot 0, and a partial trailing chunk
    pipe = FastSlamPipeline(camera, cfg, chunk=6, capacity=384)
    staged = pipe.stage_chunks(items)
    m_a = Mapper(camera, cfg.mapper, cfg.matching, cfg.pnp)
    ref = pipe.run_staged(staged, items, mapper=m_a)

    lpaths = [os.path.join(fwd_seq_dir, "image_0", x)
              for x in sorted(os.listdir(
                  os.path.join(fwd_seq_dir, "image_0")))]
    rpaths = [os.path.join(fwd_seq_dir, "image_1", x)
              for x in sorted(os.listdir(
                  os.path.join(fwd_seq_dir, "image_1")))]
    stamps = [it["stamp"] for it in items]
    pipe.reset()
    m_b = Mapper(camera, cfg.mapper, cfg.matching, cfg.pnp)
    got = pipe.run_ingest(lpaths, rpaths, stamps, mapper=m_b)

    assert len(ref) == len(got) == len(items)
    for a, b in zip(ref, got):
        np.testing.assert_array_equal(a.pose, b.pose)
        assert a.num_inliers == b.num_inliers
        assert a.lost == b.lost
    pa, la = m_a.get_graph()
    pb, lb = m_b.get_graph()
    assert sorted(pa) == sorted(pb) and len(la) == len(lb)
