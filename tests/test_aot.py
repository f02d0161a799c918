"""AOT export/reload of the fused chunk program (runtime/aot.py).

The exported artifact must reproduce the jitted program bit-for-bit on
real frames — the deployment analog of booting the reference's prebuilt
bitstream.
"""

import os

import numpy as np
import pytest

from tpuslam.config import SlamConfig


@pytest.fixture(scope="module")
def fwd_seq(tmp_path_factory):
    from tpuslam.io.synthetic import make_sequence
    from tpuslam.io.dataset import StereoImageDataset
    out = str(tmp_path_factory.mktemp("aotseq"))
    make_sequence(out, n_frames=6, width=320, height=240, f=250.0,
                  baseline=0.3, speed=0.4, seed=5)
    ds = StereoImageDataset(left_dir=os.path.join(out, "image_0"),
                            right_dir=os.path.join(out, "image_1"),
                            times_path=os.path.join(out, "times.txt"))
    return [ds[i] for i in range(len(ds))]


def test_export_reload_bit_identical(fwd_seq, tmp_path):
    import jax.numpy as jnp
    from tpuslam.geometry.camera import StereoCameraModel
    from tpuslam.runtime.aot import (export_chunk_program,
                                     load_chunk_program)
    from tpuslam.vo.fused import make_fused_chunk_fn, FusedShapes

    h, w = fwd_seq[0]["left"].shape
    f, cx, cy, B = 250.0, (w - 1) / 2.0, (h - 1) / 2.0, 0.3
    P0 = np.array([[f, 0, cx, 0], [0, f, cy, 0], [0, 0, 1, 0]],
                  np.float64)
    P1 = P0.copy()
    P1[0, 3] = -f * B
    camera = StereoCameraModel(P_l=P0, P_r=P1, width=w, height=h)
    cfg = SlamConfig()
    chunk = 6

    path = str(tmp_path / "chunk.jaxexport")
    export_chunk_program(camera, cfg, chunk, path, capacity=384)
    assert os.path.getsize(path) > 1000
    aot_step = load_chunk_program(path)

    shapes = FusedShapes(chunk=chunk, capacity=384)
    init_carry, step, _ = make_fused_chunk_fn(camera, cfg, shapes)

    lefts = jnp.asarray(np.stack([it["left"] for it in fwd_seq]))
    rights = jnp.asarray(np.stack([it["right"] for it in fwd_seq]))
    dts = jnp.full((chunk,), 0.1, jnp.float32)
    active = jnp.ones((chunk,), bool)

    carry = init_carry()
    _, outs_jit, feats_jit = step(carry, lefts, rights, dts, active)
    _, outs_aot, feats_aot = aot_step(carry, lefts, rights, dts, active)

    np.testing.assert_array_equal(np.asarray(outs_jit["pose"]),
                                  np.asarray(outs_aot["pose"]))
    np.testing.assert_array_equal(np.asarray(outs_jit["n_inliers"]),
                                  np.asarray(outs_aot["n_inliers"]))
    np.testing.assert_array_equal(np.asarray(feats_jit["desc"]),
                                  np.asarray(feats_aot["desc"]))


def test_compiled_artifact_boot(fwd_seq, tmp_path):
    """FastSlamPipeline(aot_dir=...) must save a compiled-executable
    artifact after the first compile and boot the SAME results from it
    in a fresh pipeline (zero retracing / recompilation path)."""
    import numpy as np
    from tpuslam.geometry.camera import StereoCameraModel
    from tpuslam.runtime.fast_pipeline import FastSlamPipeline

    h, w = fwd_seq[0]["left"].shape
    f, cx, cy, B = 250.0, (w - 1) / 2.0, (h - 1) / 2.0, 0.3
    P0 = np.array([[f, 0, cx, 0], [0, f, cy, 0], [0, 0, 1, 0]],
                  np.float64)
    P1 = P0.copy()
    P1[0, 3] = -f * B
    camera = StereoCameraModel(P_l=P0, P_r=P1, width=w, height=h)
    cfg = SlamConfig()
    aot_dir = str(tmp_path / "aot")

    p1 = FastSlamPipeline(camera, cfg, chunk=5, capacity=384,
                          aot_dir=aot_dir)
    assert not p1.aot_loaded
    infos1 = p1.run(fwd_seq)
    path = p1.save_aot()
    assert path is not None and os.path.getsize(path) > 1000

    p2 = FastSlamPipeline(camera, cfg, chunk=5, capacity=384,
                          aot_dir=aot_dir)
    assert p2.aot_loaded, "artifact must load on second construction"
    infos2 = p2.run(fwd_seq)
    for a, b in zip(infos1, infos2):
        np.testing.assert_array_equal(a.pose, b.pose)
        assert a.num_inliers == b.num_inliers

    # a different geometry must NOT pick up this artifact
    cam3 = StereoCameraModel(P_l=P0, P_r=P1, width=w, height=h)
    p3 = FastSlamPipeline(cam3, cfg, chunk=10, capacity=384,
                          aot_dir=aot_dir)
    assert not p3.aot_loaded
