"""Streaming mode tests: pipelined dispatch + async loop closure must
produce the same trajectories as the synchronous batch path."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def synth_seq(tmp_path_factory):
    from tpuslam.io.synthetic import make_sequence
    out = tmp_path_factory.mktemp("rtseq2")
    return make_sequence(str(out), n_frames=12, speed=0.45,
                         yaw_rate=0.006, seed=9)


def test_realtime_matches_batch(synth_seq, tmp_path):
    from tpuslam.cli.slam_batch import run as run_batch
    from tpuslam.cli.slam_realtime import run as run_rt

    res_b = run_batch(synth_seq, out_dir=str(tmp_path / "b"), quiet=True)
    res_r = run_rt(synth_seq, out_dir=str(tmp_path / "r"), quiet=True,
                   pipelined=True, async_lc=True)

    # identical deterministic math -> identical VO trajectories
    np.testing.assert_array_equal(res_b["vo_poses"], res_r["vo_poses"])
    assert sorted(res_b["optimized"]) == sorted(res_r["optimized"])
    for nid in res_b["optimized"]:
        np.testing.assert_allclose(res_b["optimized"][nid],
                                   res_r["optimized"][nid], atol=1e-5)
    assert res_r["latency_ms_p50"] > 0


def test_async_lc_joins_cleanly(synth_seq, tmp_path):
    """async_lc alone (no pipelining) also matches the sync result."""
    from tpuslam.cli.slam_realtime import run as run_rt
    a = run_rt(synth_seq, num_images=9, out_dir=str(tmp_path / "a"),
               quiet=True, pipelined=False, async_lc=True)
    s = run_rt(synth_seq, num_images=9, out_dir=str(tmp_path / "s"),
               quiet=True, pipelined=False, async_lc=False)
    np.testing.assert_array_equal(a["vo_poses"], s["vo_poses"])
    assert a["n_loop_closures"] == s["n_loop_closures"]


def test_telemetry_stream(synth_seq, tmp_path):
    """The live frame-ring telemetry (UVC stream analog): ring files and
    an atomic latest.json pointer appear; publishing never changes the
    trajectory."""
    import json
    import os
    from tpuslam.cli.slam_realtime import run as run_rt

    tdir = str(tmp_path / "telemetry")
    res = run_rt(synth_seq, num_images=9, out_dir=str(tmp_path / "o"),
                 quiet=True, pipelined=True, async_lc=False,
                 telemetry_dir=tdir)
    assert res["n_frames"] == 10

    latest = json.load(open(os.path.join(tdir, "latest.json")))
    assert latest["frame_id"] >= 0
    assert os.path.exists(os.path.join(tdir, latest["rect"]))
    from PIL import Image
    with Image.open(os.path.join(tdir, latest["rect"])) as im:
        assert im.size == (640, 480)
    if "disp" in latest:
        assert os.path.exists(os.path.join(tdir, latest["disp"]))
