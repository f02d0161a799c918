"""2-process launch of the slam_multihost CLI (partitioned back-end).

The runnable entry for BASELINE configs 4-5: both ranks must produce
identical optimized trajectories while holding complementary map shards.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope="module")
def seq(tmp_path_factory):
    from tpuslam.io.synthetic import make_sequence
    d = tmp_path_factory.mktemp("climh")
    return make_sequence(str(d), n_frames=6, width=640, height=360,
                         f=520.0, baseline=0.54, speed=0.3, seed=9)


def test_cli_two_process_partitioned(seq, tmp_path):
    out = str(tmp_path / "out")
    coord = f"localhost:{_free_port()}"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    procs = [subprocess.Popen(
        [sys.executable, "-m", "tpuslam.cli.slam_multihost", seq,
         "-coord", coord, "-num-procs", "2", "-rank", str(i),
         "-out", out, "-quiet"],
        env=env, cwd=os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))),
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(2)]
    logs = []
    for p in procs:
        out_b, _ = p.communicate(timeout=900)
        logs.append(out_b.decode(errors="replace"))
    for i, p in enumerate(procs):
        assert p.returncode == 0, f"rank {i} failed:\n{logs[i][-3000:]}"

    r0 = np.loadtxt(os.path.join(out, "poses_rank0.txt"))
    r1 = np.loadtxt(os.path.join(out, "poses_rank1.txt"))
    np.testing.assert_array_equal(r0, r1)
    assert r0.shape == (6, 12)
    # trajectory actually moved
    assert np.linalg.norm(r0[-1].reshape(3, 4)[:, 3]) > 0.5

    with open(os.path.join(out, "result_rank0.json")) as f:
        res0 = json.load(f)
    with open(os.path.join(out, "result_rank1.json")) as f:
        res1 = json.load(f)
    assert res0["n_frames"] == res1["n_frames"] == 6
    # partitioned map: each rank holds only part of the word rows
    assert res0["map_bytes"]["Mapper.words"] > 0
    assert res1["map_bytes"]["Mapper.words"] > 0
