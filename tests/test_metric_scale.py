"""Metric-scale acceptance: the KITTI devkit error on a >=150 m run.

First-party exercise of `calc_kitti_sequence_errors` — "the acceptance
metric of the whole framework" (SURVEY.md §2.2, KITTI.cpp:90-154) — at a
trajectory length where its 100 m segments actually exist, through the
full slam_batch pipeline (VO + mapper + loop closure + robust pose-graph
optimization), on an out-and-back loop sequence.
"""

import dataclasses
import os

import numpy as np
import pytest

from tpuslam.config import SlamConfig


@pytest.fixture(scope="module")
def long_loop_seq(tmp_path_factory):
    from tpuslam.io.synthetic import make_sequence, out_and_back_trajectory
    out = tmp_path_factory.mktemp("metricseq")
    # 100 m out + 100 m back = 200 m path; KITTI-like f/B ratio so the
    # 3D lift is well-conditioned at 320x240
    poses = out_and_back_trajectory(n_forward=100, speed=1.0)
    return make_sequence(str(out), poses=poses, width=320, height=240,
                         f=260.0, baseline=0.54, seed=13)


class TestMetricScale:
    def test_kitti_metric_at_scale(self, long_loop_seq):
        from tpuslam.cli.slam_batch import run
        cfg = SlamConfig()
        result = run(long_loop_seq, cfg=cfg, quiet=True)

        assert result["n_frames"] == 201
        # the way back revisits the way out
        assert result["n_loop_closures"] >= 1, "no loop closure"

        # the 100-800 m segment metric must be computable and bounded
        t_err = result["t_err_pct"]
        r_err = result["r_err_deg_per_m"]
        assert np.isfinite(t_err) and np.isfinite(r_err), \
            "no >=100 m segment found"
        assert t_err < 3.0, f"t_err {t_err:.3f} %"
        assert r_err < 0.02, f"r_err {r_err:.6f} deg/m"
        assert result["ate_m"] < 2.0, f"ATE {result['ate_m']:.3f} m"
