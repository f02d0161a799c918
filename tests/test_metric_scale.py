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
    # 104 m out + 104 m back = 208 m path; KITTI-like f/B ratio so the
    # 3D lift is well-conditioned at 320x240.  n_forward === map_update-1
    # (mod map_update) makes return-leg full nodes revisit outbound full
    # nodes at EXACTLY the same pose (return frame t sees z = 2n-t; with
    # n === 4 (mod 5) both t and 2n-t are full-node frames), which is the
    # same-lane-revisit geometry real loop closure needs — single-level
    # ORB (GFTT octave 0, CvORB.cpp:35-41) decorrelates under the >15 %
    # scale change a multi-meter offset would add.
    poses = out_and_back_trajectory(n_forward=104, speed=1.0)
    return make_sequence(str(out), poses=poses, width=320, height=240,
                         f=260.0, baseline=0.54, seed=13)


class TestMetricScale:
    def test_kitti_metric_at_scale(self, long_loop_seq):
        from tpuslam.cli.slam_batch import run
        cfg = SlamConfig()
        result = run(long_loop_seq, cfg=cfg, quiet=True)

        assert result["n_frames"] == 209
        # the way back revisits the way out: the last ~6 full nodes have
        # their outbound twins in WM (STM holds 30 full nodes = 150
        # frames) and must close the loop
        assert result["n_loop_closures"] >= 3, "loop closures missing"

        # the 100-800 m segment metric must be computable and bounded
        t_err = result["t_err_pct"]
        r_err = result["r_err_deg_per_m"]
        assert np.isfinite(t_err) and np.isfinite(r_err), \
            "no >=100 m segment found"
        assert t_err < 1.0, f"t_err {t_err:.3f} %"
        assert r_err < 0.02, f"r_err {r_err:.6f} deg/m"
        assert result["ate_m"] < 0.8, f"ATE {result['ate_m']:.3f} m"

        # global BA over the cross-leg word tracks must stay at the VO
        # noise floor: VO here is below the landmark noise floor (word
        # tracks initialize from single-view stereo depth), so
        # near-neutral is the correct outcome.  BA's improvement case —
        # odometry noisier than that floor — was measured on the
        # pre-precision-fix build (ATE 1.18 -> 0.92 m); tools/
        # demo_ba_loop.py keeps measuring the boundary on-chip.
        from tpuslam.geometry.kitti_metric import ate_rmse
        from tpuslam.mapping.ba_window import refine_trajectory_global_ba
        mapper = result["mapper"]
        vo_poses = {nid: mapper.nodes[nid].pose
                    for nid in sorted(mapper.nodes)}
        refined = refine_trajectory_global_ba(mapper, vo_poses,
                                              mapper.camera)
        ids = sorted(vo_poses)
        gt = np.stack([mapper.nodes[i].frame.gt_pose for i in ids])
        vo = np.stack([vo_poses[i] for i in ids])
        ba = np.stack([refined[i] for i in ids])
        ate_vo, ate_ba = ate_rmse(gt, vo), ate_rmse(gt, ba)
        # the STRICT-improvement assertion for the drifted regime lives
        # in tests/test_ba.py (test_global_ba_strictly_improves_drifted);
        # here VO is below the landmark noise floor and the holdout gate
        # must keep BA a near-no-op
        assert ate_ba < 1.05 * ate_vo + 0.1, \
            f"global BA degraded ATE {ate_vo:.3f} -> {ate_ba:.3f}"
