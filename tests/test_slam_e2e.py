"""Full SLAM batch pipeline end-to-end: VO + mapper + loop closure +
robust pose-graph optimization on a synthetic out-and-back sequence."""

import dataclasses
import os

import numpy as np
import pytest

from tpuslam.config import SlamConfig, MapperConfig


@pytest.fixture(scope="session")
def loop_seq(tmp_path_factory):
    from tpuslam.io.synthetic import make_sequence, out_and_back_trajectory
    out = tmp_path_factory.mktemp("loopseq")
    poses = out_and_back_trajectory(n_forward=14, speed=0.45)
    return make_sequence(str(out), poses=poses, seed=7)


class TestSlamBatch:
    def test_full_pipeline_with_loop_closure(self, loop_seq):
        from tpuslam.cli.slam_batch import run
        # small-memory mapper so loop closures are reachable in 28 frames
        cfg = SlamConfig()
        cfg = dataclasses.replace(
            cfg, mapper=MapperConfig(map_update=2, max_stm_size=3))
        result = run(loop_seq, cfg=cfg, quiet=True)

        assert result["n_frames"] == 29
        assert result["n_nodes"] == 29
        # neighbor chain at minimum
        assert result["n_links"] >= 28

        # the way back revisits the way out -> at least one loop closure
        assert result["n_loop_closures"] >= 1, "no loop closure detected"

        # trajectory quality after optimization
        assert result["ate_m"] < 0.25, f"ATE {result['ate_m']:.3f} m"

        # artifacts written (reference parity: optimized_poses.csv etc.)
        for name in ("optimized_poses.csv", "map_poses.csv",
                     "map_links.csv", "perf_time.csv"):
            assert os.path.exists(os.path.join(loop_seq, name)), name

    def test_optimizer_replay_from_csv(self, loop_seq):
        """Stage replay (SURVEY.md §4.3): reload the saved graph and
        re-run the optimizer offline."""
        from tpuslam.io.dataset import load_poses, load_links
        from tpuslam.mapping.graph import MultiMap
        from tpuslam.optim import run_optimize_robust
        poses = load_poses(os.path.join(loop_seq, "map_poses.csv"))
        links_list = load_links(os.path.join(loop_seq, "map_links.csv"))
        assert len(poses) == 29
        links = MultiMap()
        for link in links_list:
            links.insert(link.from_id, link)
        opt, chi2 = run_optimize_robust(poses, links, 20)
        assert len(opt) == 29
        assert np.isfinite(chi2)
