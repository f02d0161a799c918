"""App-mode CLI tests: replay, capture, kernel A/B harness, patterns."""

import os

import numpy as np
import pytest

from tpuslam.io.patterns import (PATTERN_COLOR_BAR, PATTERN_FRAME_INCR,
                                 PATTERN_GRID, PATTERN_HORIZ_INCR,
                                 PATTERN_VERT_INCR, generate_pattern)


class TestPatterns:
    def test_shapes_and_content(self):
        for p in (PATTERN_HORIZ_INCR, PATTERN_VERT_INCR,
                  PATTERN_FRAME_INCR, PATTERN_COLOR_BAR, PATTERN_GRID):
            img = generate_pattern(p, 64, 128, frame_index=7)
            assert img.shape == (64, 128) and img.dtype == np.uint8
        assert (generate_pattern(PATTERN_FRAME_INCR, 8, 8, 7) == 7).all()
        h = generate_pattern(PATTERN_HORIZ_INCR, 4, 300)
        assert h[0, 0] == 0 and h[0, 256] == 0 and h[0, 255] == 255
        g = generate_pattern(PATTERN_GRID, 64, 64)
        assert g[0, 0] == 255 and g[1, 1] == 0


@pytest.fixture(scope="module")
def slam_outputs(tmp_path_factory):
    """One small batch run shared by the replay tests."""
    from tpuslam.io.synthetic import make_sequence
    from tpuslam.cli.slam_batch import run
    seq = str(tmp_path_factory.mktemp("cliseq"))
    make_sequence(seq, n_frames=12, speed=0.45, yaw_rate=0.006, seed=7)
    out = str(tmp_path_factory.mktemp("cliout"))
    res = run(seq, out_dir=out, quiet=True)
    return seq, out, res


class TestOptimizeReplay:
    def test_replay_reproduces_batch_result(self, slam_outputs, tmp_path):
        from tpuslam.cli.optimize_replay import run as replay
        seq, out, res = slam_outputs
        r = replay(os.path.join(out, "map_poses.csv"),
                   os.path.join(out, "map_links.csv"),
                   out_path=str(tmp_path / "opt.csv"),
                   gt_path=os.path.join(seq, "poses.txt"), quiet=True)
        assert r["n_poses"] == res["n_nodes"]
        assert r["n_links"] == res["n_links"]
        # same graph -> same optimum (CSV float round-trip tolerance)
        for nid in res["optimized"]:
            np.testing.assert_allclose(r["optimized"][nid],
                                       res["optimized"][nid], atol=1e-3)
        assert os.path.exists(str(tmp_path / "opt.csv"))


class TestStereoCapture:
    def test_pattern_capture(self, tmp_path):
        from tpuslam.cli.stereo_capture import run as capture
        d = capture(str(tmp_path), n_frames=3, source="pattern",
                    pattern=PATTERN_GRID, quiet=True)
        imgs = sorted(os.listdir(os.path.join(d, "image_0")))
        assert len(imgs) == 3
        stamps = open(os.path.join(d, "timestamp.txt")).read().split()
        assert len(stamps) == 3

    def test_synthetic_capture_with_frontend_dumps(self, tmp_path):
        from tpuslam.cli.stereo_capture import run as capture
        d = capture(str(tmp_path), n_frames=2, source="synthetic",
                    frontend=True, quiet=True)
        dumps = os.listdir(os.path.join(d, "dumps"))
        for prefix in ("rect_l", "rect_r", "depth", "eig", "kpts2d",
                       "kpts3d", "desc", "kpts"):
            assert any(f.startswith(prefix) for f in dumps), prefix


class TestKernelTest:
    def test_harness_passes_on_golden_pair(self, tmp_path):
        from tpuslam.cli.kernel_test import run as ktest
        report = ktest(out_dir=str(tmp_path / "kt"), quiet=True)
        assert report["all_pass"], report
        assert report["xsobel_vs_golden"]["mismatches"] == 0
