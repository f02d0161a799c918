"""Runtime subsystem tests: logger, perf CSVs, checkpoint/resume.

Checkpoint acceptance: an interrupted-and-resumed batch run must produce
bit-identical mapper state and trajectories to an uninterrupted run
(the pipeline is deterministic).
"""

import os

import numpy as np
import pytest

from tpuslam.runtime.logger import (LOG_LEVEL_DEBUG, Logger, SlamError)
from tpuslam.runtime.perf import Perf


@pytest.fixture(scope="module")
def synth_seq(tmp_path_factory):
    from tpuslam.io.synthetic import make_sequence
    out = tmp_path_factory.mktemp("rtseq")
    return make_sequence(str(out), n_frames=14, speed=0.45,
                         yaw_rate=0.006, seed=5)


class TestLogger:
    def test_levels_and_buffer(self, tmp_path, capsys):
        log = Logger(level=LOG_LEVEL_DEBUG)
        log.debug("d")
        log.info("i")
        log.warn("w")
        p = str(tmp_path / "log.txt")
        log.flush(p)
        lines = open(p).read().splitlines()
        assert len(lines) == 3
        assert "[DEBUG]" in lines[0] and "[WARN]" in lines[2]
        assert "test_runtime.py" in lines[0]

    def test_quiet_suppresses_console(self, capsys):
        log = Logger(quiet=True)
        log.info("hidden")
        assert capsys.readouterr().out == ""

    def test_error_raises(self, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        log = Logger(quiet=True)
        with pytest.raises(SlamError):
            log.error("fatal")
        # buffer was flushed to log.txt before raising
        assert "fatal" in open("log.txt").read()


class TestPerf:
    def test_time_and_memory_csv(self, tmp_path):
        perf = Perf()
        for frame in range(3):
            perf.set_frame(frame)
            with perf.span("stage_a"):
                pass
            perf.add_ms("stage_b", 1.5)
            perf.register_memory("comp", 100 * (frame + 1))
        pt = str(tmp_path / "perf_time.csv")
        pm = str(tmp_path / "perf_memory.csv")
        perf.write(pt)
        perf.write_memory(pm)
        head = open(pt).read().splitlines()
        assert head[0] == "frame,stage_a,stage_b"
        assert len(head) == 4
        mem = open(pm).read().splitlines()
        assert mem[0] == "frame,comp"
        assert mem[2].endswith("200")


def _graph_signature(mapper):
    poses, links = mapper.get_graph()
    sig = {
        "ids": sorted(poses),
        "poses": np.concatenate([poses[i].ravel()
                                 for i in sorted(poses)]),
        "links": sorted((l.from_id, l.to_id, l.type)
                        for l in links.values()),
        "n_words": len(mapper.vwd),
        "node_words": {i: list(mapper.nodes[i].words)
                       for i in sorted(mapper.nodes)},
    }
    return sig


class TestCheckpointResume:
    def test_resume_is_bit_identical(self, synth_seq, tmp_path):
        from tpuslam.cli.slam_batch import run

        out_a = str(tmp_path / "straight")
        res_a = run(synth_seq, out_dir=out_a, quiet=True)

        # interrupted run: 7 frames with a checkpoint at frame 7
        cp = str(tmp_path / "cp.npz")
        out_b = str(tmp_path / "part1")
        run(synth_seq, num_images=6, out_dir=out_b, quiet=True,
            checkpoint_every=7, checkpoint_path=cp)
        assert os.path.exists(cp)

        out_c = str(tmp_path / "resumed")
        res_c = run(synth_seq, out_dir=out_c, quiet=True, resume_from=cp)

        sig_a = _graph_signature(res_a["mapper"])
        sig_c = _graph_signature(res_c["mapper"])
        assert sig_a["ids"] == sig_c["ids"]
        np.testing.assert_array_equal(sig_a["poses"], sig_c["poses"])
        assert sig_a["links"] == sig_c["links"]
        assert sig_a["n_words"] == sig_c["n_words"]
        assert sig_a["node_words"] == sig_c["node_words"]
        np.testing.assert_array_equal(res_a["vo_poses"],
                                      res_c["vo_poses"])

    def test_memory_csv_written(self, synth_seq, tmp_path):
        from tpuslam.cli.slam_batch import run
        out = str(tmp_path / "mem")
        run(synth_seq, num_images=4, out_dir=out, quiet=True, memory=True)
        pm = os.path.join(out, "perf_memory.csv")
        assert os.path.exists(pm)
        lines = open(pm).read().splitlines()
        assert "Mapper.nodes" in lines[0]
        assert len(lines) >= 2

    def test_checkpoint_roundtrip_state(self, synth_seq, tmp_path):
        """save_state -> load_state preserves every mapper field."""
        from tpuslam.cli.slam_batch import run
        from tpuslam.runtime.checkpoint import load_state, save_state
        from tpuslam.mapping.mapper import Mapper
        from tpuslam.vo.odometry import Odometry
        from tpuslam.config import SlamConfig
        from tpuslam.geometry.camera import StereoCameraModel

        res = run(synth_seq, num_images=8, out_dir=str(tmp_path), quiet=True)
        mapper = res["mapper"]
        path = str(tmp_path / "state.npz")
        save_state(path, mapper)

        cfg = SlamConfig()
        camera = StereoCameraModel.load_kitti(
            os.path.join(synth_seq, "calib.txt"), image_size=(640, 480))
        m2 = Mapper(camera, cfg.mapper, cfg.matching, cfg.pnp)
        load_state(path, m2)

        assert sorted(m2.nodes) == sorted(mapper.nodes)
        for i in mapper.nodes:
            a, b = mapper.nodes[i], m2.nodes[i]
            assert a.weight == b.weight
            np.testing.assert_array_equal(a.pose, b.pose)
            np.testing.assert_array_equal(a.frame.desc, b.frame.desc)
            np.testing.assert_array_equal(a.frame.kpts, b.frame.kpts)
            if a.frame.disparity_dec is not None:
                np.testing.assert_array_equal(a.frame.disparity_dec,
                                              b.frame.disparity_dec)
            assert a.words == b.words
        assert m2.stm == mapper.stm
        assert m2.working_mem == mapper.working_mem
        assert len(m2.vwd) == len(mapper.vwd)
        for w in mapper.vwd.words:
            assert m2.vwd.words[w].references == \
                mapper.vwd.words[w].references
