"""Independent end-to-end cross-check: tpuslam vs a pure-OpenCV pipeline.

Every other end-to-end assertion in this suite compares tpuslam against
host twins written by the same author.  tools/cv2_oracle.py composes
cv2's OWN StereoBM/GFTT/ORB/BFMatcher/solvePnPRansac with the reference
binary's constants (main.cpp:197-308) into a complete visual odometer
that shares no tpuslam kernel code; here both systems run the bench
geometry and must agree at trajectory level.

Measured on the full driver bench sequence (120 frames, 168 m,
tools/cv2_oracle.py; the rendered sequence varies per container
session, so absolute numbers are session-bound — round 5): cv2
ATE 0.634 m / t_err 0.658 %, tpuslam fused ATE 0.532 m /
t_err 0.541 %; on the 509-frame 711 m loop: cv2 (VO-only)
t_err 0.287 %, tpuslam 0.218 % post-graph with 36 loop closures
(tools/demo_scale.py, round-5 re-run).
"""

import os
import sys

import numpy as np
import pytest

from tpuslam.config import SlamConfig

TOOLS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools")

N_FRAMES = 40
CHUNK = 20
SPEED = 1.4


@pytest.fixture(scope="module")
def bench_seq(tmp_path_factory):
    from tpuslam.io.synthetic import make_sequence
    from tpuslam.io.dataset import StereoImageDataset
    out = str(tmp_path_factory.mktemp("oraclegeo"))
    make_sequence(out, n_frames=N_FRAMES, width=1241, height=376,
                  f=718.856, baseline=0.54, speed=SPEED,
                  yaw_rate=0.003, seed=11)
    ds = StereoImageDataset(
        left_dir=os.path.join(out, "image_0"),
        right_dir=os.path.join(out, "image_1"),
        times_path=os.path.join(out, "times.txt"),
        gt_path=os.path.join(out, "poses.txt"))
    items = [ds[i] for i in range(len(ds))]
    from tpuslam.geometry.camera import StereoCameraModel
    camera = StereoCameraModel.load_kitti(
        os.path.join(out, "calib.txt"), image_size=(1241, 376))
    gt_cam = np.loadtxt(os.path.join(out, "poses.txt"))
    return items, camera, gt_cam.reshape(-1, 3, 4)


def _ate(est_xyz, gt_xyz):
    return float(np.sqrt(np.mean(
        np.sum((est_xyz - gt_xyz) ** 2, axis=1))))


class TestCv2Oracle:
    def test_cv2_oracle_and_tpuslam_agree(self, bench_seq):
        cv2 = pytest.importorskip("cv2")  # noqa: F841
        sys.path.insert(0, TOOLS)
        from cv2_oracle import run_cv2_pipeline

        items, camera, gt_cam = bench_seq
        K = np.asarray(camera.K_l, np.float64)
        baseline = float(-camera.Tx_r / camera.fx_r)

        est_cv2, lost_cv2, med_cv2 = run_cv2_pipeline(items, K, baseline)
        assert lost_cv2 == 0, "cv2 oracle lost frames on bench geometry"
        assert med_cv2 >= 100

        from tpuslam.runtime.fast_pipeline import FastSlamPipeline
        pipe = FastSlamPipeline(camera, SlamConfig(), chunk=CHUNK)
        infos = pipe.run(items)
        assert not any(i.lost for i in infos[1:])

        # oracle is in the raw camera frame, tpuslam in the conjugated
        # robot frame; ATE vs the respective ground truths is invariant
        # to that fixed change of basis, so the two scalars compare 1:1
        gt_robot = np.stack([it["ground_truth"] for it in items])
        ate_tpu = _ate(np.stack([i.pose for i in infos])[:, :3, 3],
                       gt_robot[:, :3, 3])
        ate_cv2 = _ate(est_cv2[:, :3, 3], gt_cam[:N_FRAMES, :3, 3])

        # both track the 55 m segment; tpuslam must be no worse than the
        # all-OpenCV pipeline plus a small tolerance
        assert ate_cv2 < 1.0, f"oracle off the rails: {ate_cv2:.3f} m"
        assert ate_tpu < ate_cv2 + 0.3, \
            f"tpuslam ATE {ate_tpu:.3f} m vs cv2 oracle {ate_cv2:.3f} m"
