"""Real-image texture in the end-to-end evidence chain.

Every other end-to-end trajectory in this suite renders the builder's
own procedural-noise world.  Here the rendered world is textured with
the REFERENCE'S shipped real rectified camera frame
(/root/reference/data/ref_rect_l.zip -> tests/fixtures/rect_left.npy,
the same fixture the kernel golden tests use), mirror-tiled and
mip-mapped onto the box faces (io/synthetic.py photo mode) — so the
pixel statistics the front-end sees (gradient distributions, corner
shapes, ORB bit patterns) come from a real sensor, on a 168 m
trajectory long enough for a FINITE KITTI t_err.  Both the tpuslam
fused pipeline and the independent cv2-only oracle
(tools/cv2_oracle.py) must track it.

Reference bar: the reference runs on real camera files everywhere
(src/slam/src/core/CameraStereoImages.cpp:71-118).
"""

import os
import sys

import numpy as np
import pytest

from tpuslam.config import SlamConfig

FIX = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "fixtures")
TOOLS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools")

N_FRAMES = 120          # x 1.4 m = 168 m: the 100 m t_err segments exist
W, H, F = 640, 240, 350.0


@pytest.fixture(scope="module")
def photo_seq(tmp_path_factory):
    from tpuslam.io.synthetic import make_sequence
    from tpuslam.io.dataset import StereoImageDataset
    from tpuslam.geometry.camera import StereoCameraModel
    photo = np.load(os.path.join(FIX, "rect_left.npy"))
    out = str(tmp_path_factory.mktemp("phototex"))
    make_sequence(out, n_frames=N_FRAMES, width=W, height=H, f=F,
                  baseline=0.54, speed=1.4, yaw_rate=0.003, seed=11,
                  texture_photo=photo)
    ds = StereoImageDataset(
        left_dir=os.path.join(out, "image_0"),
        right_dir=os.path.join(out, "image_1"),
        times_path=os.path.join(out, "times.txt"),
        gt_path=os.path.join(out, "poses.txt"))
    items = [ds[i] for i in range(len(ds))]
    camera = StereoCameraModel.load_kitti(
        os.path.join(out, "calib.txt"), image_size=(W, H))
    gt_cam = np.loadtxt(os.path.join(out, "poses.txt")).reshape(-1, 3, 4)
    return items, camera, gt_cam


def _finite_metrics(items, est_poses):
    from tpuslam.geometry.kitti_metric import calc_kitti_sequence_errors
    gt = np.stack([np.vstack([it["ground_truth"], [0, 0, 0, 1]])
                   if it["ground_truth"].shape == (3, 4)
                   else it["ground_truth"] for it in items])
    est = np.asarray(est_poses)
    ate = float(np.sqrt(np.mean(
        np.sum((est[:, :3, 3] - gt[:, :3, 3]) ** 2, axis=1))))
    t_err, r_err = calc_kitti_sequence_errors(gt, est)
    return ate, t_err, r_err


class TestRealTexture:
    def test_fused_pipeline_tracks_real_texture(self, photo_seq):
        from tpuslam.runtime.fast_pipeline import FastSlamPipeline
        items, camera, _ = photo_seq
        pipe = FastSlamPipeline(camera, SlamConfig(), chunk=20,
                                capacity=1536)
        staged = pipe.stage_chunks(items)
        infos = pipe.run_staged(staged, items)
        lost = sum(1 for i in infos[1:] if i.lost)
        assert lost == 0, f"{lost} frames lost on real-texture world"
        ate, t_err, r_err = _finite_metrics(
            items, np.stack([i.pose for i in infos]))
        assert np.isfinite(t_err), "no 100 m segment — t_err undefined"
        assert t_err < 1.5, f"t_err {t_err:.3f}% on real texture"
        assert ate < 1.5, f"ATE {ate:.3f} m on real texture"

    def test_cv2_oracle_tracks_real_texture(self, photo_seq):
        cv2 = pytest.importorskip("cv2")  # noqa: F841
        sys.path.insert(0, TOOLS)
        from cv2_oracle import run_cv2_pipeline
        from tpuslam.geometry.kitti_metric import \
            calc_kitti_sequence_errors
        items, camera, gt_cam = photo_seq
        K = np.asarray(camera.K_l, np.float64)
        baseline = float(-camera.Tx_r / camera.fx_r)
        est, lost, _ = run_cv2_pipeline(items, K, baseline)
        assert lost == 0, "cv2 oracle lost frames on real texture"
        # the oracle reports CAMERA-frame poses: compare against the
        # camera-frame poses.txt ground truth (not the robot-conjugated
        # dataset GT)
        gt = np.stack([np.vstack([g, [0, 0, 0, 1]]) for g in gt_cam])
        est = np.asarray(est)
        ate = float(np.sqrt(np.mean(
            np.sum((est[:, :3, 3] - gt[:, :3, 3]) ** 2, axis=1))))
        t_err, _ = calc_kitti_sequence_errors(gt, est)
        assert np.isfinite(t_err)
        assert t_err < 2.0, f"cv2 t_err {t_err:.3f}%"
        assert ate < 2.0, f"cv2 ATE {ate:.3f} m"
