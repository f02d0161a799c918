"""End-to-end visual odometry on a synthetic KITTI-format sequence.

The acceptance model mirrors the reference (SURVEY.md §4): trajectory
against exact ground truth.  The synthetic world gives us what the
environment lacks (no KITTI data): geometrically consistent stereo with
known poses.
"""

import numpy as np
import pytest

from tpuslam.config import SlamConfig
from tpuslam.geometry import transform as T
from tpuslam.geometry.camera import StereoCameraModel
from tpuslam.geometry.kitti_metric import ate_rmse
from tpuslam.io.dataset import StereoImageDataset
from tpuslam.runtime.pipeline import extract_features
from tpuslam.vo.odometry import Odometry


@pytest.fixture(scope="session")
def synth_seq(tmp_path_factory):
    from tpuslam.io.synthetic import make_sequence
    out = tmp_path_factory.mktemp("synthseq")
    return make_sequence(str(out), n_frames=10, speed=0.45,
                         yaw_rate=0.006, seed=3)


class TestSyntheticSequence:
    def test_loader_roundtrip(self, synth_seq):
        import os
        ds = StereoImageDataset(
            left_dir=os.path.join(synth_seq, "image_0"),
            right_dir=os.path.join(synth_seq, "image_1"),
            times_path=os.path.join(synth_seq, "times.txt"),
            gt_path=os.path.join(synth_seq, "poses.txt"))
        assert len(ds) == 10
        item = ds[0]
        assert item["left"].shape == (480, 640)
        assert item["ground_truth"] is not None
        # frame 0 GT is identity
        np.testing.assert_allclose(item["ground_truth"], np.eye(4),
                                   atol=1e-6)

    def test_stereo_geometry_consistent(self, synth_seq):
        """Disparity of the rendered pair must equal f*B/Z of the world."""
        import os
        import jax.numpy as jnp
        from tpuslam.kernels.stereo_bm import stereo_bm
        ds = StereoImageDataset(
            left_dir=os.path.join(synth_seq, "image_0"),
            right_dir=os.path.join(synth_seq, "image_1"))
        item = ds[0]
        disp = np.asarray(stereo_bm(jnp.asarray(item["left"]),
                                    jnp.asarray(item["right"])))
        d = disp[disp > 0] / 16.0
        # world depth 8..35 m, f=500, B=0.54 -> disparity ~ 7.7..33.75
        assert (disp > 0).mean() > 0.4
        assert 6.0 < np.median(d) < 40.0


class TestOdometryE2E:
    def test_vo_tracks_ground_truth(self, synth_seq):
        import os
        cfg = SlamConfig()
        camera = StereoCameraModel.load_kitti(
            os.path.join(synth_seq, "calib.txt"), image_size=(640, 480))
        ds = StereoImageDataset(
            left_dir=os.path.join(synth_seq, "image_0"),
            right_dir=os.path.join(synth_seq, "image_1"),
            times_path=os.path.join(synth_seq, "times.txt"),
            gt_path=os.path.join(synth_seq, "poses.txt"))

        odom = Odometry(camera)
        est, gt = [], []
        for i in range(len(ds)):
            item = ds[i]
            frame = extract_features(item["left"], item["right"], camera,
                                     cfg, stamp=item["stamp"], frame_id=i,
                                     gt_pose=item["ground_truth"])
            assert frame.n_kpts > 200, f"frame {i}: {frame.n_kpts} kpts"
            info = odom.process(frame)
            assert not info.lost, f"VO lost at frame {i}"
            est.append(info.pose)
            gt.append(item["ground_truth"])

        est = np.stack(est)
        gt = np.stack(gt)
        ate = ate_rmse(gt, est)
        # ~4.5 m travelled; sub-decimeter ATE expected on clean synthetic
        assert ate < 0.15, f"ATE {ate:.3f} m"

        # final position error
        err = np.linalg.norm(est[-1][:3, 3] - gt[-1][:3, 3])
        assert err < 0.2, f"final position error {err:.3f} m"


def test_masked_median2_pallas_matches_sort():
    """The one-kernel bisection median (vo/fused._masked_median2_pallas,
    interpret mode here) must equal the std::sort-twin _masked_median
    exactly — including all-masked, heavy ties, and tiny counts."""
    import jax.numpy as jnp
    from tpuslam.vo.fused import _masked_median, _masked_median2_pallas
    rng = np.random.default_rng(7)
    cases = [(1536, 0.5, False), (1536, 0.0, False), (100, 0.9, False),
             (7, 1.0, False), (1536, 0.001, False), (1536, 1.0, True)]
    for n, frac, ties in cases:
        x = np.abs(rng.normal(0, 10, n)).astype(np.float32)
        if ties:
            x = np.round(x)
        y = np.abs(rng.normal(0, 2, n)).astype(np.float32)
        m = rng.uniform(size=n) < frac
        a0, c0 = _masked_median(jnp.asarray(x), jnp.asarray(m))
        b0, _ = _masked_median(jnp.asarray(y), jnp.asarray(m))
        a1, b1, c1 = _masked_median2_pallas(jnp.asarray(x), jnp.asarray(y),
                                            jnp.asarray(m))
        assert float(a0) == float(a1), (n, frac)
        assert float(b0) == float(b1), (n, frac)
        assert int(c0) == int(c1), (n, frac)
