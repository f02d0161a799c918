"""Sliding-window bundle adjustment tests (synthetic oracle)."""

import numpy as np
import pytest
import jax.numpy as jnp

from tpuslam.optim.ba import ba_solve, project


def _make_problem(n_cams=6, n_lms=80, noise_px=0.0, seed=0,
                  pose_noise=0.02, lm_noise=0.05):
    rng = np.random.default_rng(seed)
    intr = np.array([500.0, 500.0, 320.0, 240.0], np.float32)

    # ground truth: cameras along x, looking at +z; landmarks ahead
    Tcw_true = []
    for i in range(n_cams):
        T = np.eye(4, dtype=np.float32)
        T[:3, 3] = [-0.3 * i, 0, 0]  # cam-from-world: world shifts left
        Tcw_true.append(T)
    Tcw_true = np.stack(Tcw_true)
    lms_true = np.stack([
        rng.uniform(-2, 2 + 0.3 * n_cams, n_lms),
        rng.uniform(-1.5, 1.5, n_lms),
        rng.uniform(4, 10, n_lms)], axis=1).astype(np.float32)

    obs_cam, obs_lm, obs_uv = [], [], []
    for c in range(n_cams):
        for l in range(n_lms):
            uv, p = project(jnp.asarray(Tcw_true[c]),
                            jnp.asarray(lms_true[l]), jnp.asarray(intr))
            uv = np.asarray(uv)
            if p[2] > 0.5 and 0 <= uv[0] < 640 and 0 <= uv[1] < 480:
                obs_cam.append(c)
                obs_lm.append(l)
                obs_uv.append(uv + rng.normal(0, noise_px, 2))
    obs_cam = np.array(obs_cam, np.int32)
    obs_lm = np.array(obs_lm, np.int32)
    obs_uv = np.stack(obs_uv).astype(np.float32)
    obs_valid = np.ones(len(obs_cam), bool)

    # perturbed initialization (cameras 0,1 exact: they fix the gauge
    # including monocular scale)
    Tcw0 = Tcw_true.copy()
    for i in range(2, n_cams):
        Tcw0[i, :3, 3] += rng.normal(0, pose_noise, 3)
    lms0 = lms_true + rng.normal(0, lm_noise, lms_true.shape).astype(
        np.float32)
    return (intr, Tcw_true, lms_true, Tcw0, lms0,
            obs_cam, obs_lm, obs_uv, obs_valid)


class TestBA:
    def test_converges_to_truth(self):
        (intr, Tcw_true, lms_true, Tcw0, lms0, oc, ol, uv,
         valid) = _make_problem()
        Tcw, lms, cost = ba_solve(
            jnp.asarray(Tcw0), jnp.asarray(lms0), jnp.asarray(intr),
            jnp.asarray(oc), jnp.asarray(ol), jnp.asarray(uv),
            jnp.asarray(valid), n_cams=6, n_lms=80, iterations=8,
            n_fixed=2)
        Tcw = np.asarray(Tcw)
        rms = np.sqrt(float(cost) / len(oc))
        assert rms < 1e-3  # noise-free -> exact solution
        # poses recovered (gauge = cam 0, exact in this setup)
        t_err = np.linalg.norm(Tcw[:, :3, 3] - Tcw_true[:, :3, 3],
                               axis=1)
        assert t_err.max() < 1e-3

    def test_reduces_noise(self):
        (intr, Tcw_true, lms_true, Tcw0, lms0, oc, ol, uv,
         valid) = _make_problem(noise_px=0.3, seed=1)
        before = np.linalg.norm(Tcw0[:, :3, 3] - Tcw_true[:, :3, 3],
                                axis=1).max()
        Tcw, lms, cost = ba_solve(
            jnp.asarray(Tcw0), jnp.asarray(lms0), jnp.asarray(intr),
            jnp.asarray(oc), jnp.asarray(ol), jnp.asarray(uv),
            jnp.asarray(valid), n_cams=6, n_lms=80, iterations=8,
            n_fixed=2)
        after = np.linalg.norm(
            np.asarray(Tcw)[:, :3, 3] - Tcw_true[:, :3, 3], axis=1).max()
        assert after < before * 0.5
        rms = np.sqrt(float(cost) / len(oc))
        assert rms < 1.0  # at the noise floor

    def test_huber_rejects_outliers(self):
        (intr, Tcw_true, lms_true, Tcw0, lms0, oc, ol, uv,
         valid) = _make_problem(seed=2)
        rng = np.random.default_rng(3)
        bad = rng.choice(len(uv), size=len(uv) // 10, replace=False)
        uv_bad = uv.copy()
        uv_bad[bad] += rng.uniform(30, 80, (len(bad), 2))
        Tcw_h, _, _ = ba_solve(
            jnp.asarray(Tcw0), jnp.asarray(lms0), jnp.asarray(intr),
            jnp.asarray(oc), jnp.asarray(ol), jnp.asarray(uv_bad),
            jnp.asarray(valid), n_cams=6, n_lms=80, iterations=10,
            huber_delta=2.0, n_fixed=2)
        Tcw_n, _, _ = ba_solve(
            jnp.asarray(Tcw0), jnp.asarray(lms0), jnp.asarray(intr),
            jnp.asarray(oc), jnp.asarray(ol), jnp.asarray(uv_bad),
            jnp.asarray(valid), n_cams=6, n_lms=80, iterations=10,
            n_fixed=2)
        err_h = np.linalg.norm(
            np.asarray(Tcw_h)[:, :3, 3] - Tcw_true[:, :3, 3], axis=1).max()
        err_n = np.linalg.norm(
            np.asarray(Tcw_n)[:, :3, 3] - Tcw_true[:, :3, 3], axis=1).max()
        assert err_h < err_n * 0.25
        assert err_h < 0.08  # IRLS downweights but can't fully reject

    def test_masked_observations_ignored(self):
        (intr, _, _, Tcw0, lms0, oc, ol, uv,
         valid) = _make_problem(seed=4)
        # corrupt half the observations but mark them invalid
        uv2 = uv.copy()
        uv2[::2] += 500.0
        valid2 = valid.copy()
        valid2[::2] = False
        _, _, cost = ba_solve(
            jnp.asarray(Tcw0), jnp.asarray(lms0), jnp.asarray(intr),
            jnp.asarray(oc), jnp.asarray(ol), jnp.asarray(uv2),
            jnp.asarray(valid2), n_cams=6, n_lms=80, iterations=8,
            n_fixed=2)
        rms = np.sqrt(float(cost) / valid2.sum())
        assert rms < 1e-2


class TestBAWindow:
    """ba_window: word-track extraction from mapper nodes + sliding-window
    trajectory refinement (VERDICT r1 item 3: BA wired to the mapper)."""

    def _fake_mapper(self, kitti_camera, n_nodes=6, n_pts=120,
                     pose_noise=0.03, seed=0, drift=0.0):
        from types import SimpleNamespace
        from tpuslam.mapping.graph import Node
        from tpuslam.vo.frame import Frame

        rng = np.random.default_rng(seed)
        cam = kitti_camera
        local_t = cam.local_transform
        f, cx, cy = cam.fx_l, cam.cx_l, cam.cy_l

        pts_w = np.stack([rng.uniform(-10, 10, n_pts),
                          rng.uniform(-3, 3, n_pts),
                          rng.uniform(8, 30, n_pts)], axis=1)

        gt_poses, noisy_poses, nodes = [], [], {}
        for i in range(n_nodes):
            cam_pose = np.eye(4)
            cam_pose[2, 3] = 1.0 * i          # optical frame: +z forward
            robot_pose = cam_pose @ np.linalg.inv(local_t)
            gt_poses.append(robot_pose)

            Tcw = np.linalg.inv(cam_pose)
            kpts, kpts3d, words = [], [], []
            for w_id, X in enumerate(pts_w, start=1):
                p = Tcw[:3, :3] @ X + Tcw[:3, 3]
                if p[2] < 1.0:
                    continue
                u = f * p[0] / p[2] + cx
                v = f * p[1] / p[2] + cy
                if not (0 <= u < cam.width and 0 <= v < cam.height):
                    continue
                words.append((w_id, len(kpts)))
                kpts.append([u, v, 1.0])
                p_robot = local_t[:3, :3] @ p + local_t[:3, 3]
                kpts3d.append(p_robot)

            noisy = robot_pose.copy()
            if i > 0:
                noisy[:3, 3] += rng.normal(0, pose_noise, 3)
                if drift:
                    # cumulative random walk: the LC-disabled drifted
                    # regime (low-frequency error windowed BA cannot fix)
                    walk = getattr(self, "_walk", np.zeros(3))
                    walk = walk + rng.normal(0, drift, 3)
                    self._walk = walk
                    noisy[:3, 3] += walk
            else:
                self._walk = np.zeros(3)
            noisy_poses.append(noisy)

            frame = Frame(kpts=np.asarray(kpts, np.float32),
                          kpts3d=np.asarray(kpts3d, np.float32))
            node = Node(i + 1, 0, 0, noisy.astype(np.float32), frame)
            node.words = sorted(words)
            nodes[i + 1] = node

        mapper = SimpleNamespace(nodes=nodes)
        return mapper, gt_poses, noisy_poses

    def test_extract_window_tracks(self, kitti_camera):
        from tpuslam.mapping.ba_window import extract_window
        mapper, _, _ = self._fake_mapper(kitti_camera)
        win = extract_window(mapper, list(mapper.nodes), kitti_camera)
        assert win is not None
        assert win.n_landmarks > 50
        assert win.obs_valid.sum() >= 2 * win.n_landmarks * 0.8
        # every valid obs indexes a real camera/landmark
        ov = win.obs_valid
        assert (win.obs_cam[ov] < len(win.node_ids)).all()
        assert (win.obs_lm[ov] < win.n_landmarks).all()

    def test_refine_trajectory_improves(self, kitti_camera):
        from tpuslam.mapping.ba_window import refine_trajectory_ba
        mapper, gt, noisy = self._fake_mapper(kitti_camera)
        poses = {nid: mapper.nodes[nid].pose for nid in mapper.nodes}
        refined = refine_trajectory_ba(mapper, poses, kitti_camera,
                                       window=6, stride=3, iterations=10)
        before = max(np.linalg.norm(noisy[i][:3, 3] - gt[i][:3, 3])
                     for i in range(len(gt)))
        after = max(np.linalg.norm(refined[i + 1][:3, 3] - gt[i][:3, 3])
                    for i in range(len(gt)))
        assert after < before * 0.5, (before, after)

    def test_global_ba_strictly_improves_drifted(self, kitti_camera):
        """The drifted (loop-closure-disabled) regime: global BA over
        word tracks must STRICTLY improve a random-walk-drifted
        trajectory (the reference's -lc 0 operating point; promotes
        tools/demo_ba_loop.py's win case into the suite), and stay a
        near-no-op on the clean one (the acceptance gate's job)."""
        from tpuslam.geometry.kitti_metric import ate_rmse
        from tpuslam.mapping.ba_window import refine_trajectory_global_ba
        mapper, gt, noisy = self._fake_mapper(
            kitti_camera, n_nodes=20, pose_noise=0.0, seed=2,
            drift=0.05)
        poses = {nid: mapper.nodes[nid].pose for nid in mapper.nodes}
        gt_arr = np.stack(gt)
        drift_arr = np.stack([poses[i + 1] for i in range(len(gt))])
        ate_drift = ate_rmse(gt_arr, drift_arr)
        refined = refine_trajectory_global_ba(mapper, poses,
                                              kitti_camera)
        ba_arr = np.stack([refined[i + 1] for i in range(len(gt))])
        ate_ba = ate_rmse(gt_arr, ba_arr)
        assert ate_ba < 0.3 * ate_drift, \
            f"global BA did not fix drift: {ate_drift:.3f} -> {ate_ba:.3f}"

        # clean trajectory: gate keeps BA a near-no-op
        mapper2, gt2, _ = self._fake_mapper(
            kitti_camera, n_nodes=20, pose_noise=0.0, seed=3)
        poses2 = {nid: mapper2.nodes[nid].pose for nid in mapper2.nodes}
        refined2 = refine_trajectory_global_ba(mapper2, poses2,
                                               kitti_camera)
        gt2_arr = np.stack(gt2)
        clean = ate_rmse(gt2_arr,
                         np.stack([poses2[i + 1]
                                   for i in range(len(gt2))]))
        after2 = ate_rmse(gt2_arr,
                          np.stack([refined2[i + 1]
                                    for i in range(len(gt2))]))
        assert after2 <= clean + 0.02, (clean, after2)
