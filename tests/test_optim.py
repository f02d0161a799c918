"""Pose-graph optimizer tests: Jacobians vs numerical differentiation,
LM convergence, robust outlier ejection."""

import numpy as np

from tpuslam.geometry import transform as T
from tpuslam.mapping.graph import Link, MultiMap, NEIGHBOR, LOOP_CLOSURE
from tpuslam.optim import pose_graph as PG


def rand_se3(rng, t_scale=1.0, r_scale=0.3):
    rvec = rng.normal(0, r_scale, 3)
    angle = np.linalg.norm(rvec)
    m = np.eye(4)
    if angle > 1e-12:
        k = rvec / angle
        K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
        m[:3, :3] = np.eye(3) + np.sin(angle) * K + \
            (1 - np.cos(angle)) * (K @ K)
    m[:3, 3] = rng.normal(0, t_scale, 3)
    return m


class TestJacobians:
    def test_analytic_matches_numeric(self, rng):
        """Ji/Jj vs numeric differentiation of the error through oplus."""
        for _ in range(5):
            Xi = rand_se3(rng)[None]
            Xj = rand_se3(rng)[None]
            # measurement near the actual relative pose => small error,
            # where the qw>0 domain of the gradient holds
            Z = (np.linalg.inv(Xi[0]) @ Xj[0] @
                 rand_se3(rng, 0.05, 0.02))[None]
            Ji, Jj = PG.compute_jacobians(Z, Xi, Xj)

            def err(dxi, dxj):
                Xi_p = PG._oplus(Xi[0], dxi)[None]
                Xj_p = PG._oplus(Xj[0], dxj)[None]
                return PG.compute_errors(np.linalg.inv(Z), Xi_p, Xj_p)[0]

            eps = 1e-7
            num_Ji = np.zeros((6, 6))
            num_Jj = np.zeros((6, 6))
            z6 = np.zeros(6)
            for k in range(6):
                d = np.zeros(6)
                d[k] = eps
                num_Ji[:, k] = (err(d, z6) - err(-d, z6)) / (2 * eps)
                num_Jj[:, k] = (err(z6, d) - err(z6, -d)) / (2 * eps)

            np.testing.assert_allclose(Ji[0], num_Ji, atol=5e-5)
            np.testing.assert_allclose(Jj[0], num_Jj, atol=5e-5)


def make_noisy_loop(rng, n=40, noise_t=0.05, noise_r=0.01):
    """Circular trajectory with odometry noise + one exact LC closing it."""
    step_angle = 2 * np.pi / n
    gt = [np.eye(4)]
    step = np.eye(4)
    step[:3, :3] = np.array([
        [np.cos(step_angle), 0, np.sin(step_angle)],
        [0, 1, 0],
        [-np.sin(step_angle), 0, np.cos(step_angle)]])
    step[:3, 3] = [0, 0, 1.0]
    for _ in range(n - 1):
        gt.append(gt[-1] @ step)

    poses = {1: gt[0].astype(np.float32)}
    links = MultiMap()
    info = np.eye(6) * 100.0
    cur = gt[0]
    for i in range(1, n):
        meas = np.linalg.inv(gt[i - 1]) @ gt[i] @ \
            rand_se3(rng, noise_t, noise_r)
        cur = cur @ meas
        poses[i + 1] = cur.astype(np.float32)
        links.insert(i, Link(i, i + 1, NEIGHBOR, meas.astype(np.float32),
                             info))
    # exact loop closure last -> first
    lc_meas = np.linalg.inv(gt[n - 1]) @ gt[0]
    links.insert(n, Link(n, 1, LOOP_CLOSURE, lc_meas.astype(np.float32),
                         np.eye(6) * 100.0))
    return gt, poses, links


class TestOptimize:
    def test_lm_reduces_error_and_closes_loop(self, rng):
        gt, poses, links = make_noisy_loop(rng)
        g = PG._build(poses, links, PG.OptimizerConfig())
        chi_before = g.compute_active_errors()
        opt, chi_after = PG.run_optimize(poses, links, 20)
        assert chi_after < chi_before * 0.05

        # optimized endpoint near GT despite drifted initialization
        drift = np.linalg.norm(poses[len(gt)][:3, 3] - gt[-1][:3, 3])
        err = np.linalg.norm(opt[len(gt)][:3, 3] - gt[-1][:3, 3])
        assert err < drift * 0.5
        assert err < 0.5, f"endpoint err {err}"

    def test_fixed_vertex_stays(self, rng):
        _, poses, links = make_noisy_loop(rng)
        opt, _ = PG.run_optimize(poses, links, 10)
        np.testing.assert_allclose(opt[1], poses[1], atol=1e-9)


class TestRobust:
    def test_bad_lc_edge_ejected(self, rng):
        gt, poses, links = make_noisy_loop(rng)
        # inject a wildly wrong loop closure (non-neighbor)
        bad = np.eye(4, dtype=np.float32)
        bad[:3, 3] = [25.0, -13.0, 8.0]
        links.insert(30, Link(30, 5, LOOP_CLOSURE, bad, np.eye(6) * 100.0))

        opt, chi = PG.run_optimize_robust(poses, links, 20)
        # with the bad edge ejected the solution still closes the loop
        err = np.linalg.norm(opt[len(gt)][:3, 3] - gt[-1][:3, 3])
        assert err < 0.5, f"endpoint err {err}"

    def test_good_graph_keeps_all_edges(self, rng):
        gt, poses, links = make_noisy_loop(rng)
        opt_r, chi = PG.run_optimize_robust(poses, links, 20)
        # nothing ejected: every pose still present and loop closed
        assert len(opt_r) == len(gt)
        err = np.linalg.norm(opt_r[len(gt)][:3, 3] - gt[-1][:3, 3])
        assert err < 0.5
