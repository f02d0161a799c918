"""Tests for the batched EPnP + RANSAC + LM solver."""

import cv2
import numpy as np
import jax.numpy as jnp

from tpuslam.kernels import pnp


K = np.array([[718.856, 0.0, 607.1928],
              [0.0, 718.856, 185.2157],
              [0.0, 0.0, 1.0]], np.float32)  # KITTI seq 00 P0 intrinsics


def make_scene(rng, n=200, outlier_frac=0.3, noise=0.5):
    pts = np.stack([
        rng.uniform(-10, 10, n),
        rng.uniform(-5, 5, n),
        rng.uniform(5, 40, n),
    ], axis=1).astype(np.float32)
    rvec_gt = np.array([0.02, -0.03, 0.01], np.float32)
    tvec_gt = np.array([0.3, -0.1, 0.8], np.float32)
    R, _ = cv2.Rodrigues(rvec_gt)
    proj, _ = cv2.projectPoints(pts, rvec_gt, tvec_gt, K, None)
    img = proj.reshape(-1, 2) + rng.normal(0, noise, (n, 2))
    n_out = int(n * outlier_frac)
    idx = rng.choice(n, n_out, replace=False)
    img[idx] += rng.uniform(30, 200, (n_out, 2)) * rng.choice([-1, 1], (n_out, 2))
    return pts, img.astype(np.float32), rvec_gt, tvec_gt, idx


class TestRodrigues:
    def test_roundtrip_matches_opencv(self, rng):
        for _ in range(20):
            # stay away from theta ~= pi where the axis sign is ambiguous
            axis = rng.normal(0, 1, 3)
            axis /= np.linalg.norm(axis)
            rv = (axis * rng.uniform(0.01, 2.8)).astype(np.float64)
            R_cv, _ = cv2.Rodrigues(rv)
            R_ours = np.asarray(pnp.rodrigues(jnp.asarray(rv)))
            np.testing.assert_allclose(R_ours, R_cv, atol=1e-5)
            rv_back = np.asarray(pnp.rodrigues_inv(jnp.asarray(R_cv)))
            np.testing.assert_allclose(rv_back, rv, atol=1e-4)

    def test_small_angle(self):
        rv = np.array([1e-10, 0, 0])
        R = np.asarray(pnp.rodrigues(jnp.asarray(rv)))
        np.testing.assert_allclose(R, np.eye(3), atol=1e-9)


class TestEPnP:
    def test_minimal_noise_free(self, rng):
        pts, img, rvec_gt, tvec_gt, _ = make_scene(rng, n=6,
                                                   outlier_frac=0.0,
                                                   noise=0.0)
        R, t, ok = pnp.epnp(jnp.asarray(pts), jnp.asarray(img),
                            jnp.asarray(K))
        assert bool(ok)
        R_gt, _ = cv2.Rodrigues(rvec_gt)
        np.testing.assert_allclose(np.asarray(R), R_gt, atol=1e-3)
        np.testing.assert_allclose(np.asarray(t), tvec_gt, atol=1e-2)

    def test_matches_opencv_epnp(self, rng):
        pts, img, _, _, _ = make_scene(rng, n=12, outlier_frac=0.0,
                                       noise=0.0)
        ok_cv, rvec_cv, tvec_cv = cv2.solvePnP(
            pts, img, K, None, flags=cv2.SOLVEPNP_EPNP)
        R_cv, _ = cv2.Rodrigues(rvec_cv)
        R, t, ok = pnp.epnp(jnp.asarray(pts), jnp.asarray(img),
                            jnp.asarray(K))
        np.testing.assert_allclose(np.asarray(R), R_cv, atol=1e-3)
        np.testing.assert_allclose(np.asarray(t), tvec_cv.ravel(), atol=1e-2)


class TestRansac:
    def test_rejects_outliers(self, rng):
        pts, img, rvec_gt, tvec_gt, out_idx = make_scene(rng)
        rvec, tvec, inliers = pnp.solve_pnp_ransac(
            pts, img, K, np.zeros(3, np.float32), np.zeros(3, np.float32))
        assert len(inliers) >= 100
        # no outliers survive
        assert not set(inliers) & set(out_idx)
        np.testing.assert_allclose(rvec, rvec_gt, atol=5e-3)
        np.testing.assert_allclose(tvec, tvec_gt, atol=5e-2)

    def test_failure_returns_guess(self, rng):
        pts = rng.uniform(-1, 1, (5, 3)).astype(np.float32)
        img = rng.uniform(0, 100, (5, 2)).astype(np.float32)
        rv0 = np.array([1, 2, 3], np.float32)
        tv0 = np.array([4, 5, 6], np.float32)
        rvec, tvec, inl = pnp.solve_pnp_ransac(pts, img, K, rv0, tv0)
        np.testing.assert_array_equal(rvec, rv0)
        assert len(inl) == 0


class TestRefine:
    def test_lm_converges(self, rng):
        pts, img, rvec_gt, tvec_gt, _ = make_scene(rng, n=100,
                                                   outlier_frac=0.0,
                                                   noise=0.0)
        w = np.ones(100, np.float32)
        rv0 = rvec_gt + 0.05
        tv0 = tvec_gt + 0.2
        rv, tv = pnp.refine_lm(jnp.asarray(pts), jnp.asarray(img),
                               jnp.asarray(w), jnp.asarray(K),
                               jnp.asarray(rv0), jnp.asarray(tv0))
        np.testing.assert_allclose(np.asarray(rv), rvec_gt, atol=1e-4)
        np.testing.assert_allclose(np.asarray(tv), tvec_gt, atol=1e-3)

    def test_pallas_refine_matches_xla(self, rng):
        """The one-kernel Pallas LM (interpret mode) must track the XLA
        refine_lm_with_errors iterate-for-iterate to f32 rounding: same
        analytic normal equations, same accept/reject rule, different
        reduce orders only (kernels/pnp.py refine_lm_errors_pallas)."""
        pts, img, rvec_gt, tvec_gt, _ = make_scene(rng, n=300,
                                                   outlier_frac=0.0,
                                                   noise=0.3)
        w = (rng.uniform(size=300) < 0.7).astype(np.float32)
        m = w > 0
        rv0 = jnp.asarray(rvec_gt + 0.05)
        tv0 = jnp.asarray(tvec_gt + 0.3)
        args = (jnp.asarray(pts), jnp.asarray(img), jnp.asarray(w),
                jnp.asarray(m), jnp.asarray(K), rv0, tv0)
        rv_a, tv_a, err_a = pnp.refine_lm_with_errors(*args)
        rv_b, tv_b, err_b = pnp.refine_lm_errors_pallas(*args,
                                                        interpret=True)
        np.testing.assert_allclose(np.asarray(rv_a), np.asarray(rv_b),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(tv_a), np.asarray(tv_b),
                                   atol=1e-4)
        # same inlier set at the VO's pixel threshold
        np.testing.assert_array_equal(np.asarray(err_a) <= 2.0,
                                      np.asarray(err_b) <= 2.0)
        # padded rows (N=300 -> 384) masked to BIG and dropped
        assert err_b.shape == (300,)
