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
