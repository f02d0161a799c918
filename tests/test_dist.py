"""First-party coverage of the sharded (multi-chip) code paths on the
8-device virtual CPU mesh — VERDICT r1 item 4: the dist code must be
tested in-repo at realistic shapes, not only by the driver dryrun.

Every test asserts the sharded computation equals (to f32 reduction
tolerance) its unsharded twin.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tpuslam.config import StereoBMConfig
from tpuslam.dist.mesh import (make_mesh, sharded_frontend_step,
                               sharded_pose_graph_step, pad_edges,
                               shard_ba_problem, make_sharded_ba_step,
                               frontend_one)
from tpuslam.optim import device as dev
from tpuslam.optim import pose_graph as PG
from tpuslam.optim.ba import ba_solve

from test_optim import make_noisy_loop, rand_se3


N_DEV = 8


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= N_DEV, "conftest must set 8 CPU devices"
    return make_mesh(N_DEV)


class TestShardedFrontend:
    def test_matches_unsharded_kitti_shape(self, mesh, rng):
        """8 KITTI-geometry frames sharded over 8 devices == the
        per-frame kernels run unsharded (speckle off: the CC while_loop
        at 376x1241 x8 is pathologically slow on the CPU test backend)."""
        from tpuslam.kernels.stereo_bm_pallas import stereo_bm_auto
        from tpuslam.kernels.gftt import gftt_response
        from tpuslam.kernels.orb import orb_blur
        B, h, w = N_DEV, 376, 1241
        lefts = rng.integers(0, 256, (B, h, w), dtype=np.uint8)
        rights = np.ascontiguousarray(
            np.roll(lefts, 7, axis=2))  # correlated pair -> real disparity
        cfg = StereoBMConfig()
        fe = sharded_frontend_step(mesh, cfg, with_speckle=False)
        disp_s, eig_s, blur_s = jax.device_get(
            fe(jnp.asarray(lefts), jnp.asarray(rights)))
        assert disp_s.shape == (B, h, w)

        for i in (0, 3, 7):  # spot-check three shards
            d = jax.device_get(stereo_bm_auto(
                jnp.asarray(lefts[i]), jnp.asarray(rights[i]), cfg,
                with_speckle=False))
            e = jax.device_get(gftt_response(jnp.asarray(lefts[i])))
            b = jax.device_get(orb_blur(jnp.asarray(lefts[i])))
            np.testing.assert_array_equal(disp_s[i], d)
            np.testing.assert_allclose(eig_s[i], e, rtol=1e-6, atol=1e-7)
            np.testing.assert_allclose(blur_s[i], b, atol=0)

    def test_speckle_path_shards(self, mesh, rng):
        """The full frontend_one (speckle CC while_loop included) runs
        under shard_map — regression for the replicated-vs-varying carry
        type mismatch in the speckle while_loop."""
        B, h, w = N_DEV, 64, 256
        lefts = rng.integers(0, 256, (B, h, w), dtype=np.uint8)
        rights = np.ascontiguousarray(np.roll(lefts, 5, axis=2))
        cfg = StereoBMConfig(num_disparities=16, block_size=9)
        fe = sharded_frontend_step(mesh, cfg, with_speckle=True)
        disp_s, _, _ = jax.device_get(
            fe(jnp.asarray(lefts), jnp.asarray(rights)))
        d0, _, _ = jax.device_get(frontend_one(
            jnp.asarray(lefts[0]), jnp.asarray(rights[0]), cfg))
        np.testing.assert_array_equal(disp_s[0], d0)


def _graph_arrays(n=200):
    rng = np.random.default_rng(3)
    _, poses, links = make_noisy_loop(rng, n=n)
    ids, pose_arr, e_from, e_to, Z, Omega, free_idx = \
        dev.graph_to_arrays(poses, links)
    return poses, links, ids, pose_arr, e_from, e_to, Z, Omega, free_idx


class TestShardedPoseGraph:
    def test_sharded_lm_matches_single_device(self, mesh):
        """Edge-sharded LM == replicated lm_solve on a 200-vertex graph."""
        (_, _, ids, pose_arr, e_from, e_to, Z, Omega,
         free_idx) = _graph_arrays(200)
        n_vert = len(ids)
        n_free = n_vert - 1
        iters = 5

        ref_poses, ref_chis = dev.lm_solve(
            jnp.asarray(pose_arr), jnp.asarray(e_from), jnp.asarray(e_to),
            jnp.asarray(Z), jnp.asarray(Omega), jnp.asarray(free_idx),
            n_free, iterations=iters)

        ef, et, Zp, Op = pad_edges(e_from, e_to, Z, Omega, N_DEV)
        pg = sharded_pose_graph_step(mesh, n_vert, n_free,
                                     iterations=iters)
        out_poses, chis = pg(jnp.asarray(pose_arr), jnp.asarray(ef),
                             jnp.asarray(et), jnp.asarray(Zp),
                             jnp.asarray(Op), jnp.asarray(free_idx))
        np.testing.assert_allclose(np.asarray(chis),
                                   np.asarray(ref_chis), rtol=2e-3)
        np.testing.assert_allclose(np.asarray(out_poses)[:, :3, 3],
                                   np.asarray(ref_poses)[:, :3, 3],
                                   atol=2e-2)

    def test_device_lm_matches_host_twin(self):
        """lm_solve (f32, device assembly quirks) reproduces the host
        PoseGraphOptimizer trajectories on a 200-vertex loop graph."""
        poses, links, ids, pose_arr, e_from, e_to, Z, Omega, free_idx = \
            _graph_arrays(200)
        host_opt, host_chi = PG.run_optimize(poses, links, 10)
        dev_opt, dev_chi = PG.run_optimize(poses, links, 10,
                                           backend="device")
        host_t = np.stack([host_opt[v][:3, 3] for v in sorted(host_opt)])
        dev_t = np.stack([dev_opt[v][:3, 3] for v in sorted(dev_opt)])
        # f32 vs f64 over 10 LM iterations on a 40m loop
        np.testing.assert_allclose(dev_t, host_t, atol=5e-2)
        assert abs(dev_chi - host_chi) / (host_chi + 1e-9) < 0.1

    def test_robust_device_backend_ejects_outlier(self):
        from tpuslam.mapping.graph import Link, LOOP_CLOSURE
        rng = np.random.default_rng(5)
        gt, poses, links = make_noisy_loop(rng, n=60)
        bad = np.eye(4, dtype=np.float32)
        bad[:3, 3] = [25.0, -13.0, 8.0]
        links.insert(30, Link(30, 5, LOOP_CLOSURE, bad,
                              np.eye(6) * 100.0))
        opt, _ = PG.run_optimize_robust(poses, links, 20,
                                        backend="device")
        err = np.linalg.norm(opt[len(gt)][:3, 3] - gt[-1][:3, 3])
        assert err < 0.5, f"endpoint err {err}"


    def test_sparse_lm_matches_dense(self, mesh):
        """The structure-aware solver (block-Thomas + Woodbury extras,
        O(V) collective payload) == dense lm_solve, replicated and
        edge-sharded, including forward loop closures that land in the
        extras path."""
        from tpuslam.mapping.graph import Link, LOOP_CLOSURE
        from tpuslam.dist.mesh import sharded_pose_graph_step_sparse
        rng = np.random.default_rng(9)
        _, poses, links = make_noisy_loop(rng, n=120)
        # forward LC (to > from): exercises the Woodbury extras path
        fwd = np.eye(4, dtype=np.float32)
        fwd[:3, 3] = [0.5, 0.1, -0.2]
        links.insert(10, Link(10, 90, LOOP_CLOSURE, fwd, np.eye(6) * 2.0))
        ids, pose_arr, e_from, e_to, Z, Omega, free_idx = \
            dev.graph_to_arrays(poses, links)
        n_free = len(ids) - 1
        iters = 5

        ref_poses, ref_chis = dev.lm_solve(
            jnp.asarray(pose_arr), jnp.asarray(e_from), jnp.asarray(e_to),
            jnp.asarray(Z), jnp.asarray(Omega), jnp.asarray(free_idx),
            n_free, iterations=iters)

        xsel, xp, xq = dev.classify_extra_edges(e_from, e_to, free_idx)
        assert len(xp) >= 1          # the forward LC must be an extra
        sp_poses, sp_chis = dev.lm_solve_sparse(
            jnp.asarray(pose_arr), jnp.asarray(e_from), jnp.asarray(e_to),
            jnp.asarray(Z), jnp.asarray(Omega), jnp.asarray(free_idx),
            n_free, jnp.asarray(xsel), jnp.asarray(xp), jnp.asarray(xq),
            iterations=iters)
        np.testing.assert_allclose(np.asarray(sp_chis),
                                   np.asarray(ref_chis), rtol=2e-3)
        np.testing.assert_allclose(np.asarray(sp_poses)[:, :3, 3],
                                   np.asarray(ref_poses)[:, :3, 3],
                                   atol=2e-2)

        # edge-sharded: pad edges, shard xsel alongside
        ef, et, Zp, Op = pad_edges(e_from, e_to, Z, Omega, N_DEV)
        xsel_p = np.full(len(ef), -1, np.int32)
        xsel_p[:len(xsel)] = xsel
        pg = sharded_pose_graph_step_sparse(mesh, n_free,
                                            iterations=iters)
        out_poses, chis = pg(jnp.asarray(pose_arr), jnp.asarray(ef),
                             jnp.asarray(et), jnp.asarray(Zp),
                             jnp.asarray(Op), jnp.asarray(free_idx),
                             jnp.asarray(xsel_p), jnp.asarray(xp),
                             jnp.asarray(xq))
        np.testing.assert_allclose(np.asarray(chis),
                                   np.asarray(ref_chis), rtol=2e-3)
        np.testing.assert_allclose(np.asarray(out_poses)[:, :3, 3],
                                   np.asarray(ref_poses)[:, :3, 3],
                                   atol=2e-2)


def _ba_problem(W=8, L=256, O=2048, seed=0):
    """Random but well-posed windowed BA problem."""
    rng = np.random.default_rng(seed)
    intr = np.array([700.0, 700.0, 620.0, 188.0], np.float32)
    # cameras along +z, landmarks in front
    Tcw = np.tile(np.eye(4, dtype=np.float32), (W, 1, 1))
    for i in range(W):
        Tcw[i] = np.linalg.inv(
            rand_se3(rng, 0.02, 0.005) @
            np.diag([1.0, 1, 1, 1])) @ Tcw[i]
        Tcw[i, 2, 3] += -i * 0.5  # camera moves +z in world
    lms = np.stack([rng.uniform(-8, 8, L), rng.uniform(-3, 3, L),
                    rng.uniform(8, 30, L)], axis=1).astype(np.float32)
    obs_cam = rng.integers(0, W, O).astype(np.int32)
    obs_lm = rng.integers(0, L, O).astype(np.int32)
    # perfect projections + pixel noise, from PERTURBED geometry so the
    # solver has something to do
    uv = np.zeros((O, 2), np.float32)
    for k in range(O):
        T = Tcw[obs_cam[k]]
        p = T[:3, :3] @ lms[obs_lm[k]] + T[:3, 3]
        uv[k, 0] = intr[0] * p[0] / p[2] + intr[2]
        uv[k, 1] = intr[1] * p[1] / p[2] + intr[3]
    uv += rng.normal(0, 0.3, uv.shape).astype(np.float32)
    obs_valid = np.ones(O, bool)
    # perturb initial geometry
    lms0 = lms + rng.normal(0, 0.05, lms.shape).astype(np.float32)
    Tcw0 = Tcw.copy()
    for i in range(1, W):
        Tcw0[i] = rand_se3(rng, 0.02, 0.004).astype(np.float32) @ Tcw0[i]
    return intr, Tcw0, lms0, obs_cam, obs_lm, uv, obs_valid


class TestShardedBA:
    def test_sharded_ba_matches_single_device(self, mesh):
        intr, Tcw0, lms0, obs_cam, obs_lm, uv, obs_valid = _ba_problem()
        W, L = Tcw0.shape[0], lms0.shape[0]
        iters = 6

        ref_T, ref_lms, ref_cost = ba_solve(
            jnp.asarray(Tcw0), jnp.asarray(lms0), jnp.asarray(intr),
            jnp.asarray(obs_cam), jnp.asarray(obs_lm), jnp.asarray(uv),
            jnp.asarray(obs_valid), n_cams=W, n_lms=L,
            iterations=iters, huber_delta=4.0)

        (lms_p, oc, ol, uvp, ov, L_local, O_local) = shard_ba_problem(
            lms0, obs_cam, obs_lm, uv, obs_valid, N_DEV)
        step = make_sharded_ba_step(mesh, W, L_local, iterations=iters,
                                    huber_delta=4.0)
        out_T, out_lms, out_cost = step(
            jnp.asarray(Tcw0), jnp.asarray(lms_p), jnp.asarray(intr),
            jnp.asarray(oc), jnp.asarray(ol), jnp.asarray(uvp),
            jnp.asarray(ov))

        np.testing.assert_allclose(float(out_cost), float(ref_cost),
                                   rtol=5e-2)
        np.testing.assert_allclose(np.asarray(out_T)[:, :3, 3],
                                   np.asarray(ref_T)[:, :3, 3],
                                   atol=5e-3)

    def test_sharded_ba_reduces_cost(self, mesh):
        intr, Tcw0, lms0, obs_cam, obs_lm, uv, obs_valid = _ba_problem(
            seed=7)
        W = Tcw0.shape[0]
        (lms_p, oc, ol, uvp, ov, L_local, _) = shard_ba_problem(
            lms0, obs_cam, obs_lm, uv, obs_valid, N_DEV)
        step = make_sharded_ba_step(mesh, W, L_local, iterations=8,
                                    huber_delta=4.0)
        zero_step = make_sharded_ba_step(mesh, W, L_local, iterations=0,
                                         huber_delta=4.0)
        _, _, cost0 = zero_step(
            jnp.asarray(Tcw0), jnp.asarray(lms_p), jnp.asarray(intr),
            jnp.asarray(oc), jnp.asarray(ol), jnp.asarray(uvp),
            jnp.asarray(ov))
        _, _, cost = step(
            jnp.asarray(Tcw0), jnp.asarray(lms_p), jnp.asarray(intr),
            jnp.asarray(oc), jnp.asarray(ol), jnp.asarray(uvp),
            jnp.asarray(ov))
        assert float(cost) < float(cost0) * 0.2
