"""Sliding-window bundle adjustment with Schur complement on TPU.

The reference has no BA — its back-end is pose-graph-only LM
(/root/reference/src/slam/src/core/HyperGraph.cpp, SURVEY.md §2.7 item
5 calls distributed BA "new design territory").  This module adds the
windowed refinement stage the north-star configs 2/4/5 ask for,
designed TPU-first:

  * fixed-capacity observation arrays (O observations of L landmarks
    from W keyframe cameras) — static shapes, masked validity;
  * analytic per-observation Jacobians batched with vmap;
  * the normal equations are assembled as DENSE camera-landmark blocks
    (H_cc (6W,6W), H_cl (6W,3L) via segment-sum scatter) — at SLAM
    window sizes these are MXU-sized matmuls, not sparse graphs;
  * landmarks eliminated by the Schur complement: H_ll is (L,3,3)
    block-diagonal, inverted batched; the reduced camera system solves
    on one chip (6W x 6W is tiny);
  * scaling: the Schur reduction is separable over landmarks, so the
    landmark axis shards over the device mesh and partial reductions
    meet in one psum (see dist/mesh.py sharded_ba_step).

Gauge: camera 0 of the window is held fixed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def project(Tcw: jnp.ndarray, X: jnp.ndarray, intr: jnp.ndarray):
    """Pinhole projection of world point X by cam-from-world pose."""
    p = Tcw[:3, :3] @ X + Tcw[:3, 3]
    z = jnp.maximum(p[2], 1e-6)
    u = intr[0] * p[0] / z + intr[2]
    v = intr[1] * p[1] / z + intr[3]
    return jnp.stack([u, v]), p


def _obs_residual_jac(Tcw, X, uv, intr):
    """Residual (2,) + Jacobians wrt camera se3 twist (2,6) and landmark
    (2,3).  Camera update convention: Tcw <- exp([w, t]) * Tcw."""
    (proj_uv, p) = project(Tcw, X, intr)
    r = proj_uv - uv
    x, y, z = p[0], p[1], jnp.maximum(p[2], 1e-6)
    zi = 1.0 / z
    fx, fy = intr[0], intr[1]
    # d(u,v)/dp in camera frame
    J_p = jnp.array([[fx * zi, 0.0, -fx * x * zi * zi],
                     [0.0, fy * zi, -fy * y * zi * zi]])
    # dp/d(twist): translation part I, rotation part -[p]x
    px = jnp.array([[0, -p[2], p[1]], [p[2], 0, -p[0]],
                    [-p[1], p[0], 0.]])
    J_c = jnp.concatenate([J_p @ (-px), J_p], axis=1)  # (2,6) [w, t]
    J_l = J_p @ Tcw[:3, :3]                            # (2,3)
    return r, J_c, J_l


def _huber_w(r2, delta):
    """Huber IRLS weight for squared residual norm."""
    rn = jnp.sqrt(r2 + 1e-12)
    return jnp.where(rn <= delta, 1.0, delta / rn)


@functools.partial(jax.jit, static_argnames=("n_cams", "n_lms"))
def ba_normal_equations(Tcw, lms, intr, obs_cam, obs_lm, obs_uv,
                        obs_valid, n_cams, n_lms,
                        huber_delta=jnp.inf):
    """Assemble the BA normal equations.

    Returns (H_cc (6W,6W), b_c (6W,), H_cl (6W,3L), H_ll (L,3,3),
    b_l (L,3), cost).  Separable over observations -> shardable.
    """
    def per_obs(ci, li, uv, valid):
        r, J_c, J_l = _obs_residual_jac(Tcw[ci], lms[li], uv, intr)
        # cheirality: a landmark wandering behind the camera would blow
        # up the f32 normal equations through the 1/z terms — mask it
        z = Tcw[ci, 2, :3] @ lms[li] + Tcw[ci, 2, 3]
        valid = valid * (z > 0.1)
        w = _huber_w(jnp.sum(r * r), huber_delta) * valid
        return r, J_c * jnp.sqrt(w), J_l * jnp.sqrt(w), w * jnp.sum(r * r)

    r, J_c, J_l, cost = jax.vmap(per_obs)(
        obs_cam, obs_lm, obs_uv, obs_valid.astype(jnp.float32))
    rw = r * jnp.where(obs_valid[:, None], 1.0, 0.0)

    # camera blocks, scattered by observation camera index
    Hc_blocks = jnp.einsum("oki,okj->oij", J_c, J_c)       # (O,6,6)
    bc_blocks = jnp.einsum("oki,ok->oi", J_c, rw)          # (O,6)
    H_cc_diag = jax.ops.segment_sum(Hc_blocks, obs_cam, n_cams)
    b_c = jax.ops.segment_sum(bc_blocks, obs_cam, n_cams)

    # landmark blocks
    Hl_blocks = jnp.einsum("oki,okj->oij", J_l, J_l)       # (O,3,3)
    bl_blocks = jnp.einsum("oki,ok->oi", J_l, rw)          # (O,3)
    H_ll = jax.ops.segment_sum(Hl_blocks, obs_lm, n_lms)
    b_l = jax.ops.segment_sum(bl_blocks, obs_lm, n_lms)

    # cross terms: dense (W, L, 6, 3) is too big; scatter into (6W,3L)
    Hcl_blocks = jnp.einsum("oki,okj->oij", J_c, J_l)      # (O,6,3)
    flat_idx = obs_cam * n_lms + obs_lm
    H_cl = jax.ops.segment_sum(
        Hcl_blocks, flat_idx, n_cams * n_lms)              # (W*L,6,3)
    H_cl = H_cl.reshape(n_cams, n_lms, 6, 3)

    return (H_cc_diag, b_c, H_cl, H_ll, b_l,
            jnp.sum(cost))


def _inv3x3(M):
    """Batched closed-form 3x3 inverse (adjugate/det) — f32-robust where
    batched LU can emit NaNs on ill-conditioned blocks."""
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    d, e, f = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    g, h, i = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    A = e * i - f * h
    B = c * h - b * i
    C = b * f - c * e
    D = f * g - d * i
    E = a * i - c * g
    F = c * d - a * f
    G = d * h - e * g
    H = b * g - a * h
    K = a * e - b * d
    det = a * A + d * B + g * C
    det = jnp.where(jnp.abs(det) < 1e-20, 1e-20, det)
    adj = jnp.stack([jnp.stack([A, B, C], -1), jnp.stack([D, E, F], -1),
                     jnp.stack([G, H, K], -1)], -2)
    return adj / det[..., None, None]


def _se3_exp(tw):
    """Exponential map of [w (3,), t (3,)] -> 4x4 (first-order-exact
    rotation via Rodrigues; translation coupled through V)."""
    w = tw[:3]
    t = tw[3:]
    th = jnp.linalg.norm(w) + 1e-12
    k = w / th
    Kx = jnp.array([[0., -k[2], k[1]], [k[2], 0., -k[0]],
                    [-k[1], k[0], 0.]])
    R = jnp.eye(3) + jnp.sin(th) * Kx + (1 - jnp.cos(th)) * (Kx @ Kx)
    A = jnp.sin(th) / th
    B = (1 - jnp.cos(th)) / (th * th)
    C = (1 - A) / (th * th)
    V = jnp.eye(3) + B * Kx + C * (Kx @ Kx)
    T = jnp.eye(4)
    T = T.at[:3, :3].set(R)
    T = T.at[:3, 3].set(V @ t)
    return T


@functools.partial(jax.jit, static_argnames=("n_cams", "n_lms",
                                              "iterations", "n_fixed"))
def ba_solve(Tcw, lms, intr, obs_cam, obs_lm, obs_uv, obs_valid,
             n_cams, n_lms, iterations=5, damping=1e-4,
             huber_delta=jnp.inf, n_fixed=1):
    """Windowed BA: Gauss-Newton with Schur elimination of landmarks.

    The first `n_fixed` cameras are gauge-fixed (use 2 for monocular
    problems to pin scale; 1 suffices when landmarks carry metric
    scale, e.g. stereo-triangulated).  Returns (Tcw', lms', cost).
    """
    def eval_cost(Tcw, lms):
        def one(ci, li, uv, valid):
            r, _, _ = _obs_residual_jac(Tcw[ci], lms[li], uv, intr)
            z = Tcw[ci, 2, :3] @ lms[li] + Tcw[ci, 2, 3]
            w = _huber_w(jnp.sum(r * r), huber_delta) * valid * (z > 0.1)
            return w * jnp.sum(r * r)
        return jnp.sum(jax.vmap(one)(obs_cam, obs_lm, obs_uv,
                                     obs_valid.astype(jnp.float32)))

    def step(carry, _):
        Tcw, lms, lam, cost_prev = carry
        H_cc_diag, b_c, H_cl, H_ll, b_l, _ = ba_normal_equations(
            Tcw, lms, intr, obs_cam, obs_lm, obs_uv, obs_valid,
            n_cams, n_lms, huber_delta)

        # LM: relative damping on landmark blocks and camera diagonal
        tr = jnp.trace(H_ll, axis1=1, axis2=2) / 3.0
        lam_l = (lam * tr + 1e-3)[:, None, None] * jnp.eye(3)[None]
        Hll_inv = _inv3x3(H_ll + lam_l)                     # (L,3,3)

        # reduced camera system: S = Hcc - sum_j Wj Hll_j^-1 Wj^T
        # (separable over landmarks -> this pair of einsums is the part
        # that shards over the mesh with one psum)
        WHinv = jnp.einsum("wlij,ljk->wlik", H_cl, Hll_inv)  # (W,L,6,3)
        S_corr = jnp.einsum("wlik,vljk->wvij", WHinv, H_cl)  # (W,W,6,6)
        b_corr = jnp.einsum("wlik,lk->wi", WHinv, b_l)       # (W,6)

        diag_damp = jax.vmap(
            lambda Hb: jnp.diag(lam * jnp.diag(Hb) + 1e-6))(H_cc_diag)
        S = -S_corr
        S = S.at[jnp.arange(n_cams), jnp.arange(n_cams)].add(
            H_cc_diag + diag_damp)
        S = S.transpose(0, 2, 1, 3).reshape(6 * n_cams, 6 * n_cams)
        rhs = (b_c - b_corr).reshape(-1)

        # gauge: fix the first n_fixed cameras
        mask = jnp.ones(6 * n_cams).at[:6 * n_fixed].set(0.0)
        S = S * mask[:, None] * mask[None, :] + jnp.diag(1.0 - mask)
        rhs = rhs * mask

        dx_c = -jnp.linalg.solve(S, rhs).reshape(n_cams, 6)

        # back-substitute landmarks:
        # dx_l = -Hll^-1 (b_l + H_lc dx_c)
        Hlc_dx = jnp.einsum("wlij,wi->lj", H_cl, dx_c)       # (L,3)
        dx_l = -jnp.einsum("lij,lj->li", Hll_inv, b_l + Hlc_dx)

        Tcw_try = jax.vmap(lambda T, d: _se3_exp(d) @ T)(Tcw, dx_c)
        lms_try = lms + dx_l
        cost_try = eval_cost(Tcw_try, lms_try)

        accept = cost_try < cost_prev
        Tcw_new = jnp.where(accept, Tcw_try, Tcw)
        lms_new = jnp.where(accept, lms_try, lms)
        lam_new = jnp.where(accept, jnp.maximum(lam * 0.3, 1e-7),
                            jnp.minimum(lam * 5.0, 1e3))
        cost_new = jnp.where(accept, cost_try, cost_prev)
        return (Tcw_new, lms_new, lam_new, cost_new), cost_new

    cost0 = eval_cost(Tcw, lms)
    (Tcw, lms, _, final_cost), _ = jax.lax.scan(
        step, (Tcw, lms, jnp.float32(damping), cost0), None,
        length=iterations)
    return Tcw, lms, final_cost
