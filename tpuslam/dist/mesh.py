"""Device mesh setup and sharded step functions.

Shardings are expressed with `jax.sharding.Mesh` + `shard_map`, so the
same code runs on a real multi-chip slice (ICI collectives) or a virtual
CPU mesh (`--xla_force_host_platform_device_count=N`, the test/"fake
backend" configuration — SURVEY.md §4).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
try:
    from jax import shard_map as _shard_map  # jax >= 0.8

    def shard_map(f, mesh, in_specs, out_specs, check_rep=True):
        # jax 0.9 renamed check_rep -> check_vma
        return _shard_map(f, mesh=mesh, in_specs=in_specs,
                          out_specs=out_specs, check_vma=check_rep)
except ImportError:                         # pragma: no cover
    from jax.experimental.shard_map import shard_map

from ..kernels.stereo_bm import prefilter_xsobel
from ..kernels.stereo_bm_pallas import stereo_bm_auto as stereo_bm
from ..kernels.gftt import gftt_response
from ..kernels.orb import orb_blur
from ..config import StereoBMConfig
from ..optim import device as dev


def make_mesh(n_devices: int | None = None, axis: str = "frames") -> Mesh:
    devices = jax.devices()
    n = n_devices or len(devices)
    return Mesh(np.array(devices[:n]), (axis,))


def frontend_one(left: jnp.ndarray, right: jnp.ndarray,
                 cfg: StereoBMConfig = StereoBMConfig()):
    """Per-frame device front-end: disparity + corner response + blurred
    image for descriptors.  The unit that shards over frames."""
    disp = stereo_bm(left, right, cfg)
    eig = gftt_response(left)
    blurred = orb_blur(left)
    return disp, eig, blurred


def sharded_frontend_step(mesh: Mesh, cfg: StereoBMConfig | None = None,
                          with_speckle: bool = True):
    """Returns a jitted fn (B,H,W)x2 uint8 -> per-frame outputs, frames
    sharded over the mesh axis.  B must be divisible by mesh size."""
    cfg = cfg or StereoBMConfig()
    axis = mesh.axis_names[0]

    def per_shard(lefts, rights):
        def one(args):
            l, r = args
            d = stereo_bm(l, r, cfg, with_speckle=with_speckle)
            e = gftt_response(l)
            b = orb_blur(l)
            return d, e, b
        return jax.lax.map(one, (lefts, rights))

    fn = shard_map(per_shard, mesh=mesh,
                   in_specs=(P(axis), P(axis)),
                   out_specs=(P(axis), P(axis), P(axis)))
    return jax.jit(fn)


def sharded_pose_graph_step(mesh: Mesh, n_vertices: int, n_free: int,
                            iterations: int = 5, tau: float = 1e-5,
                            lower_step: float = 1.0 / 3.0,
                            upper_step: float = 2.0 / 3.0):
    """Returns a jitted LM step with EDGES sharded over the mesh: each
    device linearizes its edge shard into the partial quirk-layout normal
    equations (optim.device.lm_system — the reference's transposed /
    lower-triangle assembly, HyperGraph.cpp:174-208), one `psum` meets
    (A, b, chi2, max_diag) over ICI, and the replicated solve + oplus +
    gain-ratio lambda rescale (scaleLambda, HyperGraph.cpp:118-135) run
    identically on every device.  Semantics == optim.device.lm_solve ==
    the host PoseGraphOptimizer, up to f32 and reduction order.

    Edge count must be divisible by mesh size (pad with zero-information
    edges between vertex 0 and itself).
    """
    axis = mesh.axis_names[0]
    tau_f = jnp.float32(tau)
    lo = jnp.float32(lower_step)
    up = jnp.float32(upper_step)

    def step(poses, e_from, e_to, Z, Omega, free_idx):
        Z_inv = dev._se3_inv(Z)

        def body(carry, it):
            poses, lam = carry
            A, b, chi2, max_diag = dev.lm_system(
                poses, e_from, e_to, Z_inv, Z, Omega, n_free, free_idx)
            A, b, chi2 = jax.lax.psum((A, b, chi2), axis)
            max_diag = jax.lax.pmax(max_diag, axis)
            lam = jnp.where(it == 0, tau_f * max_diag, lam)

            L = jnp.tril(A)
            A_eff = L + L.T - jnp.diag(jnp.diag(A)) + \
                lam * jnp.eye(A.shape[0], dtype=A.dtype)
            x = jnp.linalg.solve(A_eff, b)
            upd = x.reshape(n_free, 6)
            full_upd = jnp.where((free_idx >= 0)[:, None],
                                 upd[jnp.clip(free_idx, 0)], 0.0)
            new_poses = dev._oplus_batch(poses, full_upd)

            err_after = dev.edge_errors(Z_inv, new_poses[e_from],
                                        new_poses[e_to])
            chi2_after = jax.lax.psum(
                jnp.einsum("ei,eij,ej->", err_after, Omega, err_after),
                axis)

            scale = x @ (lam * x + b) + 1e-3
            rho = (chi2 - chi2_after) / scale
            alpha = jnp.minimum(1.0 - (2.0 * rho - 1.0) ** 3, up)
            lam = lam * jnp.maximum(lo, alpha)
            return (new_poses, lam), chi2_after

        (poses, _), chis = jax.lax.scan(
            body, (poses, jnp.float32(0.0)), jnp.arange(iterations))
        return poses, chis

    fn = shard_map(
        step, mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis), P(axis), P()),
        out_specs=(P(), P()),
        check_rep=False)
    return jax.jit(fn)


def sharded_pose_graph_step_sparse(mesh: Mesh, n_free: int,
                                   iterations: int = 5, tau: float = 1e-5,
                                   lower_step: float = 1.0 / 3.0,
                                   upper_step: float = 2.0 / 3.0):
    """sharded_pose_graph_step with the structure-aware solver
    (optim.device.lm_solve_sparse): each device linearizes its edge
    shard into the SPARSE block form (diagonal blocks, first
    sub-diagonal, capped extras) and the per-iteration collective
    payload is O(V) block arrays — ~36V + 144R + 6V floats — instead of
    the dense (6V)^2 matrix (37 MB at V=512 -> ~100 kB).  The
    replicated part is the O(V) block-Thomas scan rather than a dense
    (6V)^3 factorization, so the Amdahl fraction SCALING.md documents
    for the dense path disappears.  Same quirk semantics; parity with
    the host optimizer is tested.

    Call with the xsel/xp/xq arrays from classify_extra_edges (computed
    on the UNSHARDED edge list, then sharded alongside e_from/e_to)."""
    axis = mesh.axis_names[0]
    tau_f = jnp.float32(tau)
    lo = jnp.float32(lower_step)
    up = jnp.float32(upper_step)
    n_sub = n_free - 1

    def step(poses, e_from, e_to, Z, Omega, free_idx, xsel, xp, xq):
        Z_inv = dev._se3_inv(Z)

        def body(carry, it):
            poses, lam = carry
            D, S, X, b, chi2, max_diag = dev.sparse_system(
                poses, e_from, e_to, Z_inv, Z, Omega, n_free, free_idx,
                xsel, xp, xq, n_sub)
            D, S, X, b, chi2 = jax.lax.psum((D, S, X, b, chi2), axis)
            max_diag = jax.lax.pmax(max_diag, axis)
            lam = jnp.where(it == 0, tau_f * max_diag, lam)

            # root-solve + broadcast: the O(V) block-Thomas scan runs on
            # device 0 only and the (6V,) solution — ~12 kB — rides one
            # psum.  Wall time on a real slice equals the replicated
            # layout (one scan) without 8x redundant sequential work;
            # on the virtual CPU test mesh it removes the
    	    # oversubscription artifact the dense path's SCALING.md row
            # documents.
            x = jax.lax.cond(
                jax.lax.axis_index(axis) == 0,
                lambda: dev._sparse_solve(D, S, X, xp, xq, b, lam),
                lambda: jnp.zeros((n_free * 6,), D.dtype))
            x = jax.lax.psum(x, axis)
            upd = x.reshape(n_free, 6)
            full_upd = jnp.where((free_idx >= 0)[:, None],
                                 upd[jnp.clip(free_idx, 0)], 0.0)
            new_poses = dev._oplus_batch(poses, full_upd)

            err_after = dev.edge_errors(Z_inv, new_poses[e_from],
                                        new_poses[e_to])
            chi2_after = jax.lax.psum(
                jnp.einsum("ei,eij,ej->", err_after, Omega, err_after),
                axis)

            scale = x @ (lam * x + b) + 1e-3
            rho = (chi2 - chi2_after) / scale
            alpha = jnp.minimum(1.0 - (2.0 * rho - 1.0) ** 3, up)
            lam = lam * jnp.maximum(lo, alpha)
            return (new_poses, lam), chi2_after

        (poses, _), chis = jax.lax.scan(
            body, (poses, jnp.float32(0.0)), jnp.arange(iterations))
        return poses, chis

    fn = shard_map(
        step, mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis), P(axis), P(),
                  P(axis), P(), P()),
        out_specs=(P(), P()),
        check_rep=False)
    return jax.jit(fn)


def shard_ba_problem(lms, obs_cam, obs_lm, obs_uv, obs_valid,
                     n_shards: int):
    """Regroup a BA problem for landmark-axis sharding.

    Landmarks are padded to a multiple of n_shards; observations are
    re-bucketed so shard k's equal-size observation block references only
    shard k's landmarks, with obs_lm rewritten to LOCAL indices.
    Returns (lms_p, obs_cam_p, obs_lm_local_p, obs_uv_p, obs_valid_p,
    L_local, O_local).
    """
    L = lms.shape[0]
    L_pad = -(-L // n_shards) * n_shards
    L_local = L_pad // n_shards
    lms_p = np.zeros((L_pad, 3), lms.dtype)
    lms_p[:L] = lms

    shard_of = np.asarray(obs_lm) // L_local
    buckets = [[] for _ in range(n_shards)]
    for i in range(len(obs_cam)):
        if obs_valid[i]:
            buckets[int(shard_of[i])].append(i)
    O_local = max((len(b) for b in buckets), default=1)
    O_local = max(O_local, 1)

    oc = np.zeros((n_shards * O_local,), np.int32)
    ol = np.zeros((n_shards * O_local,), np.int32)
    uv = np.zeros((n_shards * O_local, 2), np.float32)
    ov = np.zeros((n_shards * O_local,), bool)
    for s, b in enumerate(buckets):
        for j, i in enumerate(b):
            k = s * O_local + j
            oc[k] = obs_cam[i]
            ol[k] = obs_lm[i] - s * L_local     # local index
            uv[k] = obs_uv[i]
            ov[k] = True
    return lms_p, oc, ol, uv, ov, L_local, O_local


def make_sharded_ba_step(mesh: Mesh, n_cams: int, L_local: int,
                         iterations: int = 8, damping: float = 1e-4,
                         huber_delta: float = jnp.inf, n_fixed: int = 1):
    """Landmark-axis sharded windowed BA (the `sharded_ba_step` promised
    by optim/ba.py's design): each device assembles the normal equations
    for ITS landmark shard, the reduced camera system meets in one psum,
    the (6W,6W) Schur solve is replicated, and landmark back-substitution
    stays local.  Semantics identical to optim.ba.ba_solve (same LM
    accept/reject and damping schedule) up to reduction order.

    Returns a jitted fn
        (Tcw (W,4,4), lms (S*L_local,3), intr (4,),
         obs_cam (S*O_local,), obs_lm_local, obs_uv, obs_valid)
        -> (Tcw', lms', cost)
    with lms/obs arrays laid out by shard_ba_problem.
    """
    from ..optim import ba as B
    axis = mesh.axis_names[0]

    def shard_fn(Tcw, lms, intr, obs_cam, obs_lm, obs_uv, obs_valid):
        obs_validf = obs_valid.astype(jnp.float32)

        def eval_cost(Tcw, lms):
            def one(ci, li, uv, valid):
                r, _, _ = B._obs_residual_jac(Tcw[ci], lms[li], uv, intr)
                z = Tcw[ci, 2, :3] @ lms[li] + Tcw[ci, 2, 3]
                w = B._huber_w(jnp.sum(r * r), huber_delta) * valid * \
                    (z > 0.1)
                return w * jnp.sum(r * r)
            local = jnp.sum(jax.vmap(one)(obs_cam, obs_lm, obs_uv,
                                          obs_validf))
            return jax.lax.psum(local, axis)

        def step(carry, _):
            Tcw, lms, lam, cost_prev = carry
            (H_cc_diag, b_c, H_cl, H_ll, b_l, _) = B.ba_normal_equations(
                Tcw, lms, intr, obs_cam, obs_lm, obs_uv, obs_valid,
                n_cams, L_local, huber_delta)

            tr = jnp.trace(H_ll, axis1=1, axis2=2) / 3.0
            lam_l = (lam * tr + 1e-3)[:, None, None] * jnp.eye(3)[None]
            Hll_inv = B._inv3x3(H_ll + lam_l)

            WHinv = jnp.einsum("wlij,ljk->wlik", H_cl, Hll_inv)
            S_corr = jnp.einsum("wlik,vljk->wvij", WHinv, H_cl)
            b_corr = jnp.einsum("wlik,lk->wi", WHinv, b_l)

            # one meeting point: all partial reductions in a single psum
            H_cc_diag, b_c, S_corr, b_corr = jax.lax.psum(
                (H_cc_diag, b_c, S_corr, b_corr), axis)

            diag_damp = jax.vmap(
                lambda Hb: jnp.diag(lam * jnp.diag(Hb) + 1e-6))(H_cc_diag)
            S = -S_corr
            S = S.at[jnp.arange(n_cams), jnp.arange(n_cams)].add(
                H_cc_diag + diag_damp)
            S = S.transpose(0, 2, 1, 3).reshape(6 * n_cams, 6 * n_cams)
            rhs = (b_c - b_corr).reshape(-1)

            mask = jnp.ones(6 * n_cams).at[:6 * n_fixed].set(0.0)
            S = S * mask[:, None] * mask[None, :] + jnp.diag(1.0 - mask)
            rhs = rhs * mask

            dx_c = -jnp.linalg.solve(S, rhs).reshape(n_cams, 6)

            Hlc_dx = jnp.einsum("wlij,wi->lj", H_cl, dx_c)
            dx_l = -jnp.einsum("lij,lj->li", Hll_inv, b_l + Hlc_dx)

            Tcw_try = jax.vmap(lambda Tm, d: B._se3_exp(d) @ Tm)(Tcw, dx_c)
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

    fn = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P(axis), P(), P(axis), P(axis), P(axis), P(axis)),
        out_specs=(P(), P(axis), P()),
        check_rep=False)
    return jax.jit(fn)


def pad_edges(e_from, e_to, Z, Omega, multiple: int):
    """Pad edge arrays to a multiple with zero-information self-edges."""
    E = len(e_from)
    pad = (-E) % multiple
    if pad == 0:
        return e_from, e_to, Z, Omega
    ef = np.concatenate([e_from, np.zeros(pad, e_from.dtype)])
    et = np.concatenate([e_to, np.zeros(pad, e_to.dtype)])
    Zp = np.concatenate([Z, np.tile(np.eye(4, dtype=Z.dtype),
                                    (pad, 1, 1))])
    Op = np.concatenate([Omega, np.zeros((pad, 6, 6), Omega.dtype)])
    return ef, et, Zp, Op


def sharded_dict_top2_step(mesh: Mesh, axis: str = "words"):
    """Word-axis-sharded BoW dictionary top-2 — the on-mesh analog of
    ShardedVWDictionary's cross-rank merge (dist/partitioned_map.py):
    each device searches its own word-row shard, the per-shard two best
    (distance, global word id) pairs cross the mesh in one
    `all_gather` (a few kB), and every device merges them with the
    single-process tie-break (ascending distance, then ascending word
    id == insertion order).

    Inputs: query (Q,32) f32 replicated; train (W,32) f32, word_ids (W,)
    i32 and valid (W,) bool sharded on the word axis.  Returns
    (d1, w1, d2) replicated, identical to an unsharded exact top-2.
    """
    big = jnp.float32(1e30)

    def local_top2(query, train, wids, valid):
        qq = jnp.sum(query * query, axis=1, keepdims=True)
        tt = jnp.sum(train * train, axis=1)
        d = qq + tt[None, :] - 2.0 * jnp.matmul(query, train.T,
                                                precision="default")
        d = jnp.where(valid[None, :], d, big)
        d = jnp.maximum(d, 0.0)
        nw = d.shape[1]
        cols = jnp.arange(nw, dtype=jnp.int32)
        d1 = jnp.min(d, axis=1)
        i1 = jnp.minimum(
            jnp.min(jnp.where(d == d1[:, None], cols[None, :], nw),
                    axis=1), nw - 1)
        dm = jnp.where(cols[None, :] == i1[:, None], big, d)
        d2 = jnp.min(dm, axis=1)
        i2 = jnp.minimum(
            jnp.min(jnp.where(dm == d2[:, None], cols[None, :], nw),
                    axis=1), nw - 1)
        w1 = jnp.where(d1 < big, wids[i1], jnp.int32(2 ** 30))
        w2 = jnp.where(d2 < big, wids[i2], jnp.int32(2 ** 30))
        return d1, w1, d2, w2

    def merge2(cd, cw):
        """(K,Q) candidate distances/word-ids -> global two best per
        query with the (distance, word id) ascending tie-break."""
        d1 = jnp.min(cd, axis=0)
        w1 = jnp.min(jnp.where(cd == d1[None, :], cw, 2 ** 30), axis=0)
        hit1 = (cd == d1[None, :]) & (cw == w1[None, :])
        cd2 = jnp.where(hit1, big, cd)
        d2 = jnp.min(cd2, axis=0)
        w2 = jnp.min(jnp.where(cd2 == d2[None, :], cw, 2 ** 30), axis=0)
        return d1, w1, d2, w2

    def shard_fn(query, train, wids, valid):
        d1, w1, d2, w2 = local_top2(query, train, wids, valid)
        cd = jnp.stack([d1, d2])                    # (2, Q)
        cw = jnp.stack([w1, w2])
        cd = jax.lax.all_gather(cd, axis).reshape(-1, cd.shape[1])
        cw = jax.lax.all_gather(cw, axis).reshape(-1, cw.shape[1])
        g1, gw1, g2, _ = merge2(cd, cw)
        return g1, gw1, g2

    return jax.jit(shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis)),
        out_specs=(P(), P(), P()),
        check_rep=False))
