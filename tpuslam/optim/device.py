"""Device-side (JAX) batched SE3 pose-graph math for multi-chip scaling.

The host optimizer (optim/pose_graph.py) reproduces the reference's exact
LM semantics for parity.  This module is the TPU-native scaling path: the
same per-edge math expressed in jnp f32, designed to run under
`shard_map` with edges sharded across devices —

    per-device:  errors/Jacobians for its edge shard  ->  partial dense
                 H (6n x 6n) and b via scatter-add
    collective:  psum over the mesh
    replicated:  damped dense Cholesky solve + oplus update

Dense block assembly is deliberate: pose graphs are O(1k) vertices, where
a dense 6k x 6k factorization is microseconds on the MXU and avoids
sparse bookkeeping XLA can't fuse.  This is the distributed-BA skeleton
(SURVEY.md §2.7.5) — the reference has no analog (its LM is
single-threaded Eigen LDLT, HyperGraph.cpp:174-208).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _quat_xyz(R):
    """(E,3,3) -> (E,3) quaternion xyz, w>=0 (branchless Shepperd)."""
    m00, m01, m02 = R[:, 0, 0], R[:, 0, 1], R[:, 0, 2]
    m10, m11, m12 = R[:, 1, 0], R[:, 1, 1], R[:, 1, 2]
    m20, m21, m22 = R[:, 2, 0], R[:, 2, 1], R[:, 2, 2]
    t = m00 + m11 + m22

    s0 = jnp.sqrt(jnp.clip(t + 1.0, 1e-12)) * 2
    q0 = jnp.stack([0.25 * s0, (m21 - m12) / s0, (m02 - m20) / s0,
                    (m10 - m01) / s0], axis=-1)
    s1 = jnp.sqrt(jnp.clip(1.0 + m00 - m11 - m22, 1e-12)) * 2
    q1 = jnp.stack([(m21 - m12) / s1, 0.25 * s1, (m01 + m10) / s1,
                    (m02 + m20) / s1], axis=-1)
    s2 = jnp.sqrt(jnp.clip(1.0 + m11 - m00 - m22, 1e-12)) * 2
    q2 = jnp.stack([(m02 - m20) / s2, (m01 + m10) / s2, 0.25 * s2,
                    (m12 + m21) / s2], axis=-1)
    s3 = jnp.sqrt(jnp.clip(1.0 + m22 - m00 - m11, 1e-12)) * 2
    q3 = jnp.stack([(m10 - m01) / s3, (m02 + m20) / s3, (m12 + m21) / s3,
                    0.25 * s3], axis=-1)

    diag = jnp.stack([m00, m11, m22], axis=-1)
    arg = jnp.argmax(diag, axis=-1)
    q = jnp.where((t > 0)[:, None], q0,
                  jnp.where((arg == 0)[:, None], q1,
                            jnp.where((arg == 1)[:, None], q2, q3)))
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    sign = jnp.where(q[:, 0:1] < 0, -1.0, 1.0)
    return q[:, 1:] * sign


def edge_errors(Z_inv, Xi, Xj):
    """(E,6) error = [t; q.xyz] of Z^-1 Xi^-1 Xj (f32)."""
    Xi_inv = _se3_inv(Xi)
    delta = Z_inv @ Xi_inv @ Xj
    return jnp.concatenate([delta[:, :3, 3], _quat_xyz(delta[:, :3, :3])],
                           axis=1)


def _se3_inv(X):
    """(E,4,4) rigid inverse (no general 4x4 inverse needed)."""
    R = X[:, :3, :3]
    t = X[:, :3, 3]
    Rt = jnp.swapaxes(R, 1, 2)
    top = jnp.concatenate([Rt, -(Rt @ t[..., None])], axis=2)
    bot = jnp.broadcast_to(jnp.array([[[0., 0., 0., 1.]]], X.dtype),
                           (X.shape[0], 1, 4))
    return jnp.concatenate([top, bot], axis=1)


def edge_jacobians(Z, Xi, Xj):
    """(E,6,6) Ji, Jj — jnp twin of optim.pose_graph.compute_jacobians
    (the g2o dq_dR chain rule, SE3Gradient.cpp:39-105)."""
    E = Z.shape[0]
    A = _se3_inv(Z)
    B = _se3_inv(Xi) @ Xj
    Emat = A @ B
    Re = Emat[:, :3, :3]
    Ra = A[:, :3, :3]
    Rb = B[:, :3, :3]
    tb = B[:, :3, 3]

    # dq_dR (E,3,9), columns in column-major R order
    tr = jnp.trace(Re, axis1=1, axis2=2)
    qw = 0.25 * (jnp.sqrt(jnp.clip(tr + 1.0, 1e-12)) * 2.0)
    a1 = 1.0 / qw ** 3
    a4 = 0.25 / qw
    a2 = -0.03125 * (Re[:, 2, 1] - Re[:, 1, 2]) * a1
    a6 = 0.03125 * (Re[:, 2, 0] - Re[:, 0, 2]) * a1
    a7 = -0.03125 * (Re[:, 1, 0] - Re[:, 0, 1]) * a1
    z = jnp.zeros_like(a2)
    dq_dR = jnp.stack([
        jnp.stack([a2, z, z, z, a2, a4, z, -a4, a2], axis=-1),
        jnp.stack([a6, z, -a4, z, a6, z, a4, z, a6], axis=-1),
        jnp.stack([a7, a4, z, -a4, a7, z, z, z, a7], axis=-1),
    ], axis=1)

    def vec_cm(M):
        return jnp.swapaxes(M, 1, 2).reshape(E, 9)

    # skew1(tb, transposed) with doubled values
    x, y, zz = 2 * tb[:, 0], 2 * tb[:, 1], 2 * tb[:, 2]
    zer = jnp.zeros_like(x)
    S1 = jnp.stack([
        jnp.stack([zer, -zz, y], axis=-1),
        jnp.stack([zz, zer, -x], axis=-1),
        jnp.stack([-y, x, zer], axis=-1),
    ], axis=1)

    def skew2(R, transposed):
        r = 2.0 * R
        zr = jnp.zeros_like(r[:, 0, :])
        if transposed:
            Sx = jnp.stack([zr, r[:, 2, :], -r[:, 1, :]], axis=1)
            Sy = jnp.stack([-r[:, 2, :], zr, r[:, 0, :]], axis=1)
            Sz = jnp.stack([r[:, 1, :], -r[:, 0, :], zr], axis=1)
        else:
            Sx = jnp.stack([zr, -r[:, 2, :], r[:, 1, :]], axis=1)
            Sy = jnp.stack([r[:, 2, :], zr, -r[:, 0, :]], axis=1)
            Sz = jnp.stack([-r[:, 1, :], r[:, 0, :], zr], axis=1)
        return Sx, Sy, Sz

    zeros33 = jnp.zeros((E, 3, 3), Z.dtype)

    Sxt, Syt, Szt = skew2(Rb, True)
    M = jnp.stack([vec_cm(Ra @ Sxt), vec_cm(Ra @ Syt),
                   vec_cm(Ra @ Szt)], axis=2)
    Ji_rr = dq_dR @ M

    I3 = jnp.broadcast_to(jnp.eye(3, dtype=Z.dtype), (E, 3, 3))
    Sx, Sy, Sz = skew2(I3, False)
    M = jnp.stack([vec_cm(Re @ Sx), vec_cm(Re @ Sy),
                   vec_cm(Re @ Sz)], axis=2)
    Jj_rr = dq_dR @ M

    Ji = jnp.concatenate([
        jnp.concatenate([-Ra, Ra @ S1], axis=2),
        jnp.concatenate([zeros33, Ji_rr], axis=2),
    ], axis=1)
    Jj = jnp.concatenate([
        jnp.concatenate([Re, zeros33], axis=2),
        jnp.concatenate([zeros33, Jj_rr], axis=2),
    ], axis=1)
    return Ji, Jj


def _oplus_batch(est, upd):
    """(N,4,4) estimates x (N,6) updates -> (N,4,4)."""
    v = upd[:, 3:]
    w2 = 1.0 - jnp.sum(v * v, axis=1)
    ok = w2 >= 0
    w = jnp.sqrt(jnp.clip(w2, 0.0))
    x, y, z = v[:, 0], v[:, 1], v[:, 2]
    R = jnp.stack([
        jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z),
                   2 * (x * z + w * y)], axis=-1),
        jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z),
                   2 * (y * z - w * x)], axis=-1),
        jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x),
                   1 - 2 * (x * x + y * y)], axis=-1),
    ], axis=1)
    I3 = jnp.broadcast_to(jnp.eye(3, dtype=est.dtype), R.shape)
    R = jnp.where(ok[:, None, None], R, I3)
    inc = jnp.zeros_like(est)
    inc = inc.at[:, :3, :3].set(R)
    inc = inc.at[:, :3, 3].set(upd[:, :3])
    inc = inc.at[:, 3, 3].set(1.0)
    return est @ inc


def gn_normal_equations(poses, e_from, e_to, Z_inv, Z, Omega, n_free,
                        free_idx):
    """One Gauss-Newton linearization: dense (6n,6n) H and (6n,) b from
    this shard's edges.  `free_idx` maps vertex index -> solve index
    (-1 == fixed).  Call under shard_map and psum the results.
    """
    Xi = poses[e_from]
    Xj = poses[e_to]
    err = edge_errors(Z_inv, Xi, Xj)
    Ji, Jj = edge_jacobians(Z, Xi, Xj)

    w_err = -jnp.einsum("eij,ej->ei", Omega, err)
    bi = jnp.einsum("eji,ej->ei", Ji, w_err)
    bj = jnp.einsum("eji,ej->ei", Jj, w_err)

    JtO_i = jnp.einsum("eji,ejk->eik", Ji, Omega)
    JtO_j = jnp.einsum("eji,ejk->eik", Jj, Omega)
    H_ii = JtO_i @ Ji
    H_jj = JtO_j @ Jj
    H_ij = JtO_i @ Jj

    fi = free_idx[e_from]
    fj = free_idx[e_to]
    size = n_free * 6
    b = jnp.zeros((size,), poses.dtype)
    H = jnp.zeros((size, size), poses.dtype)

    def block_scatter(H, bi_idx, bj_idx, blocks, mask):
        # scatter (E,6,6) blocks at (bi*6, bj*6); masked rows go to a
        # dump row (index size, sliced off)
        safe_i = jnp.where(mask, bi_idx, n_free)
        safe_j = jnp.where(mask, bj_idx, n_free)
        Hp = jnp.zeros((size + 6, size + 6), poses.dtype)
        rows = safe_i[:, None] * 6 + jnp.arange(6)[None, :]
        cols = safe_j[:, None] * 6 + jnp.arange(6)[None, :]
        Hp = Hp.at[rows[:, :, None], cols[:, None, :]].add(blocks)
        return H + Hp[:size, :size]

    mi = fi >= 0
    mj = fj >= 0
    b_pad = jnp.zeros((size + 6,), poses.dtype)
    b_pad = b_pad.at[(jnp.where(mi, fi, n_free)[:, None] * 6 +
                      jnp.arange(6)[None, :])].add(bi)
    b_pad = b_pad.at[(jnp.where(mj, fj, n_free)[:, None] * 6 +
                      jnp.arange(6)[None, :])].add(bj)
    b = b_pad[:size]

    # symmetric full H (the device path solves the true normal equations;
    # the host path reproduces the reference's lower-triangle quirk)
    H = block_scatter(H, fi, fi, H_ii, mi)
    H = block_scatter(H, fj, fj, H_jj, mj)
    H = block_scatter(H, fi, fj, H_ij, mi & mj)
    H = block_scatter(H, fj, fi, jnp.swapaxes(H_ij, 1, 2), mi & mj)

    chi2 = jnp.einsum("ei,eij,ej->", err, Omega, err)
    return H, b, chi2


def _scatter_blocks(A, fi, fj, blocks, mask, n_free):
    """Scatter-add (E,6,6) blocks at block positions (fi, fj); masked
    edges land on a dump row sliced off."""
    size = n_free * 6
    safe_i = jnp.where(mask, fi, n_free)
    safe_j = jnp.where(mask, fj, n_free)
    Ap = jnp.zeros((size + 6, size + 6), A.dtype)
    rows = safe_i[:, None] * 6 + jnp.arange(6)[None, :]
    cols = safe_j[:, None] * 6 + jnp.arange(6)[None, :]
    Ap = Ap.at[rows[:, :, None], cols[:, None, :]].add(blocks)
    return A + Ap[:size, :size]


def lm_system(poses, e_from, e_to, Z_inv, Z, Omega, n_free, free_idx):
    """One LM linearization with the REFERENCE's exact assembly quirks
    (HyperGraph::buildSystem + GraphEdge::constructQuadraticForm):

      * every block inserted TRANSPOSED (GraphEdge.cpp:70-118 passes
        Eigen column-major data into a row-major triplet fill),
      * only ONE off-diagonal block per edge, at (to, from) —
        so an edge whose `to` vertex has a LOWER solve index than its
        `from` (loop closures: from=new, to=old) contributes an
        upper-triangle block that SimplicialLDLT's lower-triangle view
        then ignores (HyperGraph.cpp:197-204).  Callers must replicate
        that by tril-symmetrizing: A_eff = tril(A) + tril(A)^T - diag(A).

    Returns (A (6n,6n) raw quirk layout, b (6n,), chi2, max_diag of the
    diagonal blocks — the lambda_0 seed).  Shard edges + psum all four.
    """
    Xi = poses[e_from]
    Xj = poses[e_to]
    err = edge_errors(Z_inv, Xi, Xj)
    Ji, Jj = edge_jacobians(Z, Xi, Xj)

    w_err = -jnp.einsum("eij,ej->ei", Omega, err)
    bi = jnp.einsum("eji,ej->ei", Ji, w_err)
    bj = jnp.einsum("eji,ej->ei", Jj, w_err)

    JtO_i = jnp.einsum("eji,ejk->eik", Ji, Omega)
    JtO_j = jnp.einsum("eji,ejk->eik", Jj, Omega)
    m_ii = JtO_i @ Ji
    m_jj = JtO_j @ Jj
    m_ij = JtO_i @ Jj

    fi = free_idx[e_from]
    fj = free_idx[e_to]
    mi = fi >= 0
    mj = fj >= 0
    size = n_free * 6

    b_pad = jnp.zeros((size + 6,), poses.dtype)
    b_pad = b_pad.at[(jnp.where(mi, fi, n_free)[:, None] * 6 +
                      jnp.arange(6)[None, :])].add(bi)
    b_pad = b_pad.at[(jnp.where(mj, fj, n_free)[:, None] * 6 +
                      jnp.arange(6)[None, :])].add(bj)
    b = b_pad[:size]

    A = jnp.zeros((size, size), poses.dtype)
    A = _scatter_blocks(A, fi, fi, jnp.swapaxes(m_ii, 1, 2), mi, n_free)
    A = _scatter_blocks(A, fj, fj, jnp.swapaxes(m_jj, 1, 2), mj, n_free)
    A = _scatter_blocks(A, fj, fi, jnp.swapaxes(m_ij, 1, 2), mi & mj,
                        n_free)

    diag_i = jnp.abs(jnp.diagonal(m_ii, axis1=1, axis2=2))
    diag_j = jnp.abs(jnp.diagonal(m_jj, axis1=1, axis2=2))
    max_diag = jnp.maximum(
        jnp.max(jnp.where(mi[:, None], diag_i, 0.0)),
        jnp.max(jnp.where(mj[:, None], diag_j, 0.0)))

    chi2 = jnp.einsum("ei,eij,ej->", err, Omega, err)
    return A, b, chi2, max_diag


def _lm_iteration(poses, A, b, chi2_before, lam, e_from, e_to, Z_inv,
                  Omega, n_free, free_idx, lower_step, upper_step):
    """Shared LM update + gain-ratio lambda rescale
    (HyperGraph.cpp:57-97, scaleLambda :118-135).  `A` is the raw quirk
    layout from lm_system (post-psum in the sharded caller); lam must
    already be seeded (tau * max_diag on the first iteration)."""
    # SimplicialLDLT reads the lower triangle only
    L = jnp.tril(A)
    A_eff = L + L.T - jnp.diag(jnp.diag(A)) + \
        lam * jnp.eye(A.shape[0], dtype=A.dtype)
    x = jnp.linalg.solve(A_eff, b)
    upd = x.reshape(n_free, 6)
    full_upd = jnp.where((free_idx >= 0)[:, None],
                         upd[jnp.clip(free_idx, 0)], 0.0)
    new_poses = _oplus_batch(poses, full_upd)

    err_after = edge_errors(Z_inv, new_poses[e_from], new_poses[e_to])
    chi2_after = jnp.einsum("ei,eij,ej->", err_after, Omega, err_after)

    scale = x @ (lam * x + b) + 1e-3
    rho = (chi2_before - chi2_after) / scale
    alpha = 1.0 - (2.0 * rho - 1.0) ** 3
    alpha = jnp.minimum(alpha, upper_step)
    lam = lam * jnp.maximum(lower_step, alpha)
    return new_poses, lam, chi2_after


@functools.partial(jax.jit,
                   static_argnames=("iterations", "n_free"))
def lm_solve(poses, e_from, e_to, Z, Omega, free_idx, n_free,
             iterations=10, tau=1e-5, lower_step=1.0 / 3.0,
             upper_step=2.0 / 3.0):
    """Device LM twin of the host PoseGraphOptimizer.optimize
    (HyperGraph.cpp:57-97): same transposed/lower-triangle assembly,
    lambda_0 = tau * max|blockdiag|, gain-ratio lambda schedule with the
    [1/3, 2/3] clamp.  f32 where the host is f64 — trajectories match to
    f32 conditioning, which tests pin."""
    Z_inv = _se3_inv(Z)
    tau = jnp.float32(tau)
    lower_step = jnp.float32(lower_step)
    upper_step = jnp.float32(upper_step)

    def body(carry, it):
        poses, lam = carry
        A, b, chi2, max_diag = lm_system(poses, e_from, e_to, Z_inv, Z,
                                         Omega, n_free, free_idx)
        lam = jnp.where(it == 0, tau * max_diag, lam)
        poses, lam, chi2_after = _lm_iteration(
            poses, A, b, chi2, lam, e_from, e_to, Z_inv, Omega,
            n_free, free_idx, lower_step, upper_step)
        return (poses, lam), chi2_after

    (poses, _), chis = jax.lax.scan(body, (poses, jnp.float32(0.0)),
                                    jnp.arange(iterations))
    return poses, chis


def graph_to_arrays(poses: dict, links, fixed_id: int = 1):
    """Pose dict + link MultiMap -> device arrays.

    Returns (ids, pose_arr (N,4,4) f32, e_from, e_to (E,) i32 vertex
    indices, Z (E,4,4), Omega (E,6,6), free_idx (N,) i32 with -1 for the
    fixed vertex).  Vertex `fixed_id` is gauge-fixed like the host driver
    (Optimizer.cpp:36-38)."""
    import numpy as np
    ids = sorted(poses)
    vidx = {vid: i for i, vid in enumerate(ids)}
    pose_arr = np.stack([np.asarray(poses[v], np.float32) for v in ids])
    ef, et, Zs, Os = [], [], [], []
    for _, link in links.items():
        if link.from_id in vidx and link.to_id in vidx:
            ef.append(vidx[link.from_id])
            et.append(vidx[link.to_id])
            Zs.append(np.asarray(link.transform, np.float32))
            Os.append(np.asarray(link.info, np.float32))
    e_from = np.asarray(ef, np.int32)
    e_to = np.asarray(et, np.int32)
    Z = (np.stack(Zs) if Zs
         else np.zeros((0, 4, 4), np.float32))
    Omega = (np.stack(Os) if Os
             else np.zeros((0, 6, 6), np.float32))
    free_idx = np.full(len(ids), -1, np.int32)
    k = 0
    for i, vid in enumerate(ids):
        if vid != fixed_id:
            free_idx[i] = k
            k += 1
    return ids, pose_arr, e_from, e_to, Z, Omega, free_idx


# ---------------------------------------------------------------------------
# structure-aware solve: block-tridiagonal + low-rank correction
# ---------------------------------------------------------------------------
#
# The quirk-faithful system (lm_system + tril symmetrization) is almost
# block-tridiagonal BY CONSTRUCTION: the reference inserts ONE
# off-diagonal block per edge at (to, from) and its LDLT reads only the
# lower triangle, so an edge contributes off-diagonal structure only
# when free_idx[to] > free_idx[from].  Odometry/neighbor links
# (from=i, to=i+1) land on the first sub-diagonal; loop closures
# (from=new, to=old) land in the IGNORED upper triangle and vanish from
# the system (HyperGraph.cpp:197-204 — their diagonal contributions
# remain).  The dense path (lm_solve) assembles and solves the full
# (6V)^2 matrix anyway; this path assembles only
#   D  (V, 6, 6)    diagonal blocks
#   S  (V-1, 6, 6)  first sub-diagonal blocks (A[k+1, k])
#   X  (R, 6, 6)    the rare kept blocks with to - from >= 2, at
#                   block coordinates (xp, xq), xp > xq
# and solves by block-Thomas factorization of the tridiagonal part with
# a push-through Woodbury correction for the R extra blocks:
#   A = T + P M P',  A^-1 r = T^-1 r - G (I + M P'G)^-1 M P' T^-1 r,
#   G = T^-1 P  — robust to masked (zero) correction blocks.
# Distributed, only the O(V) block arrays cross the mesh instead of the
# (6V)^2 dense matrix (dist/mesh.py make_sharded_posegraph_step).


def sparse_system(poses, e_from, e_to, Z_inv, Z, Omega, n_free, free_idx,
                  xsel, xp, xq, n_sub):
    """lm_system in sparse block form.  `xsel` (E,) i32 maps each edge to
    its slot in the extras array (-1: not an extra), `xp`/`xq` (R,) the
    extras' block coordinates, `n_sub` = n_free - 1 (static).

    Returns (D (n_free,6,6), S (n_sub,6,6), X (R,6,6), b (6n,), chi2,
    max_diag) — all per-shard partial sums; psum every output when edge-
    sharded.  Block contents are EXACTLY the dense path's post-
    tril-symmetrization values (transposed-insert quirk included), so
    the solve below reproduces lm_solve to f32 round-off."""
    Xi = poses[e_from]
    Xj = poses[e_to]
    err = edge_errors(Z_inv, Xi, Xj)
    Ji, Jj = edge_jacobians(Z, Xi, Xj)

    w_err = -jnp.einsum("eij,ej->ei", Omega, err)
    bi = jnp.einsum("eji,ej->ei", Ji, w_err)
    bj = jnp.einsum("eji,ej->ei", Jj, w_err)

    JtO_i = jnp.einsum("eji,ejk->eik", Ji, Omega)
    JtO_j = jnp.einsum("eji,ejk->eik", Jj, Omega)
    m_ii = JtO_i @ Ji
    m_jj = JtO_j @ Jj
    m_ij = JtO_i @ Jj

    fi = free_idx[e_from]
    fj = free_idx[e_to]
    mi = fi >= 0
    mj = fj >= 0
    E = e_from.shape[0]

    # diagonal blocks: quirk layout inserts m^T; the dense path then
    # tril-symmetrizes the whole matrix, which on a diagonal block is
    # tril(B) + tril(B)^T - diag(B) elementwise
    def tril_sym(B):
        L = jnp.tril(B)
        return L + jnp.swapaxes(L, -1, -2) - \
            B * jnp.eye(6, dtype=B.dtype)

    Dt_i = tril_sym(jnp.swapaxes(m_ii, 1, 2))
    Dt_j = tril_sym(jnp.swapaxes(m_jj, 1, 2))
    D = jnp.zeros((n_free + 1, 6, 6), poses.dtype)
    D = D.at[jnp.where(mi, fi, n_free)].add(Dt_i)
    D = D.at[jnp.where(mj, fj, n_free)].add(Dt_j)
    D = D[:n_free]

    # off-diagonal: ONE block per edge at (fj, fi), value m_ij^T, kept
    # iff fj > fi (lower triangle); fj == fi + 1 -> sub-diagonal slot
    B_e = jnp.swapaxes(m_ij, 1, 2)
    keep = mi & mj & (fj > fi)
    sub = keep & (fj == fi + 1)
    S = jnp.zeros((n_sub + 1, 6, 6), poses.dtype)
    S = S.at[jnp.where(sub, fi, n_sub)].add(B_e)
    S = S[:n_sub]

    R = xp.shape[0]
    X = jnp.zeros((R + 1, 6, 6), poses.dtype)
    is_x = keep & (xsel >= 0)
    X = X.at[jnp.where(is_x, xsel, R)].add(B_e)
    X = X[:R]

    size = n_free * 6
    b_pad = jnp.zeros((size + 6,), poses.dtype)
    b_pad = b_pad.at[(jnp.where(mi, fi, n_free)[:, None] * 6 +
                      jnp.arange(6)[None, :])].add(bi)
    b_pad = b_pad.at[(jnp.where(mj, fj, n_free)[:, None] * 6 +
                      jnp.arange(6)[None, :])].add(bj)
    b = b_pad[:size]

    diag_i = jnp.abs(jnp.diagonal(m_ii, axis1=1, axis2=2))
    diag_j = jnp.abs(jnp.diagonal(m_jj, axis1=1, axis2=2))
    max_diag = jnp.maximum(
        jnp.max(jnp.where(mi[:, None], diag_i, 0.0)),
        jnp.max(jnp.where(mj[:, None], diag_j, 0.0)))

    chi2 = jnp.einsum("ei,eij,ej->", err, Omega, err)
    return D, S, X, b, chi2, max_diag


def _chol6(A):
    """Unrolled 6x6 Cholesky on a (..., 6, 6) array -> lower L.
    Scalar-component formulation (kernels/pnp.py pattern): inside the
    Thomas lax.scan this stays pure VPU arithmetic — a lax.linalg
    factorization would be a sequential custom call per scan step."""
    comps = [[A[..., i, j] for j in range(6)] for i in range(6)]
    L = [[None] * 6 for _ in range(6)]
    for j in range(6):
        d = comps[j][j]
        for k in range(j):
            d = d - L[j][k] * L[j][k]
        d = jnp.sqrt(jnp.maximum(d, 1e-30))
        L[j][j] = d
        inv = 1.0 / d
        for i in range(j + 1, 6):
            s = comps[i][j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = s * inv
    rows = [jnp.stack([L[i][j] if j <= i else jnp.zeros_like(L[i][i])
                       for j in range(6)], axis=-1) for i in range(6)]
    return jnp.stack(rows, axis=-2)


def _chol6_solve(L, B):
    """Solve (L L^T) X = B for (..., 6, m) B given lower L (..., 6, 6),
    unrolled forward/back substitution (broadcasts over leading axes)."""
    y = [None] * 6
    for i in range(6):
        s = B[..., i, :]
        for k in range(i):
            s = s - L[..., i, k, None] * y[k]
        y[i] = s / L[..., i, i, None]
    x = [None] * 6
    for i in reversed(range(6)):
        s = y[i]
        for k in range(i + 1, 6):
            s = s - L[..., k, i, None] * x[k]
        x[i] = s / L[..., i, i, None]
    return jnp.stack(x, axis=-2)


def _thomas_solve(D, S, B, lam):
    """Solve (T + lam I) X = B for symmetric block-tridiagonal T with
    diagonal blocks D (n,6,6) and sub-diagonal blocks S (n-1,6,6) at
    A[k+1, k]; B is (n, 6, m).  Block-Thomas via lax.scan with the
    unrolled 6x6 Cholesky — O(n) sequential, no custom calls."""
    n = D.shape[0]
    m = B.shape[-1]
    Dl = D + lam * jnp.eye(6, dtype=D.dtype)
    S_pad = jnp.concatenate(
        [jnp.zeros((1, 6, 6), D.dtype), S], axis=0)      # S_pad[k]=A[k,k-1]

    def fwd(carry, xs):
        Cprev_chol, gprev = carry              # chol(C_{k-1}), g_{k-1}
        Dk, Sk, Bk = xs                        # Sk = A[k, k-1]
        W = _chol6_solve(Cprev_chol, jnp.swapaxes(Sk, 0, 1))  # C^-1 Sk^T
        Ck = Dk - Sk @ W
        z = _chol6_solve(Cprev_chol, gprev)    # C^-1 g_{k-1}
        gk = Bk - Sk @ z
        Lk = _chol6(Ck)
        return (Lk, gk), (Lk, gk)

    L0 = _chol6(Dl[0])
    (_, _), (Ls, gs) = jax.lax.scan(
        fwd, (L0, B[0]), (Dl[1:], S_pad[1:], B[1:]))
    Ls = jnp.concatenate([L0[None], Ls], axis=0)         # (n,6,6)
    gs = jnp.concatenate([B[0][None], gs], axis=0)       # (n,6,m)

    def bwd(x_next, xs):
        Lk, gk, Sk1 = xs                       # Sk1 = A[k+1, k]
        rhs = gk - jnp.swapaxes(Sk1, 0, 1) @ x_next
        xk = _chol6_solve(Lk, rhs)
        return xk, xk

    xn = _chol6_solve(Ls[n - 1], gs[n - 1])
    S_bwd = jnp.concatenate([S, jnp.zeros((1, 6, 6), D.dtype)], axis=0)
    _, xs_rev = jax.lax.scan(bwd, xn, (Ls[:n - 1], gs[:n - 1],
                                       S_bwd[:n - 1]), reverse=True)
    return jnp.concatenate([xs_rev, xn[None]], axis=0)   # (n,6,m)


def _sparse_solve(D, S, X, xp, xq, b, lam):
    """x = A_eff^-1 b where A_eff = tridiag(D +lam, S) plus, for each
    extra r: block X[r] at (xp[r], xq[r]) and X[r]^T at (xq[r], xp[r]).
    Push-through Woodbury over the block-Thomas direct solve."""
    n = D.shape[0]
    R = xp.shape[0]
    bb = b.reshape(n, 6, 1)
    if R == 0:
        return _thomas_solve(D, S, bb, lam).reshape(-1)
    # P columns: unit block-columns at rows xp (first R groups) and xq
    # (second R groups); M couples them with X / X^T
    eye6 = jnp.eye(6, dtype=D.dtype)
    P = jnp.zeros((n, 6, 12 * R), D.dtype)
    for r_ in range(R):
        P = P.at[xp[r_], :, 6 * r_:6 * r_ + 6].set(eye6)
        P = P.at[xq[r_], :, 6 * R + 6 * r_:6 * R + 6 * r_ + 6].set(eye6)
    M = jnp.zeros((12 * R, 12 * R), D.dtype)
    for r_ in range(R):
        a = slice(6 * r_, 6 * r_ + 6)
        c = slice(6 * R + 6 * r_, 6 * R + 6 * r_ + 6)
        M = M.at[a, c].set(X[r_])
        M = M.at[c, a].set(X[r_].T)

    rhs = jnp.concatenate([bb, P], axis=-1)     # (n, 6, 1 + 12R)
    sol = _thomas_solve(D, S, rhs, lam)
    t_b = sol[..., :1]                          # T^-1 b
    G = sol[..., 1:]                            # T^-1 P
    PtG = jnp.einsum("nkr,nks->rs", P, G)       # P' T^-1 P
    Ptb = jnp.einsum("nkr,nk->r", P, t_b[..., 0])
    cap = jnp.eye(12 * R, dtype=D.dtype) + M @ PtG
    y = jnp.linalg.solve(cap, M @ Ptb)
    x = t_b[..., 0] - jnp.einsum("nkr,r->nk", G, y)
    return x.reshape(-1)


def classify_extra_edges(e_from, e_to, free_idx):
    """Host-side prep for sparse_system: slot index per edge for kept
    non-adjacent blocks, and their block coordinates.  Returns
    (xsel (E,) i32, xp (R,) i32, xq (R,) i32)."""
    import numpy as np
    e_from = np.asarray(e_from)
    e_to = np.asarray(e_to)
    free_idx = np.asarray(free_idx)
    fi = free_idx[e_from]
    fj = free_idx[e_to]
    keep = (fi >= 0) & (fj >= 0) & (fj > fi)
    extra = keep & (fj != fi + 1)
    xsel = np.full(len(e_from), -1, np.int32)
    idxs = np.nonzero(extra)[0]
    xsel[idxs] = np.arange(len(idxs), dtype=np.int32)
    return (xsel, fj[idxs].astype(np.int32), fi[idxs].astype(np.int32))


@functools.partial(jax.jit, static_argnames=("iterations", "n_free"))
def lm_solve_sparse(poses, e_from, e_to, Z, Omega, free_idx, n_free,
                    xsel, xp, xq,
                    iterations=10, tau=1e-5, lower_step=1.0 / 3.0,
                    upper_step=2.0 / 3.0):
    """lm_solve with the structure-aware solver: identical semantics
    (quirk assembly, lambda schedule), O(V) memory and collective
    footprint instead of (6V)^2.  `xsel`/`xp`/`xq` from
    classify_extra_edges."""
    Z_inv = _se3_inv(Z)
    tau = jnp.float32(tau)
    lower_step = jnp.float32(lower_step)
    upper_step = jnp.float32(upper_step)
    n_sub = n_free - 1

    def body(carry, it):
        poses, lam = carry
        D, S, X, b, chi2, max_diag = sparse_system(
            poses, e_from, e_to, Z_inv, Z, Omega, n_free, free_idx,
            xsel, xp, xq, n_sub)
        lam = jnp.where(it == 0, tau * max_diag, lam)
        x = _sparse_solve(D, S, X, xp, xq, b, lam)
        upd = x.reshape(n_free, 6)
        full_upd = jnp.where((free_idx >= 0)[:, None],
                             upd[jnp.clip(free_idx, 0)], 0.0)
        new_poses = _oplus_batch(poses, full_upd)
        err_after = edge_errors(Z_inv, new_poses[e_from],
                                new_poses[e_to])
        chi2_after = jnp.einsum("ei,eij,ej->", err_after, Omega,
                                err_after)
        scale = x @ (lam * x + b) + 1e-3
        rho = (chi2 - chi2_after) / scale
        alpha = 1.0 - (2.0 * rho - 1.0) ** 3
        alpha = jnp.minimum(alpha, upper_step)
        lam = lam * jnp.maximum(lower_step, alpha)
        return (new_poses, lam), chi2_after

    (poses, _), chis = jax.lax.scan(body, (poses, jnp.float32(0.0)),
                                    jnp.arange(iterations))
    return poses, chis


@functools.partial(jax.jit, static_argnames=("iterations",))
def gn_solve(poses, e_from, e_to, Z, Omega, free_idx, n_free,
             lam=1e-4, iterations=10):
    """Replicated single-device GN/LM loop (building block; the sharded
    variant in tpuslam.dist wraps the linearization in shard_map)."""
    Z_inv = _se3_inv(Z)

    def body(carry, _):
        poses, lam = carry
        H, b, chi2 = gn_normal_equations(poses, e_from, e_to, Z_inv, Z,
                                         Omega, n_free, free_idx)
        Hd = H + lam * jnp.eye(H.shape[0], dtype=H.dtype)
        x = jax.scipy.linalg.cho_solve(jax.scipy.linalg.cho_factor(Hd), b)
        upd = x.reshape(n_free, 6)
        # gather per-vertex updates (fixed vertices get zero)
        full_upd = jnp.where((free_idx >= 0)[:, None],
                             upd[jnp.clip(free_idx, 0)], 0.0)
        new_poses = _oplus_batch(poses, full_upd)
        return (new_poses, lam), chi2

    (poses, _), chis = jax.lax.scan(body, (poses, jnp.asarray(lam)),
                                    None, length=iterations)
    return poses, chis
