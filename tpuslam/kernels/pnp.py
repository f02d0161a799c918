"""Batched EPnP + RANSAC + LM refinement on TPU.

TPU-native re-design of the reference's motion-estimation solver
(/root/reference/src/slam/src/opencv/CvSolvePnP.cpp — a port of OpenCV 3's
solvePnPRansac — driven by /root/reference/src/slam/src/core/
MotionEstimation.cpp:279-374).

The reference runs a *sequential* adaptive RANSAC: draw a 6-point sample,
solve EPnP, count inliers, shrink the iteration budget
(RANSACUpdateNumIters), repeat.  On TPU that serial loop is the wrong
shape.  Here ALL `iterations_count` (300) hypotheses are drawn up front and
solved as one vmapped batch — 300 independent 12x12 eigenproblems and 6x4
least squares vectorize beautifully — then the (300, N) reprojection-error
matrix is reduced to inlier counts in one pass and the best model wins
(first-index tie-break, matching the reference's strict `>` update).  This
covers a superset of the hypotheses the sequential version would try, so
quality is >= the reference at a fraction of the wall clock.

Precision: TPUs have no native f64 (XLA TPU implements LU/solve only for
F32), so where the reference does all PnP math in double we instead do all
math in f32 *in normalized camera coordinates* — observations are premapped
through K^-1 so every matrix entry is O(1) and f32 conditioning is benign.
Inlier thresholds stay in pixels: normalized residuals are scaled back by
(fx, fy) before comparison, which is exact.

Faithfulness notes:
  * OpenCV 3's solvePnPRansac has a quirk the reference inherits: the
    post-RANSAC refit on inliers is computed and then *discarded* — the
    returned model is the best minimal-sample EPnP model
    (CvSolvePnP.cpp:194-206 copies `_local_model`, not the refined
    rvec/tvec).  We reproduce that: `ransac_epnp` returns the raw best
    hypothesis.
  * the real refinement happens in the caller's loop
    (MotionEstimation.cpp:310-374): iterative solvePnP on inliers with
    extrinsic guess, then recompute inliers with a variance-adaptive
    threshold min(reprojErr, refineSigma*sqrt(var)).  `refine_lm` +
    `solve_pnp_ransac` implement that loop with masked fixed-capacity
    arrays (no dynamic shapes), including its std::swap tail semantics.
  * inlier test is squared-error <= thr^2 (CvSolvePnP.cpp:258).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

BIG = np.float32(1e12)  # np scalar: importing this module must not init the jax backend


# ---------------------------------------------------------------------------
# geometry helpers (all jit/vmap friendly, f32)
# ---------------------------------------------------------------------------

def rodrigues(rvec: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle (3,) -> rotation matrix (3,3).  Small-angle safe."""
    rvec = rvec.astype(jnp.float32)
    theta = jnp.sqrt(jnp.sum(rvec * rvec) + 1e-24)
    k = rvec / theta
    K = jnp.array([[0.0, -k[2], k[1]],
                   [k[2], 0.0, -k[0]],
                   [-k[1], k[0], 0.0]], dtype=jnp.float32)
    s, c = jnp.sin(theta), jnp.cos(theta)
    R = jnp.eye(3, dtype=jnp.float32) + s * K + (1.0 - c) * (K @ K)
    Rsmall = jnp.eye(3, dtype=jnp.float32) + jnp.array(
        [[0.0, -rvec[2], rvec[1]],
         [rvec[2], 0.0, -rvec[0]],
         [-rvec[1], rvec[0], 0.0]], dtype=jnp.float32)
    return jnp.where(theta < 1e-7, Rsmall, R)


def rodrigues_inv(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> axis-angle (3,)."""
    R = R.astype(jnp.float32)
    c = jnp.clip((jnp.trace(R) - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(c)
    v = jnp.array([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]])
    s2 = jnp.sqrt(jnp.sum(v * v)) + 1e-24  # = 2 sin(theta)
    axis = v / s2
    # theta ~ pi fallback: axis from the largest-diagonal column
    i = jnp.argmax(jnp.diag(R))
    col = (R[:, i] + jnp.eye(3, dtype=jnp.float32)[:, i])
    axis_pi = col / (jnp.linalg.norm(col) + 1e-24)
    sign = jnp.where(v[i] >= 0, 1.0, -1.0)
    axis = jnp.where(theta > 3.1415, sign * axis_pi, axis)
    return jnp.where(theta < 1e-7, v * 0.5, axis * theta)


def project_norm(pts3d: jnp.ndarray, R: jnp.ndarray,
                 t: jnp.ndarray) -> jnp.ndarray:
    """(N,3) world points -> (N,2) normalized image coords (x/z, y/z)."""
    pc = pts3d @ R.T + t
    z = pc[:, 2:3]
    z = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    return pc[:, :2] / z


def pixel_err2(proj_n: jnp.ndarray, img_n: jnp.ndarray,
               fx, fy) -> jnp.ndarray:
    """Squared pixel reprojection error from normalized residuals."""
    d = proj_n - img_n
    return (d[:, 0] * fx) ** 2 + (d[:, 1] * fy) ** 2


def normalize_points(img: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    return jnp.stack([(img[:, 0] - cx) / fx, (img[:, 1] - cy) / fy], axis=1)


# ---------------------------------------------------------------------------
# fixed-iteration small linear algebra
#
# XLA's eigh/svd lower to tolerance-based while loops whose trip count is
# data-dependent; on the near-singular, eigenvalue-clustered matrices EPnP
# produces (rank-11 MtM, planar-ish covariances) they run ~300x slower
# than on random test matrices and dominated the fused frame time
# (~17 ms/frame of the 26 ms chunk budget — PERF.md).  These replacements
# use fixed iteration counts — Jacobi sweeps, shifted inverse subspace
# iteration, quaternion power iteration — so the compiled program has
# static cost and the clustered-spectrum case IS the fast case.
# ---------------------------------------------------------------------------

def _eigh3_closed(A: jnp.ndarray):
    """Closed-form symmetric 3x3 eigendecomposition (Smith's trigonometric
    eigenvalues + cross-product eigenvectors), ascending.  Pure scalar
    elementwise math — fuses completely under vmap."""
    a00, a01, a02 = A[0, 0], A[0, 1], A[0, 2]
    a11, a12, a22 = A[1, 1], A[1, 2], A[2, 2]
    q = (a00 + a11 + a22) / 3.0
    p1 = a01 * a01 + a02 * a02 + a12 * a12
    b00, b11, b22 = a00 - q, a11 - q, a22 - q
    p2 = b00 * b00 + b11 * b11 + b22 * b22 + 2.0 * p1
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, 1e-30))
    # det(B)/2 with B = (A - q I) / p
    detb = (b00 * (b11 * b22 - a12 * a12)
            - a01 * (a01 * b22 - a12 * a02)
            + a02 * (a01 * a12 - b11 * a02)) / (p * p * p)
    r = jnp.clip(detb / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    w2 = q + 2.0 * p * jnp.cos(phi)
    w0 = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    w1 = 3.0 * q - w0 - w2

    def eigvec(lam):
        # v = best-conditioned cross product of two rows of (A - lam I)
        r0 = jnp.stack([a00 - lam, a01, a02])
        r1 = jnp.stack([a01, a11 - lam, a12])
        r2 = jnp.stack([a02, a12, a22 - lam])
        c01 = jnp.cross(r0, r1)
        c02 = jnp.cross(r0, r2)
        c12 = jnp.cross(r1, r2)
        n01 = jnp.sum(c01 * c01)
        n02 = jnp.sum(c02 * c02)
        n12 = jnp.sum(c12 * c12)
        v = jnp.where(n01 >= jnp.maximum(n02, n12), c01,
                      jnp.where(n02 >= n12, c02, c12))
        nv = jnp.maximum(jnp.sqrt(n01), jnp.maximum(jnp.sqrt(n02),
                                                    jnp.sqrt(n12)))
        return v / jnp.maximum(nv, 1e-30)

    v0 = eigvec(w0)
    v2 = eigvec(w2)
    v1 = jnp.cross(v2, v0)
    v1 = v1 / jnp.maximum(jnp.linalg.norm(v1), 1e-30)
    w = jnp.stack([w0, w1, w2])
    V = jnp.stack([v0, v1, v2], axis=1)
    return w, V


def _smallest_eigvecs_12(MtM: jnp.ndarray, k: int = 4, iters: int = 6):
    """The k eigenvectors of smallest eigenvalue of a 12x12 PSD matrix,
    columns ascending — deflated shifted inverse iteration.  Each vector
    is driven toward the smallest eigendirection not yet found (inverse
    iteration amplifies by (lam_j+sigma)/(lam_i+sigma) per step, largest
    exactly for EPnP's near-null spectrum), with Gram-Schmidt deflation
    against the already-converged columns, so the ascending order falls
    out naturally — no Rayleigh-Ritz, no data-dependent while loops
    (XLA's eigh stalls ~300x on these clustered spectra), and a compile-
    friendly op count (one batched cholesky + 4*iters triangular solves).
    """
    # shift must dominate f32 rounding of the (possibly ~-1e-7-negative)
    # null eigenvalues or the cholesky NaNs; 1e-4*mean-eigenvalue still
    # amplifies the null space ~1e3x per inverse-iteration step
    sigma = 1e-4 * (jnp.trace(MtM) / 12.0) + 1e-12
    L = jnp.linalg.cholesky(MtM + sigma * jnp.eye(12, dtype=MtM.dtype))

    X = jnp.asarray(_SUBSPACE_X0[:, :k], MtM.dtype)
    for _ in range(iters):
        # all k columns in ONE pair of triangular solves, then ordered
        # modified Gram-Schmidt: column j is purged of columns < j, so
        # inverse-iteration dominance sorts the basis ascending
        Y = jax.scipy.linalg.cho_solve((L, True), X)
        cols = []
        for j in range(k):
            v = Y[:, j]
            for u in cols:
                v = v - jnp.dot(u, v) * u
            v = v / jnp.sqrt(jnp.maximum(jnp.dot(v, v), 1e-30))
            cols.append(v)
        X = jnp.stack(cols, axis=1)
    return X                               # (12, k), ascending


_SUBSPACE_X0 = np.linalg.qr(
    np.random.default_rng(42).standard_normal((12, 8)))[0].astype(np.float32)


# ---------------------------------------------------------------------------
# EPnP (single hypothesis in normalized coords; vmapped by the RANSAC driver)
# ---------------------------------------------------------------------------

def _horn(pws: jnp.ndarray, pcs: jnp.ndarray):
    """Absolute orientation: R, t with pcs ~= R pws + t.

    Kabsch with a closed-form SVD: right singular vectors of the 3x3
    correlation C from `_eigh3_closed(C^T C)`, left ones reconstructed as
    u_i = C v_i / s_i for the two dominant directions and the third by
    cross product — which makes U proper by construction, so the optimal
    PROPER rotation (OpenCV's det-corrected SVD, CvSolvePnP's epnp)
    falls out without any det fix and without XLA's data-dependent svd
    loop (~300x slow on the near-degenerate point sets RANSAC draws)."""
    cw = jnp.mean(pws, axis=0)
    cc = jnp.mean(pcs, axis=0)
    C = (pcs - cc).T @ (pws - cw)          # sum pc_c pw_c^T
    w3, V = _eigh3_closed(C.T @ C)         # ascending; V proper
    s = jnp.sqrt(jnp.clip(w3, 1e-20, None))
    u2 = C @ V[:, 2] / s[2]
    u1 = C @ V[:, 1] / s[1]
    # f32 re-orthonormalization + right-handed completion
    u2 = u2 / jnp.maximum(jnp.linalg.norm(u2), 1e-30)
    u1 = u1 - jnp.dot(u1, u2) * u2
    u1 = u1 / jnp.maximum(jnp.linalg.norm(u1), 1e-30)
    u0 = jnp.cross(u1, u2)
    U = jnp.stack([u0, u1, u2], axis=1)
    R = U @ V.T
    # first-order orthogonal-Procrustes polish: forming C^T C costs half
    # the f32 mantissa; at the optimum R^T C is symmetric, so solve the
    # linearized correction R <- R exp([w]x) that kills the antisymmetric
    # part of E = R^T C (classic rotation-averaging step, one 3x3 solve)
    for _ in range(2):
        E = R.T @ C
        S_ = 0.5 * (E + E.T)
        a = 0.5 * jnp.stack([E[2, 1] - E[1, 2],
                             E[0, 2] - E[2, 0],
                             E[1, 0] - E[0, 1]])
        # antisym([w]x S) = [((tr S) I - S) w]x / 2  =>  w = 2 Hs^-1 a
        Hs = jnp.trace(S_) * jnp.eye(3, dtype=pws.dtype) - S_
        wv = jnp.linalg.solve(
            Hs + 1e-9 * jnp.eye(3, dtype=pws.dtype), 2.0 * a)
        R = R @ rodrigues(wv)
    t = cc - R @ cw
    return R, t


_CP_PAIRS = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]


def _compute_rho(cws: jnp.ndarray) -> jnp.ndarray:
    """Squared distances between the 4 control points (6,)."""
    return jnp.stack([jnp.sum((cws[a] - cws[b]) ** 2) for a, b in _CP_PAIRS])


def _compute_L(v: jnp.ndarray) -> jnp.ndarray:
    """L_6x10 from the 4 null-space vectors v (4,4,3).

    Column order matches OpenCV's epnp::compute_L_6x10:
    [b11 b12 b22 b13 b23 b33 b14 b24 b34 b44]
    """
    dv = jnp.stack([v[:, a, :] - v[:, b, :] for a, b in _CP_PAIRS])  # (6,4,3)

    def dot(i, j):
        return jnp.sum(dv[:, i, :] * dv[:, j, :], axis=1)  # (6,)

    cols = [dot(0, 0), 2 * dot(0, 1), dot(1, 1), 2 * dot(0, 2),
            2 * dot(1, 2), dot(2, 2), 2 * dot(0, 3), 2 * dot(1, 3),
            2 * dot(2, 3), dot(3, 3)]
    return jnp.stack(cols, axis=1)  # (6,10)


def _betas10(b: jnp.ndarray) -> jnp.ndarray:
    """4 betas -> the 10 quadratic monomials in L's column order."""
    b1, b2, b3, b4 = b[0], b[1], b[2], b[3]
    return jnp.stack([b1 * b1, b1 * b2, b2 * b2, b1 * b3, b2 * b3,
                      b3 * b3, b1 * b4, b2 * b4, b3 * b4, b4 * b4])


def _solve_lsq(A, b):
    """Least squares via normal equations with Tikhonov guard (small dims,
    O(1)-conditioned in the normalized frame)."""
    AtA = A.T @ A
    reg = 1e-8 * (jnp.trace(AtA) / A.shape[1] + 1.0)
    return jnp.linalg.solve(AtA + reg * jnp.eye(A.shape[1], dtype=A.dtype),
                            A.T @ b)


def _betas10_jac(b: jnp.ndarray) -> jnp.ndarray:
    """Analytic d(betas10)/db, (10, 4) — cheaper than jacfwd's 4-tangent
    re-evaluation inside the 300x3-wide vmap."""
    b1, b2, b3, b4 = b[0], b[1], b[2], b[3]
    z = jnp.zeros_like(b1)
    rows = [
        (2 * b1, z, z, z), (b2, b1, z, z), (z, 2 * b2, z, z),
        (b3, z, b1, z), (z, b3, b2, z), (z, z, 2 * b3, z),
        (b4, z, z, b1), (z, b4, z, b2), (z, z, b4, b3), (z, z, z, 2 * b4),
    ]
    return jnp.stack([jnp.stack(r) for r in rows])


def _gauss_newton_betas(L, rho, betas, iters: int = 5):
    def body(b, _):
        r = L @ _betas10(b) - rho
        J = L @ _betas10_jac(b)
        db = _solve_lsq(J, -r)
        return b + db, None
    out, _ = jax.lax.scan(body, betas, None, length=iters)
    return out


def epnp_norm(obj: jnp.ndarray, img_n: jnp.ndarray):
    """EPnP for one minimal sample, observations in normalized coords.

    obj (n,3) f32, img_n (n,2) f32 normalized.  Returns (R, t, ok) with
    pc = R pw + t.  Mirrors OpenCV's epnp class (choose_control_points /
    compute_barycentric / M / betas approx 1-3 + Gauss-Newton / Horn),
    reformulated with eigh + batched least squares so it vmaps.
    """
    obj = obj.astype(jnp.float32)
    img_n = img_n.astype(jnp.float32)
    n = obj.shape[0]

    # --- control points: centroid + principal axes --------------------
    c0 = jnp.mean(obj, axis=0)
    P0 = obj - c0
    cov = P0.T @ P0
    w, Uc = _eigh3_closed(cov)              # ascending, closed form
    w = jnp.clip(w, 0.0, None)
    scale = jnp.sqrt(w[::-1] / n)           # descending, like OpenCV's SVD
    axes = Uc[:, ::-1].T                    # rows = principal axes
    cws = jnp.concatenate([c0[None], c0[None] + scale[:, None] * axes],
                          axis=0)           # (4,3)

    # --- barycentric coordinates --------------------------------------
    CC = (cws[1:] - cws[0]).T               # (3,3) columns c_i - c_0
    CCinv = jnp.linalg.inv(CC + 1e-9 * jnp.eye(3, dtype=jnp.float32))
    a123 = P0 @ CCinv.T                     # (n,3)
    alphas = jnp.concatenate([1.0 - jnp.sum(a123, axis=1, keepdims=True),
                              a123], axis=1)  # (n,4)

    # --- M matrix (2n x 12), normalized intrinsics (f=1, c=0) ----------
    u, vv = img_n[:, 0], img_n[:, 1]
    zero = jnp.zeros_like(alphas)
    r1 = jnp.stack([alphas, zero, alphas * (-u[:, None])],
                   axis=-1).reshape(n, 12)
    r2 = jnp.stack([zero, alphas, alphas * (-vv[:, None])],
                   axis=-1).reshape(n, 12)
    M = jnp.concatenate([r1, r2], axis=0)   # (2n, 12)

    MtM = M.T @ M
    evec = _smallest_eigvecs_12(MtM)        # 4 smallest, ascending
    v4 = evec.T.reshape(4, 4, 3)            # v4[k] = k-th null vector, (4,3)

    L = _compute_L(v4)                      # (6,10)
    rho = _compute_rho(cws)                 # (6,)

    # --- betas, three approximation cases + GN ------------------------
    # case 1: unknowns [B11 B12 B13 B14] -> columns 0,1,3,6
    A1 = L[:, jnp.array([0, 1, 3, 6])]
    x1 = _solve_lsq(A1, rho)
    b1_1 = jnp.sqrt(jnp.abs(x1[0]))
    s1 = jnp.where(x1[0] < 0, -1.0, 1.0)
    den1 = jnp.maximum(b1_1, 1e-9)
    betas1 = jnp.stack([b1_1, s1 * x1[1] / den1, s1 * x1[2] / den1,
                        s1 * x1[3] / den1])

    # case 2: unknowns [B11 B12 B22] -> columns 0,1,2
    A2 = L[:, jnp.array([0, 1, 2])]
    x2 = _solve_lsq(A2, rho)
    b2_1 = jnp.sqrt(jnp.abs(x2[0]))
    b2_2 = jnp.sqrt(jnp.abs(x2[2]))
    b2_2 = jnp.where(x2[1] < 0, -b2_2, b2_2)
    zero_f = jnp.float32(0.0)
    betas2 = jnp.stack([b2_1, b2_2, zero_f, zero_f])

    # case 3: unknowns [B11 B12 B22 B13 B23] -> columns 0,1,2,3,4
    A3 = L[:, jnp.array([0, 1, 2, 3, 4])]
    x3 = _solve_lsq(A3, rho)
    b3_1 = jnp.sqrt(jnp.abs(x3[0]))
    b3_2 = jnp.sqrt(jnp.abs(x3[2]))
    b3_2 = jnp.where(x3[1] < 0, -b3_2, b3_2)
    b3_3 = x3[3] / jnp.maximum(b3_1, 1e-9)
    betas3 = jnp.stack([b3_1, b3_2, b3_3, zero_f])

    def solve_case(betas):
        b = _gauss_newton_betas(L, rho, betas)
        ccs = jnp.einsum("k,kij->ij", b, v4)        # (4,3) cam control pts
        pcs = alphas @ ccs                          # (n,3)
        # depth sign fix (OpenCV: if pc z of first point negative, negate)
        sign = jnp.where(pcs[0, 2] < 0, -1.0, 1.0)
        pcs = pcs * sign
        R, t = _horn(obj, pcs)
        proj = project_norm(obj, R, t)
        err = jnp.mean(jnp.sum((proj - img_n) ** 2, axis=1))
        return R, t, err

    Rs, ts, errs = jax.vmap(solve_case)(
        jnp.stack([betas1, betas2, betas3]))
    best = jnp.argmin(errs)
    ok = jnp.isfinite(errs[best])
    return Rs[best], ts[best], ok


def epnp(obj: jnp.ndarray, img: jnp.ndarray, K: jnp.ndarray):
    """Pixel-coordinate convenience wrapper around epnp_norm."""
    return epnp_norm(obj, normalize_points(img.astype(jnp.float32),
                                           K.astype(jnp.float32)))


# ---------------------------------------------------------------------------
# RANSAC driver
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("n_hyp", "model_points"))
def ransac_epnp(obj: jnp.ndarray, img: jnp.ndarray, valid: jnp.ndarray,
                K: jnp.ndarray, key: jnp.ndarray,
                reproj_thr: jnp.ndarray,
                n_hyp: int = 300, model_points: int = 6):
    """Batched RANSAC: n_hyp EPnP hypotheses in parallel.

    obj (N,3), img (N,2) pixels, valid (N,) bool (padded capacity).
    Returns (rvec, tvec, inlier_mask (N,), n_inliers).  The returned model
    is the raw best minimal-sample model (the reference's OpenCV-3
    semantics; see module docstring).
    """
    N = obj.shape[0]
    K = K.astype(jnp.float32)
    fx, fy = K[0, 0], K[1, 1]
    img_n = normalize_points(img.astype(jnp.float32), K)
    obj = obj.astype(jnp.float32)
    nv = jnp.sum(valid)

    # map uniform draws to valid indices
    order = jnp.argsort(jnp.where(valid, jnp.arange(N), N + jnp.arange(N)))
    u = jax.random.uniform(key, (n_hyp, model_points))
    draw = jnp.minimum((u * jnp.maximum(nv, 1)).astype(jnp.int32),
                       jnp.maximum(nv - 1, 0))
    sample_idx = order[draw]                          # (n_hyp, m)

    Rs, ts, oks = jax.vmap(lambda idx: epnp_norm(obj[idx], img_n[idx]))(
        sample_idx)
    Rs, ts = jax.lax.optimization_barrier((Rs, ts))

    # reprojection errors of every hypothesis against every point
    def errors(R, t):
        p = project_norm(obj, R, t)
        return pixel_err2(p, img_n, fx, fy)

    err2 = jax.vmap(errors)(Rs, ts)                   # (n_hyp, N)
    thr2 = reproj_thr * reproj_thr
    inl = (err2 <= thr2) & valid[None, :]
    # barrier: keeps the (n_hyp, N) reduction out of the surrounding
    # fusion (multi-output fusions over this operand tile ~300x slower,
    # see kernels/matching.py _top2_min)
    inl = jax.lax.optimization_barrier(inl)
    counts = jnp.where(oks, jnp.sum(inl, axis=1), -1)
    counts = jax.lax.optimization_barrier(counts)
    best = jnp.argmax(counts)                         # first max wins
    R, t = Rs[best], ts[best]
    rvec = rodrigues_inv(R)
    return rvec, ts[best], inl[best], counts[best]


# ---------------------------------------------------------------------------
# Iterative refinement (cv::solvePnP ITERATIVE with guess == LM on
# reprojection residuals); Jacobian via JAX autodiff through Rodrigues.
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("iters",))
def refine_lm(obj: jnp.ndarray, img: jnp.ndarray, weight: jnp.ndarray,
              K: jnp.ndarray, rvec0: jnp.ndarray, tvec0: jnp.ndarray,
              iters: int = 20):
    """Weighted LM minimizing sum w_i ||proj(X_i) - x_i||^2 over (rvec,t),
    residuals in normalized coords (equivalent minimizer to the pixel LM
    for fx == fy, which holds on rectified stereo).

    Twin of cvFindExtrinsicCameraParams2's CvLevMarq refinement (the
    useExtrinsicGuess=true path the reference hits at
    MotionEstimation.cpp:331-339).  `weight` in {0,1} selects inliers with
    static shapes.
    """
    K = K.astype(jnp.float32)
    obj = obj.astype(jnp.float32)
    img_n = normalize_points(img.astype(jnp.float32), K)
    w = weight.astype(jnp.float32)

    def residuals(p):
        R = rodrigues(p[:3])
        proj = project_norm(obj, R, p[3:])
        return ((proj - img_n) * w[:, None]).reshape(-1)

    def cost(p):
        r = residuals(p)
        return jnp.sum(r * r)

    p0 = jnp.concatenate([rvec0.astype(jnp.float32),
                          tvec0.astype(jnp.float32)])

    def body(state, _):
        p, lam = state
        r = residuals(p)
        J = jax.jacfwd(residuals)(p)                  # (2N, 6)
        H = J.T @ J
        g = J.T @ r
        step = jnp.linalg.solve(
            H + lam * jnp.diag(jnp.diag(H) + 1e-12), -g)
        new_p = p + step
        better = cost(new_p) < cost(p)
        p = jnp.where(better, new_p, p)
        lam = jnp.where(better, lam * 0.5, lam * 10.0)
        return (p, lam), None

    (p, _), _ = jax.lax.scan(body, (p0, jnp.float32(1e-3)), None,
                             length=iters)
    return p[:3], p[3:]


@jax.jit
def refine_lm_with_errors(obj, img, weight, valid, K, rvec, tvec):
    """Fused refine_lm + reproj_errors: one device dispatch per
    refinement round instead of two (the per-call host<->device latency
    dominates the VO step on remote-attached TPUs)."""
    rvec2, tvec2 = refine_lm(obj, img, weight, K, rvec, tvec)
    err = reproj_errors(obj, img, valid, K, rvec2, tvec2)
    return rvec2, tvec2, err


@jax.jit
def reproj_errors(obj, img, valid, K, rvec, tvec):
    """Per-point reprojection L2 pixel errors, BIG where invalid."""
    K = K.astype(jnp.float32)
    R = rodrigues(rvec)
    p = project_norm(obj.astype(jnp.float32), R, tvec.astype(jnp.float32))
    img_n = normalize_points(img.astype(jnp.float32), K)
    e = jnp.sqrt(pixel_err2(p, img_n, K[0, 0], K[1, 1]))
    return jnp.where(valid, e, BIG)


def solve_pnp_ransac(obj: np.ndarray, img: np.ndarray, K: np.ndarray,
                     rvec0: np.ndarray, tvec0: np.ndarray,
                     min_inliers: int = 20, refine_iterations: int = 1,
                     reprojection_error: float = 2.0,
                     refine_sigma: float = 3.0,
                     iterations_count: int = 300,
                     seed: int = 0,
                     capacity: int = 1536):
    """Host driver: full twin of the reference solvePnPRansac + refinement
    loop (MotionEstimation.cpp:279-374).

    Returns (rvec, tvec, inlier_indices ndarray); on failure the guess is
    passed back with empty inliers (the reference's rvec/tvec passthrough).
    Inputs are unpadded (N,3)/(N,2) float arrays.
    """
    n = len(obj)
    if n < 6:
        return np.asarray(rvec0), np.asarray(tvec0), np.zeros(0, np.int64)

    cap = capacity
    obj_p = np.zeros((cap, 3), np.float32)
    img_p = np.zeros((cap, 2), np.float32)
    val_p = np.zeros((cap,), bool)
    obj_p[:n] = obj
    img_p[:n] = img
    val_p[:n] = True

    obj_d = jnp.asarray(obj_p)
    img_d = jnp.asarray(img_p)
    val_d = jnp.asarray(val_p)
    K_d = jnp.asarray(K, dtype=jnp.float32)

    key = jax.random.PRNGKey(seed)
    rvec, tvec, inl_mask, n_inl = ransac_epnp(
        obj_d, img_d, val_d, K_d, key,
        jnp.float32(reprojection_error), n_hyp=iterations_count)
    inl_mask = np.asarray(inl_mask)
    n_inl = int(n_inl)
    if n_inl <= 0:
        return np.asarray(rvec0), np.asarray(tvec0), np.zeros(0, np.int64)

    inliers = np.nonzero(inl_mask)[0]

    # ---- refinement loop (MotionEstimation.cpp:310-374) ---------------
    if n_inl >= min_inliers and refine_iterations > 0:
        thr = reprojection_error
        prev = inliers
        new_inliers = inliers
        new_rvec, new_tvec = rvec, tvec
        refine_count = 0
        while refine_count < refine_iterations:
            w = np.zeros((cap,), np.float32)
            w[prev] = 1.0
            new_rvec, new_tvec, err_d = refine_lm_with_errors(
                obj_d, img_d, jnp.asarray(w), val_d, K_d, new_rvec,
                new_tvec)
            err = np.asarray(err_d)
            new_inliers = np.nonzero(err[:n] <= thr)[0]
            kept = err[new_inliers]
            # reference calcVariance over the kept errors
            var = float(np.var(kept, ddof=1)) if len(kept) > 1 else 0.0
            thr = min(reprojection_error,
                      refine_sigma * float(np.sqrt(var)))
            if (len(new_inliers) < min_inliers or
                    np.array_equal(new_inliers, prev)):
                break
            # the reference's std::swap: prev takes the new set, new_inliers
            # the old one (matters for the post-loop swap below)
            new_inliers, prev = prev, new_inliers
            refine_count += 1
        # post-loop swap(new_inliers, inliers) (MotionEstimation.cpp:370):
        # break -> last computed set; budget exhaustion -> the previous set
        inliers = new_inliers
        rvec, tvec = new_rvec, new_tvec

    return np.asarray(rvec), np.asarray(tvec), inliers
