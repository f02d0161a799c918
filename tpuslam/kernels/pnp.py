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
# fixed-iteration small linear algebra — SCALARIZED
#
# Two tiers of re-design for TPU:
#
# 1. (round 3) XLA's eigh/svd lower to tolerance-based while loops whose
#    trip count is data-dependent; on the near-singular, eigenvalue-
#    clustered matrices EPnP produces (rank-11 MtM, planar-ish
#    covariances) they ran ~300x slower than on random test matrices.
#    Replaced with fixed iteration counts.
# 2. (round 4) even fixed-count `lax.linalg` primitives (cholesky,
#    triangular_solve, solve, inv) are opaque custom calls: under the
#    300-wide hypothesis vmap each became its own tiny kernel launch,
#    and the RANSAC solve chain compiled to ~300 sequential dispatches
#    at 7-40 us each (~8.7 ms/frame, PERF.md).  Every small decomposition
#    below is therefore UNROLLED into scalar arithmetic on the matrix
#    components — under vmap each scalar is a (n_hyp,)-lane vector and
#    the whole solve chain is pure elementwise math that XLA fuses into
#    a handful of VPU kernels (the "Pallas mega-kernel" effect without
#    leaving XLA, so the exact same program also runs on the CPU test
#    mesh).  Matrices are Python tuples of jnp scalars; loops over their
#    static dimensions unroll at trace time.
# ---------------------------------------------------------------------------


def _chol_s(A, n):
    """Unrolled Cholesky of an n x n PSD 'matrix' given as nested lists
    of scalars.  Returns lower-triangular L as nested lists."""
    L = [[None] * n for _ in range(n)]
    for j in range(n):
        d = A[j][j]
        for k in range(j):
            d = d - L[j][k] * L[j][k]
        L[j][j] = jnp.sqrt(jnp.maximum(d, 1e-30))
        inv_d = 1.0 / L[j][j]
        for i in range(j + 1, n):
            s = A[i][j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = s * inv_d
    return L


def _chol_solve_s(L, b, n):
    """Solve L L^T x = b (unrolled).  `b` entries may carry extra leading
    axes (e.g. stacked columns); L entries broadcast."""
    y = [None] * n
    for i in range(n):
        s = b[i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return x


def _solve_sym_s(A, b, n):
    """x = A^-1 b for symmetric positive-definite A (scalar comps)."""
    return _chol_solve_s(_chol_s(A, n), b, n)


def _inv3_s(M):
    """General 3x3 inverse via adjugate (scalar comps)."""
    a, b, c = M[0]
    d, e, f = M[1]
    g, h, i = M[2]
    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    det = a * A + b * B + c * C
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-30,
                              jnp.where(det < 0, -1e-30, 1e-30), det)
    return (((e * i - f * h) * inv_det, -(b * i - c * h) * inv_det,
             (b * f - c * e) * inv_det),
            (-(d * i - f * g) * inv_det, (a * i - c * g) * inv_det,
             -(a * f - c * d) * inv_det),
            ((d * h - e * g) * inv_det, -(a * h - b * g) * inv_det,
             (a * e - b * d) * inv_det))


def _dot3_s(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _cross3_s(a, b):
    return (a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0])


def _norm3_s(a):
    return jnp.sqrt(jnp.maximum(_dot3_s(a, a), 1e-30))


def _matmul3_s(A, B):
    return tuple(tuple(sum(A[i][k] * B[k][j] for k in range(3))
                       for j in range(3)) for i in range(3))


def _rodrigues_s(w):
    """Axis-angle 3-tuple -> rotation matrix as nested tuples.
    R = c I + (1-c) kk^T + s [k]x, small-angle I + [w]x."""
    th2 = w[0] * w[0] + w[1] * w[1] + w[2] * w[2]
    theta = jnp.sqrt(th2 + 1e-24)
    kx, ky, kz = w[0] / theta, w[1] / theta, w[2] / theta
    s, c = jnp.sin(theta), jnp.cos(theta)
    one_c = 1.0 - c
    small = theta < 1e-7

    def entry(big, sm):
        return jnp.where(small, sm, big)

    return (
        (entry(c + one_c * kx * kx, jnp.ones_like(theta)),
         entry(one_c * kx * ky - s * kz, -w[2]),
         entry(one_c * kx * kz + s * ky, w[1])),
        (entry(one_c * ky * kx + s * kz, w[2]),
         entry(c + one_c * ky * ky, jnp.ones_like(theta)),
         entry(one_c * ky * kz - s * kx, -w[0])),
        (entry(one_c * kz * kx - s * ky, -w[1]),
         entry(one_c * kz * ky + s * kx, w[0]),
         entry(c + one_c * kz * kz, jnp.ones_like(theta))),
    )


def _eigh3_s(a00, a01, a02, a11, a12, a22):
    """Scalarized Smith closed-form symmetric 3x3 eigendecomposition,
    ascending.  Returns ((w0,w1,w2), V) with V[i][k] = component i of
    eigenvector k (nested tuples)."""
    q = (a00 + a11 + a22) / 3.0
    p1 = a01 * a01 + a02 * a02 + a12 * a12
    b00, b11, b22 = a00 - q, a11 - q, a22 - q
    p2 = b00 * b00 + b11 * b11 + b22 * b22 + 2.0 * p1
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, 1e-30))
    detb = (b00 * (b11 * b22 - a12 * a12)
            - a01 * (a01 * b22 - a12 * a02)
            + a02 * (a01 * a12 - b11 * a02)) / (p * p * p)
    r = jnp.clip(detb / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    w2 = q + 2.0 * p * jnp.cos(phi)
    w0 = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    w1 = 3.0 * q - w0 - w2

    def eigvec(lam):
        r0 = (a00 - lam, a01, a02)
        r1 = (a01, a11 - lam, a12)
        r2 = (a02, a12, a22 - lam)
        c01 = _cross3_s(r0, r1)
        c02 = _cross3_s(r0, r2)
        c12 = _cross3_s(r1, r2)
        n01 = _dot3_s(c01, c01)
        n02 = _dot3_s(c02, c02)
        n12 = _dot3_s(c12, c12)
        use01 = n01 >= jnp.maximum(n02, n12)
        use02 = n02 >= n12
        v = tuple(jnp.where(use01, c01[i],
                            jnp.where(use02, c02[i], c12[i]))
                  for i in range(3))
        nv = jnp.maximum(jnp.sqrt(n01),
                         jnp.maximum(jnp.sqrt(n02), jnp.sqrt(n12)))
        nv = jnp.maximum(nv, 1e-30)
        return tuple(v[i] / nv for i in range(3))

    v0 = eigvec(w0)
    v2 = eigvec(w2)
    v1 = _cross3_s(v2, v0)
    n1 = _norm3_s(v1)
    v1 = tuple(v1[i] / n1 for i in range(3))
    V = tuple((v0[i], v1[i], v2[i]) for i in range(3))
    return (w0, w1, w2), V

def _eigh3_closed(A: jnp.ndarray):
    """Array-interface wrapper over the scalarized closed-form 3x3 eigh
    (ascending eigenvalues, V columns = eigenvectors)."""
    (w0, w1, w2), V = _eigh3_s(A[0, 0], A[0, 1], A[0, 2],
                               A[1, 1], A[1, 2], A[2, 2])
    w = jnp.stack([w0, w1, w2])
    Vm = jnp.stack([jnp.stack(list(row)) for row in V])
    return w, Vm


def _smallest_eigvecs_12_s(A, k: int = 4, iters: int = 6):
    """The k eigenvectors of smallest eigenvalue of a 12x12 PSD 'matrix'
    of scalar components, ascending — deflated shifted inverse iteration
    (see round-3 notes above: inverse iteration amplifies the null
    directions; ordered MGS deflation sorts the basis ascending; no
    data-dependent loops).  Fully unrolled: one scalar Cholesky + per-
    iteration substitutions with the k columns riding a (k,)-shaped
    trailing axis.  Returns `cols`: list of k columns, each a list of 12
    scalars."""
    # shift must dominate f32 rounding of the (possibly ~-1e-7-negative)
    # null eigenvalues or the cholesky sqrt-clamps; 1e-4*mean-eigenvalue
    # still amplifies the null space ~1e3x per inverse-iteration step
    tr = A[0][0]
    for i in range(1, 12):
        tr = tr + A[i][i]
    sigma = 1e-4 * (tr / 12.0) + 1e-12
    Ash = [[A[i][j] + sigma if i == j else A[i][j] for j in range(12)]
           for i in range(12)]
    L = _chol_s(Ash, 12)

    X = [jnp.asarray(_SUBSPACE_X0[i, :k]) for i in range(12)]  # (k,) each
    cols = []
    for _ in range(iters):
        Y = _chol_solve_s(L, X, 12)
        cols = []
        for j in range(k):
            v = [Y[i][j] for i in range(12)]
            for u in cols:
                d = v[0] * u[0]
                for i in range(1, 12):
                    d = d + v[i] * u[i]
                v = [v[i] - d * u[i] for i in range(12)]
            nrm2 = v[0] * v[0]
            for i in range(1, 12):
                nrm2 = nrm2 + v[i] * v[i]
            nrm = jnp.sqrt(jnp.maximum(nrm2, 1e-30))
            cols.append([v[i] / nrm for i in range(12)])
        X = [jnp.stack([cols[j][i] for j in range(k)]) for i in range(12)]
    return cols


_SUBSPACE_X0 = np.linalg.qr(
    np.random.default_rng(42).standard_normal((12, 8)))[0].astype(np.float32)


# ---------------------------------------------------------------------------
# EPnP (single hypothesis in normalized coords; vmapped by the RANSAC driver)
# ---------------------------------------------------------------------------

def _horn_core_s(P0, c0, pcs, n: int):
    """Scalarized absolute orientation: R, t with pcs ~= R pws + t,
    where pws = c0 + P0 (pre-centered world points).

    Kabsch with a closed-form SVD: right singular vectors of the 3x3
    correlation C from the scalar eigh of C^T C, left ones reconstructed
    as u_i = C v_i / s_i for the two dominant directions and the third by
    cross product — which makes U proper by construction, so the optimal
    PROPER rotation (OpenCV's det-corrected SVD, CvSolvePnP's epnp)
    falls out without any det fix and without XLA's data-dependent svd
    loop.  Entirely elementwise: vmaps/case-batches into fused VPU code.
    """
    inv_n = 1.0 / n
    cc = tuple(sum(pcs[p][i] for p in range(n)) * inv_n for i in range(3))
    C = [[None] * 3 for _ in range(3)]
    for i in range(3):
        for j in range(3):
            s = (pcs[0][i] - cc[i]) * P0[0][j]
            for p in range(1, n):
                s = s + (pcs[p][i] - cc[i]) * P0[p][j]
            C[i][j] = s
    # B = C^T C (symmetric)
    def b_entry(i, j):
        return (C[0][i] * C[0][j] + C[1][i] * C[1][j] + C[2][i] * C[2][j])
    (w0, w1, w2), V = _eigh3_s(b_entry(0, 0), b_entry(0, 1), b_entry(0, 2),
                               b_entry(1, 1), b_entry(1, 2), b_entry(2, 2))
    s1 = jnp.sqrt(jnp.clip(w1, 1e-20, None))
    s2 = jnp.sqrt(jnp.clip(w2, 1e-20, None))
    v1 = (V[0][1], V[1][1], V[2][1])
    v2 = (V[0][2], V[1][2], V[2][2])
    u2 = tuple(_dot3_s(C[i], v2) / s2 for i in range(3))
    u1 = tuple(_dot3_s(C[i], v1) / s1 for i in range(3))
    # f32 re-orthonormalization + right-handed completion
    n2 = _norm3_s(u2)
    u2 = tuple(u2[i] / n2 for i in range(3))
    d12 = _dot3_s(u1, u2)
    u1 = tuple(u1[i] - d12 * u2[i] for i in range(3))
    n1 = _norm3_s(u1)
    u1 = tuple(u1[i] / n1 for i in range(3))
    u0 = _cross3_s(u1, u2)
    v0 = (V[0][0], V[1][0], V[2][0])
    # R = U V^T with U columns (u0, u1, u2)
    R = [[u0[i] * v0[j] + u1[i] * v1[j] + u2[i] * v2[j]
          for j in range(3)] for i in range(3)]
    # first-order orthogonal-Procrustes polish: forming C^T C costs half
    # the f32 mantissa; at the optimum R^T C is symmetric, so solve the
    # linearized correction R <- R exp([w]x) that kills the antisymmetric
    # part of E = R^T C (classic rotation-averaging step, one 3x3 solve)
    for _ in range(2):
        E = [[R[0][i] * C[0][j] + R[1][i] * C[1][j] + R[2][i] * C[2][j]
              for j in range(3)] for i in range(3)]
        a = (0.5 * (E[2][1] - E[1][2]),
             0.5 * (E[0][2] - E[2][0]),
             0.5 * (E[1][0] - E[0][1]))
        trS = E[0][0] + E[1][1] + E[2][2]
        # Hs = tr(S) I - S with S = (E + E^T)/2, plus 1e-9 ridge
        Hs = [[None] * 3 for _ in range(3)]
        for i in range(3):
            for j in range(3):
                sij = 0.5 * (E[i][j] + E[j][i])
                Hs[i][j] = (trS - sij + 1e-9) if i == j else -sij
        Hi = _inv3_s(Hs)
        wv = tuple(2.0 * _dot3_s(Hi[i], a) for i in range(3))
        R = _matmul3_s(R, _rodrigues_s(wv))
    t = tuple(cc[i] - _dot3_s(R[i], c0) for i in range(3))
    return R, t


def _horn(pws: jnp.ndarray, pcs: jnp.ndarray):
    """Array-interface wrapper over the scalarized Horn core."""
    n = pws.shape[0]
    cw = tuple(jnp.mean(pws[:, i]) for i in range(3))
    P0 = [tuple(pws[p, i] - cw[i] for i in range(3)) for p in range(n)]
    pc = [tuple(pcs[p, i] for i in range(3)) for p in range(n)]
    R, t = _horn_core_s(P0, cw, pc, n)
    Rm = jnp.stack([jnp.stack(list(r)) for r in R])
    return Rm, jnp.stack(list(t))


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
    compute_barycentric / M / betas approx 1-3 + Gauss-Newton / Horn) —
    fully scalarized (see the linear-algebra section note): the whole
    solve chain is elementwise arithmetic on matrix components, so the
    300-wide RANSAC vmap compiles to a handful of fused VPU kernels
    instead of ~300 sequential `lax.linalg` dispatches.  The three beta
    approximation cases ride a (3,)-shaped trailing axis through the
    shared Gauss-Newton/Horn tail.
    """
    obj = obj.astype(jnp.float32)
    img_n = img_n.astype(jnp.float32)
    n = obj.shape[0]
    ox = [obj[p, 0] for p in range(n)]
    oy = [obj[p, 1] for p in range(n)]
    oz = [obj[p, 2] for p in range(n)]
    uu = [img_n[p, 0] for p in range(n)]
    vv = [img_n[p, 1] for p in range(n)]
    inv_n = 1.0 / n

    # --- control points: centroid + principal axes --------------------
    c0 = (sum(ox) * inv_n, sum(oy) * inv_n, sum(oz) * inv_n)
    P0 = [(ox[p] - c0[0], oy[p] - c0[1], oz[p] - c0[2]) for p in range(n)]

    def cov_entry(i, j):
        s = P0[0][i] * P0[0][j]
        for p in range(1, n):
            s = s + P0[p][i] * P0[p][j]
        return s

    (w0, w1, w2), V = _eigh3_s(cov_entry(0, 0), cov_entry(0, 1),
                               cov_entry(0, 2), cov_entry(1, 1),
                               cov_entry(1, 2), cov_entry(2, 2))
    # descending like OpenCV's SVD; axes rows = V columns reversed
    scale = [jnp.sqrt(jnp.clip(wd, 0.0, None) * inv_n)
             for wd in (w2, w1, w0)]
    cws = [c0] + [tuple(c0[i] + scale[k] * V[i][2 - k] for i in range(3))
                  for k in range(3)]

    # --- barycentric coordinates --------------------------------------
    CC = [[cws[j + 1][i] - c0[i] + (1e-9 if i == j else 0.0)
           for j in range(3)] for i in range(3)]
    CCinv = _inv3_s(CC)
    alphas = []
    for p in range(n):
        a123 = tuple(_dot3_s(CCinv[i], P0[p]) for i in range(3))
        alphas.append((1.0 - a123[0] - a123[1] - a123[2],
                       a123[0], a123[1], a123[2]))

    # --- MtM (12x12) from its 4x4 structure blocks --------------------
    # M rows per point p: r1[3i+(0,1,2)] = (a_i, 0, -u a_i),
    #                     r2[3i+(0,1,2)] = (0, a_i, -v a_i)
    # => MtM factors into S=sum(a_i a_l), U=sum(u a_i a_l),
    #    V=sum(v a_i a_l), Q=sum((u^2+v^2) a_i a_l)
    Sq = [[None] * 4 for _ in range(4)]
    Uq = [[None] * 4 for _ in range(4)]
    Vq = [[None] * 4 for _ in range(4)]
    Qq = [[None] * 4 for _ in range(4)]
    for i in range(4):
        for l in range(i, 4):
            s_ = u_ = v_ = q_ = None
            for p in range(n):
                ail = alphas[p][i] * alphas[p][l]
                su = uu[p] * ail
                sv = vv[p] * ail
                sq = uu[p] * uu[p] * ail + vv[p] * vv[p] * ail
                s_ = ail if s_ is None else s_ + ail
                u_ = su if u_ is None else u_ + su
                v_ = sv if v_ is None else v_ + sv
                q_ = sq if q_ is None else q_ + sq
            Sq[i][l] = Sq[l][i] = s_
            Uq[i][l] = Uq[l][i] = u_
            Vq[i][l] = Vq[l][i] = v_
            Qq[i][l] = Qq[l][i] = q_
    zero = jnp.zeros_like(Sq[0][0])
    MtM = [[None] * 12 for _ in range(12)]
    for i in range(4):
        for l in range(4):
            MtM[3 * i + 0][3 * l + 0] = Sq[i][l]
            MtM[3 * i + 0][3 * l + 1] = zero
            MtM[3 * i + 0][3 * l + 2] = -Uq[i][l]
            MtM[3 * i + 1][3 * l + 0] = zero
            MtM[3 * i + 1][3 * l + 1] = Sq[i][l]
            MtM[3 * i + 1][3 * l + 2] = -Vq[i][l]
            MtM[3 * i + 2][3 * l + 0] = -Uq[i][l]
            MtM[3 * i + 2][3 * l + 1] = -Vq[i][l]
            MtM[3 * i + 2][3 * l + 2] = Qq[i][l]

    cols = _smallest_eigvecs_12_s(MtM)      # 4 smallest, ascending
    # v4[k][cp] = 3-vector of null vector k at control point cp
    v4 = [[(cols[k][3 * cp + 0], cols[k][3 * cp + 1], cols[k][3 * cp + 2])
           for cp in range(4)] for k in range(4)]

    # --- L (6x10) and rho (6,) ----------------------------------------
    dv = [[tuple(v4[k][a][i] - v4[k][b][i] for i in range(3))
           for k in range(4)] for a, b in _CP_PAIRS]

    def dvdot(pair, i, j):
        return _dot3_s(dv[pair][i], dv[pair][j])

    Lmat = [[dvdot(p, 0, 0), 2 * dvdot(p, 0, 1), dvdot(p, 1, 1),
             2 * dvdot(p, 0, 2), 2 * dvdot(p, 1, 2), dvdot(p, 2, 2),
             2 * dvdot(p, 0, 3), 2 * dvdot(p, 1, 3), 2 * dvdot(p, 2, 3),
             dvdot(p, 3, 3)] for p in range(6)]
    rho = [sum((cws[a][i] - cws[b][i]) ** 2 for i in range(3))
           for a, b in _CP_PAIRS]

    # --- betas, three approximation cases -----------------------------
    def lsq_cols(idx):
        """Least squares of L[:, idx] x = rho via regularized normal
        equations (scalarized _solve_lsq twin)."""
        k = len(idx)
        AtA = [[None] * k for _ in range(k)]
        for i in range(k):
            for j in range(i, k):
                s = Lmat[0][idx[i]] * Lmat[0][idx[j]]
                for p in range(1, 6):
                    s = s + Lmat[p][idx[i]] * Lmat[p][idx[j]]
                AtA[i][j] = AtA[j][i] = s
        tr = AtA[0][0]
        for i in range(1, k):
            tr = tr + AtA[i][i]
        reg = 1e-8 * (tr / k + 1.0)
        for i in range(k):
            AtA[i][i] = AtA[i][i] + reg
        rhs = []
        for i in range(k):
            s = Lmat[0][idx[i]] * rho[0]
            for p in range(1, 6):
                s = s + Lmat[p][idx[i]] * rho[p]
            rhs.append(s)
        return _chol_solve_s(_chol_s(AtA, k), rhs, k)

    x1 = lsq_cols([0, 1, 3, 6])
    b1_1 = jnp.sqrt(jnp.abs(x1[0]))
    s1 = jnp.where(x1[0] < 0, -1.0, 1.0)
    den1 = jnp.maximum(b1_1, 1e-9)
    betas1 = (b1_1, s1 * x1[1] / den1, s1 * x1[2] / den1,
              s1 * x1[3] / den1)

    x2 = lsq_cols([0, 1, 2])
    b2_1 = jnp.sqrt(jnp.abs(x2[0]))
    b2_2 = jnp.sqrt(jnp.abs(x2[2]))
    b2_2 = jnp.where(x2[1] < 0, -b2_2, b2_2)
    betas2 = (b2_1, b2_2, zero, zero)

    x3 = lsq_cols([0, 1, 2, 3, 4])
    b3_1 = jnp.sqrt(jnp.abs(x3[0]))
    b3_2 = jnp.sqrt(jnp.abs(x3[2]))
    b3_2 = jnp.where(x3[1] < 0, -b3_2, b3_2)
    b3_3 = x3[3] / jnp.maximum(b3_1, 1e-9)
    betas3 = (b3_1, b3_2, b3_3, zero)

    # --- shared Gauss-Newton + Horn tail over a (3,) case axis --------
    b = [jnp.stack([betas1[c], betas2[c], betas3[c]]) for c in range(4)]
    for _ in range(5):
        b1, b2, b3, b4 = b
        mono = (b1 * b1, b1 * b2, b2 * b2, b1 * b3, b2 * b3, b3 * b3,
                b1 * b4, b2 * b4, b3 * b4, b4 * b4)
        r = []
        for p in range(6):
            s = Lmat[p][0] * mono[0]
            for c in range(1, 10):
                s = s + Lmat[p][c] * mono[c]
            r.append(s - rho[p])
        # J columns from the beta-monomial jacobian structure
        J = [(2 * b1 * Lmat[p][0] + b2 * Lmat[p][1] + b3 * Lmat[p][3]
              + b4 * Lmat[p][6],
              b1 * Lmat[p][1] + 2 * b2 * Lmat[p][2] + b3 * Lmat[p][4]
              + b4 * Lmat[p][7],
              b1 * Lmat[p][3] + b2 * Lmat[p][4] + 2 * b3 * Lmat[p][5]
              + b4 * Lmat[p][8],
              b1 * Lmat[p][6] + b2 * Lmat[p][7] + b3 * Lmat[p][8]
              + 2 * b4 * Lmat[p][9]) for p in range(6)]
        AtA = [[None] * 4 for _ in range(4)]
        for i in range(4):
            for j in range(i, 4):
                s = J[0][i] * J[0][j]
                for p in range(1, 6):
                    s = s + J[p][i] * J[p][j]
                AtA[i][j] = AtA[j][i] = s
        tr = AtA[0][0] + AtA[1][1] + AtA[2][2] + AtA[3][3]
        reg = 1e-8 * (tr / 4 + 1.0)
        for i in range(4):
            AtA[i][i] = AtA[i][i] + reg
        rhs = []
        for i in range(4):
            s = J[0][i] * r[0]
            for p in range(1, 6):
                s = s + J[p][i] * r[p]
            rhs.append(-s)
        db = _chol_solve_s(_chol_s(AtA, 4), rhs, 4)
        b = [b[i] + db[i] for i in range(4)]

    # camera-frame control points and points (case axis rides along)
    ccs = [tuple(b[0] * v4[0][cp][i] + b[1] * v4[1][cp][i]
                 + b[2] * v4[2][cp][i] + b[3] * v4[3][cp][i]
                 for i in range(3)) for cp in range(4)]
    pcs = [tuple(alphas[p][0] * ccs[0][i] + alphas[p][1] * ccs[1][i]
                 + alphas[p][2] * ccs[2][i] + alphas[p][3] * ccs[3][i]
                 for i in range(3)) for p in range(n)]
    # depth sign fix (OpenCV: if pc z of first point negative, negate)
    sign = jnp.where(pcs[0][2] < 0, -1.0, 1.0)
    pcs = [tuple(sign * pcs[p][i] for i in range(3)) for p in range(n)]

    R, t = _horn_core_s(P0, c0, pcs, n)

    # per-case mean squared reprojection error over the sample points
    err = None
    for p in range(n):
        pcx = _dot3_s(R[0], (ox[p], oy[p], oz[p])) + t[0]
        pcy = _dot3_s(R[1], (ox[p], oy[p], oz[p])) + t[1]
        pcz = _dot3_s(R[2], (ox[p], oy[p], oz[p])) + t[2]
        z = jnp.where(jnp.abs(pcz) < 1e-9, 1e-9, pcz)
        du = pcx / z - uu[p]
        dvp = pcy / z - vv[p]
        e = du * du + dvp * dvp
        err = e if err is None else err + e
    err = err * inv_n

    # best of the 3 cases (argmin, first-min tie-break; non-finite errs
    # lose to any finite case)
    e0 = jnp.where(jnp.isfinite(err[0]), err[0], jnp.float32(np.inf))
    e1 = jnp.where(jnp.isfinite(err[1]), err[1], jnp.float32(np.inf))
    e2 = jnp.where(jnp.isfinite(err[2]), err[2], jnp.float32(np.inf))
    pick0 = (e0 <= e1) & (e0 <= e2)
    pick1 = e1 <= e2

    def pick(q):
        return jnp.where(pick0, q[0], jnp.where(pick1, q[1], q[2]))

    Rb = jnp.stack([jnp.stack([pick(R[i][j]) for j in range(3)])
                    for i in range(3)])
    tb = jnp.stack([pick(t[i]) for i in range(3)])
    best_err = jnp.where(pick0, e0, jnp.where(pick1, e1, e2))
    ok = best_err < np.float32(np.inf)
    return Rb, tb, ok


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

    def normal_eqs(p):
        """Analytic H = J^T J, g = J^T r for the weighted normalized
        reprojection residuals.  jacfwd pushed 6 tangents through the
        whole rodrigues+project graph per LM iteration (~60 small
        sequential kernels inside the VO scan — refine measured
        0.66 ms/frame of the chunk budget); analytically only the (3,3,3)
        dR/drvec needs autodiff (a scalar-sized jacobian, once), and the
        per-point chain rule is a handful of (N,.) einsums."""
        rv, t = p[:3], p[3:]
        R = rodrigues(rv)
        pc = obj @ R.T + t
        z = jnp.where(jnp.abs(pc[:, 2]) < 1e-9, 1e-9, pc[:, 2])
        invz = 1.0 / z
        x_z = pc[:, 0] * invz
        y_z = pc[:, 1] * invz
        proj = jnp.stack([x_z, y_z], axis=1)
        r2 = (proj - img_n) * w[:, None]               # (N,2)

        J_R = jax.jacfwd(rodrigues)(rv)                # (3,3,3)
        dPdr = jnp.einsum("abc,nb->nac", J_R, obj)     # (N,3,3)
        # d proj / d P  rows: u: (1/z, 0, -x/z^2), v: (0, 1/z, -y/z^2)
        Ju_r = (dPdr[:, 0] - x_z[:, None] * dPdr[:, 2]) * invz[:, None]
        Jv_r = (dPdr[:, 1] - y_z[:, None] * dPdr[:, 2]) * invz[:, None]
        Ju_t = jnp.stack([invz, jnp.zeros_like(invz),
                          -x_z * invz], axis=1)
        Jv_t = jnp.stack([jnp.zeros_like(invz), invz,
                          -y_z * invz], axis=1)
        Ju = jnp.concatenate([Ju_r, Ju_t], axis=1) * w[:, None]  # (N,6)
        Jv = jnp.concatenate([Jv_r, Jv_t], axis=1) * w[:, None]
        H = Ju.T @ Ju + Jv.T @ Jv
        g = Ju.T @ r2[:, 0] + Jv.T @ r2[:, 1]
        c = jnp.sum(r2 * r2)
        return H, g, c

    def body(state, _):
        # (H, g, cost) at the accepted iterate ride the carry, so each
        # iteration runs ONE evaluation: the candidate's normal_eqs
        # doubles as its cost check, and a rejected step re-steps from
        # the carried H/g with the raised lambda — the same iterate
        # sequence as evaluate-then-accept, one forward pass cheaper.
        # The damped 6x6 normal equations are solved with the unrolled
        # scalar Cholesky — jnp.linalg.solve is an opaque custom call
        # that costs a dispatch per LM iteration on the remote chip.
        p, lam, H, g, c_prev = state
        Hd = [[H[i, j] + (lam * (H[i, i] + 1e-12) if i == j else 0.0)
               for j in range(6)] for i in range(6)]
        step = _chol_solve_s(_chol_s(Hd, 6), [-g[i] for i in range(6)], 6)
        new_p = p + jnp.stack(step)
        Hn, gn, c_new = normal_eqs(new_p)
        better = c_new < c_prev
        p = jnp.where(better, new_p, p)
        H = jnp.where(better, Hn, H)
        g = jnp.where(better, gn, g)
        lam = jnp.where(better, lam * 0.5, lam * 10.0)
        return (p, lam, H, g, jnp.where(better, c_new, c_prev)), None

    H0, g0, c0 = normal_eqs(p0)
    (p, _, _, _, _), _ = jax.lax.scan(
        body, (p0, jnp.float32(1e-3), H0, g0, c0), None, length=iters)
    return p[:3], p[3:]


@jax.jit
def refine_lm_with_errors(obj, img, weight, valid, K, rvec, tvec):
    """Fused refine_lm + reproj_errors: one device dispatch per
    refinement round instead of two (the per-call host<->device latency
    dominates the VO step on remote-attached TPUs)."""
    rvec2, tvec2 = refine_lm(obj, img, weight, K, rvec, tvec)
    err = reproj_errors(obj, img, valid, K, rvec2, tvec2)
    return rvec2, tvec2, err


# ---------------------------------------------------------------------------
# Pallas LM refine: the whole 20-iteration loop in ONE kernel
# ---------------------------------------------------------------------------

def _rod_tup(rv):
    """rodrigues() on a (r0, r1, r2) scalar tuple -> 3x3 nested tuple.

    Same math as `rodrigues` (K*K expanded as k k^T - I, exact for the
    normalized axis) in pure scalar ops so it traces inside a Pallas
    kernel and differentiates with jax.jvp — the in-kernel twin of
    refine_lm's jacfwd(rodrigues)."""
    r0, r1, r2 = rv
    theta = jnp.sqrt(r0 * r0 + r1 * r1 + r2 * r2 + 1e-24)
    inv = 1.0 / theta
    k0, k1, k2 = r0 * inv, r1 * inv, r2 * inv
    s = jnp.sin(theta)
    one_c = 1.0 - jnp.cos(theta)
    R = ((1.0 + one_c * (k0 * k0 - 1.0),
          -s * k2 + one_c * k0 * k1,
          s * k1 + one_c * k0 * k2),
         (s * k2 + one_c * k0 * k1,
          1.0 + one_c * (k1 * k1 - 1.0),
          -s * k0 + one_c * k1 * k2),
         (-s * k1 + one_c * k0 * k2,
          s * k0 + one_c * k1 * k2,
          1.0 + one_c * (k2 * k2 - 1.0)))
    Rs = ((jnp.float32(1.0) + 0.0 * r0, -r2, r1),
          (r2, jnp.float32(1.0) + 0.0 * r0, -r0),
          (-r1, r0, jnp.float32(1.0) + 0.0 * r0))
    small = theta < 1e-7
    return tuple(tuple(jnp.where(small, Rs[i][j], R[i][j])
                       for j in range(3)) for i in range(3))


def _refine_lm_errors_kernel(params, ox, oy, oz, u, v, w, msk,
                             out_p, out_err, *, iters: int):
    """Kernel body: weighted LM over (rvec, tvec) + final pixel errors.

    params (1,8) SMEM: [rvec0, tvec0, fx, fy].  ox/oy/oz object planes,
    u/v normalized observations, w inlier weights, msk validity — all
    (rows,128) f32 VMEM.  out_p (8,128): row i broadcasts p[i];
    out_err (rows,128): sqrt pixel errors, BIG where invalid.

    One kernel launch replaces the ~9 XLA fusions x 20 sequential LM
    iterations of refine_lm (measured 0.57 ms/frame inside the fused VO
    scan, tools/profile_vostep.py): every iterate works on VMEM-resident
    (rows,128) planes and ~35 carried (1,1) scalars."""
    X = ox[...]
    Y = oy[...]
    Z = oz[...]
    U = u[...]
    V = v[...]
    Wt = w[...]
    fx = params[0, 6]
    fy = params[0, 7]

    def normal_eqs(p):
        rv = (p[0], p[1], p[2])
        R = _rod_tup(rv)
        dR = []
        for j in range(3):
            tang = tuple(jnp.float32(1.0) if i == j else jnp.float32(0.0)
                         for i in range(3))
            dR.append(jax.jvp(_rod_tup, (rv,), (tang,))[1])
        pcx = R[0][0] * X + R[0][1] * Y + R[0][2] * Z + p[3]
        pcy = R[1][0] * X + R[1][1] * Y + R[1][2] * Z + p[4]
        pcz = R[2][0] * X + R[2][1] * Y + R[2][2] * Z + p[5]
        zz = jnp.where(jnp.abs(pcz) < 1e-9, 1e-9, pcz)
        invz = 1.0 / zz
        x_z = pcx * invz
        y_z = pcy * invz
        r2u = (x_z - U) * Wt
        r2v = (y_z - V) * Wt
        # dP/drvec_j planes, then the projection chain rule rows
        Ju = []
        Jv = []
        for j in range(3):
            dx = dR[j][0][0] * X + dR[j][0][1] * Y + dR[j][0][2] * Z
            dy = dR[j][1][0] * X + dR[j][1][1] * Y + dR[j][1][2] * Z
            dz = dR[j][2][0] * X + dR[j][2][1] * Y + dR[j][2][2] * Z
            Ju.append((dx - x_z * dz) * invz * Wt)
            Jv.append((dy - y_z * dz) * invz * Wt)
        Ju.extend([invz * Wt, 0.0 * invz, -x_z * invz * Wt])
        Jv.extend([0.0 * invz, invz * Wt, -y_z * invz * Wt])
        H = [[None] * 6 for _ in range(6)]
        g = [None] * 6
        for i in range(6):
            for j in range(i, 6):
                hij = jnp.sum(Ju[i] * Ju[j] + Jv[i] * Jv[j])
                H[i][j] = hij
                H[j][i] = hij
            g[i] = jnp.sum(Ju[i] * r2u + Jv[i] * r2v)
        c = jnp.sum(r2u * r2u + r2v * r2v)
        return H, g, c

    p0 = [params[0, i] for i in range(6)]
    H0, g0, c0 = normal_eqs(p0)

    def body(_, state):
        p, lam, H, g, c_prev = state
        Hd = [[H[i][j] + (lam * (H[i][i] + 1e-12) if i == j else 0.0)
               for j in range(6)] for i in range(6)]
        step = _chol_solve_s(_chol_s(Hd, 6), [-g[i] for i in range(6)], 6)
        new_p = [p[i] + step[i] for i in range(6)]
        Hn, gn, c_new = normal_eqs(new_p)
        better = c_new < c_prev
        p = [jnp.where(better, new_p[i], p[i]) for i in range(6)]
        H = [[jnp.where(better, Hn[i][j], H[i][j]) for j in range(6)]
             for i in range(6)]
        g = [jnp.where(better, gn[i], g[i]) for i in range(6)]
        lam = jnp.where(better, lam * 0.5, lam * 10.0)
        return (p, lam, H, g, jnp.where(better, c_new, c_prev))

    p, _, _, _, _ = jax.lax.fori_loop(
        0, iters, body, (p0, jnp.float32(1e-3), H0, g0, c0),
        unroll=False)

    for i in range(6):
        out_p[i, :] = jnp.full((128,), 1.0, jnp.float32) * p[i]
    out_p[6, :] = jnp.zeros((128,), jnp.float32)
    out_p[7, :] = jnp.zeros((128,), jnp.float32)

    # final unweighted pixel errors at the accepted iterate
    R = _rod_tup((p[0], p[1], p[2]))
    pcx = R[0][0] * X + R[0][1] * Y + R[0][2] * Z + p[3]
    pcy = R[1][0] * X + R[1][1] * Y + R[1][2] * Z + p[4]
    pcz = R[2][0] * X + R[2][1] * Y + R[2][2] * Z + p[5]
    zz = jnp.where(jnp.abs(pcz) < 1e-9, 1e-9, pcz)
    du = (pcx / zz - U) * fx
    dv = (pcy / zz - V) * fy
    e = jnp.sqrt(du * du + dv * dv)
    out_err[...] = jnp.where(msk[...] > 0.0, e, jnp.float32(BIG))


@functools.partial(jax.jit, static_argnames=("iters", "interpret"))
def refine_lm_errors_pallas(obj, img, weight, valid, K, rvec0, tvec0,
                            iters: int = 20, interpret: bool = False):
    """Pallas twin of refine_lm_with_errors: same LM (analytic normal
    equations, carried (H, g, cost), scalar Cholesky, same
    accept/reject rule) fused into one TPU kernel.

    Numerics agree with the XLA path to f32 rounding (different reduce
    orders), not bit-exactly — tests/test_pnp.py pins the equivalence
    tolerance; the VO consumes inlier *sets* thresholded at pixel scale,
    where sub-1e-3-px differences are invisible."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N = obj.shape[0]
    pad = (-N) % 128
    Np = N + pad
    rows = Np // 128
    K = K.astype(jnp.float32)
    img_n = normalize_points(img.astype(jnp.float32), K)
    obj = obj.astype(jnp.float32)

    def plane(x):
        return jnp.pad(x, (0, pad)).reshape(rows, 128)

    params = jnp.stack([rvec0[0], rvec0[1], rvec0[2],
                        tvec0[0], tvec0[1], tvec0[2],
                        K[0, 0], K[1, 1]]).astype(jnp.float32)[None, :]
    args = [plane(obj[:, 0]), plane(obj[:, 1]), plane(obj[:, 2]),
            plane(img_n[:, 0]), plane(img_n[:, 1]),
            plane(weight.astype(jnp.float32)),
            plane(valid.astype(jnp.float32))]

    out_p, err = pl.pallas_call(
        functools.partial(_refine_lm_errors_kernel, iters=iters),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_shape=[jax.ShapeDtypeStruct((8, 128), jnp.float32),
                   jax.ShapeDtypeStruct((rows, 128), jnp.float32)],
        interpret=interpret,
    )(params, *args)
    p = out_p[:, 0]
    return p[:3], p[3:6], err.reshape(-1)[:N]


def refine_lm_with_errors_auto(obj, img, weight, valid, K, rvec, tvec):
    """Backend dispatch: the one-kernel Pallas LM on TPU, the XLA path
    elsewhere (the Pallas interpreter is tests-only slow)."""
    if jax.default_backend() == "tpu":
        return refine_lm_errors_pallas(obj, img, weight, valid, K,
                                       rvec, tvec)
    return refine_lm_with_errors(obj, img, weight, valid, K, rvec, tvec)


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
