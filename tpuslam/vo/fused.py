"""Fully-fused on-device visual odometry: one XLA program per frame chunk.

TPU-native re-design of the reference's per-frame loop
(/root/reference/src/slam/src/core/main.cpp:149-308 driving Odometry.cpp /
Registration.cpp / MotionEstimation.cpp).  The reference overlaps its FPGA
front-end with the CPU back-end through double-banked DDR buffers; on a
remote-attached TPU the analogous bottleneck is the ~30 ms host<->device
round-trip, so here the WHOLE visual-odometry chain — StereoBM disparity,
GFTT detection + greedy NMS, ORB description, 3D lifting, guided/global
Hamming matching with the wrong-guess retry, batched EPnP-RANSAC, LM
refinement, covariance, and the keyframe state machine — runs as a single
jitted `lax.scan` over a chunk of frames.  Per chunk there is ONE image
upload and ONE small result download; the odometry state (reference
keyframe features, pose, velocity) never leaves the device.

Semantics mirror the host implementation (vo/odometry.py, vo/registration.py)
which is the line-by-line behavioral twin of the reference:

  * constant-velocity guess, guided matching in a 40-px radius with NNDR
    and single-candidate accept (Registration.cpp:236-303),
  * wrong-guess retry with global brute-force matching when matches fall
    below 25% of the previous count (Odometry.cpp:139-142),
  * first-wins train-index dedup (Registration.cpp:284-300),
  * 300-hypothesis EPnP RANSAC + the OpenCV-3 refine/swap quirk
    (MotionEstimation.cpp:279-374),
  * keyframe insertion at inliers <= 30% of ref keypoints or <= 150
    (Odometry.cpp:165-176), Lost state on failure.

RANSAC sampling order differs from the host path (the host compacts
correspondences before drawing; here rows stay padded), so trajectories
agree to registration noise, not bit-exactly — tests assert trajectory-level
equivalence.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SlamConfig
from ..geometry.camera import StereoCameraModel
from ..kernels.stereo_bm_pallas import stereo_bm_auto
from ..kernels.gftt import gftt_candidates, select_from_candidates_device
from ..kernels.orb import orb_descriptors_const_angle_auto, orb_pattern
from ..kernels import matching as M
from ..kernels import pnp as P

BIG = np.float32(1e9)   # np scalar: importing this module must not init the jax backend


# ---------------------------------------------------------------------------
# jnp rigid-transform helpers (twins of geometry/transform.py)
# ---------------------------------------------------------------------------

def _rot_to_quat(R):
    """Shepperd's method, f32 (transform.py rot_to_quat twin)."""
    t = jnp.trace(R)
    m00, m01 = R[0, 0], R[0, 1]
    m02, m10 = R[0, 2], R[1, 0]
    m11, m12 = R[1, 1], R[1, 2]
    m20, m21, m22 = R[2, 0], R[2, 1], R[2, 2]
    s0 = jnp.sqrt(jnp.maximum(t + 1.0, 1e-30)) * 2
    q0 = jnp.stack([0.25 * s0, (m21 - m12) / s0, (m02 - m20) / s0,
                    (m10 - m01) / s0])
    s1 = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, 1e-30)) * 2
    q1 = jnp.stack([(m21 - m12) / s1, 0.25 * s1, (m01 + m10) / s1,
                    (m02 + m20) / s1])
    s2 = jnp.sqrt(jnp.maximum(1.0 + m11 - m00 - m22, 1e-30)) * 2
    q2 = jnp.stack([(m02 - m20) / s2, (m01 + m10) / s2, 0.25 * s2,
                    (m12 + m21) / s2])
    s3 = jnp.sqrt(jnp.maximum(1.0 + m22 - m00 - m11, 1e-30)) * 2
    q3 = jnp.stack([(m10 - m01) / s3, (m02 + m20) / s3, (m12 + m21) / s3,
                    0.25 * s3])
    diag = jnp.stack([m00, m11, m22])
    arg = jnp.argmax(diag)
    q = jnp.where(t > 0, q0,
                  jnp.where(arg == 0, q1, jnp.where(arg == 1, q2, q3)))
    return q / jnp.linalg.norm(q)


def _quat_to_rot(q):
    w, x, y, z = q[0], q[1], q[2], q[3]
    n = w * w + x * x + y * y + z * z
    s = jnp.where(n > 0, 2.0 / jnp.maximum(n, 1e-30), 0.0)
    wx, wy, wz = s * w * x, s * w * y, s * w * z
    xx, xy, xz = s * x * x, s * x * y, s * x * z
    yy, yz, zz = s * y * y, s * y * z, s * z * z
    return jnp.array([[1 - (yy + zz), xy - wz, xz + wy],
                      [xy + wz, 1 - (xx + zz), yz - wx],
                      [xz - wy, yz + wx, 1 - (xx + yy)]], jnp.float32)


def _compose(a, b):
    """a @ b with quaternion rotation renormalization
    (Transform.cpp:190-200)."""
    m = a @ b
    R = _quat_to_rot(_rot_to_quat(m[:3, :3]))
    return m.at[:3, :3].set(R)


def _inv(t):
    """Rigid 4x4 inverse."""
    R = t[:3, :3]
    p = t[:3, 3]
    out = jnp.eye(4, dtype=jnp.float32)
    out = out.at[:3, :3].set(R.T)
    return out.at[:3, 3].set(-R.T @ p)


def _from_rpy_xyz(x, y, z, roll, pitch, yaw):
    A, B = jnp.cos(yaw), jnp.sin(yaw)
    C, D = jnp.cos(pitch), jnp.sin(pitch)
    E, F = jnp.cos(roll), jnp.sin(roll)
    DE, DF = D * E, D * F
    return jnp.array([
        [A * C, A * DF - B * E, B * F + A * DE, x],
        [B * C, A * E + B * DF, B * DE - A * F, y],
        [-D, C * F, C * E, z],
        [0.0, 0.0, 0.0, 1.0]], jnp.float32)


def _get_rpy(t):
    roll = jnp.arctan2(t[2, 1], t[2, 2])
    pitch = jnp.arcsin(jnp.clip(-t[2, 0], -1.0, 1.0))
    yaw = jnp.arctan2(t[1, 0], t[0, 0])
    return roll, pitch, yaw


def _masked_median(x, mask):
    """sorted(kept)[count >> 1] — the reference's std::sort median pick
    (MotionEstimation.cpp:188-206)."""
    big = jnp.float32(3e38)
    v = jnp.sort(jnp.where(mask, x, big))
    cnt = jnp.sum(mask)
    idx = jnp.clip(cnt >> 1, 0, x.shape[0] - 1)
    return v[idx], cnt


def _masked_median2_kernel(a_ref, b_ref, msk_ref, out_ref):
    """Both covariance medians in ONE Pallas kernel: exact k-th-smallest
    (k = count >> 1) of each masked non-negative f32 array via a 31-step
    binary search on the i32 bit pattern (monotone for non-negative
    floats, +inf included).  Replaces the two in-scan jnp.sorts of
    _masked_median (~0.15 ms/frame of fusion overhead, the largest
    scan item after the Pallas LM refine).  out rows: 0 = median(a),
    1 = median(b), 2 = count."""
    msk = msk_ref[...] > 0.0
    cnt = jnp.sum(msk.astype(jnp.int32))
    n = a_ref.shape[0] * a_ref.shape[1]
    k = jnp.clip(cnt >> 1, 0, n - 1)

    def kth_smallest(x):
        big = jnp.float32(3e38)
        keys = jax.lax.bitcast_convert_type(
            jnp.where(msk, x, big), jnp.int32)

        def body(_, state):
            lo, hi = state
            mid = lo + ((hi - lo) >> 1)    # (lo+hi)>>1 overflows i32
            c = jnp.sum((keys <= mid).astype(jnp.int32))
            pick = c >= k + 1
            return (jnp.where(pick, lo, mid + 1),
                    jnp.where(pick, mid, hi))

        lo, _ = jax.lax.fori_loop(
            0, 31, body, (jnp.int32(0), jnp.int32(2 ** 31 - 1)),
            unroll=False)
        # Mosaic bitcast is vector-only: broadcast the scalar key first
        return jax.lax.bitcast_convert_type(
            jnp.full((128,), 1, jnp.int32) * lo, jnp.float32)

    out_ref[0, :] = kth_smallest(a_ref[...])
    out_ref[1, :] = kth_smallest(b_ref[...])
    out_ref[2, :] = jnp.full((128,), 1.0, jnp.float32) * \
        cnt.astype(jnp.float32)
    out_ref[3, :] = jnp.zeros((128,), jnp.float32)


def _masked_median2_pallas(a, b, mask):
    """(med_a, med_b, cnt) — one-kernel twin of two _masked_median
    calls for non-negative inputs (tests/test_vo.py pins equality)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    n = a.shape[0]
    pad = (-n) % 128
    rows = (n + pad) // 128

    def plane(x, fill):
        return jnp.pad(x.astype(jnp.float32), (0, pad),
                       constant_values=fill).reshape(rows, 128)

    out = pl.pallas_call(
        _masked_median2_kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4, 128), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )(plane(a, 0.0), plane(b, 0.0), plane(mask.astype(jnp.float32), 0.0))
    return out[0, 0], out[1, 0], out[2, 0].astype(jnp.int32)


# ---------------------------------------------------------------------------
# fused chunk program factory
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class FusedShapes:
    chunk: int = 40
    capacity: int = 1536
    n_cand: int = 4096
    dec: int = 4                 # disparity decimation for map nodes


def make_frontend_fn(camera: StereoCameraModel, cfg: SlamConfig,
                     shapes: FusedShapes = FusedShapes()):
    """Per-frame device front-end factory: (left, right) u8 -> feature
    dict (kpts, valid, n_kpts, desc, bits, pts3d, disp_dec).

    The unit the fused VO scans over, also used standalone by the
    multi-host frontend sharding (dist/multihost.py) where each process
    extracts features for its frame block and only these compact arrays
    cross DCN."""
    H, W = camera.height, camera.width
    C = shapes.capacity
    dec = shapes.dec
    Hd, Wd = H // dec, W // dec

    local_t = jnp.asarray(camera.local_transform, jnp.float32)
    fx = camera.fx_l
    cx_l, cy_l = camera.cx_l, camera.cy_l
    c_rl = jnp.float32(camera.cx_r - camera.cx_l)
    wx_n = jnp.float32(camera.Tx_l / camera.fx_l -
                       camera.Tx_r / camera.fx_r)
    wy_n = jnp.float32(camera.Tx_l / camera.fy_l -
                       camera.Tx_r / camera.fy_r)
    pattern = jnp.asarray(orb_pattern())
    border = cfg.orb.edge_threshold

    def compute_disparity(left, right, with_speckle: bool):
        # Depth-method dispatch is static (traced once per config):
        # the fused program supports the dense engines (BM / SGBM,
        # main.cpp:197-244); the sparse LK option runs in the standard
        # pipeline (runtime/pipeline.py).
        if cfg.depth_method == "sgbm":
            from ..kernels.sgbm import sgbm as _sgbm
            return _sgbm(left, right, cfg.sgbm,
                         with_speckle=with_speckle)
        return stereo_bm_auto(left, right, cfg.bm,
                              with_speckle=with_speckle)

    def frontend(left, right, disp=None):
        # Speckle is config-switched (SlamConfig.fused_speckle, default
        # off): the default mirrors the reference's REAL-TIME PL path
        # whose `bm` block (bm*.v) computes SAD + uniqueness + subpixel
        # only; its BATCH mode adds cv::StereoBM speckle filtering
        # (main.cpp:207-212) — enable for strict parity there; the
        # fused chunk driver then computes disparity for the whole
        # chunk, runs the BATCH-FLAT speckle pass (stereo_bm.
        # speckle_filter_batch — vmapping the per-frame filter turns
        # its pointer-jump takes into catastrophic batched gathers) and
        # hands the filtered maps in via `disp`.  tools/ab_speckle.py
        # holds the trajectory-level A/B behind the default.
        # optimization_barrier between stages is load-bearing throughout
        # this function: inside the chunk lax.scan XLA otherwise merges
        # consecutive stages into multi-output mega-fusions whose tiling
        # collapses (~40x on this body; same pathology as
        # kernels/matching.py _top2_min).  Barriers restore the fusion
        # boundaries the stages have when compiled standalone.
        if disp is None:
            disp = compute_disparity(left, right, cfg.fused_speckle)
        disp = jax.lax.optimization_barrier(disp)
        vals, idx, _, _ = gftt_candidates(
            left, jnp.float32(cfg.gftt.quality_level), cfg.gftt.block_size,
            max_candidates=shapes.n_cand)
        vals, idx = jax.lax.optimization_barrier((vals, idx))
        kpts, valid, _ = select_from_candidates_device(
            vals, idx, W, jnp.float32(cfg.gftt.min_distance),
            max_features=cfg.gftt.max_features, capacity=C)
        kpts, valid = jax.lax.optimization_barrier((kpts, valid))

        # ORB border filter + order-preserving compaction (CvORB.cpp:137-155)
        x, y = kpts[:, 0], kpts[:, 1]
        keep = valid & (x >= border) & (x < W - border) & \
            (y >= border) & (y < H - border)
        order = jnp.argsort(~keep, stable=True)
        kpts = kpts[order]
        n_k = jnp.sum(keep)
        valid = jnp.arange(C) < n_k
        kpts = jnp.where(valid[:, None], kpts, 0.0)
        kpts, valid = jax.lax.optimization_barrier((kpts, valid))

        # GFTT keypoints always carry angle -1 (GFTT.cpp octave-0 path),
        # so the static-angle bit-plane formulation applies — the
        # blur-fused Pallas strip kernel on TPU (the 7x7 Gaussian runs
        # inside the strip kernel; the standalone orb_blur dispatch cost
        # ~0.7 ms/frame in r4), orb_blur + the XLA bit-plane path
        # elsewhere (bit-identical; see orb.py)
        desc = orb_descriptors_const_angle_auto(left, kpts[:, :2],
                                                valid, pattern, C,
                                                angle_deg=-1.0)
        desc = jax.lax.optimization_barrier(desc)

        # 3D lift (Stereo.cpp:53-117): truncated int coords, /16, robot frame
        xi = kpts[:, 0].astype(jnp.int32)
        yi = kpts[:, 1].astype(jnp.int32)
        d16 = jnp.take(disp.reshape(-1), yi * W + xi)   # flat 1D gather
        d = jnp.maximum(d16.astype(jnp.float32) / 16.0, 0.0)
        denom = d + c_rl
        Wx = wx_n / denom
        Wy = wy_n / denom
        px = (kpts[:, 0] - cx_l) * Wx
        py = (kpts[:, 1] - cy_l) * Wy
        pz = fx * Wx
        pts = jnp.stack([px, py, pz], axis=1)
        pts = pts @ local_t[:3, :3].T + local_t[:3, 3]
        ok3 = (d > 0.0) & valid & jnp.isfinite(pts).all(axis=1)
        pts3d = jnp.where(ok3[:, None], pts, jnp.nan)

        disp_dec = disp[:Hd * dec:dec, :Wd * dec:dec]
        return dict(kpts=kpts, valid=valid, n_kpts=n_k.astype(jnp.int32),
                    desc=desc, bits=M.unpack_bits(desc), pts3d=pts3d,
                    disp_dec=disp_dec)

    frontend.compute_disparity = compute_disparity
    return frontend


def batched_frontend(frontend, cfg: SlamConfig, lefts, rights):
    """vmap the frontend over a chunk; with fused_speckle the disparity
    is computed for the whole chunk first and speckle-filtered by the
    batch-flat pass (see frontend's speckle note)."""
    if not cfg.fused_speckle:
        return jax.vmap(frontend)(lefts, rights)
    from ..kernels.stereo_bm import speckle_filter_batch
    disp_all = jax.vmap(
        lambda l, r: frontend.compute_disparity(l, r, False))(
        lefts, rights)
    if cfg.depth_method == "sgbm":
        c = cfg.sgbm
        if c.speckle_window_size > 0 and c.speckle_range >= 0:
            # SGBM passes DISP_SCALE*speckleRange (kernels/sgbm.py)
            disp_all, _ = speckle_filter_batch(
                disp_all, c.speckle_window_size, c.speckle_range * 16,
                (c.min_disparity - 1) * 16)
    else:
        c = cfg.bm
        if c.speckle_window_size > 0 and c.speckle_range >= 0:
            disp_all, _ = speckle_filter_batch(
                disp_all, c.speckle_window_size, c.speckle_range,
                (c.min_disparity - 1) * 16)
    return jax.vmap(frontend)(lefts, rights, disp_all)


def make_fused_chunk_fn(camera: StereoCameraModel, cfg: SlamConfig,
                        shapes: FusedShapes = FusedShapes(),
                        full_node_offsets: tuple[int, ...] | None = None):
    """Build (init_carry, chunk_step) for the fused VO.

    chunk_step(carry, lefts (B,H,W) u8, rights, dts (B,), active (B,) bool)
      -> (carry, outs dict)

    outs carries per-frame poses/transforms/flags for every frame plus the
    full feature set ONLY for `full_node_offsets` (the mapper's full-node
    cadence) — the D2H link is ~50 MB/s, so features of intermediate
    frames (which the mapper immediately clears, Mapper.cpp:73-86) never
    cross it.
    """
    H, W = camera.height, camera.width
    C = shapes.capacity
    B = shapes.chunk
    if full_node_offsets is None:
        # mapper full-node cadence: every map_update-th processed frame,
        # starting at index map_update-1 (Mapper.cpp:71-86)
        mu = cfg.mapper.map_update
        full_node_offsets = tuple(range(mu - 1, B, mu))

    local_t = jnp.asarray(camera.local_transform, jnp.float32)
    fx, fy = camera.fx_l, camera.fy_l
    cx_l, cy_l = camera.cx_l, camera.cy_l
    nndr = jnp.float32(cfg.matching.nndr)
    radius = jnp.float32(cfg.matching.guess_win_size)
    min_inl = cfg.pnp.min_inliers
    reproj_err = jnp.float32(cfg.pnp.reprojection_error)
    K_l = jnp.asarray(camera.K_l, jnp.float32)
    eye4 = jnp.eye(4, dtype=jnp.float32)

    frontend = make_frontend_fn(camera, cfg, shapes)

    # ---- match-set helpers ---------------------------------------------
    def dedup(accept, i1):
        """First-wins train-index dedup (Registration.cpp:284-300):
        among accepted rows sharing i1, keep the lowest from-index."""
        rank = jnp.where(accept, jnp.arange(C, dtype=jnp.int32),
                         jnp.int32(C + 1))
        first = jnp.full((C,), C + 1, jnp.int32).at[i1].min(rank)
        return accept & (first[i1] == jnp.arange(C, dtype=jnp.int32))

    def corr_mask(accept, i1, ref_pts3d):
        """Accepted + deduped + finite-3D correspondence validity and its
        count (estimate_motion's finite filter)."""
        acc = dedup(accept, i1)
        finite = jnp.isfinite(ref_pts3d).all(axis=1)
        m = acc & finite
        return m, jnp.sum(m).astype(jnp.int32)

    # ---- the VO scan body ----------------------------------------------
    def vo_step(carry, feats, dt):
        frames = carry["frames"]
        is_first = frames == 0
        pose = carry["pose"]

        # constant-velocity guess (Odometry.cpp:42-56)
        v = carry["vel"]
        guess = _from_rpy_xyz(v[0] * dt, v[1] * dt, v[2] * dt,
                              v[3] * dt, v[4] * dt, v[5] * dt)
        has_guess = carry["has_vel"] & ~is_first

        motion_since_kf = _compose(_inv(carry["kf_pose"]), pose)
        guess_update = _compose(motion_since_kf, guess)

        # shared Hamming matrix, ref (query) x cur (train).  The bit-
        # matrix matmul is exact at precision="default" (bf16 {0,1}
        # operands, f32 accumulation, sums <= 256) — ~6x cheaper than
        # the repo-wide "highest" pin, bit-identical output
        dist = (carry["ref_nbits"][:, None] + feats["nbits"][None, :]
                - 2.0 * jnp.matmul(carry["ref_bits"], feats["bits"].T,
                                   precision="default"))
        dist = jnp.where(carry["ref_valid"][:, None] &
                         feats["valid"][None, :], dist, BIG)
        dist = jax.lax.optimization_barrier(dist)

        # guided candidate set (Registration.cpp:236-303)
        guess_cam = _inv(_compose(guess_update, local_t))
        pc = carry["ref_pts3d"] @ guess_cam[:3, :3].T + guess_cam[:3, 3]
        pu = pc[:, 0] / pc[:, 2] * fx + cx_l
        pv = pc[:, 1] / pc[:, 2] * fy + cy_l
        pvalid = (jnp.isfinite(pu) & jnp.isfinite(pv) &
                  (pu > 0.0) & (pu < W - 1) & (pv > 0.0) & (pv < H - 1) &
                  (pc[:, 2] > 0.0) & carry["ref_valid"])
        dxm = jnp.nan_to_num(pu, nan=-1e6)[:, None] - feats["kpts"][:, 0][None, :]
        dym = jnp.nan_to_num(pv, nan=-1e6)[:, None] - feats["kpts"][:, 1][None, :]
        in_rad = ((dxm * dxm + dym * dym <= radius * radius) &
                  feats["valid"][None, :] & pvalid[:, None])
        in_rad = jax.lax.optimization_barrier(in_rad)
        n_cand_g = jnp.sum(in_rad, axis=1)
        n_cand_g = jax.lax.optimization_barrier(n_cand_g)

        dist_g = jnp.where(in_rad, dist, BIG)
        d1g, i1g, d2g, _ = M._top2_min(dist_g)
        acc_g = ((n_cand_g >= 2) & (d1g < nndr * d2g)) | (n_cand_g == 1)
        m_g, n_match_g = corr_mask(acc_g, i1g, carry["ref_pts3d"])

        # global brute-force (Registration.cpp:311-335)
        d1n, i1n, d2n, _ = M._top2_min(dist)
        acc_n = carry["ref_valid"] & (d1n < nndr * d2n)
        m_n, n_match_n = corr_mask(acc_n, i1n, carry["ref_pts3d"])

        # wrong-guess retry (Odometry.cpp:139-142)
        retry = has_guess & (n_match_g <
                             carry["num_objects"].astype(jnp.float32) *
                             cfg.odometry.guess_ratio)
        use_global = ~has_guess | retry
        i1 = jnp.where(use_global, i1n, i1g)
        m = jnp.where(use_global, m_n, m_g)
        n_match = jnp.where(use_global, n_match_n, n_match_g)
        guess_used = jnp.where(use_global, eye4, guess_update)

        # PnP RANSAC (MotionEstimation.cpp:279-374)
        obj = jnp.nan_to_num(carry["ref_pts3d"], nan=0.0)
        img = feats["kpts"][i1, :2]
        pnp_guess_cam = _inv(_compose(guess_used, local_t))
        rvec0 = P.rodrigues_inv(pnp_guess_cam[:3, :3])
        tvec0 = pnp_guess_cam[:3, 3]
        key = jax.random.PRNGKey(frames)
        rvec, tvec, inl_mask, n_inl = P.ransac_epnp(
            obj, img, m, K_l, key, reproj_err,
            n_hyp=cfg.pnp.iterations_count)
        ransac_ok = n_inl > 0

        # refinement round(s) with the reference's swap semantics
        inl = inl_mask
        rv, tv = rvec, tvec
        thr = reproj_err
        do_refine = (n_inl >= min_inl)
        prev = inl_mask
        for _ in range(max(cfg.pnp.refine_iterations, 0)):
            w = prev.astype(jnp.float32)
            rv2, tv2, err = P.refine_lm_with_errors_auto(obj, img, w, m,
                                                         K_l, rv, tv)
            new_inl = (err <= thr) & m
            n_new = jnp.sum(new_inl)
            kept = jnp.where(new_inl, err, 0.0)
            mean = jnp.sum(kept) / jnp.maximum(n_new, 1)
            var = jnp.sum(jnp.where(new_inl, (err - mean) ** 2, 0.0)) / \
                jnp.maximum(n_new - 1, 1)
            thr = jnp.minimum(reproj_err,
                              jnp.float32(cfg.pnp.refine_sigma) *
                              jnp.sqrt(var))
            same = jnp.all(new_inl == prev)
            brk = (n_new < min_inl) | same
            # break -> latest set; budget exhaustion -> previous set
            # (MotionEstimation.cpp:370 std::swap tail)
            inl_final = jnp.where(brk, new_inl, prev)
            rv = jnp.where(do_refine, rv2, rv)
            tv = jnp.where(do_refine, tv2, tv)
            inl = jnp.where(do_refine, inl_final, inl)
            prev = jnp.where(brk, prev, new_inl)

        n_inliers = jnp.sum(inl).astype(jnp.int32)
        ok = ((n_match >= min_inl) & ransac_ok & (n_inliers >= min_inl)) \
            | is_first

        # camera pose -> robot-frame transform (MotionEstimation.cpp:155-160)
        pnp_mat = eye4.at[:3, :3].set(P.rodrigues(rv)).at[:3, 3].set(tv)
        tf = _inv(_compose(local_t, pnp_mat))
        t = jnp.where(is_first, eye4, tf)

        # covariance from median errors of inliers
        # (MotionEstimation.cpp:162-214)
        pts_b = feats["pts3d"][i1]
        ok3 = jnp.isfinite(pts_b).all(axis=1) & inl
        new_pt = jnp.nan_to_num(pts_b, nan=0.0) @ tf[:3, :3].T + tf[:3, 3]
        pts_a = obj
        d2 = jnp.sum((pts_a - new_pt) ** 2, axis=1)
        org = tf[:3, 3]
        v1 = pts_a - org
        v2 = new_pt - org
        n1 = jnp.linalg.norm(v1, axis=1) + 1e-30
        n2 = jnp.linalg.norm(v2, axis=1) + 1e-30
        cosr = jnp.sum(v1 * v2, axis=1) / (n1 * n2)
        ang_err = jnp.arccos(jnp.clip(cosr, -1.0, 1.0))
        if jax.default_backend() == "tpu":
            med_d, med_a, cnt3 = _masked_median2_pallas(d2, ang_err, ok3)
        else:
            med_d, cnt3 = _masked_median(d2, ok3)
            med_a, _ = _masked_median(ang_err, ok3)
        med_d = jnp.maximum(med_d, 1e-4)
        med_a = jnp.maximum(med_a, 1e-4)
        cov = jnp.eye(6, dtype=jnp.float32)
        cov = jnp.where(is_first,
                        cov * cfg.odometry.initial_cov,
                        jnp.where(ok & (cnt3 > 0),
                                  cov.at[:3, :3].mul(med_d)
                                     .at[3:, 3:].mul(med_a),
                                  cov))

        # odometry output transform & keyframe logic (Odometry.cpp:104-183)
        output = _compose(_inv(motion_since_kf), t)
        new_pose = jnp.where(ok, _compose(pose, output), pose)
        step_len = jnp.where(ok, jnp.linalg.norm(output[:3, 3]), 0.0)

        n_ref = carry["ref_n"].astype(jnp.float32)
        add_kf = is_first | \
            (n_inliers.astype(jnp.float32) <=
             cfg.odometry.keyframe_thr * n_ref) | \
            (n_inliers <= cfg.odometry.vis_keyframe_thr)

        # velocity update (Odometry.cpp:62-76 via process)
        roll, pitch, yaw = _get_rpy(output)
        safe_dt = jnp.maximum(dt, 1e-9)
        vel_new = jnp.stack([output[0, 3], output[1, 3], output[2, 3],
                             roll, pitch, yaw]) / safe_dt
        vel = jnp.where(dt > 0, jnp.where(ok, vel_new, jnp.zeros(6)),
                        jnp.zeros(6))
        has_vel = dt > 0

        num_objects = jnp.where(is_first, carry["num_objects"],
                                n_match.astype(jnp.int32))

        def sel(new, old):
            return jnp.where(add_kf, new, old)

        new_carry = dict(
            pose=new_pose,
            vel=vel,
            has_vel=has_vel,
            kf_pose=sel(new_pose, carry["kf_pose"]),
            ref_kpts=sel(feats["kpts"], carry["ref_kpts"]),
            ref_pts3d=sel(feats["pts3d"], carry["ref_pts3d"]),
            ref_bits=sel(feats["bits"], carry["ref_bits"]),
            ref_nbits=sel(feats["nbits"], carry["ref_nbits"]),
            ref_valid=sel(feats["valid"], carry["ref_valid"]),
            ref_n=sel(feats["n_kpts"], carry["ref_n"]),
            num_objects=num_objects,
            frames=frames + 1,
            dist=carry["dist"] + step_len,
        )
        # barrier the carry: keeps XLA from cloning the pose-chain math
        # into neighboring fusions (several near-copies of new_pose
        # otherwise materialize; with reduced-precision matmuls they
        # disagree — see the jax_default_matmul_precision note in
        # tpuslam/__init__.py for the failure this surfaced as)
        new_carry = jax.lax.optimization_barrier(new_carry)
        out = dict(pose=new_pose,
                   transform=jnp.where(ok, output, jnp.zeros((4, 4))),
                   lost=~ok, keyframe=add_kf, cov=cov,
                   n_inliers=n_inliers, n_matches=n_match, vel=vel,
                   dist=new_carry["dist"],
                   # matching diagnostics (the reference logs its
                   # kpts/matches/inliers line per frame)
                   used_global=use_global,
                   n_matches_guided=n_match_g,
                   n_matches_global=n_match_n)
        return new_carry, out

    # ---- chunk program ---------------------------------------------------
    def chunk_step(carry, lefts, rights, dts, active):
        # the front-end is per-frame independent: run it BATCHED over the
        # whole chunk (vmap) so the dense kernels fill the chip instead
        # of running one frame at a time inside the scan — only the VO
        # state machine (keyframe-dependent matching + PnP) is inherently
        # sequential and stays in the lax.scan
        feats_all = batched_frontend(frontend, cfg, lefts, rights)
        feats_all["nbits"] = jnp.sum(feats_all["bits"], axis=2)
        feats_all = jax.lax.optimization_barrier(feats_all)

        def body(c, xs):
            f, dt, act = xs
            nc, out = vo_step(c, f, dt)
            c2 = jax.tree_util.tree_map(
                lambda a, b: jnp.where(act, a, b), nc, c)
            return c2, out

        carry, outs = jax.lax.scan(body, carry,
                                   (feats_all, dts, active))
        outs.update(kpts=feats_all["kpts"], pts3d=feats_all["pts3d"],
                    desc=feats_all["desc"], n_kpts=feats_all["n_kpts"],
                    disp_dec=feats_all["disp_dec"])
        # features cross the slow D2H link only for mapper full nodes
        off = jnp.asarray(full_node_offsets, jnp.int32)
        feats = dict(kpts=outs.pop("kpts")[off],
                     pts3d=outs.pop("pts3d")[off],
                     desc=outs.pop("desc")[off],
                     disp_dec=outs.pop("disp_dec")[off])
        feats["n_kpts"] = outs["n_kpts"][off]
        return carry, outs, feats

    def init_carry():
        return dict(
            pose=jnp.eye(4, dtype=jnp.float32),
            vel=jnp.zeros(6, jnp.float32),
            has_vel=jnp.asarray(False),
            kf_pose=jnp.eye(4, dtype=jnp.float32),
            ref_kpts=jnp.zeros((C, 3), jnp.float32),
            ref_pts3d=jnp.full((C, 3), jnp.nan, jnp.float32),
            ref_bits=jnp.zeros((C, 256), jnp.float32),
            ref_nbits=jnp.zeros((C,), jnp.float32),
            ref_valid=jnp.zeros((C,), jnp.bool_),
            ref_n=jnp.asarray(0, jnp.int32),
            num_objects=jnp.asarray(0, jnp.int32),
            frames=jnp.asarray(0, jnp.int32),
            dist=jnp.asarray(0.0, jnp.float32),
        )

    return init_carry, jax.jit(chunk_step), full_node_offsets
