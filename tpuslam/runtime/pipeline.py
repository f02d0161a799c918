"""Per-frame front-end: disparity -> keypoints -> descriptors -> 3D.

Mirrors the feature-generation block of the reference main loop
(/root/reference/src/slam/src/core/main.cpp:195-255): StereoBM disparity,
GFTT keypoints, border filtering + ORB descriptors (computeDescriptor
mutates the keypoint list via runByImageBorder — so a frame's keypoints
are the border-filtered set), disparity-lifted 3D points in the robot
frame (Stereo.cpp:119-155).

All image-sized math runs as jitted device programs; candidate selection
and bookkeeping stay on host (the same accelerator/host split as the
reference's FPGA/A53 design).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..config import DepthMethod, SlamConfig
from ..geometry import transform as T
from ..geometry.camera import StereoCameraModel, project_disparity_to_3d
from ..kernels.stereo_bm_pallas import stereo_bm_auto as stereo_bm
from ..kernels.sgbm import sgbm
from ..kernels.gftt import gftt_candidates, select_from_candidates
from ..kernels.orb import orb_blur, orb_descriptors, run_by_image_border
from ..vo.frame import Frame, CAPACITY


def frontend_dispatch(left: np.ndarray, right: np.ndarray,
                      cfg: SlamConfig) -> dict:
    """Launch the image-sized device work for one frame WITHOUT blocking.

    JAX dispatch is asynchronous: the returned arrays are futures.  The
    streaming driver dispatches frame i+1 before collecting frame i, so
    the device computes the next frame's disparity/GFTT while the host
    runs this frame's selection/VO/mapping — the TPU re-expression of
    the reference's PL-computes-N+1-while-CPU-runs-N overlap via
    double-banked DDR buffers (SURVEY.md §2.7, FPGA.h:35-53).
    """
    left_d = jnp.asarray(left)
    right_d = jnp.asarray(right)
    # depth-method dispatch (appSetting.depthMethod, main.cpp:197-244;
    # Parameters.h:24-30).  LK is sparse: correspondences are computed
    # per keypoint at collect time (Stereo.cpp:9-51), no dense map.
    if cfg.depth_method == DepthMethod.SGBM:
        disp = sgbm(left_d, right_d, cfg.sgbm)      # main.cpp:218-244
    elif cfg.depth_method == DepthMethod.LK:
        disp = None
    elif cfg.depth_method == DepthMethod.CV_BM:
        import cv2
        bm = cv2.StereoBM_create(cfg.bm.num_disparities, cfg.bm.block_size)
        bm.setPreFilterCap(cfg.bm.prefilter_cap)
        bm.setTextureThreshold(cfg.bm.texture_threshold)
        bm.setUniquenessRatio(cfg.bm.uniqueness_ratio)
        bm.setSpeckleWindowSize(cfg.bm.speckle_window_size)
        bm.setSpeckleRange(cfg.bm.speckle_range)
        bm.setDisp12MaxDiff(cfg.bm.disp12_max_diff)
        disp = jnp.asarray(bm.compute(left, right))
    else:
        disp = stereo_bm(left_d, right_d, cfg.bm)   # main.cpp:197-216
    # GFTT: response + threshold + local-max + top-k ON DEVICE so only
    # ~4096 candidates cross the host boundary, not the full map
    cand = gftt_candidates(left_d, jnp.float32(cfg.gftt.quality_level),
                           cfg.gftt.block_size)      # GFTT.cpp:11-25
    # start device->host transfers now; they overlap host work
    for a in (disp, *cand):
        if a is None:
            continue
        try:
            a.copy_to_host_async()
        except Exception:
            break
    return {"left": left, "right": right, "left_d": left_d,
            "disp": disp, "cand": cand}


def frontend_collect(pending: dict, camera: StereoCameraModel,
                     cfg: SlamConfig, stamp: float = 0.0,
                     frame_id: int = -1,
                     gt_pose: np.ndarray | None = None) -> Frame:
    """Block on a frontend_dispatch result and finish the host side."""
    left = pending["left"]
    left_d = pending["left_d"]
    disp = pending["disp"]

    vals, flat_idx, _, _ = pending["cand"]
    kpts = select_from_candidates(np.asarray(vals), np.asarray(flat_idx),
                                  width=left.shape[1],
                                  max_features=cfg.gftt.max_features,
                                  min_distance=cfg.gftt.min_distance)

    # ORB border filter + descriptors (CvORB.cpp:137-218)
    kpts, _ = run_by_image_border(kpts, left.shape,
                                  cfg.orb.edge_threshold)
    desc_dev, valid = orb_descriptors(left_d, kpts[:, :2],
                                      max_kpts=CAPACITY)
    n = len(kpts)
    desc = np.asarray(desc_dev)[:n]

    # disparity -> 3D in robot frame (Stereo.cpp:53-155)
    if disp is None:     # sparse LK correspondence path (Stereo.cpp:9-51)
        disp_np = None
        kpts3d = _keypoints_3d_lk(kpts, left_d,
                                  jnp.asarray(pending["right"]), camera,
                                  cfg)
    else:
        disp_np = np.asarray(disp)
        kpts3d = _keypoints_3d(kpts, disp_np, camera)

    frame = Frame(stamp=stamp, image_left=left,
                  image_right=pending["right"],
                  disparity=disp_np, kpts=kpts, kpts3d=kpts3d,
                  desc=desc, gt_pose=gt_pose, frame_id=frame_id)
    return frame


def extract_features(left: np.ndarray, right: np.ndarray,
                     camera: StereoCameraModel, cfg: SlamConfig,
                     stamp: float = 0.0, frame_id: int = -1,
                     gt_pose: np.ndarray | None = None) -> Frame:
    """Full front-end for one stereo pair -> populated Frame."""
    return frontend_collect(frontend_dispatch(left, right, cfg), camera,
                            cfg, stamp, frame_id, gt_pose)


def _keypoints_3d_lk(kpts: np.ndarray, left_d, right_d,
                     camera: StereoCameraModel,
                     cfg: SlamConfig) -> np.ndarray:
    """Sparse 3D from per-keypoint LK stereo correspondences.

    Twin of computeCorrespondences + generateKeypoints3DStereo for the
    DEPTH_METHOD_CV_LK option (Stereo.cpp:9-51, 84-117): pyramidal LK to
    the right image, disparity = left.x - right.x, gate
    (min_disparity, max_disparity], project, optical->robot transform.
    """
    from ..kernels.lk_stereo import lk_stereo

    n = len(kpts)
    if n == 0:
        return np.zeros((0, 3), np.float32)
    lk = cfg.lk
    cap = CAPACITY
    pts = np.zeros((cap, 2), np.float32)
    val = np.zeros((cap,), bool)
    pts[:n] = kpts[:, :2]
    val[:n] = True
    nxt, status, _ = lk_stereo(
        left_d, right_d, jnp.asarray(pts), jnp.asarray(val),
        win=(lk.win_w, lk.win_h), max_level=lk.max_level,
        max_iters=lk.iterations, eps=lk.epsilon,
        min_eig_threshold=lk.min_eig_threshold)
    nxt = np.asarray(nxt)[:n]
    status = np.asarray(status)[:n]
    d = kpts[:n, 0] - nxt[:, 0]
    ok = status & (d > lk.min_disparity) & (d <= lk.max_disparity)
    pts3 = project_disparity_to_3d(kpts[:n, :2],
                                   np.where(ok, d, 0.0).astype(np.float32),
                                   camera)
    pts3[~ok] = np.nan
    valid = np.isfinite(pts3).all(axis=1)
    out = np.full_like(pts3, np.nan)
    if valid.any():
        out[valid] = T.transform_points(camera.local_transform,
                                        pts3[valid])
    return out.astype(np.float32)


def _keypoints_3d(kpts: np.ndarray, disp: np.ndarray,
                  camera: StereoCameraModel) -> np.ndarray:
    """generateKeypoints3DStereo twin (Stereo.cpp:53-117): sample the x16
    fixed-point dense map at truncated int coords, clamp negatives to 0,
    project, then optical->robot transform."""
    if len(kpts) == 0:
        return np.zeros((0, 3), np.float32)
    xs = kpts[:, 0].astype(np.int64)   # (int) cast truncates like C++
    ys = kpts[:, 1].astype(np.int64)
    d16 = disp[ys, xs].astype(np.float32)
    d = d16 / 16.0
    d = np.maximum(d, 0.0)
    pts = project_disparity_to_3d(kpts[:, :2], d, camera)
    # disparity == 0 -> invalid (Stereo.cpp:89-90 skips zero)
    pts[d == 0.0] = np.nan
    valid = np.isfinite(pts).all(axis=1)
    out = np.full_like(pts, np.nan)
    if valid.any():
        out[valid] = T.transform_points(camera.local_transform, pts[valid])
    return out.astype(np.float32)
