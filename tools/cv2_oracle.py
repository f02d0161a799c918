"""Independent end-to-end oracle: the reference's SLAM front-end built
ONLY from OpenCV's own components.

Every end-to-end tpuslam number is otherwise validated against host
twins the same author wrote, on a world the same author rendered.  This
tool composes cv2's StereoBM + GFTTDetector + ORB + BFMatcher +
solvePnPRansac — the exact components the reference binary configures
(/root/reference/src/slam/src/core/main.cpp:197-308, GFTT.cpp:12-25,
Registration.cpp:320-335, MotionEstimation.cpp:285-307) with the exact
constants — into a frame-to-keyframe visual odometer.  None of the
tpuslam kernels or twins are imported; only the dataset reader (plain
PNG loading) and the KITTI metric (asserted against its own unit tests)
are shared.

Usage:  python tools/cv2_oracle.py <sequence_dir> [n_frames]
Prints one JSON line {"ate": ..., "t_err": ..., "r_err": ..., "lost": N}.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _make_bm():
    import cv2
    # main.cpp:199-212 DEPTH_METHOD_CV_BM
    bm = cv2.StereoBM_create(16, 9)
    bm.setPreFilterCap(31)
    bm.setBlockSize(21)
    bm.setMinDisparity(0)
    bm.setNumDisparities(64)
    bm.setTextureThreshold(10)
    bm.setUniquenessRatio(10)
    bm.setSpeckleWindowSize(50)
    bm.setSpeckleRange(32)
    bm.setDisp12MaxDiff(1)
    return bm


def _make_gftt():
    import cv2
    # GFTT.cpp:12-19 generateKeypoints
    return cv2.GFTTDetector_create(1500, 0.01, 7.0, 3, False, 0.04)


def run_cv2_pipeline(items, K: np.ndarray, baseline: float,
                     min_inliers: int = 20,
                     reproj_err: float = 2.0,
                     iterations_count: int = 300,
                     keyframe_thr: float = 0.3,
                     vis_keyframe_thr: int = 150,
                     nndr: float = 0.8):
    """Frame-to-keyframe VO over `items` (dicts with left/right uint8).

    Returns (poses (N,4,4) camera-frame, lost_count, median_inliers).
    Structure mirrors Odometry.cpp:104-183 (keyframe rule) and
    Registration.cpp:311-335 (global NNDR matching); all vision
    components are cv2's own.
    """
    import cv2
    bm = _make_bm()
    gftt = _make_gftt()
    orb = cv2.ORB_create()
    matcher = cv2.BFMatcher(cv2.NORM_HAMMING)
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]

    def features(left, right):
        disp = bm.compute(left, right).astype(np.float32) / 16.0
        kpts = gftt.detect(left, None)
        kpts, desc = orb.compute(left, kpts)
        if not kpts:
            return np.zeros((0, 2), np.float32), None, \
                np.zeros((0, 3), np.float32)
        uv = np.array([k.pt for k in kpts], np.float32)
        xi = uv[:, 0].astype(np.int32)
        yi = uv[:, 1].astype(np.int32)
        d = disp[yi, xi]
        with np.errstate(divide="ignore", invalid="ignore"):
            Z = np.where(d > 0, fx * baseline / d, np.nan)
        X = (uv[:, 0] - cx) * Z / fx
        Y = (uv[:, 1] - cy) * Z / fy
        return uv, desc, np.stack([X, Y, Z], axis=1)

    pose = np.eye(4)
    poses = [pose.copy()]
    ref_uv = ref_desc = ref_p3 = None
    ref_n = 0
    lost = 0
    inliers_log = []

    for i, it in enumerate(items):
        uv, desc, p3 = features(np.ascontiguousarray(it["left"]),
                                np.ascontiguousarray(it["right"]))
        if i == 0:
            ref_uv, ref_desc, ref_p3 = uv, desc, p3
            ref_n = len(uv)
            kf_pose = pose.copy()
            continue

        ok = False
        n_inl = 0
        if desc is not None and ref_desc is not None and \
                len(desc) >= 2 and len(ref_desc) >= 2:
            # global NNDR matching, first-wins train dedup
            # (Registration.cpp:320-335)
            knn = matcher.knnMatch(ref_desc, desc, k=2)
            obj, img = [], []
            used = set()
            for pair in knn:
                if len(pair) < 2:
                    continue
                m, n2 = pair
                if m.distance < nndr * n2.distance and \
                        m.trainIdx not in used and \
                        np.all(np.isfinite(ref_p3[m.queryIdx])):
                    used.add(m.trainIdx)
                    obj.append(ref_p3[m.queryIdx])
                    img.append(uv[m.trainIdx])
            if len(obj) >= min_inliers:
                obj = np.asarray(obj, np.float64)
                img = np.asarray(img, np.float64)
                okp, rvec, tvec, inl = cv2.solvePnPRansac(
                    obj, img, K.astype(np.float64), None,
                    iterationsCount=iterations_count,
                    reprojectionError=reproj_err,
                    confidence=0.99, flags=cv2.SOLVEPNP_EPNP)
                if okp and inl is not None and len(inl) >= min_inliers:
                    # iterative refinement on inliers with guess
                    # (MotionEstimation.cpp:310-339)
                    okr, rvec, tvec = cv2.solvePnP(
                        obj[inl[:, 0]], img[inl[:, 0]],
                        K.astype(np.float64), None, rvec, tvec,
                        useExtrinsicGuess=True,
                        flags=cv2.SOLVEPNP_ITERATIVE)
                    if okr:
                        R, _ = cv2.Rodrigues(rvec)
                        Tcr = np.eye(4)     # current-cam <- ref-cam... no:
                        Tcr[:3, :3] = R     # maps ref-frame pts to cur cam
                        Tcr[:3, 3] = tvec[:, 0]
                        motion = np.linalg.inv(Tcr)   # ref-cam -> cur-cam
                        pose = kf_pose @ motion
                        n_inl = len(inl)
                        ok = True
        if not ok:
            lost += 1
        inliers_log.append(n_inl)
        poses.append(pose.copy())
        # keyframe rule (Odometry.cpp:165-176)
        if ok and (n_inl <= keyframe_thr * ref_n or
                   n_inl <= vis_keyframe_thr) or not ok:
            ref_uv, ref_desc, ref_p3 = uv, desc, p3
            ref_n = len(uv)
            kf_pose = pose.copy()

    inl_sorted = sorted(inliers_log)
    med = inl_sorted[len(inl_sorted) // 2] if inl_sorted else 0
    return np.stack(poses), lost, med


def main():
    from tpuslam.geometry.camera import StereoCameraModel
    from tpuslam.io.dataset import StereoImageDataset
    from tpuslam.geometry.kitti_metric import calc_kitti_sequence_errors

    seq = sys.argv[1]
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 10 ** 9
    camera = StereoCameraModel.load_kitti(os.path.join(seq, "calib.txt"))
    ds = StereoImageDataset(left_dir=os.path.join(seq, "image_0"),
                            right_dir=os.path.join(seq, "image_1"),
                            times_path=os.path.join(seq, "times.txt"))
    items = [ds[i] for i in range(min(n, len(ds)))]
    K = np.asarray(camera.K_l, np.float64)
    baseline = float(-camera.Tx_r / camera.fx_r)

    est, lost, med = run_cv2_pipeline(items, K, baseline)

    # raw camera-frame KITTI poses (ATE and the segment metrics are
    # invariant to the optical->robot conjugation the tpuslam dataset
    # reader applies, so camera-frame comparison is exact)
    gt_rows = np.loadtxt(os.path.join(seq, "poses.txt"))
    gt = np.concatenate([gt_rows[:len(est)].reshape(-1, 3, 4),
                         np.tile(np.array([[[0., 0, 0, 1]]]),
                                 (len(est), 1, 1))], axis=1)
    ate = float(np.sqrt(np.mean(
        np.sum((est[:, :3, 3] - gt[:, :3, 3]) ** 2, axis=1))))
    t_err, r_err = calc_kitti_sequence_errors(gt, est)
    print(json.dumps({"ate": round(ate, 4), "t_err": round(t_err, 4),
                      "r_err": round(r_err, 6), "lost": lost,
                      "median_inliers": med}))


if __name__ == "__main__":
    main()
