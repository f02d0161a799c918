"""Golden-oracle tests for the TPU front-end kernels.

Strategy mirrors the reference's RTL verification (SURVEY.md §4): each
kernel is validated against an OpenCV oracle on the same real stereo
fixture the reference ships for its simulation benches
(data/ref_rect_{l,r}.zip -> tests/fixtures/rect_*.npy).
"""

import cv2
import numpy as np
import pytest

from tpuslam.config import StereoBMConfig
from tpuslam.kernels.stereo_bm import prefilter_xsobel, stereo_bm
from tpuslam.kernels.gftt import gftt_response, select_keypoints
from tpuslam.kernels.orb import (orb_blur, orb_descriptors,
                                 run_by_image_border)
from tpuslam.kernels import matching


# ---------------------------------------------------------------------------
# StereoBM
# ---------------------------------------------------------------------------

class TestStereoBM:
    def test_prefilter_matches_opencv_internals(self, stereo_pair):
        """X-Sobel prefilter vs a direct NumPy re-derivation of OpenCV's
        prefilterXSobel (reflect-101 rows, clip to [0, 2*cap], border cols
        = cap)."""
        left, _ = stereo_pair
        cap = 31
        ours = np.asarray(prefilter_xsobel(left, cap))

        x = left.astype(np.int32)
        h, w = x.shape
        up = np.vstack([x[1:2], x[:-1]])
        down = np.vstack([x[1:], x[h - 2:h - 1]])

        def dx(row):
            l = np.hstack([row[:, :1], row[:, :-1]])
            r = np.hstack([row[:, 1:], row[:, -1:]])
            return r - l

        d = dx(up) + 2 * dx(x) + dx(down)
        ref = np.clip(d, -cap, cap) + cap
        ref[:, 0] = cap
        ref[:, -1] = cap
        np.testing.assert_array_equal(ours, ref.astype(np.uint8))

    def test_disparity_matches_opencv(self, stereo_pair):
        """Full pipeline vs cv2.StereoBM with the reference configuration
        (main.cpp:197-216), no speckle (tested separately)."""
        left, right = stereo_pair
        cfg = StereoBMConfig()
        bm = cv2.StereoBM_create(cfg.num_disparities, cfg.block_size)
        bm.setPreFilterType(cv2.STEREO_BM_PREFILTER_XSOBEL)
        bm.setPreFilterCap(cfg.prefilter_cap)
        bm.setTextureThreshold(cfg.texture_threshold)
        bm.setUniquenessRatio(cfg.uniqueness_ratio)
        bm.setDisp12MaxDiff(cfg.disp12_max_diff)
        bm.setSpeckleWindowSize(0)
        bm.setMinDisparity(cfg.min_disparity)
        ref = bm.compute(left, right)

        ours = np.asarray(stereo_bm(left, right, cfg, with_speckle=False))

        # compare on the joint valid region plus require identical validity
        filtered = (cfg.min_disparity - 1) * 16
        ref_valid = ref != filtered
        ours_valid = ours != filtered
        agree = (ref_valid == ours_valid)
        assert agree.mean() > 0.995, f"validity agreement {agree.mean()}"
        both = ref_valid & ours_valid
        diff = np.abs(ref.astype(np.int32) - ours.astype(np.int32))[both]
        exact = (diff == 0).mean()
        assert exact > 0.995, f"exact match only {exact}"
        assert np.percentile(diff, 99.9) <= 16

    def test_disparity_with_speckle_matches_opencv(self, stereo_pair):
        left, right = stereo_pair
        cfg = StereoBMConfig()
        bm = cv2.StereoBM_create(cfg.num_disparities, cfg.block_size)
        bm.setPreFilterType(cv2.STEREO_BM_PREFILTER_XSOBEL)
        bm.setPreFilterCap(cfg.prefilter_cap)
        bm.setTextureThreshold(cfg.texture_threshold)
        bm.setUniquenessRatio(cfg.uniqueness_ratio)
        bm.setDisp12MaxDiff(cfg.disp12_max_diff)
        bm.setSpeckleWindowSize(cfg.speckle_window_size)
        bm.setSpeckleRange(cfg.speckle_range)
        bm.setMinDisparity(cfg.min_disparity)
        ref = bm.compute(left, right)

        ours = np.asarray(stereo_bm(left, right, cfg, with_speckle=True))
        match = (ref == ours).mean()
        assert match > 0.99, f"pixel agreement {match}"


    def test_speckle_batch_and_fixed_rounds(self):
        """speckle_filter_batch == vmapped per-frame filter, and the
        fixed-trip labeling converges (flag) on adversarial topologies:
        serpentine 1-px path through the whole frame, and a spiral."""
        import jax.numpy as jnp
        from tpuslam.kernels.stereo_bm import (_speckle_filter,
                                               speckle_filter_batch,
                                               speckle_filter_with_flag)
        rng = np.random.default_rng(0)
        B, h, w = 3, 60, 200
        d = rng.integers(-16, 800, (B, h, w)).astype(np.int16)
        d[rng.random((B, h, w)) < 0.3] = -16
        ref = np.stack([np.asarray(_speckle_filter(
            jnp.asarray(x).astype(jnp.int32), 50, 32, -16)) for x in d])
        got, conv = speckle_filter_batch(jnp.asarray(d), 50, 32, -16)
        np.testing.assert_array_equal(ref.astype(np.int16),
                                      np.asarray(got))
        assert bool(conv)

        hh, ww = 120, 400
        serp = np.full((hh, ww), -16, np.int32)
        for r in range(hh):
            serp[r, :] = 100          # serpentine = every row connected
        _, conv = speckle_filter_with_flag(jnp.asarray(serp), 50, 32,
                                           -16)
        assert bool(conv), "serpentine did not converge in 16 rounds"
        spiral = np.full((hh, ww), -16, np.int32)
        t_, b_, l_, r_ = 0, hh - 1, 0, ww - 1
        while t_ <= b_ and l_ <= r_:
            spiral[t_, l_:r_ + 1] = 100
            spiral[t_:b_ + 1, r_] = 100
            t_ += 2
            b_ -= 2
            l_ += 2
            r_ -= 2
        _, conv2 = speckle_filter_with_flag(jnp.asarray(spiral), 50, 32,
                                            -16)
        assert bool(conv2), "spiral did not converge in 16 rounds"


# ---------------------------------------------------------------------------
# GFTT
# ---------------------------------------------------------------------------

class TestGFTT:
    def test_response_matches_opencv(self, stereo_pair):
        left, _ = stereo_pair
        ref = cv2.cornerMinEigenVal(left, blockSize=3, ksize=3)
        ours = np.asarray(gftt_response(left, block_size=3))
        np.testing.assert_allclose(ours, ref, rtol=0, atol=1e-6)

    def test_response_dil_pallas_equivalent(self, stereo_pair):
        """The fused response+dilation strip kernel must produce the
        same candidate mask as gftt_response + local_max_3x3 (values
        within 1 ulp of FMA contraction; mask exactly equal)."""
        import jax.numpy as jnp
        from tpuslam.kernels.gftt import (gftt_response, local_max_3x3,
                                          gftt_response_dil_pallas)
        left, _ = stereo_pair
        eig_ref = np.asarray(gftt_response(left, 3))
        eig_p, dil_p = gftt_response_dil_pallas(jnp.asarray(left),
                                                interpret=True)
        eig_p = np.asarray(eig_p)
        np.testing.assert_allclose(eig_p, eig_ref, rtol=2e-6, atol=1e-7)
        maxv = eig_ref.max()
        thr = maxv * 0.01
        z = np.where(eig_ref > thr, eig_ref, 0.0)
        dil_ref = np.asarray(local_max_3x3(jnp.asarray(z)))
        mask_ref = (z != 0) & (z == dil_ref)
        mask_p = (eig_p > eig_p.max() * 0.01) & \
            (eig_p == np.asarray(dil_p))
        np.testing.assert_array_equal(mask_ref, mask_p)

    def test_select_matches_goodfeatures(self, stereo_pair):
        """Full GFTT vs cv2.goodFeaturesToTrack with the reference params
        (GFTT.cpp:13-19: 1500 pts, quality 0.01, minDist 7, block 3)."""
        left, _ = stereo_pair
        ref = cv2.goodFeaturesToTrack(
            left, maxCorners=1500, qualityLevel=0.01, minDistance=7,
            blockSize=3)
        ref = ref.reshape(-1, 2)

        eig = np.asarray(gftt_response(left, block_size=3))
        ours = select_keypoints(eig, max_features=1500, quality_level=0.01,
                                min_distance=7.0, use_local_max=True)
        assert len(ours) == len(ref), (len(ours), len(ref))
        # order and positions must match exactly
        np.testing.assert_allclose(ours[:, :2], ref, atol=0)

    def test_fpga_path_threshold_semantics(self, stereo_pair):
        """generateKeypoints2 twin: raw threshold, no local-max, external
        max register value."""
        left, _ = stereo_pair
        eig = np.asarray(gftt_response(left, block_size=3))
        kp = select_keypoints(eig, max_features=1500, quality_level=0.01,
                              min_distance=7.0, use_local_max=False,
                              max_value=float(eig.max()))
        assert 0 < len(kp) <= 1500
        # min-distance suppression honored
        from scipy.spatial.distance import pdist
        if len(kp) > 1:
            assert pdist(kp[:, :2]).min() >= 7.0


# ---------------------------------------------------------------------------
# ORB
# ---------------------------------------------------------------------------

class TestORB:
    def test_blur_matches_opencv(self, stereo_pair):
        left, _ = stereo_pair
        ref = cv2.GaussianBlur(left, (7, 7), 2, borderType=cv2.BORDER_REFLECT_101)
        ours = np.asarray(orb_blur(left))
        diff = np.abs(ref.astype(int) - ours.astype(int))
        # OpenCV >=3.4 runs a bit-exact fixed-point 8U path; our float path
        # is within +-1 LSB of it everywhere (~99% exact)
        assert (diff <= 1).all()
        assert (diff == 0).mean() > 0.98

    def test_descriptors_match_opencv(self, stereo_pair):
        """End-to-end: GFTT keypoints -> ORB descriptors vs cv2.ORB.compute
        (the reference flow GFTT.cpp -> CvORB.cpp)."""
        left, _ = stereo_pair
        pts = cv2.goodFeaturesToTrack(left, 500, 0.01, 7, blockSize=3)
        pts = pts.reshape(-1, 2)
        kps = [cv2.KeyPoint(float(x), float(y), 31) for x, y in pts]
        orb = cv2.ORB_create(nfeatures=500, scaleFactor=2.0, nlevels=3,
                             edgeThreshold=19, patchSize=31)
        kps_out, ref_desc = orb.compute(left, kps)
        ref_xy = np.array([k.pt for k in kps_out], np.float32)
        ref_ang = np.array([k.angle for k in kps_out], np.float32)

        filt, keep = run_by_image_border(pts, left.shape, border=19)
        np.testing.assert_allclose(filt, ref_xy, atol=0)

        desc, valid = orb_descriptors(left, filt, ref_ang,
                                      max_kpts=512)
        ours = np.asarray(desc)[:len(filt)]
        exact_rows = (ours == ref_desc).all(axis=1).mean()
        assert exact_rows > 0.95, f"exact descriptor rows {exact_rows}"
        # bitwise near-equality for the rest (rounding at patch edges)
        xor = np.unpackbits(ours ^ ref_desc, axis=1).sum(axis=1)
        assert xor.mean() < 1.0, f"mean bit diff {xor.mean()}"

    def test_const_angle_path_bit_identical(self, stereo_pair):
        """The static-angle bit-plane formulation (the fused pipeline's
        ORB path) must match the general gather kernel bit-for-bit for
        border-filtered angle=-1 keypoints."""
        import jax.numpy as jnp
        from tpuslam.kernels.orb import (
            _orb_descriptors_device, _orb_descriptors_const_angle_device,
            orb_pattern)
        left, _ = stereo_pair
        pts = cv2.goodFeaturesToTrack(left, 500, 0.01, 7, blockSize=3)
        pts = pts.reshape(-1, 2)
        filt, _ = run_by_image_border(pts, left.shape, border=19)
        C = 512
        xy = np.zeros((C, 2), np.float32)
        xy[:len(filt)] = filt
        valid = np.arange(C) < len(filt)
        blurred = orb_blur(left)
        pattern = jnp.asarray(orb_pattern())
        ang = jnp.full((C,), -1.0, jnp.float32)
        ref = _orb_descriptors_device(blurred, jnp.asarray(xy), ang,
                                      jnp.asarray(valid), pattern, C)
        new = _orb_descriptors_const_angle_device(
            blurred, jnp.asarray(xy), jnp.asarray(valid), pattern, C,
            angle_deg=-1.0)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(new))

        # the blur-fused Pallas strip-kernel variant (the TPU fused
        # path; takes the RAW image) must also be bit-identical
        # (interpret mode on the CPU test mesh)
        from tpuslam.kernels.orb import _orb_descriptors_const_angle_pallas
        pal = _orb_descriptors_const_angle_pallas(
            jnp.asarray(left), jnp.asarray(xy), jnp.asarray(valid), C,
            angle_deg=-1.0, interpret=True)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(pal))

    def test_device_nms_matches_host_greedy(self, stereo_pair):
        """select_from_candidates_device (block-sequential fixpoint NMS)
        must accept EXACTLY the host greedy grid-suppression set."""
        import jax.numpy as jnp
        from tpuslam.kernels.gftt import (gftt_candidates,
                                          select_from_candidates,
                                          select_from_candidates_device)
        left, _ = stereo_pair
        w = left.shape[1]
        vals, idx, _, _ = gftt_candidates(
            jnp.asarray(left), jnp.float32(0.01), 3, max_candidates=4096)
        host = select_from_candidates(np.asarray(vals), np.asarray(idx),
                                      w, max_features=1500,
                                      min_distance=7.0)
        kpts, valid, n_acc = select_from_candidates_device(
            vals, idx, w, jnp.float32(7.0), max_features=1500,
            capacity=1536)
        kpts = np.asarray(kpts)[np.asarray(valid)]
        assert len(kpts) == len(host) == int(n_acc)
        np.testing.assert_array_equal(kpts[:, :2], host[:, :2])



# ---------------------------------------------------------------------------
# Matching
# ---------------------------------------------------------------------------

class TestMatching:
    def test_hamming_matrix(self, rng):
        a = rng.integers(0, 256, (64, 32), dtype=np.uint8)
        b = rng.integers(0, 256, (80, 32), dtype=np.uint8)
        ours = np.asarray(matching.hamming_matrix(a, b))
        ref = np.zeros((64, 80), np.int32)
        for i in range(64):
            for j in range(80):
                ref[i, j] = np.unpackbits(a[i] ^ b[j]).sum()
        np.testing.assert_array_equal(ours.astype(np.int32), ref)

    def test_knn2_matches_bfmatcher(self, rng):
        a = rng.integers(0, 256, (100, 32), dtype=np.uint8)
        b = rng.integers(0, 256, (120, 32), dtype=np.uint8)
        bf = cv2.BFMatcher(cv2.NORM_HAMMING)
        ref = bf.knnMatch(a, b, k=2)

        va = np.ones(100, bool)
        vb = np.ones(120, bool)
        d1, i1, d2, i2 = matching.knn2_hamming(a, va, b, vb)
        d1, i1 = np.asarray(d1), np.asarray(i1)
        d2 = np.asarray(d2)
        for q, pair in enumerate(ref):
            assert pair[0].distance == d1[q]
            assert pair[0].trainIdx == i1[q]
            assert pair[1].distance == d2[q]

    def test_nndr(self):
        d1 = np.array([10.0, 10.0, 5.0])
        d2 = np.array([20.0, 11.0, 100.0])
        n = np.array([5, 5, 1])
        ok = matching.nndr_accept(d1, None, d2, n, nndr=0.8)
        np.testing.assert_array_equal(ok, [True, False, True])


class TestGfttDeviceCandidates:
    def test_candidate_path_matches_host_path(self, stereo_pair):
        """Device top-k candidate extraction + host suppression must
        reproduce the full-map host path exactly."""
        import jax.numpy as jnp
        from tpuslam.kernels.gftt import (gftt_candidates, gftt_response,
                                          select_from_candidates,
                                          select_keypoints)
        left, _ = stereo_pair
        eig = np.asarray(gftt_response(left, 3))
        ref = select_keypoints(eig, max_features=1500, quality_level=0.01,
                               min_distance=7.0, use_local_max=True)
        vals, idx, maxv, cnt = gftt_candidates(
            jnp.asarray(left), jnp.float32(0.01), 3)
        assert int(cnt) <= 4096  # candidate budget holds on real data
        got = select_from_candidates(np.asarray(vals), np.asarray(idx),
                                     width=left.shape[1],
                                     max_features=1500, min_distance=7.0)
        np.testing.assert_array_equal(got, ref)

    def test_two_stage_top_k_matches_flat(self):
        """The segmented top-k must reproduce lax.top_k exactly on the
        finite slots: values everywhere, indices wherever the value is
        finite (-inf padding slots carry arbitrary indices that every
        consumer masks), including exact-tie tie-breaks."""
        import jax
        import jax.numpy as jnp
        from tpuslam.kernels.gftt import _two_stage_top_k
        n = 376 * 1241
        rng = np.random.default_rng(7)
        cases = []
        a = np.full(n, -np.inf, np.float32)
        ii = rng.choice(n, 3000, replace=False)
        a[ii] = rng.random(3000).astype(np.float32)
        cases.append(a)
        # heavy exact ties spanning segment boundaries
        b = np.full(n, -np.inf, np.float32)
        ii = rng.choice(n, 9000, replace=False)
        b[ii] = np.repeat(rng.random(1500).astype(np.float32), 6)
        cases.append(b)
        # more candidates than k
        c = np.full(n, -np.inf, np.float32)
        ii = rng.choice(n, 12000, replace=False)
        c[ii] = rng.random(12000).astype(np.float32)
        cases.append(c)
        for x in cases:
            v1, i1 = jax.lax.top_k(jnp.asarray(x), 4096)
            v2, i2 = _two_stage_top_k(jnp.asarray(x), 4096)
            np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
            fin = np.isfinite(np.asarray(v1))
            np.testing.assert_array_equal(np.asarray(i1)[fin],
                                          np.asarray(i2)[fin])
