"""Bisect the VO scan BODY: time 40-frame scans of progressively larger
prefixes of vo_step (vo/fused.py) over PRECOMPUTED frontend features, so
each row's delta is that sub-block's cost in its scan context.

Run alone on the chip (tunnel measurement rules in PERF.md apply: the
probe latency is printed around every row so degraded-tunnel readings
are visible)."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tpuslam.runtime.cache import enable_persistent_cache  # noqa: E402
enable_persistent_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tpuslam.config import SlamConfig  # noqa: E402
from tpuslam.geometry.camera import StereoCameraModel  # noqa: E402
from tpuslam.io.dataset import StereoImageDataset  # noqa: E402
from tpuslam.vo import fused as F  # noqa: E402
from tpuslam.kernels import matching as M  # noqa: E402
from tpuslam.kernels import pnp as P  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SEQ = os.path.join(REPO, ".bench_cache", "kittigeo120")
B = 40
C = 1536
BIG = np.float32(1e9)

_hammer = None


def rewarm():
    global _hammer
    if _hammer is None:
        y = jnp.ones((8, 8), jnp.float32)
        g = jax.jit(lambda a: a + 1)
        jax.block_until_ready(g(y))
        _hammer = (g, y)
    g, y = _hammer
    r = None
    for _ in range(2000):
        r = g(y)
    jax.block_until_ready(r)


def timeit(fn, *args, probe=None, reps=5, warmup=1):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    rewarm()
    pf, px = probe
    t0 = time.perf_counter()
    jax.block_until_ready(pf(px))
    p0 = (time.perf_counter() - t0) * 1e3
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    t0 = time.perf_counter()
    jax.block_until_ready(pf(px))
    p1 = (time.perf_counter() - t0) * 1e3
    print(f"#   probe {p0:.2f} -> {p1:.2f} ms", file=sys.stderr, flush=True)
    return float(np.median(ts)) * 1e3


def main():
    cfg = SlamConfig()
    camera = StereoCameraModel.load_kitti(
        os.path.join(SEQ, "calib.txt"), image_size=(1241, 376))
    ds = StereoImageDataset(left_dir=os.path.join(SEQ, "image_0"),
                            right_dir=os.path.join(SEQ, "image_1"))
    H, W = camera.height, camera.width
    lefts = jnp.asarray(np.stack([ds[i]["left"] for i in range(B)]))
    rights = jnp.asarray(np.stack([ds[i]["right"] for i in range(B)]))

    shapes = F.FusedShapes(chunk=B, capacity=C)
    frontend = F.make_frontend_fn(camera, cfg, shapes)
    feats_all = jax.jit(lambda l, r: jax.vmap(frontend)(l, r))(lefts, rights)
    feats_all["nbits"] = jnp.sum(feats_all["bits"], axis=2)
    feats_all = jax.tree_util.tree_map(jax.block_until_ready, feats_all)

    K_l = jnp.asarray(camera.K_l, jnp.float32)
    local_t = jnp.asarray(camera.local_transform, jnp.float32)
    fx, fy = camera.fx_l, camera.fy_l
    cx_l, cy_l = camera.cx_l, camera.cy_l
    nndr = jnp.float32(cfg.matching.nndr)
    radius = jnp.float32(cfg.matching.guess_win_size)
    reproj_err = jnp.float32(cfg.pnp.reprojection_error)
    eye4 = jnp.eye(4, dtype=jnp.float32)
    min_inl = cfg.pnp.min_inliers
    cols = jnp.arange(C, dtype=jnp.int32)

    px = jnp.ones((1536, 1536), jnp.float32)
    pf = jax.jit(lambda a: jnp.min(a, axis=1))
    jax.block_until_ready(pf(px))
    probe = (pf, px)

    # a carry holding a fixed keyframe (frame 0's features)
    ref = {k: jax.tree_util.tree_map(lambda a: a[0], feats_all[k])
           for k in ("kpts", "pts3d", "bits", "nbits", "valid")}

    def dedup(accept, i1):
        rank = jnp.where(accept, cols, jnp.int32(C + 1))
        first = jnp.full((C,), C + 1, jnp.int32).at[i1].min(rank)
        return accept & (first[i1] == cols)

    def corr_mask(accept, i1, ref_pts3d):
        acc = dedup(accept, i1)
        finite = jnp.isfinite(ref_pts3d).all(axis=1)
        m = acc & finite
        return m, jnp.sum(m).astype(jnp.int32)

    def prefix_body(level):
        def body(carry, f):
            guess_update = eye4
            # --- dist matrix
            dist = (ref["nbits"][:, None] + f["nbits"][None, :]
                    - 2.0 * jnp.matmul(ref["bits"], f["bits"].T,
                                       precision="default"))
            dist = jnp.where(ref["valid"][:, None] & f["valid"][None, :],
                             dist, BIG)
            dist = jax.lax.optimization_barrier(dist)
            out = jnp.sum(dist)
            if level == 0:
                return carry, out
            # --- global top2
            d1n, i1n, d2n, _ = M._top2_min(dist)
            acc_n = ref["valid"] & (d1n < nndr * d2n)
            if level == 1:
                return carry, out + jnp.sum(d1n) + jnp.sum(i1n)
            # --- guided projection + mask + top2
            guess_cam = F._inv(F._compose(guess_update, local_t))
            pc = ref["pts3d"] @ guess_cam[:3, :3].T + guess_cam[:3, 3]
            pu = pc[:, 0] / pc[:, 2] * fx + cx_l
            pv = pc[:, 1] / pc[:, 2] * fy + cy_l
            pvalid = (jnp.isfinite(pu) & jnp.isfinite(pv) &
                      (pu > 0.0) & (pu < W - 1) & (pv > 0.0) &
                      (pv < H - 1) & (pc[:, 2] > 0.0) & ref["valid"])
            dxm = jnp.nan_to_num(pu, nan=-1e6)[:, None] - f["kpts"][:, 0][None, :]
            dym = jnp.nan_to_num(pv, nan=-1e6)[:, None] - f["kpts"][:, 1][None, :]
            in_rad = ((dxm * dxm + dym * dym <= radius * radius) &
                      f["valid"][None, :] & pvalid[:, None])
            in_rad = jax.lax.optimization_barrier(in_rad)
            n_cand_g = jnp.sum(in_rad, axis=1)
            n_cand_g = jax.lax.optimization_barrier(n_cand_g)
            dist_g = jnp.where(in_rad, dist, BIG)
            d1g, i1g, d2g, _ = M._top2_min(dist_g)
            acc_g = ((n_cand_g >= 2) & (d1g < nndr * d2g)) | (n_cand_g == 1)
            if level == 2:
                return carry, out + jnp.sum(d1g) + jnp.sum(i1g)
            # --- dedup/corr both paths
            m_g, n_match_g = corr_mask(acc_g, i1g, ref["pts3d"])
            m_n, n_match_n = corr_mask(acc_n, i1n, ref["pts3d"])
            i1 = jnp.where(True, i1n, i1g)
            m = m_n
            if level == 3:
                return carry, out + n_match_g + n_match_n
            # --- RANSAC
            obj = jnp.nan_to_num(ref["pts3d"], nan=0.0)
            img = f["kpts"][i1, :2]
            key = jax.random.PRNGKey(0)
            rvec, tvec, inl_mask, n_inl = P.ransac_epnp(
                obj, img, m, K_l, key, reproj_err,
                n_hyp=cfg.pnp.iterations_count)
            if level == 4:
                return carry, out + jnp.sum(rvec) + n_inl
            # --- refine loop
            inl = inl_mask
            rv, tv = rvec, tvec
            thr = reproj_err
            do_refine = (n_inl >= min_inl)
            prev = inl_mask
            for _ in range(max(cfg.pnp.refine_iterations, 0)):
                w = prev.astype(jnp.float32)
                rv2, tv2, err = P.refine_lm_with_errors(obj, img, w, m,
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
                inl_final = jnp.where(brk, new_inl, prev)
                rv = jnp.where(do_refine, rv2, rv)
                tv = jnp.where(do_refine, tv2, tv)
                inl = jnp.where(do_refine, inl_final, inl)
                prev = jnp.where(brk, prev, new_inl)
            if level == 5:
                return carry, out + jnp.sum(rv) + jnp.sum(inl)
            # --- covariance medians (two sorts)
            pnp_mat = eye4.at[:3, :3].set(P.rodrigues(rv)).at[:3, 3].set(tv)
            tf = F._inv(F._compose(local_t, pnp_mat))
            pts_b = f["pts3d"][i1]
            ok3 = jnp.isfinite(pts_b).all(axis=1) & inl
            new_pt = jnp.nan_to_num(pts_b, nan=0.0) @ tf[:3, :3].T + tf[:3, 3]
            d2 = jnp.sum((obj - new_pt) ** 2, axis=1)
            org = tf[:3, 3]
            v1 = obj - org
            v2 = new_pt - org
            n1 = jnp.linalg.norm(v1, axis=1) + 1e-30
            n2 = jnp.linalg.norm(v2, axis=1) + 1e-30
            cosr = jnp.sum(v1 * v2, axis=1) / (n1 * n2)
            ang_err = jnp.arccos(jnp.clip(cosr, -1.0, 1.0))
            med_d, cnt3 = F._masked_median(d2, ok3)
            med_a, _ = F._masked_median(ang_err, ok3)
            return carry, out + med_d + med_a + cnt3
        return body

    names = ["dist", "+top2_global", "+guided(top2)", "+dedup x2",
             "+ransac", "+refine_loop", "+cov_medians"]
    xs = {k: feats_all[k] for k in ("kpts", "pts3d", "bits", "nbits",
                                    "valid")}
    prev = 0.0
    print(f"{'prefix':<16}{'ms/chunk':>10}{'ms/frame':>10}{'delta ms/fr':>13}")
    for lv, name in enumerate(names):
        fjit = jax.jit(lambda x, lv=lv: jax.lax.scan(prefix_body(lv), 0,
                                                     x)[1])
        ms = timeit(fjit, xs, probe=probe)
        print(f"{name:<16}{ms:>10.2f}{ms / B:>10.3f}{(ms - prev) / B:>13.3f}",
              flush=True)
        prev = ms


if __name__ == "__main__":
    main()
