"""Per-stage device timing of the fused VO front-end on real frames.

Times each stage of the per-frame pipeline in isolation (jitted,
block_until_ready, median over reps) plus the full fused chunk program,
to locate where the per-frame milliseconds actually go (VERDICT.md round-1
item 2: never profiled).  Run on the real TPU chip:

    python tools/profile_stages.py
"""

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

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SEQ = os.path.join(REPO, ".bench_cache", "kittigeo80")


_probe = None


def _probe_ms():
    """Latency of a known-cheap reference op.  The tunneled chip is
    shared: external load adds ~25 ms+ to every dispatch in bursts of
    minutes.  Measurements taken while the probe is slow are garbage."""
    global _probe
    if _probe is None:
        x = jnp.ones((1536, 1536), jnp.float32)
        f = jax.jit(lambda a: jnp.min(a, axis=1))
        jax.block_until_ready(f(x))
        _probe = (f, x)
    f, x = _probe
    t0 = time.perf_counter()
    jax.block_until_ready(f(x))
    return (time.perf_counter() - t0) * 1e3


def timeit(fn, *args, reps=20, warmup=2, probe_thresh=1.0):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    for attempt in range(30):
        if _probe_ms() < probe_thresh:
            ts = []
            for _ in range(reps):
                t0 = time.perf_counter()
                jax.block_until_ready(fn(*args))
                ts.append(time.perf_counter() - t0)
            if _probe_ms() < probe_thresh:    # window stayed clean
                return float(np.median(ts)) * 1e3  # ms
        print("#   (degraded window, retrying...)", file=sys.stderr)
        time.sleep(10)
    return float("nan")


def main():
    cfg = SlamConfig()
    camera = StereoCameraModel.load_kitti(
        os.path.join(SEQ, "calib.txt"), image_size=(1241, 376))
    ds = StereoImageDataset(
        left_dir=os.path.join(SEQ, "image_0"),
        right_dir=os.path.join(SEQ, "image_1"))
    it0, it1 = ds[10], ds[11]
    left = jnp.asarray(it0["left"])
    right = jnp.asarray(it0["right"])
    left2 = jnp.asarray(it1["left"])

    from tpuslam.kernels.stereo_bm_pallas import stereo_bm_auto
    from tpuslam.kernels.gftt import (gftt_candidates,
                                      select_from_candidates_device)
    from tpuslam.kernels.orb import (orb_blur, _orb_descriptors_device,
                                     orb_pattern)
    from tpuslam.kernels import matching as M
    from tpuslam.kernels import pnp as P

    C = 1536
    H, W = camera.height, camera.width
    results = {}

    # --- stereo BM -----------------------------------------------------
    bm = jax.jit(lambda l, r: stereo_bm_auto(l, r, cfg.bm,
                                             with_speckle=False))
    results["stereo_bm"] = timeit(bm, left, right)
    disp = bm(left, right)

    # --- GFTT response + candidates ------------------------------------
    cand = jax.jit(lambda im: gftt_candidates(
        im, jnp.float32(cfg.gftt.quality_level), cfg.gftt.block_size,
        max_candidates=4096))
    results["gftt_candidates"] = timeit(cand, left)
    vals, idx, _, _ = cand(left)

    # --- NMS (min-distance suppression fixpoint) -----------------------
    nms = jax.jit(lambda v, i: select_from_candidates_device(
        v, i, W, jnp.float32(cfg.gftt.min_distance),
        max_features=cfg.gftt.max_features, capacity=C))
    results["gftt_nms"] = timeit(nms, vals, idx)
    kpts, valid, _ = nms(vals, idx)

    # --- ORB blur + descriptors ----------------------------------------
    pattern = jnp.asarray(orb_pattern())
    blur = jax.jit(orb_blur)
    results["orb_blur"] = timeit(blur, left)
    blurred = blur(left)
    ang = jnp.full((C,), -1.0, jnp.float32)
    desc_fn = jax.jit(lambda b, k, v: _orb_descriptors_device(
        b, k[:, :2], ang, v, pattern, C))
    results["orb_desc"] = timeit(desc_fn, blurred, kpts, valid)
    desc = desc_fn(blurred, kpts, valid)

    # --- matching (Hamming top-2 both ways) ----------------------------
    bits = M.unpack_bits(desc)
    nbits = jnp.sum(bits, axis=1)

    def match(b1, n1, v1, b2, n2, v2):
        dist = (n1[:, None] + n2[None, :] - 2.0 * (b1 @ b2.T))
        dist = jnp.where(v1[:, None] & v2[None, :], dist, 1e9)
        return M._top2_min(dist)

    match_j = jax.jit(match)
    results["hamming_top2"] = timeit(match_j, bits, nbits, valid,
                                     bits, nbits, valid)

    # --- PnP RANSAC ----------------------------------------------------
    rng = np.random.default_rng(0)
    obj = jnp.asarray(rng.normal(0, 5, (C, 3)).astype(np.float32) +
                      np.array([0, 0, 15], np.float32))
    K = jnp.asarray(camera.K_l, jnp.float32)
    img_pts = jax.jit(lambda o: (o @ jnp.asarray(camera.K_l.T,
                                                 jnp.float32))[:, :2] /
                      o[:, 2:3])(obj)
    val = jnp.ones((C,), bool)
    key = jax.random.PRNGKey(0)
    ransac = jax.jit(lambda o, i, v, k: P.ransac_epnp(
        o, i, v, K, k, jnp.float32(2.0), n_hyp=cfg.pnp.iterations_count))
    results["ransac_epnp_300"] = timeit(ransac, obj, img_pts, val, key)

    # --- LM refine + errors --------------------------------------------
    w = val.astype(jnp.float32)
    rv0 = jnp.zeros(3, jnp.float32)
    tv0 = jnp.zeros(3, jnp.float32)
    refine = jax.jit(lambda o, i, ww, v, r, t: P.refine_lm_with_errors(
        o, i, ww, v, K, r, t))
    results["refine_lm"] = timeit(refine, obj, img_pts, w, val, rv0, tv0)

    # --- full fused chunk, steady state per frame ----------------------
    from tpuslam.vo.fused import make_fused_chunk_fn, FusedShapes
    B = 40
    shapes = FusedShapes(chunk=B, capacity=C)
    init_carry, step, _ = make_fused_chunk_fn(camera, cfg, shapes)
    lefts = jnp.broadcast_to(left, (B, H, W))
    rights = jnp.broadcast_to(right, (B, H, W))
    lefts = lefts.at[1::2].set(left2)
    dts = jnp.full((B,), 0.1, jnp.float32)
    active = jnp.ones((B,), bool)

    carry = init_carry()
    t0 = time.perf_counter()
    carry, outs, feats = step(carry, lefts, rights, dts, active)
    jax.block_until_ready(outs)
    compile_s = time.perf_counter() - t0

    def run_chunk(c):
        c, o, f = step(c, lefts, rights, dts, active)
        return o["pose"]

    chunk_ms = timeit(run_chunk, carry, reps=5, warmup=1,
                      probe_thresh=1.0)
    results["fused_chunk_per_frame"] = chunk_ms / B

    print(f"# chunk compile/load: {compile_s:.1f} s")
    print(f"{'stage':<24}{'ms':>10}")
    total = 0.0
    for k, v in results.items():
        print(f"{k:<24}{v:>10.3f}")
        if k != "fused_chunk_per_frame":
            total += v
    print(f"{'sum(stages)':<24}{total:>10.3f}")
    print(f"# fused per-frame: {results['fused_chunk_per_frame']:.2f} ms "
          f"-> {1e3 / results['fused_chunk_per_frame']:.1f} fps")


if __name__ == "__main__":
    main()
