"""Trustworthy per-kernel timing on the axon-tunneled TPU.

`block_until_ready` on this backend returns before device completion, so
naive per-call timing measures dispatch latency, not compute (readings
like 0.1 ms for stereo_bm's ~500 MB of HBM traffic are physically
impossible).  This tool measures throughput instead: N back-to-back
dispatches chained by data dependency, closed with a device_get (which
must produce correct bytes and therefore really synchronizes); per-op
time = (total - transfer) / N.
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
for name in ("kittigeo80", "kittigeo120"):
    SEQ = os.path.join(REPO, ".bench_cache", name)
    if os.path.exists(os.path.join(SEQ, "calib.txt")):
        break


def sync(x):
    """Force real completion: fetch one element to host."""
    leaf = jax.tree_util.tree_leaves(x)[0]
    return np.asarray(leaf).reshape(-1)[:1]


def bench(label, fn, *args, reps=30):
    """fn must return something cheap to fetch; chained dispatches."""
    sync(fn(*args))               # warm/compile
    sync(fn(*args))
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(reps)]
    sync(outs[-1])
    total = time.perf_counter() - t0
    # measure the fixed fetch/dispatch overhead with an empty chain
    t0 = time.perf_counter()
    sync(outs[-1])
    overhead = time.perf_counter() - t0
    ms = max(total - overhead, 0.0) / reps * 1e3
    print(f"{label:<28}{ms:>10.3f} ms")
    return ms


def main():
    cfg = SlamConfig()
    camera = StereoCameraModel.load_kitti(
        os.path.join(SEQ, "calib.txt"), image_size=(1241, 376))
    ds = StereoImageDataset(left_dir=os.path.join(SEQ, "image_0"),
                            right_dir=os.path.join(SEQ, "image_1"))
    H, W = camera.height, camera.width
    left = jnp.asarray(ds[10]["left"])
    right = jnp.asarray(ds[10]["right"])
    C = 1536
    rng = np.random.default_rng(0)

    from tpuslam.kernels.stereo_bm_pallas import stereo_bm_auto
    from tpuslam.kernels.stereo_bm import stereo_bm as stereo_bm_xla
    from tpuslam.kernels.gftt import (gftt_candidates,
                                      select_from_candidates_device)
    from tpuslam.kernels.orb import (orb_blur, _orb_descriptors_device,
                                     orb_pattern)
    from tpuslam.kernels import matching as M
    from tpuslam.kernels import pnp as P

    bm_p = jax.jit(lambda l, r: stereo_bm_auto(l, r, cfg.bm,
                                               with_speckle=False))
    bench("stereo_bm (pallas)", bm_p, left, right)
    bm_x = jax.jit(lambda l, r: stereo_bm_xla(l, r, cfg.bm,
                                              with_speckle=False))
    bench("stereo_bm (xla)", bm_x, left, right)
    disp = bm_p(left, right)

    cand = jax.jit(lambda im: gftt_candidates(
        im, jnp.float32(cfg.gftt.quality_level), cfg.gftt.block_size,
        max_candidates=4096))
    bench("gftt_candidates", cand, left)
    vals, idx, _, _ = cand(left)

    nms = jax.jit(lambda v, i: select_from_candidates_device(
        v, i, W, jnp.float32(cfg.gftt.min_distance),
        max_features=cfg.gftt.max_features, capacity=C))
    bench("gftt_nms", nms, vals, idx)
    kpts, valid, _ = nms(vals, idx)

    bench("orb_blur", jax.jit(orb_blur), left)
    blurred = orb_blur(left)
    pattern = jnp.asarray(orb_pattern())
    ang = jnp.full((C,), -1.0, jnp.float32)
    desc_fn = jax.jit(lambda b, k, v: _orb_descriptors_device(
        b, k[:, :2], ang, v, pattern, C))
    bench("orb_desc", desc_fn, blurred, kpts, valid)
    desc = desc_fn(blurred, kpts, valid)

    # argsort compaction (the ORB border reorder inside the fused scan)
    keep = jnp.asarray(rng.random(C) > 0.1)

    @jax.jit
    def compact(kp, kc):
        order = jnp.argsort(~kc, stable=True)
        return kp[order]
    bench("argsort compaction", compact, kpts, keep)

    bits = M.unpack_bits(desc)
    nbits = jnp.sum(bits, axis=1)

    @jax.jit
    def match(b1, n1, v1):
        dist = (n1[:, None] + n1[None, :] - 2.0 * (b1 @ b1.T))
        dist = jnp.where(v1[:, None] & v1[None, :], dist, 1e9)
        return M._top2_min(dist)
    bench("hamming+top2", match, bits, nbits, valid)

    obj = jnp.asarray(rng.normal(0, 5, (C, 3)).astype(np.float32) +
                      np.array([0, 0, 15], np.float32))
    K = jnp.asarray(camera.K_l, jnp.float32)
    img_pts = jax.jit(
        lambda o: (o @ K.T)[:, :2] / o[:, 2:3])(obj)
    val = jnp.ones((C,), bool)
    key = jax.random.PRNGKey(0)
    ransac = jax.jit(lambda o, i, v, k: P.ransac_epnp(
        o, i, v, K, k, jnp.float32(2.0), n_hyp=cfg.pnp.iterations_count))
    bench("ransac_epnp_300", ransac, obj, img_pts, val, key, reps=10)

    w = val.astype(jnp.float32)
    rv0 = jnp.zeros(3, jnp.float32)
    tv0 = jnp.zeros(3, jnp.float32)
    refine = jax.jit(lambda o, i, ww, v, r, t: P.refine_lm_with_errors(
        o, i, ww, v, K, r, t))
    bench("refine_lm20+errors", refine, obj, img_pts, w, val, rv0, tv0,
          reps=10)


if __name__ == "__main__":
    main()
