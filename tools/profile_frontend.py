"""Bisect the per-frame frontend inside its 40-frame scan context:
BM / GFTT / select / blur / ORB / lift deltas."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tpuslam.runtime.cache import enable_persistent_cache  # noqa: E402
enable_persistent_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from tpuslam.config import SlamConfig  # noqa: E402
from tpuslam.geometry.camera import StereoCameraModel  # noqa: E402
from tpuslam.io.dataset import StereoImageDataset  # noqa: E402
from tpuslam.kernels.stereo_bm_pallas import stereo_bm_auto  # noqa: E402
from tpuslam.kernels.gftt import (gftt_candidates,  # noqa: E402
                                  select_from_candidates_device)
from tpuslam.kernels.orb import (orb_blur, _orb_descriptors_device,  # noqa: E402
                                 orb_pattern)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SEQ = os.path.join(REPO, ".bench_cache", "kittigeo120")
B = 40
C = 1536


def main():
    cfg = SlamConfig()
    camera = StereoCameraModel.load_kitti(
        os.path.join(SEQ, "calib.txt"), image_size=(1241, 376))
    ds = StereoImageDataset(left_dir=os.path.join(SEQ, "image_0"),
                            right_dir=os.path.join(SEQ, "image_1"))
    H, W = camera.height, camera.width
    lefts_n = np.stack([ds[i]["left"] for i in range(B)])
    rights_n = np.stack([ds[i]["right"] for i in range(B)])
    lefts = jnp.asarray(lefts_n)
    rights = jnp.asarray(rights_n)
    pattern = jnp.asarray(orb_pattern())
    border = cfg.orb.edge_threshold

    def bench(name, fn, reps=8):
        r = fn(lefts, rights)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        for _ in range(reps):
            r = fn(lefts, rights)
        jax.block_until_ready(r)
        dt = (time.perf_counter() - t0) / reps * 1e3
        print(f"{name:<26}{dt:>10.2f} ms/chunk{dt / B:>9.3f} ms/frame",
              flush=True)

    def scan(body):
        @jax.jit
        def run(ls, rs):
            def step(c, xs):
                return c, body(xs[0], xs[1])
            return jax.lax.scan(step, 0, (ls, rs))[1]
        return run

    bench("bm", scan(lambda l, r: stereo_bm_auto(l, r, cfg.bm,
                                                 with_speckle=False)))

    def f_gftt(l, r):
        disp = stereo_bm_auto(l, r, cfg.bm, with_speckle=False)
        disp = jax.lax.optimization_barrier(disp)
        vals, idx, _, _ = gftt_candidates(
            l, jnp.float32(cfg.gftt.quality_level), cfg.gftt.block_size,
            max_candidates=4096)
        return disp[0, 0], vals, idx
    bench("bm+gftt_cand", scan(f_gftt))

    def f_sel(l, r):
        disp = stereo_bm_auto(l, r, cfg.bm, with_speckle=False)
        disp = jax.lax.optimization_barrier(disp)
        vals, idx, _, _ = gftt_candidates(
            l, jnp.float32(cfg.gftt.quality_level), cfg.gftt.block_size,
            max_candidates=4096)
        vals, idx = jax.lax.optimization_barrier((vals, idx))
        kpts, valid, _ = select_from_candidates_device(
            vals, idx, W, jnp.float32(cfg.gftt.min_distance),
            max_features=cfg.gftt.max_features, capacity=C)
        return disp[0, 0], kpts, valid
    bench("bm+gftt+select", scan(f_sel))

    def f_blur(l, r):
        out = f_sel(l, r)
        blurred = orb_blur(l)
        return out[0], blurred[0, 0]
    bench("bm+gftt+sel+blur", scan(f_blur))

    def f_orb(l, r):
        disp = stereo_bm_auto(l, r, cfg.bm, with_speckle=False)
        disp = jax.lax.optimization_barrier(disp)
        vals, idx, _, _ = gftt_candidates(
            l, jnp.float32(cfg.gftt.quality_level), cfg.gftt.block_size,
            max_candidates=4096)
        vals, idx = jax.lax.optimization_barrier((vals, idx))
        kpts, valid, _ = select_from_candidates_device(
            vals, idx, W, jnp.float32(cfg.gftt.min_distance),
            max_features=cfg.gftt.max_features, capacity=C)
        kpts, valid = jax.lax.optimization_barrier((kpts, valid))
        blurred = orb_blur(l)
        blurred = jax.lax.optimization_barrier(blurred)
        ang = jnp.full((C,), -1.0, jnp.float32)
        desc = _orb_descriptors_device(blurred, kpts[:, :2], ang, valid,
                                       pattern, C)
        return disp[0, 0], desc
    bench("bm+gftt+sel+blur+orb", scan(f_orb))

    from tpuslam.vo.fused import make_frontend_fn, FusedShapes
    fe = make_frontend_fn(camera, cfg, FusedShapes(chunk=B, capacity=C))

    def f_full(l, r):
        f = fe(l, r)
        return f["kpts"], f["desc"], f["pts3d"], f["disp_dec"]
    bench("full frontend", scan(f_full))


if __name__ == "__main__":
    main()
