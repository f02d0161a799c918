"""Per-stage frontend timings, batched over 40 frames, outputs forced
to scalars, FLOOR-SUBTRACTED (tunnel measurement discipline, PERF.md:
every dispatch+fetch pays a ~25 ms round-trip; a do-nothing xor+sum
pass is measured first and subtracted from each stage)."""

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
from tpuslam.kernels.orb import (orb_blur,  # noqa: E402
                                 _orb_descriptors_const_angle_device,
                                 orb_pattern)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SEQ = os.path.join(REPO, ".bench_cache", "kittigeo120")
B = 40
C = 1536


_FLOOR_MS = [0.0]


def timed(name, fn, *args, reps=5, is_floor=False):
    # vary the seed every dispatch: identical re-dispatches are served
    # without executing on this backend (PERF.md measurement rules)
    float(fn(jnp.uint8(251), *args))     # fetch = the only real barrier
    ts = []
    for rep in range(reps):
        t0 = time.perf_counter()
        float(fn(jnp.uint8(rep), *args))
        ts.append(time.perf_counter() - t0)
    ms = float(np.median(ts)) * 1e3
    if is_floor:
        _FLOOR_MS[0] = ms
        print(f"{name:24s} {ms:9.2f} ms/chunk  (subtracted below)",
              flush=True)
        return
    net = max(ms - _FLOOR_MS[0], 0.0)
    print(f"{name:24s} {ms:9.2f} ms/chunk {net / B:8.3f} ms/frame "
          f"(floor-corrected)", flush=True)


def main():
    cfg = SlamConfig()
    camera = StereoCameraModel.load_kitti(
        os.path.join(SEQ, "calib.txt"), image_size=(1241, 376))
    ds = StereoImageDataset(left_dir=os.path.join(SEQ, "image_0"),
                            right_dir=os.path.join(SEQ, "image_1"))
    H, W = camera.height, camera.width
    lefts = np.stack([ds[i]["left"] for i in range(B)])
    rights = np.stack([ds[i]["right"] for i in range(B)])
    lefts = jnp.asarray(lefts)
    rights = jnp.asarray(rights)
    pattern = jnp.asarray(orb_pattern())

    @jax.jit
    def f_bm(seed, ls, rs):
        ls = ls ^ seed
        d = jax.vmap(lambda a, b: stereo_bm_auto(a, b, cfg.bm,
                                                 with_speckle=False))(ls, rs)
        return jnp.sum(d.astype(jnp.int32))

    @jax.jit
    def f_gftt(seed, ls):
        ls = ls ^ seed
        def one(l):
            vals, idx, _, _ = gftt_candidates(
                l, jnp.float32(cfg.gftt.quality_level),
                cfg.gftt.block_size, max_candidates=4096)
            kpts, valid, _ = select_from_candidates_device(
                vals, idx, W, jnp.float32(cfg.gftt.min_distance),
                max_features=cfg.gftt.max_features, capacity=C)
            return jnp.sum(kpts) + jnp.sum(valid)
        return jnp.sum(jax.vmap(one)(ls))

    @jax.jit
    def f_blur(seed, ls):
        ls = ls ^ seed
        return jnp.sum(jax.vmap(orb_blur)(ls).astype(jnp.int32))

    @jax.jit
    def f_orb(seed, ls, kpts, valid):
        ls = ls ^ seed
        def one(l, k, v):
            blurred = orb_blur(l)
            d = _orb_descriptors_const_angle_device(
                blurred, k, v, pattern, C, angle_deg=-1.0)
            return jnp.sum(d.astype(jnp.int32))
        return jnp.sum(jax.vmap(one)(ls, kpts, valid))

    rng = np.random.default_rng(0)
    kx = rng.uniform(20, W - 20, (B, C)).astype(np.float32)
    ky = rng.uniform(20, H - 20, (B, C)).astype(np.float32)
    kpts = jnp.asarray(np.stack([kx, ky], axis=-1))
    valid = jnp.asarray(np.ones((B, C), bool))

    @jax.jit
    def f_floor(seed, ls):
        return jnp.sum((ls ^ seed).astype(jnp.int32))

    @jax.jit
    def f_orb_pallas(seed, ls, kpts, valid):
        from tpuslam.kernels.orb import _orb_descriptors_const_angle_pallas
        ls = ls ^ seed
        def one(l, k, v):
            d = _orb_descriptors_const_angle_pallas(l, k, v, C,
                                                    angle_deg=-1.0)
            return jnp.sum(d.astype(jnp.int32))
        return jnp.sum(jax.vmap(one)(ls, kpts, valid))

    timed("floor (xor+sum)", f_floor, lefts, is_floor=True)
    timed("bm(pallas, incl LR)", f_bm, lefts, rights)
    timed("gftt+select", f_gftt, lefts)
    timed("blur (XLA, standalone)", f_blur, lefts)
    timed("blur+orb (XLA path)", f_orb, lefts, kpts, valid)
    timed("orb blur-fused (pallas)", f_orb_pallas, lefts, kpts, valid)


if __name__ == "__main__":
    main()
