"""Bisect the fused VO chunk: time scan-shaped sub-programs.

The per-stage numbers in profile_stages.py time each kernel as its own
dispatch; inside the fused lax.scan XLA fuses differently.  This tool
times 40-frame scans of progressively larger prefixes of the per-frame
body, so the cost of each sub-stage IN ITS SCAN CONTEXT is the delta
between consecutive rows.  Run alone on the chip.
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
from tpuslam.vo.fused import (FusedShapes, make_frontend_fn,  # noqa: E402
                              make_fused_chunk_fn)
from tpuslam.kernels import matching as M  # noqa: E402
from tpuslam.kernels import pnp as P  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SEQ = os.path.join(REPO, ".bench_cache", "kittigeo80")
if not os.path.exists(os.path.join(SEQ, "calib.txt")):
    SEQ = os.path.join(REPO, ".bench_cache", "kittigeo120")
B = 40
C = 1536


def probe_ms(probe):
    f, x = probe
    t0 = time.perf_counter()
    jax.block_until_ready(f(x))
    return (time.perf_counter() - t0) * 1e3


_hammer = None


def rewarm():
    """The tunnel connection goes cold after idle periods (long compiles
    included): every synchronous dispatch then pays a ~25 ms round trip,
    and sleeping makes it worse.  A burst of async tiny dispatches
    restores sub-ms latency."""
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
    """Median stage time; also reports the cheap-probe latency around the
    measurement so degraded-tunnel readings are visible, not hidden."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    rewarm()
    p0 = probe_ms(probe)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    p1 = probe_ms(probe)
    med = float(np.median(ts)) * 1e3
    print(f"#   probe {p0:.2f} -> {p1:.2f} ms around this row",
          file=sys.stderr, flush=True)
    return med


def main():
    cfg = SlamConfig()
    camera = StereoCameraModel.load_kitti(
        os.path.join(SEQ, "calib.txt"), image_size=(1241, 376))
    ds = StereoImageDataset(left_dir=os.path.join(SEQ, "image_0"),
                            right_dir=os.path.join(SEQ, "image_1"))
    H, W = camera.height, camera.width
    left = jnp.asarray(ds[10]["left"])
    left2 = jnp.asarray(ds[11]["left"])
    right = jnp.asarray(ds[10]["right"])
    lefts = jnp.broadcast_to(left, (B, H, W)).at[1::2].set(left2)
    rights = jnp.broadcast_to(right, (B, H, W))

    px = jnp.ones((1536, 1536), jnp.float32)
    pf = jax.jit(lambda a: jnp.min(a, axis=1))
    jax.block_until_ready(pf(px))
    probe = (pf, px)

    shapes = FusedShapes(chunk=B, capacity=C)
    frontend = make_frontend_fn(camera, cfg, shapes)
    K_l = jnp.asarray(camera.K_l, jnp.float32)

    rows = {}

    # 1. frontend-only scan
    @jax.jit
    def scan_frontend(ls, rs):
        def body(c, xs):
            f = frontend(xs[0], xs[1])
            return c, (f["kpts"], f["desc"], f["pts3d"], f["n_kpts"])
        return jax.lax.scan(body, 0, (ls, rs))[1]

    rows["frontend"] = timeit(scan_frontend, lefts, rights, probe=probe)
    kpts_all, desc_all, pts3d_all, _ = scan_frontend(lefts, rights)

    # 2. frontend + matching scan (global top2 only)
    @jax.jit
    def scan_match(ls, rs):
        def body(carry, xs):
            f = frontend(xs[0], xs[1])
            bits = f["bits"]
            nbits = jnp.sum(bits, axis=1)
            ref_bits, ref_nbits, ref_valid = carry
            dist = (ref_nbits[:, None] + nbits[None, :]
                    - 2.0 * (ref_bits @ bits.T))
            dist = jnp.where(ref_valid[:, None] & f["valid"][None, :],
                             dist, 1e9)
            d1, i1, d2, i2 = M._top2_min(dist)
            return (bits, nbits, f["valid"]), (d1, i1)
        init = (jnp.zeros((C, 256), jnp.float32), jnp.zeros((C,)),
                jnp.zeros((C,), bool))
        return jax.lax.scan(body, init, (ls, rs))[1]

    rows["frontend+match"] = timeit(scan_match, lefts, rights, probe=probe)

    # 3. PnP-only scan over precomputed features
    key = jax.random.PRNGKey(0)

    @jax.jit
    def scan_pnp(kpts, pts3d):
        def body(c, xs):
            kp, p3 = xs
            obj = jnp.nan_to_num(p3, nan=0.0)
            img = kp[:, :2]
            m = jnp.isfinite(p3).all(axis=1)
            rv, tv, inl, n = P.ransac_epnp(
                obj, img, m, K_l, key, jnp.float32(2.0),
                n_hyp=cfg.pnp.iterations_count)
            w = inl.astype(jnp.float32)
            rv2, tv2, err = P.refine_lm_with_errors(obj, img, w, m, K_l,
                                                    rv, tv)
            return c, (rv2, tv2, n)
        return jax.lax.scan(body, 0, (kpts, pts3d))[1]

    rows["pnp_scan"] = timeit(scan_pnp, kpts_all, pts3d_all, probe=probe)

    # 4. full fused chunk
    init_carry, step, _ = make_fused_chunk_fn(camera, cfg, shapes)
    dts = jnp.full((B,), 0.1, jnp.float32)
    active = jnp.ones((B,), bool)
    carry = init_carry()
    carry, outs, feats = step(carry, lefts, rights, dts, active)
    jax.block_until_ready(outs)

    def run_chunk(c):
        c2, o, f = step(c, lefts, rights, dts, active)
        return o["pose"]

    rows["full_chunk"] = timeit(run_chunk, carry, probe=probe)

    print(f"{'scan (40 frames)':<22}{'ms/chunk':>12}{'ms/frame':>12}")
    for k, v in rows.items():
        print(f"{k:<22}{v:>12.2f}{v / B:>12.3f}")


if __name__ == "__main__":
    main()
