"""Bisect ransac_epnp: vmapped EPnP vs error matrix vs selection."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tpuslam.runtime.cache import enable_persistent_cache  # noqa: E402
enable_persistent_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from tpuslam.kernels import pnp as P  # noqa: E402


def bench(name, fn, *args, reps=20):
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn(*args)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name:<34}{dt:>10.3f} ms")
    return dt


def main():
    H, C, m = 300, 1536, 6
    rng = np.random.default_rng(0)
    obj = jnp.asarray(rng.standard_normal((C, 3)).astype(np.float32)) * 5
    obj = obj + jnp.asarray([0, 0, 15.0], jnp.float32)
    K = jnp.asarray([[718.0, 0, 620.0], [0, 718.0, 188.0], [0, 0, 1.0]],
                    jnp.float32)
    pc = obj + jnp.asarray([0.1, 0.0, 0.5], jnp.float32)
    img = jnp.stack([pc[:, 0] / pc[:, 2] * 718.0 + 620.0,
                     pc[:, 1] / pc[:, 2] * 718.0 + 188.0], axis=1)
    img_n = P.normalize_points(img, K)
    idx = jnp.asarray(rng.integers(0, C, (H, m)), jnp.int32)

    sample_o = obj[idx]       # (H, m, 3)
    sample_i = img_n[idx]     # (H, m, 2)

    f1 = jax.jit(lambda o, i: jax.vmap(P.epnp_norm)(o, i))
    bench("vmap epnp_norm x300", f1, sample_o, sample_i)

    Rs, ts, oks = f1(sample_o, sample_i)

    def errsel(Rs, ts, oks):
        def errors(R, t):
            p = P.project_norm(obj, R, t)
            return P.pixel_err2(p, img_n, 718.0, 718.0)
        err2 = jax.vmap(errors)(Rs, ts)
        inl = err2 <= 4.0
        counts = jnp.where(oks, jnp.sum(inl, axis=1), -1)
        best = jnp.argmax(counts)
        return P.rodrigues_inv(Rs[best]), inl[best], counts[best]
    bench("errors+select", jax.jit(errsel), Rs, ts, oks)

    # pieces of epnp_norm
    def ctrl(o):
        c0 = jnp.mean(o, axis=0)
        P0 = o - c0
        cov = P0.T @ P0
        w, Uc = jnp.linalg.eigh(cov)
        return w, Uc
    bench("  vmap control-pts eigh3", jax.jit(jax.vmap(ctrl)), sample_o)

    def nullspace(o, i):
        n = o.shape[0]
        c0 = jnp.mean(o, axis=0)
        P0 = o - c0
        alphas = jnp.concatenate(
            [1.0 - jnp.sum(P0, axis=1, keepdims=True), P0], axis=1)
        u, vv = i[:, 0], i[:, 1]
        zero = jnp.zeros_like(alphas)
        r1 = jnp.stack([alphas, zero, alphas * (-u[:, None])],
                       axis=-1).reshape(n, 12)
        r2 = jnp.stack([zero, alphas, alphas * (-vv[:, None])],
                       axis=-1).reshape(n, 12)
        M = jnp.concatenate([r1, r2], axis=0)
        MtM = M.T @ M
        _, evec = jnp.linalg.eigh(MtM)
        return evec
    bench("  vmap M+eigh12", jax.jit(jax.vmap(nullspace)), sample_o,
          sample_i)

    L = jnp.asarray(rng.standard_normal((H, 6, 10)).astype(np.float32))
    rho = jnp.asarray(rng.standard_normal((H, 6)).astype(np.float32))
    b0 = jnp.asarray(rng.standard_normal((H, 3, 4)).astype(np.float32))
    f_gn = jax.jit(jax.vmap(lambda l, r, bs: jax.vmap(
        lambda b: P._gauss_newton_betas(l, r, b))(bs)))
    bench("  vmap GN betas (300x3)", f_gn, L, rho, b0)

    pws = jnp.asarray(rng.standard_normal((H, 3, m, 3)).astype(np.float32))
    pcs = pws + 0.1
    f_h = jax.jit(jax.vmap(jax.vmap(P._horn)))
    bench("  vmap horn (300x3)", f_h, pws, pcs)


if __name__ == "__main__":
    main()
