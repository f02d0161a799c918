"""Micro-profile of ransac_epnp internals on the chip: which factorization
dominates the 300-hypothesis batch?"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tpuslam.runtime.cache import enable_persistent_cache  # noqa: E402
enable_persistent_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def bench(name, fn, *args, reps=20):
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn(*args)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name:<28}{dt:>10.3f} ms")
    return dt


def main():
    H = 300
    rng = np.random.default_rng(0)
    MtM = jnp.asarray(rng.standard_normal((H, 12, 12)).astype(np.float32))
    MtM = MtM @ MtM.transpose(0, 2, 1)
    A3 = jnp.asarray(rng.standard_normal((H * 3, 3, 3)).astype(np.float32))
    S = 40  # scan length (frames per chunk)

    bench("eigh 12x12 x300", jax.jit(lambda m: jnp.linalg.eigh(m)[1]), MtM)
    bench("svd 3x3 x900", jax.jit(lambda a: jnp.linalg.svd(a)[0]), A3)
    bench("cholesky 12x12 x300",
          jax.jit(lambda m: jnp.linalg.cholesky(
              m + 1e-3 * jnp.eye(12))), MtM)
    bench("solve 12x4 x300",
          jax.jit(lambda m: jnp.linalg.solve(
              m + 1e-3 * jnp.eye(12),
              jnp.ones((H, 12, 4), jnp.float32))), MtM)

    # full ransac_epnp at capacity shapes
    from tpuslam.kernels import pnp as P
    C = 1536
    obj = jnp.asarray(rng.standard_normal((C, 3)).astype(np.float32)) * 5
    obj = obj + jnp.asarray([0, 0, 15.0], jnp.float32)
    K = jnp.asarray([[718.0, 0, 620.0], [0, 718.0, 188.0], [0, 0, 1.0]],
                    jnp.float32)
    R0 = jnp.eye(3, dtype=jnp.float32)
    t0v = jnp.asarray([0.1, 0.0, 0.5], jnp.float32)
    pc = obj @ R0.T + t0v
    img = jnp.stack([pc[:, 0] / pc[:, 2] * 718.0 + 620.0,
                     pc[:, 1] / pc[:, 2] * 718.0 + 188.0], axis=1)
    valid = jnp.ones((C,), bool)
    key = jax.random.PRNGKey(0)

    f = jax.jit(lambda: P.ransac_epnp(obj, img, valid, K, key,
                                      jnp.float32(2.0), n_hyp=300))
    bench("ransac_epnp (1 frame)", f)

    g = jax.jit(lambda w: P.refine_lm_with_errors(
        obj, img, w, valid, K, jnp.zeros(3), jnp.zeros(3)))
    bench("refine_lm_with_errors", g, jnp.ones((C,), jnp.float32))

    # scanned: 40 frames of ransac in one program (how bench runs it)
    @jax.jit
    def scan_ransac():
        def body(c, _):
            rv, tv, inl, n = P.ransac_epnp(obj, img, valid, K, key,
                                           jnp.float32(2.0), n_hyp=300)
            return c, n
        return jax.lax.scan(body, 0, None, length=S)[1]
    d = bench("ransac scan x40", scan_ransac)
    print(f"{'  -> per frame':<28}{d / S:>10.3f} ms")


if __name__ == "__main__":
    main()
