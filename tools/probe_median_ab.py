"""In-scan A/B: sort-based _masked_median x2 vs _masked_median2_pallas."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tpuslam.runtime.cache import enable_persistent_cache
enable_persistent_cache()
import numpy as np, jax, jax.numpy as jnp
from tpuslam.vo import fused as F

B = 40; C = 1536
rng = np.random.default_rng(0)
d2 = jnp.asarray(np.abs(rng.normal(0, 5, (B, C))).astype(np.float32))
ang = jnp.asarray(np.abs(rng.normal(0, 0.1, (B, C))).astype(np.float32))
msk = jnp.asarray(rng.uniform(size=(B, C)) < 0.3)

def mk(use_pallas):
    @jax.jit
    def f(seed, d2, ang, msk):
        d2 = d2 + seed
        def body(c, xs):
            a, b, m = xs
            if use_pallas:
                md, ma, cnt = F._masked_median2_pallas(a, b, m)
            else:
                md, cnt = F._masked_median(a, m)
                ma, _ = F._masked_median(b, m)
            return c, md + ma + cnt
        return jnp.sum(jax.lax.scan(body, 0, (d2, ang, msk))[1])
    return f

g = jax.jit(lambda a: a + 1); y = jnp.ones((8, 8), jnp.float32)
def rewarm():
    r = None
    for _ in range(2000): r = g(y)
    jax.block_until_ready(r)
def timed(fn, *args):
    float(fn(jnp.float32(251), *args)); rewarm()
    ts = []
    for rep in range(7):
        t0 = time.perf_counter(); float(fn(jnp.float32(rep), *args)); ts.append(time.perf_counter()-t0)
    return float(np.median(ts))*1e3
fl = timed(jax.jit(lambda s, a: jnp.sum(a + s)), d2)
for name, use in (("sort x2", False), ("pallas", True)):
    ms = timed(mk(use), d2, ang, msk)
    print(f"{name}: {ms:.1f} ms/chunk net {(ms-fl)/B:.3f} ms/frame (floor {fl:.1f})")
