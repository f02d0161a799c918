"""Split the fused chunk: batched-frontend-only vs full chunk program,
floor-corrected, to size the VO-scan + tail residual."""
import os, sys, time
import numpy as np
sys.path.insert(0, "/root/repo")
from tpuslam.runtime.cache import enable_persistent_cache
enable_persistent_cache()
import jax, jax.numpy as jnp
from tpuslam.config import SlamConfig
from tpuslam.geometry.camera import StereoCameraModel
from tpuslam.io.dataset import StereoImageDataset
from tpuslam.vo import fused as F

SEQ = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".bench_cache", "kittigeo120")
B = 40
cfg = SlamConfig()
camera = StereoCameraModel.load_kitti(os.path.join(SEQ, "calib.txt"),
                                      image_size=(1241, 376))
ds = StereoImageDataset(left_dir=os.path.join(SEQ, "image_0"),
                        right_dir=os.path.join(SEQ, "image_1"))
lefts = jnp.asarray(np.stack([ds[i]["left"] for i in range(B)]))
rights = jnp.asarray(np.stack([ds[i]["right"] for i in range(B)]))
shapes = F.FusedShapes(chunk=B, capacity=1536)
frontend = F.make_frontend_fn(camera, cfg, shapes)

@jax.jit
def fe_only(l, r):
    f = jax.vmap(frontend)(l, r)
    f["nbits"] = jnp.sum(f["bits"], axis=2)
    return jax.tree_util.tree_map(lambda a: jnp.sum(a.astype(jnp.float32)), f)

init_carry, step, _ = make = F.make_fused_chunk_fn(camera, cfg, shapes)
dts = jnp.full((B,), 0.1, jnp.float32)
active = jnp.ones((B,), bool)
carry0 = init_carry()
carry0, outs, feats = step(carry0, lefts, rights, dts, active)
jax.block_until_ready(outs)

g = jax.jit(lambda a: a + 1); y = jnp.ones((8, 8), jnp.float32)
def rewarm():
    r = None
    for _ in range(2000): r = g(y)
    jax.block_until_ready(r)

def t(fn, *a, reps=7):
    jax.block_until_ready(fn(*a))
    rewarm()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter(); jax.block_until_ready(fn(*a))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3

floor = t(jax.jit(lambda l: jnp.sum(l.astype(jnp.int32))), lefts)
fe = t(fe_only, lefts, rights)
full = t(lambda c: step(c, lefts, rights, dts, active)[1]["pose"], carry0)
print(f"floor  {floor:8.2f} ms")
print(f"fe     {fe:8.2f} ms  net {(fe-floor)/B:6.3f} ms/frame")
print(f"full   {full:8.2f} ms  net {(full-floor)/B:6.3f} ms/frame")
print(f"scan+tail = {(full-fe)/B:6.3f} ms/frame")
