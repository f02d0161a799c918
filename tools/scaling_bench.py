"""Scaling-efficiency harness on the virtual CPU mesh (BASELINE 4-5).

One physical chip is available, so a wall-clock speedup curve over real
devices cannot be measured here.  What the 8-virtual-device CPU mesh CAN
witness honestly is the *sharding overhead*: the same total workload run
unsharded (mesh of 1) vs sharded over 8 virtual devices on the same
physical cores.  If the sharded program does no redundant work and its
collectives are cheap, the ratio t(1)/t(8) stays near 1.0 — and on a
real slice, where each shard owns a chip, per-device work drops by 8x
with the same collective pattern.  Efficiency here := t_unsharded /
t_sharded_over_8 at FIXED total work (1.0 = zero sharding overhead).

Covers the three distributed paths (dist/mesh.py): frame-parallel
frontend (no collectives until the output gather), edge-sharded pose
graph LM (one psum per iteration), landmark-sharded BA (one psum for the
reduced camera system).

Usage: python tools/scaling_bench.py [--small] [--md-out SCALING.md]
Prints one line per path; --md-out rewrites the results table in the
given markdown file.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                           " --xla_force_host_platform_device_count=8")

import numpy as np  # noqa: E402
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402


def _time(fn, *args, reps=3):
    jax.block_until_ready(fn(*args))          # compile
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def bench_frontend(n_frames=8, width=640, height=368):
    from tpuslam.config import SlamConfig
    from tpuslam.dist.mesh import make_mesh, sharded_frontend_step

    cfg = SlamConfig()
    rng = np.random.default_rng(0)
    lefts = rng.integers(0, 255, (n_frames, height, width),
                         dtype=np.uint8)
    rights = np.roll(lefts, 8, axis=2)

    out = {}
    for n_dev in (1, 8):
        mesh = make_mesh(n_dev)
        # with_speckle=False: the production fused path's configuration
        # (SlamConfig.fused_speckle default; AB_SPECKLE.md).  The
        # speckle CC pass's pointer-jump gathers are irregular-memory
        # work whose throughput is nonlinear in shard size — sharding
        # CORRECTNESS under speckle is covered by
        # tests/test_dist.py test_speckle_path_shards.
        step = sharded_frontend_step(mesh, cfg.bm, with_speckle=False)
        out[n_dev] = _time(step, jnp.asarray(lefts), jnp.asarray(rights))
    return out[1] / out[8], out


def bench_pose_graph(n_v=512, iters=5, sparse=False):
    from tpuslam.dist.mesh import (make_mesh, sharded_pose_graph_step,
                                   sharded_pose_graph_step_sparse)
    from tpuslam.optim import device as dev

    rng = np.random.default_rng(1)
    gt = [np.eye(4, dtype=np.float32)]
    for _ in range(n_v - 1):
        step = np.eye(4, dtype=np.float32)
        step[:3, 3] = [1.0, 0.1 * rng.standard_normal(), 0.0]
        gt.append(gt[-1] @ step)
    gt = np.stack(gt)
    noisy = gt.copy()
    noisy[1:, :3, 3] += 0.05 * rng.standard_normal((n_v - 1, 3)) \
        .astype(np.float32)
    e_from = np.arange(n_v - 1, dtype=np.int32)
    e_to = e_from + 1
    Z = np.stack([np.linalg.inv(gt[a]) @ gt[b]
                  for a, b in zip(e_from, e_to)]).astype(np.float32)
    Omega = np.tile(np.eye(6, dtype=np.float32), (n_v - 1, 1, 1))
    n_e = ((n_v - 1 + 7) // 8) * 8
    pad = n_e - (n_v - 1)
    e_from = np.concatenate([e_from, np.zeros(pad, np.int32)])
    e_to = np.concatenate([e_to, np.zeros(pad, np.int32)])
    Z = np.concatenate([Z, np.tile(np.eye(4, dtype=np.float32),
                                   (pad, 1, 1))])
    Omega = np.concatenate([Omega, np.zeros((pad, 6, 6), np.float32)])
    free_idx = np.full(n_v, -1, np.int32)
    free_idx[1:] = np.arange(n_v - 1)
    args = tuple(jnp.asarray(a) for a in
                 (noisy, e_from, e_to, Z, Omega, free_idx))

    out = {}
    if sparse:
        xsel, xp, xq = dev.classify_extra_edges(e_from, e_to, free_idx)
        xargs = tuple(jnp.asarray(a) for a in (xsel, xp, xq))
        for n_dev in (1, 8):
            mesh = make_mesh(n_dev)
            step = sharded_pose_graph_step_sparse(mesh, n_v - 1,
                                                  iterations=iters)
            out[n_dev] = _time(step, *args, *xargs)
        return out[1] / out[8], out
    for n_dev in (1, 8):
        mesh = make_mesh(n_dev)
        step = sharded_pose_graph_step(mesh, n_v, n_v - 1,
                                       iterations=iters)
        out[n_dev] = _time(step, *args)
    return out[1] / out[8], out


def bench_ba(W=8, L=1024, O=4096, iters=5):
    from tpuslam.dist.mesh import (make_mesh, make_sharded_ba_step,
                                   shard_ba_problem)
    from tpuslam.optim.ba import ba_solve
    import functools

    rng = np.random.default_rng(2)
    lms = rng.uniform(-10, 10, (L, 3)).astype(np.float32)
    lms[:, 2] += 15.0
    Tcw = np.tile(np.eye(4, dtype=np.float32), (W, 1, 1))
    Tcw[:, 0, 3] = np.linspace(0, 2, W)
    intr = jnp.asarray([500.0, 500.0, 320.0, 240.0], jnp.float32)
    obs_cam = rng.integers(0, W, O).astype(np.int32)
    obs_lm = rng.integers(0, L, O).astype(np.int32)
    pts = lms[obs_lm]
    pc = pts - Tcw[obs_cam][:, :3, 3]
    uv = np.stack([pc[:, 0] / pc[:, 2] * 500 + 320,
                   pc[:, 1] / pc[:, 2] * 500 + 240], axis=1) \
        .astype(np.float32)
    uv += rng.normal(0, 0.5, uv.shape).astype(np.float32)
    valid = np.ones(O, bool)

    t1 = _time(functools.partial(
        ba_solve, n_cams=W, n_lms=L, iterations=iters),
        jnp.asarray(Tcw), jnp.asarray(lms), intr, jnp.asarray(obs_cam),
        jnp.asarray(obs_lm), jnp.asarray(uv), jnp.asarray(valid))

    mesh = make_mesh(8, axis="landmarks")
    lms_s, oc_s, ol_s, uv_s, va_s, L_loc, _ = shard_ba_problem(
        lms, obs_cam, obs_lm, uv, valid, n_shards=8)
    step = make_sharded_ba_step(mesh, W, L_loc, iterations=iters)
    t8 = _time(step, jnp.asarray(Tcw), jnp.asarray(lms_s), intr,
               jnp.asarray(oc_s), jnp.asarray(ol_s), jnp.asarray(uv_s),
               jnp.asarray(va_s))
    return t1 / t8, {1: t1, 8: t8}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true",
                    help="reduced shapes (test-suite speed)")
    ap.add_argument("--md-out", default=None)
    a = ap.parse_args()

    if a.small:
        rows = [
            ("frontend", *bench_frontend(n_frames=8, width=320,
                                         height=240)),
            ("pose_graph", *bench_pose_graph(n_v=128, iters=3)),
            ("pose_graph_sparse", *bench_pose_graph(n_v=128, iters=3,
                                                    sparse=True)),
            ("ba", *bench_ba(W=4, L=256, O=1024, iters=3)),
        ]
    else:
        rows = [
            ("frontend", *bench_frontend()),
            ("pose_graph", *bench_pose_graph()),
            ("pose_graph_sparse", *bench_pose_graph(sparse=True)),
            ("ba", *bench_ba()),
        ]

    lines = []
    for name, eff, times in rows:
        line = (f"{name:11s} t(mesh1)={times[1]*1e3:8.1f} ms  "
                f"t(mesh8)={times[8]*1e3:8.1f} ms  "
                f"sharding-efficiency={eff:.2f}")
        print(line, flush=True)
        lines.append((name, eff, times))

    if a.md_out:
        table = ["| path | t(mesh 1) | t(mesh 8, same work) | "
                 "sharding efficiency |",
                 "|---|---|---|---|"]
        for name, eff, times in lines:
            table.append(f"| {name} | {times[1]*1e3:.1f} ms | "
                         f"{times[8]*1e3:.1f} ms | {eff:.2f} |")
        block = "\n".join(table)
        marker = "<!-- scaling-results -->"
        src = open(a.md_out).read() if os.path.exists(a.md_out) else ""
        if marker in src:
            pre, rest = src.split(marker, 1)
            _, post = rest.split(marker, 1)
            src = pre + marker + "\n" + block + "\n" + marker + post
        else:
            src += f"\n{marker}\n{block}\n{marker}\n"
        open(a.md_out, "w").write(src)

    return lines


if __name__ == "__main__":
    main()
