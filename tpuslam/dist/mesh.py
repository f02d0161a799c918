"""Device mesh setup and sharded step functions.

Shardings are expressed with `jax.sharding.Mesh` + `shard_map`, so the
same code runs on a real multi-chip slice (ICI collectives) or a virtual
CPU mesh (`--xla_force_host_platform_device_count=N`, the test/"fake
backend" configuration — SURVEY.md §4).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..kernels.stereo_bm import prefilter_xsobel
from ..kernels.stereo_bm_pallas import stereo_bm_auto as stereo_bm
from ..kernels.gftt import gftt_response
from ..kernels.orb import orb_blur
from ..config import StereoBMConfig
from ..optim import device as dev


def make_mesh(n_devices: int | None = None, axis: str = "frames") -> Mesh:
    devices = jax.devices()
    n = n_devices or len(devices)
    return Mesh(np.array(devices[:n]), (axis,))


def frontend_one(left: jnp.ndarray, right: jnp.ndarray,
                 cfg: StereoBMConfig = StereoBMConfig()):
    """Per-frame device front-end: disparity + corner response + blurred
    image for descriptors.  The unit that shards over frames."""
    disp = stereo_bm(left, right, cfg)
    eig = gftt_response(left)
    blurred = orb_blur(left)
    return disp, eig, blurred


def sharded_frontend_step(mesh: Mesh, cfg: StereoBMConfig | None = None,
                          with_speckle: bool = True):
    """Returns a jitted fn (B,H,W)x2 uint8 -> per-frame outputs, frames
    sharded over the mesh axis.  B must be divisible by mesh size."""
    cfg = cfg or StereoBMConfig()
    axis = mesh.axis_names[0]

    def per_shard(lefts, rights):
        def one(args):
            l, r = args
            d = stereo_bm(l, r, cfg, with_speckle=with_speckle)
            e = gftt_response(l)
            b = orb_blur(l)
            return d, e, b
        return jax.lax.map(one, (lefts, rights))

    fn = shard_map(per_shard, mesh=mesh,
                   in_specs=(P(axis), P(axis)),
                   out_specs=(P(axis), P(axis), P(axis)))
    return jax.jit(fn)


def sharded_pose_graph_step(mesh: Mesh, n_vertices: int, n_free: int,
                            iterations: int = 5):
    """Returns a jitted LM/GN step with EDGES sharded over the mesh:
    each device linearizes its edge shard into partial dense normal
    equations, `psum`s H and b over ICI, and runs the replicated damped
    Cholesky solve + pose update.

    Edge count must be divisible by mesh size (pad with zero-information
    edges between vertex 0 and itself).
    """
    axis = mesh.axis_names[0]

    def step(poses, e_from, e_to, Z, Omega, free_idx):
        Z_inv = dev._se3_inv(Z)

        def body(carry, _):
            poses, lam = carry
            H, b, chi2 = dev.gn_normal_equations(
                poses, e_from, e_to, Z_inv, Z, Omega, n_free, free_idx)
            H = jax.lax.psum(H, axis)
            b = jax.lax.psum(b, axis)
            chi2 = jax.lax.psum(chi2, axis)
            Hd = H + lam * jnp.eye(H.shape[0], dtype=H.dtype)
            x = jax.scipy.linalg.cho_solve(
                jax.scipy.linalg.cho_factor(Hd), b)
            upd = x.reshape(n_free, 6)
            full_upd = jnp.where((free_idx >= 0)[:, None],
                                 upd[jnp.clip(free_idx, 0)], 0.0)
            return (dev._oplus_batch(poses, full_upd), lam), chi2

        (poses, _), chis = jax.lax.scan(
            body, (poses, jnp.float32(1e-4)), None, length=iterations)
        return poses, chis

    fn = shard_map(
        step, mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis), P(axis), P()),
        out_specs=(P(), P()),
        check_rep=False)
    return jax.jit(fn)


def pad_edges(e_from, e_to, Z, Omega, multiple: int):
    """Pad edge arrays to a multiple with zero-information self-edges."""
    E = len(e_from)
    pad = (-E) % multiple
    if pad == 0:
        return e_from, e_to, Z, Omega
    ef = np.concatenate([e_from, np.zeros(pad, e_from.dtype)])
    et = np.concatenate([e_to, np.zeros(pad, e_to.dtype)])
    Zp = np.concatenate([Z, np.tile(np.eye(4, dtype=Z.dtype),
                                    (pad, 1, 1))])
    Op = np.concatenate([Omega, np.zeros((pad, 6, 6), Omega.dtype)])
    return ef, et, Zp, Op
