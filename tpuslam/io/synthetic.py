"""Synthetic KITTI-format stereo sequence generator.

The build environment has no KITTI data (zero egress), so end-to-end
tests and benchmarks run on synthetic sequences with *exact* ground truth:
a textured 3D surface is sampled into a dense point cloud and z-buffer
splatted into each stereo view along a smooth trajectory.  Output follows
the KITTI odometry layout (image_0/, image_1/, calib.txt, times.txt,
poses.txt) so the real dataset loader (tpuslam.io.dataset) and camera
model (geometry.camera.load_kitti) are exercised unchanged — swap the
directory for a real KITTI sequence and nothing else changes.

This plays the role of the reference's synthetic stimulus/pattern
infrastructure (RTL sim stimulus img_001_*.dat + FPGA pattern generators,
/root/reference/src/dvp/sim, Parameters.h:61-68) at the system level.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from ..geometry import transform as T


@functools.partial(jax.jit, static_argnames=("h", "w"))
def _smooth_noise_device(noise, h, w, sigma_px):
    fy = jnp.fft.fftfreq(h)[:, None].astype(jnp.float32)
    fx = jnp.fft.fftfreq(w)[None, :].astype(jnp.float32)
    filt = jnp.exp(-2.0 * (jnp.pi * sigma_px) ** 2 * (fx * fx + fy * fy))
    out = jnp.fft.ifft2(jnp.fft.fft2(noise) * filt).real
    return out / (jnp.abs(out).max() + 1e-12)


def _smooth_noise(rng, h, w, sigma_px: float, amplitude: float = 1.0):
    """Band-limited random field via FFT low-pass of white noise.

    The RNG draw stays on host (reproducibility vs. the fixtures);
    the FFT filtering runs as one jitted program — the host FFTs
    dominated sequence generation time on this machine."""
    noise = rng.standard_normal((h, w)).astype(np.float32)
    out = _smooth_noise_device(jnp.asarray(noise), h, w,
                               jnp.float32(sigma_px))
    return np.asarray(out, np.float64) * amplitude


def _make_world_chunk(rng, h, w, f, cx, cy, supersample: int = 2):
    """Dense textured point cloud filling one camera frustum (local
    optical frame of its anchor pose).

    Returns (points (N,3) anchor-cam optical frame, intensities (N,))."""
    hs, ws = h * supersample, w * supersample
    # texture: multi-scale so GFTT/ORB/SAD all have structure
    tex = (0.55 * _smooth_noise(rng, hs, ws, 1.2) +
           0.3 * _smooth_noise(rng, hs, ws, 4.0) +
           0.15 * _smooth_noise(rng, hs, ws, 16.0))
    tex = (tex - tex.min()) / (tex.max() - tex.min() + 1e-12)
    intensity = 20.0 + tex * 215.0

    # depth: smooth rolling surface 8..35 m plus larger structure
    z = (18.0 + 10.0 * _smooth_noise(rng, hs, ws, 40.0) +
         5.0 * _smooth_noise(rng, hs, ws, 120.0))
    z = np.clip(z, 8.0, 35.0)

    us = (np.arange(ws) + 0.5) / supersample - 0.5
    vs = (np.arange(hs) + 0.5) / supersample - 0.5
    uu, vv = np.meshgrid(us, vs)
    # widen the field of view of the chunk beyond its anchor frame so
    # nearby frames don't run out of geometry at the borders
    margin = 0.35
    uu = (uu - cx) * (1.0 + 2.0 * margin) + cx
    vv = (vv - cy) * (1.0 + 2.0 * margin) + cy

    X = (uu - cx) * z / f
    Y = (vv - cy) * z / f
    pts = np.stack([X, Y, z], axis=-1).reshape(-1, 3)
    return pts.astype(np.float64), intensity.reshape(-1)


def _make_world(rng, h, w, f, cx, cy, anchor_poses, supersample: int = 2,
                anchor_spacing: float = 15.0):
    """World as the union of frustum point clouds seeded along the whole
    trajectory, so no frame ever runs out of geometry (round-1 bench bug:
    a frame-0-only world went black ~35 m in; VERDICT.md item 1).

    `anchor_poses` is the list of 4x4 cam-to-world trajectory poses; a new
    frustum chunk is spawned whenever the camera has moved/turned far
    enough from the last anchor.  Chunks overlap; z-buffer splatting in
    `_render` resolves visibility.
    """
    anchors = []
    for p in anchor_poses:
        p = np.asarray(p, np.float64)
        if not anchors:
            anchors.append(p)
            continue
        prev = anchors[-1]
        dist = np.linalg.norm(p[:3, 3] - prev[:3, 3])
        # rotation angle between anchor orientations
        cosang = (np.trace(prev[:3, :3].T @ p[:3, :3]) - 1.0) / 2.0
        ang = np.arccos(np.clip(cosang, -1.0, 1.0))
        if dist >= anchor_spacing or ang >= 0.35:
            anchors.append(p)

    all_pts, all_int = [], []
    for p in anchors:
        pts, inten = _make_world_chunk(rng, h, w, f, cx, cy, supersample)
        all_pts.append(pts @ p[:3, :3].T + p[:3, 3])
        all_int.append(inten)
    return np.concatenate(all_pts), np.concatenate(all_int)


@functools.partial(jax.jit, static_argnames=("h", "w"))
def _render_device(points, intensity, cam_to_world, f, cx, cy, h, w):
    """Z-buffer splat of the world into a camera at `cam_to_world`.

    Entirely on device: scatter-min z-buffer, winner writeback, and a
    4-round neighbor hole fill expressed as grouped 3x3 convolutions.
    (The previous NumPy splat took ~9 s/frame on this host; one jitted
    XLA program renders the same frame in milliseconds.)
    """
    R = cam_to_world[:3, :3]
    t = cam_to_world[:3, 3]
    pc = (points - t) @ R  # == R.T @ (p - t)
    z = pc[:, 2]
    zs = jnp.where(z > 0.5, z, jnp.inf)
    u = pc[:, 0] / zs * f + cx
    v = pc[:, 1] / zs * f + cy
    px = jnp.round(u).astype(jnp.int32)
    py = jnp.round(v).astype(jnp.int32)
    ok = ((z > 0.5) & (px >= 0) & (px < w) & (py >= 0) & (py < h) &
          jnp.isfinite(u) & jnp.isfinite(v))
    # invalid points land in a dump slot past the image
    flat = jnp.where(ok, py * w + px, h * w)
    zbuf = jnp.full(h * w + 1, jnp.inf, jnp.float32)
    zbuf = zbuf.at[flat].min(jnp.where(ok, z, jnp.inf))
    win = ok & (z <= zbuf[flat])
    img = jnp.zeros(h * w + 1, jnp.float32)
    img = img.at[jnp.where(win, flat, h * w)].set(intensity)
    img = img[:h * w].reshape(h, w)
    hit = (zbuf[:h * w] < jnp.inf).reshape(h, w)

    # fill holes from valid 8-neighbors (disocclusions, sampling gaps)
    kern = jnp.ones((2, 1, 3, 3), jnp.float32).at[:, :, 1, 1].set(0.0)

    def fill_iter(state, _):
        im, ht = state
        x = jnp.stack([im * ht, ht.astype(jnp.float32)])[None]  # (1,2,h,w)
        out = jax.lax.conv_general_dilated(
            x, kern, (1, 1), "SAME", feature_group_count=2)
        acc, cnt = out[0, 0], out[0, 1]
        fill = (~ht) & (cnt > 0)
        im = jnp.where(fill, acc / jnp.maximum(cnt, 1.0), im)
        return (im, ht | fill), None

    (img, hit), _ = jax.lax.scan(fill_iter, (img, hit), None, length=4)
    return jnp.clip(jnp.round(img), 0, 255).astype(jnp.uint8)


def _render(points, intensity, cam_to_world, f, cx, cy, h, w):
    """NumPy-facing wrapper over the device splat renderer."""
    img = _render_device(
        jnp.asarray(points, jnp.float32), jnp.asarray(intensity, jnp.float32),
        jnp.asarray(cam_to_world, jnp.float32), jnp.float32(f),
        jnp.float32(cx), jnp.float32(cy), int(h), int(w))
    return np.asarray(img)


def out_and_back_trajectory(n_forward: int, speed: float = 0.5):
    """Forward motion, one apex frame, then backing up along the same
    path (viewing direction unchanged so the frame-0 world stays
    visible) — revisits early poses exactly, for loop-closure testing.

    The apex frame makes forward frame f and its revisit share parity
    (f_fwd + f_back = 2*n_forward), so with an even mapper cadence the
    revisit of a full node is again a full node.  2*n_forward+1 frames.
    """
    poses = []
    pose = np.eye(4)
    for _ in range(n_forward):
        poses.append(pose.copy())
        pose = pose.copy()
        pose[2, 3] += speed
    poses.append(pose.copy())  # apex
    for _ in range(n_forward):
        pose = pose.copy()
        pose[2, 3] -= speed
        poses.append(pose.copy())
    return poses


def make_sequence(out_dir: str, n_frames: int = 20,
                  width: int = 640, height: int = 480,
                  f: float = 500.0, baseline: float = 0.54,
                  speed: float = 0.5, yaw_rate: float = 0.004,
                  seed: int = 0, poses: list | None = None) -> str:
    """Generate a KITTI-layout synthetic stereo sequence; returns out_dir.

    Camera frame is KITTI optical (x right, y down, z forward); poses.txt
    rows are cam0-to-world 3x4 like KITTI ground truth.  Pass `poses`
    (list of 4x4 cam-to-world) to override the default forward+yaw
    trajectory.
    """
    rng = np.random.default_rng(seed)
    cx, cy = (width - 1) / 2.0, (height - 1) / 2.0

    left_dir = os.path.join(out_dir, "image_0")
    right_dir = os.path.join(out_dir, "image_1")
    os.makedirs(left_dir, exist_ok=True)
    os.makedirs(right_dir, exist_ok=True)

    if poses is None:
        # forward motion with gentle yaw (optical frame: y is down, yaw is
        # rotation about +y)
        poses = []
        pose = np.eye(4)
        for i in range(n_frames):
            poses.append(pose.copy())
            cy_, sy_ = np.cos(yaw_rate), np.sin(yaw_rate)
            step = np.array([
                [cy_, 0.0, sy_, 0.0],
                [0.0, 1.0, 0.0, 0.0],
                [-sy_, 0.0, cy_, speed],
                [0.0, 0.0, 0.0, 1.0],
            ])
            pose = pose @ step
    else:
        poses = [np.asarray(p, np.float64) for p in poses]
        n_frames = len(poses)

    points, intensity = _make_world(rng, height, width, f, cx, cy, poses)
    points = jnp.asarray(points, jnp.float32)      # upload the world once
    intensity = jnp.asarray(intensity, jnp.float32)

    right_offset = np.eye(4)
    right_offset[0, 3] = baseline   # right camera at +x in optical frame

    for i, p in enumerate(poses):
        img_l = _render(points, intensity, p, f, cx, cy, height, width)
        img_r = _render(points, intensity, p @ right_offset,
                        f, cx, cy, height, width)
        Image.fromarray(img_l).save(
            os.path.join(left_dir, f"{i:06d}.png"))
        Image.fromarray(img_r).save(
            os.path.join(right_dir, f"{i:06d}.png"))

    with open(os.path.join(out_dir, "calib.txt"), "w") as fh:
        p0 = [f, 0.0, cx, 0.0, 0.0, f, cy, 0.0, 0.0, 0.0, 1.0, 0.0]
        p1 = list(p0)
        p1[3] = -f * baseline
        fh.write("P0: " + " ".join(f"{v:.12e}" for v in p0) + "\n")
        fh.write("P1: " + " ".join(f"{v:.12e}" for v in p1) + "\n")

    with open(os.path.join(out_dir, "times.txt"), "w") as fh:
        for i in range(n_frames):
            fh.write(f"{i * 0.1:.6e}\n")

    with open(os.path.join(out_dir, "poses.txt"), "w") as fh:
        for p in poses:
            fh.write(" ".join(f"{v:.9e}" for v in p[:3].reshape(-1)) + "\n")

    return out_dir
