"""Stereo rectification: inverse remap generation + bilinear warp on TPU.

TPU-native re-design of the reference's rectification stage, which is
split across the R5 firmware and the PL fabric:

  * map generation — /root/reference/src/StereoBM/src/fpga.c:303-366
    (`rect_remap`): for every *destination* pixel, un-project through the
    rectified intrinsics, rotate by the rectification rotation (transposed
    — the stored `rot` maps original->rectified rays), re-project through
    the original intrinsics; all in s.24 fixed point, output maps as int16
    with 5 fractional bits.
  * bilinear warp — /root/reference/src/dvp/rtl/rect_intp.v:330-412:
    u1.5 fractional weights, u1.10 weight products, u8.10 accumulation,
    truncate to u8.1, +1 round, saturate to u8.0.

The map is generated ONCE per calibration on host (NumPy integer math,
bit-exact with the firmware); the per-frame warp is a jitted XLA gather +
integer multiply-add program (VPU work, batched over frames).  A float
path (`rect_map_float` / `remap_bilinear`) is the idiomatic variant for
new calibrations; the fixed-point path exists for golden parity with the
hardware pipeline.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

FRAC_BITS = 5            # map fractional bits (rect_remap output, u1.5 warp)
FRAC_ONE = 1 << FRAC_BITS


@dataclass
class RectCamera:
    """One camera's fixed-point rectification parameters.

    Field scaling follows struct RECT_PARAM (fpga.c:181-227):
      f      : original focal length, u10.16
      c      : original principal point, integer pixels
      f2inv  : 1/f_rect, u-8.32
      c2_f2  : c_rect/f_rect, u0.24
      rot    : rectification rotation (original->rectified), s1.24
    """
    f: tuple[int, int]
    c: tuple[int, int]
    f2inv: tuple[int, int]
    c2_f2: tuple[int, int]
    rot: np.ndarray  # (3,3) int64

    @classmethod
    def from_float(cls, f, c, f_rect, c_rect, R) -> "RectCamera":
        """Quantize a float calibration into the firmware's fixed point."""
        return cls(
            f=(int(round(f[0] * (1 << 16))), int(round(f[1] * (1 << 16)))),
            c=(int(round(c[0])), int(round(c[1]))),
            f2inv=(int(round((1.0 / f_rect[0]) * (1 << 32))),
                   int(round((1.0 / f_rect[1]) * (1 << 32)))),
            c2_f2=(int(round((c_rect[0] / f_rect[0]) * (1 << 24))),
                   int(round((c_rect[1] / f_rect[1]) * (1 << 24)))),
            rot=np.round(np.asarray(R, np.float64) * (1 << 24)).astype(
                np.int64),
        )


# The reference firmware's baked-in calibration ("Data set 220426",
# fpga.c:190-227) — the rig that produced the golden sim data.
REFERENCE_CALIB = (
    RectCamera(f=(40419817, 40382910), c=(320, 240),
               f2inv=(6338213, 6338213), c2_f2=(4984405, 5932596),
               rot=np.array([[16598538, -120818, 2439034],
                             [137992, 16776300, -108069],
                             [-2438123, 126979, 16598626]], np.int64)),
    RectCamera(f=(39609530, 39627967), c=(320, 240),
               f2inv=(6338213, 6338213), c2_f2=(4984405, 5932596),
               rot=np.array([[16569087, -69780, 2633522],
                             [51223, 16776692, 122251],
                             [-2633948, -112694, 16568783]], np.int64)),
)


def rect_map_fixed(cam: RectCamera, height: int,
                   width: int) -> tuple[np.ndarray, np.ndarray]:
    """Bit-exact vectorized twin of rect_remap (fpga.c:303-366).

    Returns (map_x, map_y) int16, 5 fractional bits: the *source*
    coordinate sampled for each destination pixel.
    """
    xdst = np.arange(width, dtype=np.int64)[None, :]
    ydst = np.arange(height, dtype=np.int64)[:, None]

    # (u10.0)*(u-8.32) >> 8 = u1.24 ; minus c2/f2 (u0.24) -> s1.24
    xd = ((xdst * cam.f2inv[0]) >> 8) - cam.c2_f2[0]
    yd = ((ydst * cam.f2inv[1]) >> 8) - cam.c2_f2[1]

    r = cam.rot
    # R^T @ [xd, yd, 1]: (s.24 * s1.24) >> 24, summed
    lx = ((r[0, 0] * xd) >> 24) + ((r[1, 0] * yd) >> 24) + r[2, 0]
    ly = ((r[0, 1] * xd) >> 24) + ((r[1, 1] * yd) >> 24) + r[2, 1]
    lw = ((r[0, 2] * xd) >> 24) + ((r[1, 2] * yd) >> 24) + r[2, 2]

    lw_inv = (1 << 48) // lw                      # s1.24 reciprocal
    x2 = (lx * lw_inv) >> 24
    y2 = (ly * lw_inv) >> 24

    x_fx = (x2 * cam.f[0]) >> 34                  # s10.6
    y_fy = (y2 * cam.f[1]) >> 34
    x_out = (x_fx + (cam.c[0] << 6) + 1) >> 1     # round to 5 frac bits
    y_out = (y_fy + (cam.c[1] << 6) + 1) >> 1
    return x_out.astype(np.int16), np.broadcast_to(
        y_out, (height, width)).astype(np.int16).copy()


def rect_map_float(f, c, f_rect, c_rect, R, height: int,
                   width: int) -> tuple[np.ndarray, np.ndarray]:
    """Float inverse rectification map (same geometry, full precision).

    R maps original-camera rays to rectified rays (OpenCV R1/R2
    convention), matching the firmware's R^T application.
    """
    x = (np.arange(width, dtype=np.float64) - c_rect[0]) / f_rect[0]
    y = (np.arange(height, dtype=np.float64) - c_rect[1]) / f_rect[1]
    xx, yy = np.meshgrid(x, y)
    rays = np.stack([xx, yy, np.ones_like(xx)], axis=-1)
    src = rays @ np.asarray(R, np.float64)        # == (R^T @ ray)^T
    sx = src[..., 0] / src[..., 2] * f[0] + c[0]
    sy = src[..., 1] / src[..., 2] * f[1] + c[1]
    return sx.astype(np.float32), sy.astype(np.float32)


@jax.jit
def remap_bilinear_hw(img: jnp.ndarray, map_x: jnp.ndarray,
                      map_y: jnp.ndarray) -> jnp.ndarray:
    """Integer bilinear warp, bit-exact with rect_intp.v:330-412.

    map_x/map_y: int16 source coords with 5 fractional bits.  Output
    pixels whose 2x2 source neighborhood leaves the image are 0.
    """
    h, w = img.shape
    mx = map_x.astype(jnp.int32)
    my = map_y.astype(jnp.int32)
    x0 = mx >> FRAC_BITS
    y0 = my >> FRAC_BITS
    xf = mx & (FRAC_ONE - 1)
    yf = my & (FRAC_ONE - 1)
    xfi = FRAC_ONE - xf
    yfi = FRAC_ONE - yf

    valid = (x0 >= 0) & (y0 >= 0) & (x0 + 1 <= w - 1) & (y0 + 1 <= h - 1)
    x0c = jnp.clip(x0, 0, w - 2)
    y0c = jnp.clip(y0, 0, h - 2)

    p = img.astype(jnp.int32)
    ul = p[y0c, x0c]
    ur_ = p[y0c, x0c + 1]
    dl = p[y0c + 1, x0c]
    dr = p[y0c + 1, x0c + 1]

    # u8.0 * u1.10 accumulation (weights sum to 1024)
    acc = (ul * (xfi * yfi) + ur_ * (xf * yfi)
           + dl * (xfi * yf) + dr * (xf * yf))
    out = ((acc >> 9) + 1) >> 1                   # u8.1 +1 round -> u8.0
    out = jnp.minimum(out, 255)
    return jnp.where(valid, out, 0).astype(jnp.uint8)


@jax.jit
def remap_bilinear(img: jnp.ndarray, map_x: jnp.ndarray,
                   map_y: jnp.ndarray) -> jnp.ndarray:
    """Float bilinear warp (idiomatic path for new calibrations)."""
    h, w = img.shape
    x0 = jnp.floor(map_x).astype(jnp.int32)
    y0 = jnp.floor(map_y).astype(jnp.int32)
    xf = map_x - x0
    yf = map_y - y0
    valid = (x0 >= 0) & (y0 >= 0) & (x0 + 1 <= w - 1) & (y0 + 1 <= h - 1)
    x0c = jnp.clip(x0, 0, w - 2)
    y0c = jnp.clip(y0, 0, h - 2)
    p = img.astype(jnp.float32)
    ul = p[y0c, x0c]
    ur_ = p[y0c, x0c + 1]
    dl = p[y0c + 1, x0c]
    dr = p[y0c + 1, x0c + 1]
    out = (ul * (1 - xf) * (1 - yf) + ur_ * xf * (1 - yf)
           + dl * (1 - xf) * yf + dr * xf * yf)
    return jnp.where(valid, out, 0.0)


class StereoRectifier:
    """Per-rig rectifier: maps computed once, per-frame warp on device.

    Plays the role of the rect pipeline stage (rect.v + firmware map
    upload); `jax.vmap`-able over a frame batch for throughput.
    """

    def __init__(self, maps_l, maps_r):
        self._mx_l = jnp.asarray(maps_l[0])
        self._my_l = jnp.asarray(maps_l[1])
        self._mx_r = jnp.asarray(maps_r[0])
        self._my_r = jnp.asarray(maps_r[1])
        self._fixed = self._mx_l.dtype == jnp.int16

    @classmethod
    def from_reference_calib(cls, height: int = 480,
                             width: int = 640) -> "StereoRectifier":
        return cls(rect_map_fixed(REFERENCE_CALIB[0], height, width),
                   rect_map_fixed(REFERENCE_CALIB[1], height, width))

    def __call__(self, left, right):
        warp = remap_bilinear_hw if self._fixed else remap_bilinear
        return (warp(jnp.asarray(left), self._mx_l, self._my_l),
                warp(jnp.asarray(right), self._mx_r, self._my_r))
