"""Pyramidal Lucas-Kanade stereo correspondence (epipolar-constrained).

TPU-native re-design of calcOpticalFlowPyrLKStereo
(/root/reference/src/slam/src/opencv/CvLKStereo.cpp:20-407) — OpenCV's
pyramidal LK with the y-component of the update forced to zero
(CvLKStereo.cpp:343-345), used by the DEPTH_METHOD_CV_LK sparse-depth
option (Stereo.cpp:9-51: win 15x3, maxLevel 5, 30 iters, eps 0.01,
minEig 1e-4, disparity gate (0.5, 128]).

Instead of the reference's sequential per-point loop, all points are
tracked simultaneously (`vmap` over a fixed-capacity point array), each
pyramid level is a static unrolled stage, and the 30-iteration refine
runs as a `lax.fori_loop` with per-point convergence masks — the same
math, restructured so XLA sees one static program.  The W_BITS=14
fixed-point bilinear interpolation and CV_DESCALE rounding are kept
bit-faithful (integer ops) so results track the reference.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

W_BITS = 14
FLT_SCALE = 1.0 / (1 << 20)


def _descale(x, n):
    return (x + (1 << (n - 1))) >> n


def _reflect101_pad(img, py, px):
    return jnp.pad(img, ((py, py), (px, px)), mode="reflect")


def pyr_down(img: jnp.ndarray) -> jnp.ndarray:
    """OpenCV pyrDown: 5-tap Gaussian [1,4,6,4,1]/16 separable blur
    (reflect-101 borders) then drop odd rows/cols.  uint8 in/out with
    OpenCV's round-half-away rounding."""
    k = jnp.array([1., 4., 6., 4., 1.]) / 16.0
    x = img.astype(jnp.float32)
    xp = _reflect101_pad(x, 2, 2)
    # rows
    h, w = x.shape
    r = sum(k[i] * xp[i:i + h, 2:2 + w] for i in range(5))
    rp = _reflect101_pad(r, 0, 2)
    c = sum(k[i] * rp[:, i:i + w] for i in range(5))
    sub = c[::2, ::2]
    return jnp.clip(jnp.round(sub), 0, 255).astype(jnp.uint8)


def scharr_deriv(img: jnp.ndarray) -> jnp.ndarray:
    """OpenCV calcScharrDeriv: int16 (H,W,2) [dx, dy]; smoothing taps
    (3,10,3), difference (-1,0,1); reflect-101 borders."""
    x = img.astype(jnp.int32)
    xp = _reflect101_pad(x, 1, 1)
    h, w = x.shape

    def shift(dy, dx):
        return xp[1 + dy:1 + dy + h, 1 + dx:1 + dx + w]

    dxv = (3 * (shift(-1, 1) - shift(-1, -1))
           + 10 * (shift(0, 1) - shift(0, -1))
           + 3 * (shift(1, 1) - shift(1, -1)))
    dyv = (3 * (shift(1, -1) - shift(-1, -1))
           + 10 * (shift(1, 0) - shift(-1, 0))
           + 3 * (shift(1, 1) - shift(-1, 1)))
    return jnp.stack([dxv, dyv], axis=-1).astype(jnp.int16)


def build_lk_pyramid(img: jnp.ndarray, max_level: int):
    """[(image uint8, scharr int16 (H,W,2)) per level]."""
    levels = []
    cur = jnp.asarray(img)
    for _ in range(max_level + 1):
        levels.append((cur, scharr_deriv(cur)))
        cur = pyr_down(cur)
    return levels


def _gather_patch(img, iy, ix, wh, ww, pad):
    """(wh+1, ww+1) patch at integer corner (iy, ix) from a pre-padded
    image (pad added on each side)."""
    return jax.lax.dynamic_slice(img, (iy + pad, ix + pad),
                                 (wh + 1, ww + 1))


def _interp_weights(a, b):
    iw00 = jnp.round((1.0 - a) * (1.0 - b) * (1 << W_BITS)).astype(jnp.int32)
    iw01 = jnp.round(a * (1.0 - b) * (1 << W_BITS)).astype(jnp.int32)
    iw10 = jnp.round((1.0 - a) * b * (1 << W_BITS)).astype(jnp.int32)
    iw11 = (1 << W_BITS) - iw00 - iw01 - iw10
    return iw00, iw01, iw10, iw11


@functools.partial(
    jax.jit,
    static_argnames=("win", "max_level", "max_iters", "eps",
                     "min_eig_threshold"))
def lk_stereo(left: jnp.ndarray, right: jnp.ndarray, pts: jnp.ndarray,
              valid: jnp.ndarray, win: tuple[int, int] = (15, 3),
              max_level: int = 5, max_iters: int = 30, eps: float = 0.01,
              min_eig_threshold: float = 1e-4):
    """Track left-image points to the right image along x.

    pts: (N,2) float32 left coords (fixed capacity, `valid` masks real
    entries).  Returns (next_pts (N,2), status (N,) bool, err (N,) =
    min-eigenvalue as with OPTFLOW_LK_GET_MIN_EIGENVALS).
    """
    ww, wh = win
    half_x = (ww - 1) * 0.5
    half_y = (wh - 1) * 0.5
    eps2 = float(min(max(eps, 0.0), 10.0)) ** 2

    pyr_l = build_lk_pyramid(left, max_level)
    pyr_r = build_lk_pyramid(right, max_level)
    pad = max(ww, wh) + 2
    pyr_l = [(jnp.pad(i, pad), jnp.pad(d, ((pad, pad), (pad, pad), (0, 0))))
             for i, d in pyr_l]
    pyr_r = [(jnp.pad(i, pad), d) for i, d in pyr_r]

    n = pts.shape[0]
    status = valid.astype(bool)
    err = jnp.zeros((n,), jnp.float32)
    next_x = jnp.zeros((n,), jnp.float32)

    for level in range(max_level, -1, -1):
        I_img, I_deriv = pyr_l[level]
        J_img, _ = pyr_r[level]
        rows, cols = pyr_l[level][0].shape[0] - 2 * pad, \
            pyr_l[level][0].shape[1] - 2 * pad

        prev = pts * (1.0 / (1 << level))
        if level == max_level:
            nxt_x = prev[:, 0]
        else:
            nxt_x = next_x * 2.0

        def track_one(px, py, nx, st):
            # --- patch extraction at prevPt (CvLKStereo.cpp:205-280) --
            fx = px - half_x
            fy = py - half_y
            ipx = jnp.floor(fx).astype(jnp.int32)
            ipy = jnp.floor(fy).astype(jnp.int32)
            inb = ((ipx >= -ww) & (ipx < cols) & (ipy >= -wh) & (ipy < rows))
            ipx_c = jnp.clip(ipx, -pad + 1, cols + pad - ww - 2)
            ipy_c = jnp.clip(ipy, -pad + 1, rows + pad - wh - 2)
            a = fx - ipx
            b = fy - ipy
            w00, w01, w10, w11 = _interp_weights(a, b)

            patch = _gather_patch(I_img, ipy_c, ipx_c, wh, ww, pad).astype(
                jnp.int32)
            dx_p = _gather_patch(I_deriv[..., 0], ipy_c, ipx_c, wh,
                                 ww, pad).astype(jnp.int32)
            dy_p = _gather_patch(I_deriv[..., 1], ipy_c, ipx_c, wh,
                                 ww, pad).astype(jnp.int32)

            def bilin(p, shift_bits):
                v = (p[:-1, :-1] * w00 + p[:-1, 1:] * w01
                     + p[1:, :-1] * w10 + p[1:, 1:] * w11)
                return _descale(v, shift_bits)

            iwin = bilin(patch, W_BITS - 5)      # 5 frac bits
            ixwin = bilin(dx_p, W_BITS)
            iywin = bilin(dy_p, W_BITS)

            A11 = jnp.sum(ixwin * ixwin).astype(jnp.float32) * FLT_SCALE
            A12 = jnp.sum(ixwin * iywin).astype(jnp.float32) * FLT_SCALE
            A22 = jnp.sum(iywin * iywin).astype(jnp.float32) * FLT_SCALE
            D = A11 * A22 - A12 * A12
            min_eig = (A22 + A11 - jnp.sqrt(
                (A11 - A22) ** 2 + 4.0 * A12 * A12)) / (2.0 * ww * wh)
            good = (min_eig >= min_eig_threshold) & (D >= 1.1920929e-07)
            Dinv = jnp.where(good, 1.0 / jnp.where(good, D, 1.0), 0.0)

            # --- iterative refinement (CvLKStereo.cpp:298-362) --------
            def body(j, carry):
                nx_c, conv, oob, prev_dx = carry
                gx = nx_c - half_x
                gy = py - half_y
                inx = jnp.floor(gx).astype(jnp.int32)
                iny = jnp.floor(gy).astype(jnp.int32)
                inb_j = ((inx >= -ww) & (inx < cols)
                         & (iny >= -wh) & (iny < rows))
                inx_c = jnp.clip(inx, -pad + 1, cols + pad - ww - 2)
                iny_c = jnp.clip(iny, -pad + 1, rows + pad - wh - 2)
                aa = gx - inx
                bb = gy - iny
                v00, v01, v10, v11 = _interp_weights(aa, bb)
                jp = _gather_patch(J_img, iny_c, inx_c, wh, ww, pad).astype(
                    jnp.int32)
                jwin = _descale(jp[:-1, :-1] * v00 + jp[:-1, 1:] * v01
                                + jp[1:, :-1] * v10 + jp[1:, 1:] * v11,
                                W_BITS - 5)
                diff = jwin - iwin
                b1 = jnp.sum(diff * ixwin).astype(jnp.float32) * FLT_SCALE
                b2 = jnp.sum(diff * iywin).astype(jnp.float32) * FLT_SCALE
                # y forced to 0 — the stereo modification
                dxv = (A12 * b2 - A22 * b1) * Dinv
                active = jnp.logical_not(conv) & jnp.logical_not(oob) & inb_j
                new_oob = oob | (jnp.logical_not(inb_j)
                                 & jnp.logical_not(conv))
                nx_n = jnp.where(active, nx_c + dxv, nx_c)
                converged = dxv * dxv <= eps2
                oscill = (j > 0) & (jnp.abs(dxv + prev_dx) < 0.01)
                nx_n = jnp.where(active & oscill & jnp.logical_not(converged),
                                 nx_n - dxv * 0.5, nx_n)
                conv_n = conv | (active & (converged | oscill))
                return nx_n, conv_n, new_oob, jnp.where(active, dxv, prev_dx)

            nx0 = nx
            nx_f, _, oob_f, _ = jax.lax.fori_loop(
                0, max_iters, body,
                (nx0, jnp.array(False), jnp.array(False), jnp.float32(0.0)))

            nx_out = jnp.where(good, nx_f, nx0)
            st_level0 = st & inb & good & jnp.logical_not(oob_f)
            st_upper = st  # upper levels only kill at level 0
            return nx_out, jnp.where(level == 0, st_level0, st_upper), \
                min_eig, inb

        nxt_x_o, status_o, min_eigs, inb_v = jax.vmap(track_one)(
            prev[:, 0], prev[:, 1], nxt_x, status)
        # points whose prev window left the image: stop tracking; at
        # level 0 that clears status (CvLKStereo.cpp:210-224)
        next_x = jnp.where(inb_v, nxt_x_o, nxt_x)
        if level == 0:
            status = status_o & inb_v
            err = min_eigs
        # err semantics: OPTFLOW_LK_GET_MIN_EIGENVALS -> min-eig at each
        # level; final value is level 0's (Stereo.cpp:36 uses that flag)

    next_pts = jnp.stack([next_x, pts[:, 1]], axis=-1)
    return next_pts, status, err


def compute_correspondences(left, right, left_pts, valid,
                            min_disparity: float = 0.5,
                            max_disparity: float = 128.0):
    """Stereo.cpp:9-51 twin: LK track + disparity validity gate."""
    next_pts, status, err = lk_stereo(jnp.asarray(left), jnp.asarray(right),
                                      jnp.asarray(left_pts),
                                      jnp.asarray(valid))
    disp = left_pts[:, 0] - np.asarray(next_pts)[:, 0]
    status = np.asarray(status) & (disp > min_disparity) & \
        (disp <= max_disparity)
    return np.asarray(next_pts), status, np.asarray(err)
