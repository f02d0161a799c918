"""Semi-global block matching (SGBM, MODE_HH) on TPU.

TPU-native implementation of the reference's selectable SGBM depth engine
(/root/reference/src/slam/src/core/main.cpp:218-244 — cv::StereoSGBM
minDisparity -64, numDisparities 128, blockSize 11, P1 100, P2 1000,
disp12MaxDiff 32, preFilterCap 0, uniquenessRatio 15, speckleWindowSize
1000, speckleRange 16, MODE_HH), following the classic OpenCV SGBM
algorithm semantics:

  * Birchfield–Tomasi pixel cost on two channels — the clipped 3-row
    x-Sobel response (full weight, clip ±max(preFilterCap,15)|1) and the
    raw intensity (quarter weight, >> 2) — with half-pixel min/max
    interpolation on both images,
  * block aggregation: (blockSize x blockSize) box sum with replicate
    borders over the valid-x region [max(maxD,0), W+min(minD,0)),
  * MODE_HH: all 8 SGM path directions, the textbook recurrence
    L_r(p,d) = C(p,d) + min(L_r(p-r,d), L_r(p-r,d∓1)+P1, min_d L_r + P2)
    − min_d L_r,
  * winner selection (first-min tie-break), uniqueness-ratio gate,
    quadratic x16-subpixel interpolation with C-truncating division,
    left-right consistency via the reference's floor/ceil double check,
    and the connected-component speckle filter (maxDiff scaled x16, as
    cv::StereoSGBM does — unlike StereoBM which passes it raw).

TPU shaping: the disparity axis (128 for the reference config) is the
lane axis everywhere; each SGM direction is one `lax.scan` whose carry is
a (rows-or-cols, D) slab, so the recurrence's sequential dimension is the
scan axis and everything else vectorizes on the VPU.  The cost volume is
materialized in both (W1,H,D) and (H,W1,D) layouts so both scan
orientations consume their operand along the leading axis.

Exactness: cv2 5.0 (the only oracle available in this environment) moved
SGBM into a new `stereo` module whose output differs from the classic
calib3d implementation by ±1 subpixel step on a minority of pixels; the
oracle test asserts tight agreement bands rather than bit equality (see
tests/test_sgbm.py).  The reference binary itself linked the OpenCV-3-era
implementation this kernel follows.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SGBMConfig
from .stereo_bm import _speckle_filter

DISP_SCALE = 16
_INF = np.int32(1 << 29)  # np scalar: importing this module must not init the jax backend


def _sobel3(img: jnp.ndarray) -> jnp.ndarray:
    """3-row x-derivative of calcPixelCostBT: (row[x+1]-row[x-1])*2 +
    up[x+1]-up[x-1] + down[x+1]-down[x-1], rows clamped, x borders 0."""
    im = img.astype(jnp.int32)
    h, w = im.shape
    up = jnp.concatenate([im[:1], im[:-1]], axis=0)
    dn = jnp.concatenate([im[1:], im[-1:]], axis=0)

    def dx(a):
        z = jnp.zeros((h, 1), jnp.int32)
        return jnp.concatenate([z, a[:, 2:] - a[:, :-2], z], axis=1)

    return dx(im) * 2 + dx(up) + dx(dn)


def _minmax3(a: jnp.ndarray):
    """Per-pixel min/max over {a, (a+left)/2, (a+right)/2} (BT half-pixel
    interpolation; all operands non-negative so // == C division)."""
    al = (a + jnp.concatenate([a[:, :1], a[:, :-1]], axis=1)) // 2
    ar = (a + jnp.concatenate([a[:, 1:], a[:, -1:]], axis=1)) // 2
    lo = jnp.minimum(jnp.minimum(a, al), ar)
    hi = jnp.maximum(jnp.maximum(a, al), ar)
    return lo, hi


def _bt_cost(left: jnp.ndarray, right: jnp.ndarray,
             cfg: SGBMConfig) -> jnp.ndarray:
    """(H, W1, D) int16 two-channel BT pixel cost over the valid region."""
    h, w = left.shape
    min_d, D = cfg.min_disparity, cfg.num_disparities
    max_d = min_d + D
    minX1 = max(max_d, 0)
    maxX1 = w + min(min_d, 0)
    ftzero = max(cfg.prefilter_cap, 15) | 1

    def tab(v):
        return jnp.clip(v, -ftzero, ftzero) + ftzero

    sl = tab(_sobel3(left))
    sr = tab(_sobel3(right))
    border = jnp.full((h, 1), ftzero, jnp.int32)
    sl = jnp.concatenate([border, sl[:, 1:-1], border], axis=1)
    sr = jnp.concatenate([border, sr[:, 1:-1], border], axis=1)

    total = None
    for (u, v, shift) in ((sl, sr, 0),
                          (left.astype(jnp.int32),
                           right.astype(jnp.int32), 2)):
        v0, v1 = _minmax3(v)
        u0, u1 = _minmax3(u)
        uu = u[:, minX1:maxX1]
        uu0 = u0[:, minX1:maxX1]
        uu1 = u1[:, minX1:maxX1]
        per_d = []
        for d_i in range(D):
            d = min_d + d_i
            lo = minX1 - d
            hi = maxX1 - d
            vv = v[:, lo:hi]
            vv0 = v0[:, lo:hi]
            vv1 = v1[:, lo:hi]
            c0 = jnp.maximum(jnp.maximum(uu - vv1, vv0 - uu), 0)
            c1 = jnp.maximum(jnp.maximum(vv - uu1, uu0 - vv), 0)
            per_d.append(jnp.minimum(c0, c1) >> shift)
        c = jnp.stack(per_d, axis=-1)           # (H, W1, D)
        total = c if total is None else total + c
    return total.astype(jnp.int16)


def _box_sum_region(c: jnp.ndarray, sw: int) -> jnp.ndarray:
    """(H, W1, D) box sum over (sw x sw) with replicate borders on the
    region grid (OpenCV clamps the window inside [minX1, maxX1))."""
    if sw <= 1:
        return c.astype(jnp.int32)
    r = sw // 2
    x = c.astype(jnp.int32)
    for axis in (1, 0):
        first = jax.lax.slice_in_dim(x, 0, 1, axis=axis)
        last = jax.lax.slice_in_dim(x, x.shape[axis] - 1, x.shape[axis],
                                    axis=axis)
        pad = jnp.concatenate([jnp.repeat(first, r, axis=axis), x,
                               jnp.repeat(last, r, axis=axis)], axis=axis)
        cs = jnp.cumsum(pad, axis=axis)
        head = jax.lax.slice_in_dim(cs, sw - 1, sw, axis=axis)
        tail = (jax.lax.slice_in_dim(cs, sw, cs.shape[axis], axis=axis) -
                jax.lax.slice_in_dim(cs, 0, cs.shape[axis] - sw, axis=axis))
        x = jnp.concatenate([head, tail], axis=axis)
    return x


def _sgm_step(Lp, C_slab, P1, P2):
    """One SGM recurrence step: carry Lp (N, D) -> L for this slab."""
    minLp = jnp.min(Lp, axis=-1, keepdims=True)
    inf = jnp.full_like(Lp[:, :1], _INF)
    lm1 = jnp.concatenate([inf, Lp[:, :-1]], axis=1)
    lp1 = jnp.concatenate([Lp[:, 1:], inf], axis=1)
    best = jnp.minimum(jnp.minimum(Lp, lm1 + P1),
                       jnp.minimum(lp1 + P1, minLp + P2))
    return C_slab + best - minLp


def _aggregate(C_hw: jnp.ndarray, P1: int, P2: int) -> jnp.ndarray:
    """Sum of all 8 SGM directions.  C_hw: (H, W1, D) int32."""
    H, W1, D = C_hw.shape
    P1 = jnp.int32(P1)
    P2 = jnp.int32(P2)
    C_wh = jnp.transpose(C_hw, (1, 0, 2))       # (W1, H, D) for x-scans

    def scan(C, carry_n, reverse, shift_x=0):
        def step(Lp, Cs):
            if shift_x > 0:      # predecessor column x-1: shift right
                Lp = jnp.concatenate(
                    [jnp.zeros((1, D), jnp.int32), Lp[:-1]], axis=0)
            elif shift_x < 0:    # predecessor column x+1
                Lp = jnp.concatenate(
                    [Lp[1:], jnp.zeros((1, D), jnp.int32)], axis=0)
            L = _sgm_step(Lp, Cs, P1, P2)
            return L, L
        init = jnp.zeros((carry_n, D), jnp.int32)
        _, Ls = jax.lax.scan(step, init, C, reverse=reverse)
        return Ls

    S = scan(C_wh, H, False)                      # left -> right
    S = S + scan(C_wh, H, True)                   # right -> left
    S = jnp.transpose(S, (1, 0, 2))               # back to (H, W1, D)
    S = S + scan(C_hw, W1, False)                 # top -> bottom
    S = S + scan(C_hw, W1, True)                  # bottom -> top
    S = S + scan(C_hw, W1, False, shift_x=1)      # top-left diagonal
    S = S + scan(C_hw, W1, False, shift_x=-1)     # top-right diagonal
    S = S + scan(C_hw, W1, True, shift_x=1)       # bottom-left diagonal
    S = S + scan(C_hw, W1, True, shift_x=-1)      # bottom-right diagonal
    return S


def _trunc_div(a, b):
    """C integer division (truncation toward zero)."""
    q = jnp.abs(a) // jnp.abs(b)
    return jnp.where((a < 0) ^ (b < 0), -q, q).astype(a.dtype)


@functools.partial(jax.jit, static_argnames=("cfg", "with_speckle"))
def sgbm(left: jnp.ndarray, right: jnp.ndarray,
         cfg: SGBMConfig = SGBMConfig(),
         with_speckle: bool = True) -> jnp.ndarray:
    """(H,W) uint8 pair -> (H,W) int16 disparity, x16 fixed point.

    Invalid pixels hold (min_disparity-1)*16, OpenCV's
    INVALID_DISP_SCALED."""
    h, w = left.shape
    min_d, D = cfg.min_disparity, cfg.num_disparities
    max_d = min_d + D
    minX1 = max(max_d, 0)
    maxX1 = w + min(min_d, 0)
    W1 = maxX1 - minX1
    P1 = max(cfg.p1, 1)
    P2 = max(cfg.p2, P1 + 1)
    INVALID = (min_d - 1) * DISP_SCALE

    C = _bt_cost(left, right, cfg)
    C = _box_sum_region(C, cfg.block_size)
    S = _aggregate(C, P1, P2)                      # (H, W1, D)

    # winner: first minimum over d (barriers keep each lane-reduction in
    # its own fusion; see kernels/matching.py _top2_min)
    ds = jnp.arange(D, dtype=jnp.int32)
    minS = jnp.min(S, axis=-1)
    minS = jax.lax.optimization_barrier(minS)
    best = jnp.min(jnp.where(S == minS[..., None], ds, D), axis=-1)
    best = jnp.minimum(best, D - 1)
    best = jax.lax.optimization_barrier(best)

    valid = jnp.ones((h, W1), bool)
    if cfg.uniqueness_ratio > 0:
        far = jnp.abs(ds[None, None, :] - best[..., None]) > 1
        bad = (S * (100 - cfg.uniqueness_ratio) <
               minS[..., None] * 100) & far
        valid &= ~jnp.any(bad, axis=-1)

    # x16 subpixel (quadratic, C-truncating division)
    bm1 = jnp.clip(best - 1, 0, D - 1)
    bp1 = jnp.clip(best + 1, 0, D - 1)
    Sm1 = jnp.take_along_axis(S, bm1[..., None], axis=-1)[..., 0]
    Sp1 = jnp.take_along_axis(S, bp1[..., None], axis=-1)[..., 0]
    interior = (best > 0) & (best < D - 1)
    denom2 = jnp.maximum(Sm1 + Sp1 - 2 * minS, 1)
    sub = best * DISP_SCALE + _trunc_div(
        (Sm1 - Sp1) * DISP_SCALE + denom2, denom2 * 2)
    disp = jnp.where(interior, sub,
                     best * DISP_SCALE) + min_d * DISP_SCALE

    # left-right consistency (disp12MaxDiff): each left pixel's best
    # hypothesis competes for its right pixel rx = x_full - (minD+best);
    # losers with both floor and ceil checks failing are invalidated.
    if cfg.disp12_max_diff >= 0:
        xs_full = jnp.arange(W1, dtype=jnp.int32)[None, :] + minX1
        d_abs = best + min_d                       # integer disparity
        rx = xs_full - d_abs
        rx_ok = (rx >= 0) & (rx < w)
        rx_idx = jnp.where(rx_ok, rx, w)           # dump slot
        # encode (cost, disparity) into one int for a single scatter-min;
        # OFF makes the disparity term non-negative.
        OFF = D + abs(min_d) + 2
        enc = minS * (2 * OFF) + (d_abs + OFF)
        enc = jnp.where(rx_ok & valid, enc, _INF)
        disp2 = jnp.full((h, w + 1), _INF, jnp.int32)
        rows = jnp.arange(h, dtype=jnp.int32)[:, None]
        disp2 = disp2.at[rows, rx_idx].min(enc)
        disp2_d = jnp.where(disp2 >= _INF, jnp.int32(min_d - 1),
                            disp2 % (2 * OFF) - OFF)[:, :w]  # per right-x

        d1 = disp                                   # scaled
        d_floor = d1 >> 4
        d_ceil = (d1 + DISP_SCALE - 1) >> 4
        xf = jnp.clip(xs_full - d_floor, 0, w - 1)
        xc = jnp.clip(xs_full - d_ceil, 0, w - 1)
        d2f = jnp.take_along_axis(disp2_d, xf, axis=1)
        d2c = jnp.take_along_axis(disp2_d, xc, axis=1)
        in_f = (xs_full - d_floor >= 0) & (xs_full - d_floor < w)
        in_c = (xs_full - d_ceil >= 0) & (xs_full - d_ceil < w)
        fail_f = in_f & (d2f >= min_d) & \
            (jnp.abs(d2f - d_floor) > cfg.disp12_max_diff)
        fail_c = in_c & (d2c >= min_d) & \
            (jnp.abs(d2c - d_ceil) > cfg.disp12_max_diff)
        valid &= ~(fail_f & fail_c)

    region = jnp.where(valid, disp, INVALID).astype(jnp.int16)
    out = jnp.full((h, w), jnp.int16(INVALID))
    out = jax.lax.dynamic_update_slice(out, region, (0, minX1))

    if with_speckle and cfg.speckle_window_size > 0 and \
            cfg.speckle_range >= 0:
        # SGBM passes DISP_SCALE*speckleRange to filterSpeckles
        out = _speckle_filter(out, cfg.speckle_window_size,
                              cfg.speckle_range * DISP_SCALE, INVALID)
    return out


def sgbm_np(left: np.ndarray, right: np.ndarray,
            cfg: SGBMConfig = SGBMConfig(),
            with_speckle: bool = True) -> np.ndarray:
    """NumPy-facing wrapper."""
    return np.asarray(sgbm(jnp.asarray(left), jnp.asarray(right), cfg,
                           with_speckle))
