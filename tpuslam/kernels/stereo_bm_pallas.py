"""Pallas TPU kernel for dense SAD block-matching disparity.

Bit-identical fast path for :func:`tpuslam.kernels.stereo_bm.stereo_bm`
(the reference's PL `bm` pipeline, /root/reference/src/dvp/rtl/bm*.v, and
its CPU twin cv::StereoBM at src/slam/src/core/main.cpp:197-216).

Why Pallas: the XLA path materializes the 64-disparity cost volume in HBM
((D,H,W) int32 ~ 120 MB, touched several times by the box-filter cumsums
and the winner/uniqueness reductions — ~0.5+ GB of HBM traffic per frame).
This kernel tiles the frame into row strips and keeps the ENTIRE cost
volume for a strip in VMEM ((D, TILE_H, Wp) int16 ~ 1.3 MB), so HBM
traffic collapses to one read of the two prefiltered images and one write
of the disparity/minsad maps (~4 MB/frame).  Mirrors the RTL dataflow
philosophy (line-buffered strips, 32-wide disparity SIMD becomes the lane
axis) without copying its structure.

Per strip the kernel runs two passes over the disparity axis:
  pass 1: for j = 0..D-1 (j indexes the REVERSED disparity order, exactly
      like the XLA path's `cost_rev`, so tie-breaking matches argmin):
      absdiff -> 21-row vertical box sum -> 21-col horizontal box sum
      (lane rolls), store cost[j] in VMEM and stream-update the winner
      (strict < keeps the first minimal j), its previous-neighbour SAD,
      and retroactively the next-neighbour SAD.
  pass 2: uniqueness — any j with cost[j] <= minsad*(100+uniq)/100 and
      |j - argmin| > 1 kills the pixel (OpenCV integer semantics).
Then the texture gate, x16 subpixel interpolation and validity masking
reproduce stereo_bm's integer formulas verbatim.  Left-right consistency
and speckle filtering run in XLA on the (H,W) int16 outputs (they are
cheap and global), shared with the reference path via
stereo_bm._lr_consistency / _speckle_filter.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import StereoBMConfig
from .stereo_bm import (FILTERED_SCALE, _lr_consistency, _speckle_filter,
                        prefilter_xsobel)

LANE = 128      # lane width; also the left pad for the disparity shift
DEF_TILE_H = 8  # output rows per grid step


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _bm_strip_kernel(lp_ref, rp_ref, disp_ref, sad_ref, cost_ref, *,
                     ndisp: int, r: int, tile_h: int, wp: int,
                     h: int, w: int, mindisp: int, ftzero: int,
                     uniq: int, tex_thr: int):
    """One grid step = one TILE_H-row output strip.

    lp_ref/rp_ref: full prefiltered images, zero-padded to
      (r + n_strips*tile_h + r, LANE + wp) int16, image pixel (y, x) at
      [r + y, LANE + x].  The LANE left pad supplies the zeros OpenCV's
      shifted right image sees for x < d.
    cost_ref: VMEM scratch (ndisp, tile_h, wp) int16 — the strip's cost
      volume, indexed by j = ndisp-1-d (reversed order).
    """
    i = pl.program_id(0)
    row0 = i * tile_h                      # padded-row index of strip top
    sh = tile_h + 2 * r

    # full-width strip loads: dynamic start on the sublane axis only
    # (Mosaic rejects dynamic lane-axis slice starts; the disparity shift
    # is a dynamic lane-rotate below instead)
    lps = lp_ref[pl.ds(row0, sh), :]       # (sh, LANE+wp) int32
    rps32 = rp_ref[pl.ds(row0, sh), :]
    big = jnp.int32(1 << 30)

    def boxes(absd):
        """(2r+1)-row vertical then (2r+1)-col horizontal box sums of an
        (sh, wp) int32 image -> (tile_h, wp) int32.  Everything is int32:
        Mosaic's lane rotate (tpu.dynamic_rotate) only handles 32-bit."""
        v = absd[0:tile_h]
        for k in range(1, 2 * r + 1):
            v = v + absd[k:k + tile_h]
        out = v
        for s in range(1, r + 1):
            # circular: shift wp-s == shift -s; wrapped lanes land only
            # in the masked-invalid border columns
            out = out + pltpu.roll(v, shift=s, axis=1) \
                      + pltpu.roll(v, shift=wp - s, axis=1)
        return out

    lane_img = lps[:, LANE:LANE + wp]

    def pass1(j, carry):
        best_sad, best_j, sad_n, sad_p, prev = carry
        d = ndisp - 1 - j
        # rsh[x] = rp[x - d]: dynamic rotate right by d, then the static
        # LANE-offset slice; the LANE-wide zero left pad keeps the rotate
        # wrap out of the sliced window (d <= ndisp-1 < LANE)
        rolled = pltpu.roll(rps32, shift=d, axis=1)
        rsh = rolled[:, LANE:LANE + wp]
        absd = jnp.abs(lane_img - rsh)
        cost = boxes(absd)                               # (tile_h, wp)
        cost_ref[pl.ds(j, 1)] = cost[None]

        upd = cost < best_sad                            # strict: first j wins
        # retroactive next-neighbour: previous step picked j-1
        sad_p = jnp.where(best_j == j - 1, cost, sad_p)
        sad_n = jnp.where(upd, prev, sad_n)
        best_sad = jnp.where(upd, cost, best_sad)
        best_j = jnp.where(upd, j, best_j)
        return best_sad, best_j, sad_n, sad_p, cost

    zero = jnp.zeros((tile_h, wp), jnp.int32)
    best_sad, best_j, sad_n, sad_p, _ = jax.lax.fori_loop(
        0, ndisp, pass1,
        (jnp.full((tile_h, wp), big), jnp.zeros((tile_h, wp), jnp.int32),
         zero, zero, zero))

    # internal-order edge fixups (XLA path: lo=1 when mind==0,
    # hi=ndisp-2 when mind==ndisp-1); sad_p at mind==0 is cost[1], and
    # sad_n at mind==ndisp-1 is cost[ndisp-2], which the stream already
    # holds in the opposite register.
    sad_n = jnp.where(best_j == 0, sad_p, sad_n)
    sad_p = jnp.where(best_j == ndisp - 1, sad_n, sad_p)

    minsad = best_sad
    thresh = minsad + minsad * uniq // 100

    # int32 accumulator: Mosaic cannot legalize i1-vector loop carries
    def pass2(j, violate):
        cost = cost_ref[pl.ds(j, 1)][0]
        far = jnp.abs(j - best_j) > 1
        return violate + ((cost <= thresh) & far).astype(jnp.int32)

    if uniq > 0:
        violate = jax.lax.fori_loop(
            0, ndisp, pass2, jnp.zeros((tile_h, wp), jnp.int32))
        uniq_ok = violate == 0
    else:
        uniq_ok = jnp.ones((tile_h, wp), jnp.bool_)

    # texture gate: (2r+1)^2 box sum of |prefiltered - ftzero|
    tex = boxes(jnp.abs(lane_img - jnp.int32(ftzero)))
    tex_ok = tex >= tex_thr

    # x16 subpixel, OpenCV integer rounding (C division truncates to 0)
    sn = sad_n
    sp = sad_p
    denom = sp + sn - 2 * minsad + jnp.abs(sp - sn)
    num = (sp - sn) * 256
    frac = jnp.where(
        denom != 0,
        jnp.sign(num) * (jnp.abs(num) // jnp.where(denom == 0, 1, denom)),
        0)
    d_act = ndisp - 1 - best_j
    disp16 = ((d_act + mindisp) * 256 + frac + 15) >> 4

    ys = row0 + jax.lax.broadcasted_iota(jnp.int32, (tile_h, wp), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (tile_h, wp), 1)
    valid = ((ys >= r) & (ys < h - r) &
             (xs >= mindisp + ndisp - 1 + r) & (xs < w - r) &
             tex_ok & uniq_ok)

    filtered = (mindisp - 1) * FILTERED_SCALE
    disp_ref[:] = jnp.where(valid, disp16, filtered).astype(jnp.int16)
    sad_ref[:] = best_sad.astype(jnp.int16)   # max 62*441 = 27342


@functools.partial(jax.jit,
                   static_argnames=("cfg", "with_speckle", "interpret"))
def stereo_bm_pallas(left: jnp.ndarray, right: jnp.ndarray,
                     cfg: StereoBMConfig = StereoBMConfig(),
                     with_speckle: bool = True,
                     interpret: bool | None = None) -> jnp.ndarray:
    """Pallas-strip StereoBM: uint8 (H,W) pair -> int16 (H,W) x16 disparity.

    Output is bit-identical to :func:`stereo_bm` (tested).  On non-TPU
    backends the kernel runs in interpreter mode (slow — tests only).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    ndisp = cfg.num_disparities
    r = cfg.block_size // 2
    mindisp = cfg.min_disparity
    ftzero = cfg.prefilter_cap
    filtered = (mindisp - 1) * FILTERED_SCALE

    h, w = left.shape
    tile_h = DEF_TILE_H
    n_strips = _cdiv(h, tile_h)
    hp = n_strips * tile_h
    wp = _cdiv(w, LANE) * LANE

    lp = prefilter_xsobel(left, ftzero).astype(jnp.int32)
    rp = prefilter_xsobel(right, ftzero).astype(jnp.int32)

    def pad(img):
        out = jnp.zeros((hp + 2 * r, LANE + wp), jnp.int32)
        return jax.lax.dynamic_update_slice(out, img, (r, LANE))

    kern = functools.partial(
        _bm_strip_kernel, ndisp=ndisp, r=r, tile_h=tile_h, wp=wp,
        h=h, w=w, mindisp=mindisp, ftzero=ftzero,
        uniq=cfg.uniqueness_ratio, tex_thr=cfg.texture_threshold)

    disp_p, sad_p = pl.pallas_call(
        kern,
        grid=(n_strips,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((tile_h, wp), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((tile_h, wp), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((hp, wp), jnp.int16),
                   jax.ShapeDtypeStruct((hp, wp), jnp.int16)),
        scratch_shapes=[pltpu.VMEM((ndisp, tile_h, wp), jnp.int32)],
        interpret=interpret,
    )(pad(lp), pad(rp))

    disp = disp_p[:h, :w].astype(jnp.int32)
    minsad = sad_p[:h, :w].astype(jnp.int32)

    if cfg.disp12_max_diff >= 0:
        disp = _lr_consistency(disp, minsad, cfg)
    if with_speckle and cfg.speckle_window_size > 0 and cfg.speckle_range >= 0:
        disp = _speckle_filter(disp, cfg.speckle_window_size,
                               cfg.speckle_range, filtered)
    return disp.astype(jnp.int16)


@functools.partial(jax.jit, static_argnames=("max_size", "max_diff",
                                              "filtered"))
def _speckle_jit(disp, max_size, max_diff, filtered):
    return _speckle_filter(disp.astype(jnp.int32), max_size, max_diff,
                           filtered).astype(jnp.int16)


def stereo_bm_auto(left: jnp.ndarray, right: jnp.ndarray,
                   cfg: StereoBMConfig = StereoBMConfig(),
                   with_speckle: bool = True) -> jnp.ndarray:
    """Backend dispatch: the Pallas strip kernel on TPU, the XLA path
    elsewhere (the Pallas interpreter is tests-only slow).  Both are
    bit-identical (tests/test_bm_pallas.py).

    On TPU the speckle pass runs as its OWN dispatch: fusing a
    pallas_call with the speckle connected-components while_loop into one
    XLA program serializes pathologically (measured 17.9 s vs 0.1 s per
    frame split) on the TPU runtime."""
    from .stereo_bm import stereo_bm
    if jax.default_backend() == "tpu":
        disp = stereo_bm_pallas(left, right, cfg, with_speckle=False)
        if with_speckle and cfg.speckle_window_size > 0 \
                and cfg.speckle_range >= 0:
            disp = _speckle_jit(
                disp, cfg.speckle_window_size, cfg.speckle_range,
                (cfg.min_disparity - 1) * FILTERED_SCALE)
        return disp
    return stereo_bm(left, right, cfg, with_speckle=with_speckle)
