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

LANE = 128       # lane width; also the left pad for the disparity shift
DEF_TILE_H = 16  # output rows per grid step


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _bm_strip_kernel(lp_ref, rp_ref, disp_ref, sad_ref, cost_ref,
                     sadn_ref, sadp_ref, violate_ref, *,
                     ndisp: int, r: int, tile_h: int, wp: int,
                     h: int, w: int, mindisp: int, ftzero: int,
                     uniq: int, tex_thr: int):
    """One grid step = one TILE_H-row output strip.

    lp_ref/rp_ref: full prefiltered images, zero-padded to
      (r + n_strips*tile_h + r, LANE + wp + LANE) int32, image pixel
      (y, x) at [r + y, LANE + x].  The LANE left pad supplies the zeros
      OpenCV's shifted right image sees for x < d; the right pad absorbs
      the unrolled sub-slices.
    cost_ref: VMEM scratch (ndisp, tile_h, wp) int16 — the strip's cost
      volume, indexed by j = ndisp-1-d (reversed order).

    Performance structure (the naive version ran ~15x off the VPU
    roofline; each item below was measured to matter):
      * box sums are log-tree binary decompositions of the 2r+1 window
        (6 adds + 3 static rolls instead of 21 adds + 20 rolls),
      * the winner scan carries ONE encoded array: enc = sad*ndisp + j,
        whose running minimum reproduces OpenCV's strict-< first-j
        tie-break exactly; minimum/argmin/neighbour-SAD tracking as five
        separate fori_loop carries cost ~16 ms/frame in Mosaic carry
        copies,
      * neighbour SADs and the uniqueness count are recovered in a
        second pass that accumulates IN PLACE into VMEM scratch refs
        (scalar-only loop carry),
      * the right image's disparity shift is one incremental static
        roll per UNROLL disparities plus static sub-slices at
        LANE+0..LANE+UNROLL-1, not a dynamic rotate per disparity,
      * the cost volume is stored int16 (max SAD 62*441 = 27342 < 2^15).
    """
    i = pl.program_id(0)
    row0 = i * tile_h                      # padded-row index of strip top
    sh = tile_h + 2 * r
    wtot = LANE + wp + LANE

    # full-width strip loads: dynamic start on the sublane axis only
    # (Mosaic rejects dynamic lane-axis slice starts)
    lps = lp_ref[pl.ds(row0, sh), :]       # (sh, wtot) int32
    rps32 = rp_ref[pl.ds(row0, sh), :]
    big = jnp.int32(1 << 30)
    win = 2 * r + 1
    UNROLL = 4 if ndisp % 4 == 0 else 1

    def vbox(a):
        """Vertical (2r+1)-row window sum: (sh, wp) -> (tile_h, wp) via
        log-tree partial sums (static sublane slices are free)."""
        parts = {1: a}
        k = 1
        while k * 2 <= win:
            p = parts[k]
            parts[k * 2] = p[:p.shape[0] - k] + p[k:]
            k *= 2
        out = None
        off = 0
        rem = win
        while rem > 0:
            while k > rem:
                k //= 2
            seg = parts[k][off:off + tile_h]
            out = seg if out is None else out + seg
            off += k
            rem -= k
        return out

    def hbox(v):
        """Horizontal centered (2r+1) window sum on (tile_h, wp) via
        log-tree rolls.  Wrapped lanes only reach columns masked invalid
        by the x-validity window (x < mindisp+ndisp-1+r or x >= w-r)."""
        parts = {1: v}
        k = 1
        while k * 2 <= win:
            p = parts[k]
            parts[k * 2] = p + pltpu.roll(p, shift=k, axis=1)
            k *= 2
        out = None
        off = 0
        rem = win
        while rem > 0:
            while k > rem:
                k //= 2
            seg = parts[k] if off == 0 else \
                pltpu.roll(parts[k], shift=off, axis=1)
            out = seg if out is None else out + seg
            off += k
            rem -= k
        # out[x] = sum_{s=0..2r} v[x-s]; recenter to +-r around x
        # (roll requires non-negative shifts: -r == wp - r circularly)
        return pltpu.roll(out, shift=wp - r, axis=1)

    def boxes(absd):
        return hbox(vbox(absd))

    lane_img = lps[:, LANE:LANE + wp]

    def pass1(g, carry):
        enc_min, rcur = carry
        # rcur holds rp rotated right by d0 = ndisp-1 - g*UNROLL; the
        # static sub-slice at LANE+t reads rp[x - (d0 - t)], with zeros
        # for x < d supplied by the pads
        for t in range(UNROLL):
            rsh = rcur[:, LANE + t:LANE + t + wp]
            absd = jnp.abs(lane_img - rsh)
            cost = boxes(absd)                           # (tile_h, wp)
            j = g * UNROLL + t
            cost_ref[pl.ds(j, 1)] = cost.astype(jnp.int16)[None]
            # running min of sad*ndisp + j == strict-< first-j winner
            enc_min = jnp.minimum(enc_min, cost * ndisp + j)
        rnext = pltpu.roll(rcur, shift=wtot - UNROLL, axis=1)
        return enc_min, rnext

    r0 = pltpu.roll(rps32, shift=ndisp - 1, axis=1)      # d at j=0
    enc_min, _ = jax.lax.fori_loop(
        0, ndisp // UNROLL, pass1,
        (jnp.full((tile_h, wp), big), r0))
    best_j = enc_min % ndisp
    minsad = enc_min // ndisp
    thresh = minsad + minsad * uniq // 100

    # pass 2: neighbour SADs + uniqueness count, accumulated IN PLACE in
    # VMEM scratch (a vector fori_loop carry would be copied every
    # iteration); int32 accumulator — Mosaic cannot legalize i1-vector
    # loop carries
    zero = jnp.zeros((tile_h, wp), jnp.int32)
    sadn_ref[:] = zero
    sadp_ref[:] = zero
    violate_ref[:] = zero

    def pass2(g, carry):
        for t in range(UNROLL):
            j = g * UNROLL + t
            cost = cost_ref[pl.ds(j, 1)][0].astype(jnp.int32)
            sadn_ref[:] = jnp.where(j == best_j - 1, cost, sadn_ref[:])
            sadp_ref[:] = jnp.where(j == best_j + 1, cost, sadp_ref[:])
            if uniq > 0:
                far = jnp.abs(j - best_j) > 1
                violate_ref[:] = violate_ref[:] + \
                    ((cost <= thresh) & far).astype(jnp.int32)
        return carry

    jax.lax.fori_loop(0, ndisp // UNROLL, pass2, jnp.int32(0))
    sad_n = sadn_ref[:]
    sad_p = sadp_ref[:]
    uniq_ok = (violate_ref[:] == 0) if uniq > 0 else \
        jnp.ones((tile_h, wp), jnp.bool_)

    # internal-order edge fixups (XLA path: lo=1 when mind==0,
    # hi=ndisp-2 when mind==ndisp-1): at best_j==0 there is no j-1
    # neighbour, at best_j==ndisp-1 no j+1 neighbour.
    sad_n = jnp.where(best_j == 0, sad_p, sad_n)
    sad_p = jnp.where(best_j == ndisp - 1, sad_n, sad_p)

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
    sad_ref[:] = minsad.astype(jnp.int16)     # max 62*441 = 27342


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
        # left pad: zeros for the disparity shift; right pad: room for
        # the unrolled static sub-slices
        out = jnp.zeros((hp + 2 * r, LANE + wp + LANE), jnp.int32)
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
        scratch_shapes=[pltpu.VMEM((ndisp, tile_h, wp), jnp.int16),
                        pltpu.VMEM((tile_h, wp), jnp.int32),
                        pltpu.VMEM((tile_h, wp), jnp.int32),
                        pltpu.VMEM((tile_h, wp), jnp.int32)],
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
