"""Pallas TPU kernel for dense SAD block-matching disparity.

Bit-identical fast path for :func:`tpuslam.kernels.stereo_bm.stereo_bm`
(the reference's PL `bm` pipeline, /root/reference/src/dvp/rtl/bm*.v, and
its CPU twin cv::StereoBM at src/slam/src/core/main.cpp:197-216).

Why Pallas: the XLA path materializes the 64-disparity cost volume in HBM
((D,H,W) int32 ~ 120 MB, touched several times by the box-filter cumsums
and the winner/uniqueness reductions — ~0.5+ GB of HBM traffic per frame).
This kernel tiles the frame into row strips and keeps each strip's whole
cost volume on-chip, so HBM traffic collapses to one read of the two
prefiltered images and one write of the disparity/minsad maps.

Version 2 (round 5).  The v1 kernel (git history) ran the horizontal
21-tap box as a log-tree of lane rolls — ~450 Mosaic lane-shuffle ops
per strip — plus fori_loops whose vector carries Mosaic copies every
iteration; it measured ~2.6 ms/frame, ~10x off the VPU roofline.  v2
restructures the dataflow around the MXU:

  pass 1 (VPU, fully unrolled over the reversed disparity index j):
      absdiff -> 21-row vertical box sum (log-tree of *static sublane
      slices*, which are free) -> split V = 64*A + B (A <= 20, B <= 63)
      and store A/B as int8 row-blocks of two plane buffers in VMEM
      scratch, with 128 zero lanes on each side.  A 65th row-block holds
      the texture-gate image |prefiltered - ftzero|.
  pass 2 (MXU): the 21-tap *horizontal* box of every disparity at once
      is a banded matmul: for each 128-lane output block,
      cost = 64 * (Apad[:, k..k+3] @ Band3) + (Bpad[:, ..] @ Band3)
      with Band3 (384,128) the 0/1 band |s - c - 128| <= r.  int8
      operands with int32 accumulation are exact (A,B <= 127; 21-term
      sums < 2^15).  One (65*TH, 384) @ (384, 128) matmul per plane per
      block replaces all lane rolls.
  pass 3 (VPU, per lane block): winner/argmin with OpenCV's strict-<
      first-j tie-break via one min-reduction of enc = cost*ndisp + j
      over the disparity axis; neighbour SADs and the uniqueness count
      are axis-0 reductions of the same in-register cost block (no
      loop carries anywhere in the kernel).
Then the texture gate, x16 subpixel interpolation and validity masking
reproduce stereo_bm's integer formulas verbatim.  Left-right consistency
and speckle filtering run in XLA on the (H,W) int16 outputs (they are
cheap and global), shared with the reference path via
stereo_bm._lr_consistency / _speckle_filter.

Boundary note: v1's rolled horizontal box wrapped circularly; v2's
banded matmul is zero-boundary.  The two differ only at x < r or
x >= wp - r, all of which lie outside the x-validity window
(mindisp + ndisp - 1 + r <= x < w - r), so the masked outputs are
bit-identical (tests/test_bm_pallas.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import StereoBMConfig
from .stereo_bm import FILTERED_SCALE, _lr_consistency, _speckle_filter

LANE = 128       # lane width; also the left pad for the disparity shift
DEF_TILE_H = 32  # output rows per grid step (int8 sublane tile = 32)


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _ftruncdiv(a, b):
    """floor(a / b) for integer-valued f32 a >= 0, b >= 1 with
    a + 2*b < 2^24: the correctly-rounded f32 quotient is within one of
    the true ratio, and the correction products stay exact (q <= a/b so
    q*b <= a + b).  Twin of C's truncating integer division for the
    non-negative operands BM pass 3 feeds it (adversarial near-integer
    quotients covered in tests/test_bm_pallas.py)."""
    q = jnp.floor(a / b)
    q = jnp.where(q * b > a, q - 1.0, q)
    return jnp.where((q + 1.0) * b <= a, q + 1.0, q)


def _bm_strip_kernel(lraw_ref, rraw_ref, band_ref, disp_ref, sad_ref,
                     apad_ref, bpad_ref, *,
                     ndisp: int, r: int, tile_h: int, wp: int,
                     h: int, w: int, mindisp: int, ftzero: int,
                     uniq: int, tex_thr: int, mm_i8: bool):
    """One grid step = one TILE_H-row output strip (see module doc).

    lraw_ref/rraw_ref: RAW images (the X-Sobel prefilter runs in-kernel
      — as a separate XLA pass over uint8 it measured 0.95 ms/frame,
      more than the whole strip kernel), padded to
      (n_strips*tile_h + 2*(r+1), LANE + wp + LANE) int16 with image
      pixel (y, x) at [r + 1 + y, LANE + x], row -1 pre-filled with the
      reflect-101 row 1 and row h with row h-2 (the only out-of-image
      raw rows whose prefilter output reaches a *valid* disparity row).
      The LANE left pad supplies the zeros OpenCV's shifted right image
      sees for x < d; the right pad absorbs the unrolled sub-slices.
    band_ref: (3*LANE, LANE) banded 0/1 matrix (int8 or bf16).
    apad_ref/bpad_ref: VMEM scratch ((ndisp+1)*tile_h, 2*LANE + wp)
      int8 plane buffers; row-block j holds the vertical box sums of
      disparity j split as V = 64*A + B, row-block ndisp the texture
      image.  Side lane blocks stay zero (written once at strip 0).
    """
    i = pl.program_id(0)
    row0 = i * tile_h                      # padded-row index of strip top
    sh = tile_h + 2 * r
    wtot = LANE + wp + LANE
    win = 2 * r + 1
    rows = (ndisp + 1) * tile_h
    NB = wp // LANE
    pdt = apad_ref.dtype

    @pl.when(i == 0)
    def _zero_side_blocks():
        z = jnp.zeros((rows, LANE), pdt)
        apad_ref[:, :LANE] = z
        apad_ref[:, LANE + wp:] = z
        bpad_ref[:, :LANE] = z
        bpad_ref[:, LANE + wp:] = z

    # full-width strip loads: dynamic start on the sublane axis only
    # (Mosaic rejects dynamic lane-axis slice starts).  Prefiltered
    # strip rows [Y0-r, Y0+tile_h+r) need raw rows [Y0-r-1, ..+r+1),
    # which start at padded-raw row Y0 = row0 exactly.
    lanex = jax.lax.broadcasted_iota(jnp.int32, (sh, wtot), 1) - LANE

    def prefilter(raw_ref):
        """In-kernel X-Sobel prefilter (OpenCV prefilterXSobel /
        xsbl2.v semantics, numerically identical to
        stereo_bm.prefilter_xsobel at every in-image pixel): raw
        (sh+2, wtot) -> clipped sobel (sh, wtot) with image columns
        0 and w-1 forced to ftzero and pad lanes forced to 0 (matching
        the v1 scheme of zero-padding the prefiltered image)."""
        raw = raw_ref[pl.ds(row0, sh + 2), :].astype(jnp.int32)
        rt = pltpu.roll(raw, shift=wtot - 1, axis=1)   # raw[x + 1]
        lf = pltpu.roll(raw, shift=1, axis=1)          # raw[x - 1]
        dxa = rt - lf
        sob = dxa[:-2] + 2 * dxa[1:-1] + dxa[2:]       # (sh, wtot)
        v = jnp.clip(sob, -ftzero, ftzero) + ftzero
        v = jnp.where((lanex == 0) | (lanex == w - 1), ftzero, v)
        return jnp.where((lanex < 0) | (lanex >= w), 0, v)

    lps = prefilter(lraw_ref)                          # (sh, wtot)
    rps32 = prefilter(rraw_ref)
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

    lane_img = lps[:, LANE:LANE + wp]

    def put_plane(group, v):
        """Split v = 64*A + B (v <= 62*21 = 1302 -> A <= 20, B <= 63)
        and store as int8 rows of the two plane buffers."""
        a = (v >> 6).astype(pdt)
        b = (v & 63).astype(pdt)
        lo = group * tile_h
        apad_ref[lo:lo + tile_h, LANE:LANE + wp] = a
        bpad_ref[lo:lo + tile_h, LANE:LANE + wp] = b

    # pass 1: vertical box sums of |L - shift(R, d)| for every reversed
    # disparity j (d = ndisp-1-j), fully unrolled — no loop carries.
    # rcur holds rp rotated right by d0 = ndisp-1 - g*UNROLL; the static
    # sub-slice at LANE+t reads rp[x - (d0 - t)], with zeros for x < d
    # supplied by the pads.
    rcur = pltpu.roll(rps32, shift=ndisp - 1, axis=1)
    for g in range(ndisp // UNROLL):
        for t in range(UNROLL):
            rsh = rcur[:, LANE + t:LANE + t + wp]
            put_plane(g * UNROLL + t, vbox(jnp.abs(lane_img - rsh)))
        rcur = pltpu.roll(rcur, shift=wtot - UNROLL, axis=1)
    # texture-gate image as the 65th row-block
    put_plane(ndisp, vbox(jnp.abs(lane_img - jnp.int32(ftzero))))

    # passes 2+3 per 128-lane block.  Pass 3 runs ENTIRELY in f32: every
    # quantity is an integer below 2^24 (cost <= 27342, enc <= 1.75e6,
    # num <= 6.999e6), where f32 arithmetic is exact — and the VPU has
    # no integer-divide unit, so the i32 formulation's subpixel `//`
    # and the full-block i32 casts dominated the kernel (0.20 of its
    # 0.70 ms/frame, /tmp-probe bisect r5b).  C-truncation division is
    # reproduced exactly by _ftruncdiv below.
    band = band_ref[:]
    # Mosaic has no f32 iota: build i32, cast once (hoisted out of the
    # per-block loop)
    jgrid = jax.lax.broadcasted_iota(
        jnp.int32, (ndisp, tile_h, LANE), 0).astype(jnp.float32)
    dn = (((1,), (0,)), ((), ()))
    ys = row0 + jax.lax.broadcasted_iota(jnp.int32, (tile_h, LANE), 0)
    xs0 = jax.lax.broadcasted_iota(jnp.int32, (tile_h, LANE), 1)
    filtered = jnp.int16((mindisp - 1) * FILTERED_SCALE)
    ndisp_f = jnp.float32(ndisp)
    ftruncdiv = _ftruncdiv

    for k in range(NB):
        asl = apad_ref[:, k * LANE:k * LANE + 3 * LANE]
        bsl = bpad_ref[:, k * LANE:k * LANE + 3 * LANE]
        if mm_i8:
            ca = jax.lax.dot_general(asl, band, dn,
                                     preferred_element_type=jnp.int32)
            cb = jax.lax.dot_general(bsl, band, dn,
                                     preferred_element_type=jnp.int32)
            cost_all = (ca * 64 + cb).astype(jnp.float32)
        else:
            # explicit DEFAULT precision: the package pins
            # jax_default_matmul_precision=highest, which Mosaic rejects
            # for bf16 operands ("Bad lhs type"); bf16 x bf16 -> f32 is
            # already exact here
            ca = jax.lax.dot_general(asl.astype(jnp.bfloat16), band, dn,
                                     preferred_element_type=jnp.float32,
                                     precision=jax.lax.Precision.DEFAULT)
            cb = jax.lax.dot_general(bsl.astype(jnp.bfloat16), band, dn,
                                     preferred_element_type=jnp.float32,
                                     precision=jax.lax.Precision.DEFAULT)
            # exact: integer-valued f32s below 2^15
            cost_all = ca * 64 + cb

        tex = cost_all[ndisp * tile_h:]                 # (tile_h, LANE)
        cost = cost_all[:ndisp * tile_h].reshape(ndisp, tile_h, LANE)

        # winner: running min of sad*ndisp + j == strict-< first-j
        # tie-break (OpenCV argmin over the reversed order)
        enc = cost * ndisp_f + jgrid
        m1 = jnp.min(enc, axis=0)                       # (tile_h, LANE)
        if ndisp & (ndisp - 1) == 0:
            minsad = jnp.floor(m1 * (1.0 / ndisp))      # pow2: exact
        else:
            minsad = ftruncdiv(m1, ndisp_f)
        best_j = m1 - minsad * ndisp_f

        bj = best_j[None]
        sad_n = jnp.sum(jnp.where(jgrid == bj - 1, cost, 0.0), axis=0)
        sad_p = jnp.sum(jnp.where(jgrid == bj + 1, cost, 0.0), axis=0)
        if uniq > 0:
            thresh = minsad + ftruncdiv(minsad * uniq, jnp.float32(100))
            far = jnp.abs(jgrid - bj) > 1
            uniq_ok = ~jnp.any((cost <= thresh[None]) & far, axis=0)
        else:
            uniq_ok = jnp.ones((tile_h, LANE), jnp.bool_)

        # internal-order edge fixups (XLA path: lo=1 when mind==0,
        # hi=ndisp-2 when mind==ndisp-1): at best_j==0 there is no j-1
        # neighbour, at best_j==ndisp-1 no j+1 neighbour.
        sad_n = jnp.where(best_j == 0, sad_p, sad_n)
        sad_p = jnp.where(best_j == ndisp - 1, sad_n, sad_p)

        tex_ok = tex >= tex_thr

        # x16 subpixel, OpenCV integer rounding (C division truncates:
        # sign * floor(|num| / denom))
        denom = sad_p + sad_n - 2 * minsad + jnp.abs(sad_p - sad_n)
        num = (sad_p - sad_n) * 256.0
        q = ftruncdiv(jnp.abs(num), jnp.maximum(denom, 1.0))
        frac = jnp.where(denom != 0, jnp.sign(num) * q, 0.0)
        d_act = (ndisp - 1) - best_j
        # (v + 15) >> 4 == floor((v + 15) / 16); /16 is exact (pow2)
        disp16 = jnp.floor(((d_act + mindisp) * 256.0 + frac + 15.0)
                           * (1.0 / 16.0))

        xs = xs0 + k * LANE
        valid = ((ys >= r) & (ys < h - r) &
                 (xs >= mindisp + ndisp - 1 + r) & (xs < w - r) &
                 tex_ok & uniq_ok)

        disp_ref[:, k * LANE:(k + 1) * LANE] = \
            jnp.where(valid, disp16.astype(jnp.int16), filtered)
        sad_ref[:, k * LANE:(k + 1) * LANE] = \
            minsad.astype(jnp.int16)      # max 62*441 = 27342


def _lr_kernel(dT_ref, sT_ref, out_ref, *, w: int, ndisp: int,
               mindisp: int, md16: int, filtered: int):
    """Transposed LR-consistency kernel (one grid step, whole frame).

    Inputs are the TRANSPOSED disparity/minsad maps (wp, hp): the
    disparity axis lands on SUBLANES, so the per-candidate-disparity
    shifts of the winner competition and both projection checks are
    free static sublane slices — the XLA _lr_consistency spends
    ~0.5 ms/frame materializing the same 65-slice select chains over
    HBM-resident lanes.  Formulas replicate _lr_consistency verbatim
    (cv::validateDisparity semantics)."""
    wp, hp = dT_ref.shape
    INF = jnp.int32(2 ** 31 - 1)
    disp = dT_ref[:].astype(jnp.int32)
    minsad = sT_ref[:].astype(jnp.int32)

    xs = jax.lax.broadcasted_iota(jnp.int32, (wp, hp), 0)
    lvalid = disp != filtered
    min_x1 = max(mindisp + ndisp, 0)
    participate = lvalid & (xs >= min_x1)

    dint = (disp + FILTERED_SCALE // 2) >> 4
    dv = disp - mindisp * FILTERED_SCALE
    enc = jnp.where(participate, minsad * jnp.int32(4096) + dv, INF)

    P = 128
    inf_pad = jnp.full((P, hp), INF, jnp.int32)
    enc_pad = jnp.concatenate([inf_pad, enc, inf_pad], axis=0)
    dint_pad = jnp.concatenate(
        [jnp.full((P, hp), jnp.int32(1 << 20)), dint, inf_pad], axis=0)

    best2 = jnp.full((wp, hp), INF, jnp.int32)
    for k in range(mindisp, mindisp + ndisp + 1):
        sl = enc_pad[P + k:P + k + wp]
        sd = dint_pad[P + k:P + k + wp]
        best2 = jnp.minimum(best2, jnp.where(sd == k, sl, INF))
    have = best2 != INF
    disp2 = jnp.where(have, best2 % 4096 + mindisp * FILTERED_SCALE,
                      jnp.int32(filtered))
    disp2_pad = jnp.concatenate(
        [jnp.full((P, hp), jnp.int32(filtered)), disp2,
         jnp.full((P, hp), jnp.int32(filtered))], axis=0)

    def fails(s):
        xp = xs - s
        inb = (xp >= 0) & (xp < w)
        d2 = jnp.zeros((wp, hp), jnp.int32)
        for k in range(mindisp, mindisp + ndisp + 1):
            sl = disp2_pad[P - k:P - k + wp]
            d2 = jnp.where(s == k, sl, d2)
        return inb & (d2 >= 0) & (jnp.abs(d2 - disp) > md16)

    bad = participate & fails(disp >> 4) & \
        fails((disp + FILTERED_SCALE - 1) >> 4)
    out_ref[:] = jnp.where(bad, filtered, disp).astype(jnp.int16)


def _lr_consistency_pallas(disp_p, sad_p, cfg: StereoBMConfig,
                           interpret: bool):
    """LR consistency on the padded (hp, wp) int16 kernel outputs via
    the transposed Pallas kernel; bit-identical to _lr_consistency."""
    kern = functools.partial(
        _lr_kernel, w=disp_p.shape[1], ndisp=cfg.num_disparities,
        mindisp=cfg.min_disparity,
        md16=cfg.disp12_max_diff * FILTERED_SCALE,
        filtered=(cfg.min_disparity - 1) * FILTERED_SCALE)
    outT = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (disp_p.shape[1], disp_p.shape[0]), jnp.int16),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(disp_p.T, sad_p.T)
    return outT.T.astype(jnp.int32)


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
    # Mosaic v5e rejects s8 x s8 -> s32 tpu.matmul; operate the MXU in
    # bf16 with f32 accumulation instead (exact here: operands <= 127
    # are bf16-exact, band entries are 0/1, 21-term sums < 2^15 < 2^24).
    # Plane *storage* stays int8 — the cast happens at matmul time.
    mm_i8 = False

    def pad_raw(img):
        # raw-image embed for the in-kernel prefilter: image row y at
        # padded row r+1+y; rows -1 / h carry the reflect-101 rows the
        # prefilter of rows 0 / h-1 reads (deeper pad rows only feed
        # *invalid* output rows — zeros are fine there); left lane pad:
        # zeros for the disparity shift; right pad: room for the
        # unrolled static sub-slices
        x = img.astype(jnp.int16)
        core = jnp.concatenate([x[1:2], x, x[h - 2:h - 1]], axis=0)
        out = jnp.zeros((hp + 2 * (r + 1), LANE + wp + LANE), jnp.int16)
        return jax.lax.dynamic_update_slice(out, core, (r, LANE))

    # banded 0/1 matrix for the horizontal box matmul (see kernel doc)
    s_idx = jax.lax.broadcasted_iota(jnp.int32, (3 * LANE, LANE), 0)
    c_idx = jax.lax.broadcasted_iota(jnp.int32, (3 * LANE, LANE), 1)
    band = (jnp.abs(s_idx - c_idx - LANE) <= r)
    band = band.astype(jnp.int8 if mm_i8 else jnp.bfloat16)

    kern = functools.partial(
        _bm_strip_kernel, ndisp=ndisp, r=r, tile_h=tile_h, wp=wp,
        h=h, w=w, mindisp=mindisp, ftzero=ftzero,
        uniq=cfg.uniqueness_ratio, tex_thr=cfg.texture_threshold,
        mm_i8=mm_i8)

    disp_p, sad_p = pl.pallas_call(
        kern,
        grid=(n_strips,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((tile_h, wp), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((tile_h, wp), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((hp, wp), jnp.int16),
                   jax.ShapeDtypeStruct((hp, wp), jnp.int16)),
        scratch_shapes=[
            pltpu.VMEM(((ndisp + 1) * tile_h, 2 * LANE + wp), jnp.int8),
            pltpu.VMEM(((ndisp + 1) * tile_h, 2 * LANE + wp), jnp.int8)],
        compiler_params=pltpu.CompilerParams(
            # inputs + the two plane buffers + live SSA blocks exceed the
            # 16M default scoped-vmem limit; v5e has 128M physical VMEM
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(pad_raw(left), pad_raw(right), band)

    # run LR consistency at the PADDED geometry (the pad region is all
    # `filtered` — never participates — so in-image results are
    # identical) with the TRANSPOSED Pallas kernel: every shift of the
    # 65-slice winner/check chains becomes a free static sublane slice
    # on VMEM-resident data (the XLA pass cost ~0.5 ms/frame).
    if cfg.disp12_max_diff >= 0:
        disp = _lr_consistency_pallas(disp_p, sad_p, cfg, interpret)
    else:
        disp = disp_p.astype(jnp.int32)
    disp = disp[:h, :w]
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
