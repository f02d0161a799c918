"""Dense SAD block-matching disparity on TPU.

TPU-native re-design of the reference's disparity engine — the PL `bm`
pipeline (/root/reference/src/dvp/rtl/bm*.v, 4.5k LoC: 32-wide parallel SAD,
uniqueness test, x16 subpixel) and its CPU twin cv::StereoBM configured at
/root/reference/src/slam/src/core/main.cpp:197-216 (ndisp 64, block 21,
prefilterCap 31, textureThreshold 10, uniquenessRatio 10, speckle 50/32,
disp12MaxDiff 1).

Instead of translating the RTL's line-buffer dataflow, the whole frame is
computed as one fused XLA program:

  * the X-Sobel prefilter is a shifted-add stencil (VPU),
  * the 64-disparity cost volume is |L - shift(R,d)| batched over a leading
    disparity axis (vectorizes over the 8x128 VPU lanes; the RTL's 32-wide
    disparity SIMD becomes a full 64-wide axis),
  * 21x21 window SAD is two cumulative-sum box filters (exact, integer),
  * argmin + uniqueness + texture gates + x16 subpixel reproduce the exact
    integer semantics of OpenCV's findStereoCorrespondenceBM so the output
    is bit-comparable with the reference's CPU path,
  * left-right consistency (disp12) reuses the same cost volume,
  * the speckle filter is a connected-components pass via min-label
    propagation with pointer jumping (log-depth on TPU).

All shapes are static; everything jits into a single program.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..config import StereoBMConfig

FILTERED_SCALE = 16  # x16 fixed-point disparity (DISP_SCALE)


def prefilter_xsobel(img: jnp.ndarray, cap: int = 31) -> jnp.ndarray:
    """X-Sobel prefilter, clipping to [0, 2*cap] around `cap`.

    Matches OpenCV prefilterXSobel (and the PL xsbl2.v block's saturating
    6-bit variant, xsbl2.v:183-197): horizontal Sobel with reflect-101
    vertical borders; first/last column forced to `cap`.
    """
    x = img.astype(jnp.int32)
    h, w = x.shape

    # reflect-101 row padding: row -1 -> row 1, row h -> row h-2
    up = jnp.concatenate([x[1:2], x[:-1]], axis=0)
    down = jnp.concatenate([x[1:], x[h - 2:h - 1]], axis=0)

    def dx(row):
        left = jnp.concatenate([row[:, :1], row[:, :-1]], axis=1)
        right = jnp.concatenate([row[:, 1:], row[:, -1:]], axis=1)
        return right - left

    d = dx(up) + 2 * dx(x) + dx(down)
    v = jnp.clip(d, -cap, cap) + cap
    # first/last column = cap (OpenCV sets dptr[0] = dptr[cols-1] = val0)
    col = jnp.full((h, 1), cap, dtype=jnp.int32)
    v = jnp.concatenate([col, v[:, 1:-1], col], axis=1)
    return v.astype(jnp.uint8)


@jax.jit
def prefilter_xsobel_hw(img: jnp.ndarray) -> jnp.ndarray:
    """The PL xsbl2 block's 6-bit offset-binary prefilter variant.

    Bit-exact with /root/reference/src/dvp/rtl/xsbl2.v (datapath
    :813-874, `limit` :183-197), validated against the shipped golden
    data (ref_xsbl = xsbl2(ref_rect)):
      interior  = clamp(sobel_x, -32, 31) + 32
      cols 0,W-1 = 0x20 (forced, xsbl2.v:869-872)
      rows 0,H-1 = 0   (never written by the 3-line pipeline)
    """
    x = img.astype(jnp.int32)
    h, w = x.shape

    def dx(row):
        left = jnp.concatenate([row[:, :1], row[:, :-1]], axis=1)
        right = jnp.concatenate([row[:, 1:], row[:, -1:]], axis=1)
        return right - left

    d = dx(x)
    s = jnp.zeros_like(x)
    s = s.at[1:-1].set(d[:-2] + 2 * d[1:-1] + d[2:])
    v = jnp.clip(s, -32, 31) + 32
    col = jnp.full((h, 1), 0x20, jnp.int32)
    v = jnp.concatenate([col, v[:, 1:-1], col], axis=1)
    row0 = jnp.zeros((1, w), jnp.int32)
    v = jnp.concatenate([row0, v[1:-1], row0], axis=0)
    return v.astype(jnp.uint8)


def _box_sum(x: jnp.ndarray, radius: int) -> jnp.ndarray:
    """(2r+1)^2 window sum with zero padding, exact integer, via integral
    images.  Works on (..., H, W)."""
    *lead, h, w = x.shape
    r = radius
    # integral over rows
    c = jnp.cumsum(x, axis=-2)
    zero_row = jnp.zeros((*lead, 1, w), dtype=x.dtype)
    c = jnp.concatenate([zero_row, c], axis=-2)  # S[i] = sum of rows < i
    top = jnp.clip(jnp.arange(h) - r, 0, h)
    bot = jnp.clip(jnp.arange(h) + r + 1, 0, h)
    rows = jnp.take(c, bot, axis=-2) - jnp.take(c, top, axis=-2)
    # integral over cols
    c2 = jnp.cumsum(rows, axis=-1)
    zero_col = jnp.zeros((*lead, h, 1), dtype=x.dtype)
    c2 = jnp.concatenate([zero_col, c2], axis=-1)
    lft = jnp.clip(jnp.arange(w) - r, 0, w)
    rgt = jnp.clip(jnp.arange(w) + r + 1, 0, w)
    return jnp.take(c2, rgt, axis=-1) - jnp.take(c2, lft, axis=-1)


def _speckle_filter(disp: jnp.ndarray, max_size: int, max_diff: int,
                    filtered: int, rounds: int = 16) -> jnp.ndarray:
    """Connected-component speckle removal (cv::filterSpeckles semantics):
    4-connected components where |d(p)-d(q)| <= max_diff; components with
    <= max_size pixels are replaced by `filtered`.  Pixels already equal to
    `filtered` are excluded from components (OpenCV skips newVal pixels in
    its flood fill), and max_diff is in raw disparity-map units (OpenCV's
    StereoBM passes speckleRange through unscaled).

    Implemented as min-label flood fill with pointer jumping: neighbor-min
    hook + two label(label) jumps per round.  Runs a FIXED `rounds`
    lax.scan, not a convergence while_loop: a data-dependent while_loop
    next to a pallas_call in one fused program faults the TPU runtime
    (PERF.md r4), and a fixed trip count keeps the whole chunk program
    crash-free.  Reach roughly triples per round (hook-then-double-jump),
    so 16 rounds cover any component a (376, 1241) frame can hold with a
    wide margin; `speckle_filter_with_flag` exposes the converged bit and
    tests assert it on real and synthetic maps.
    """
    out, _ = speckle_filter_with_flag(disp, max_size, max_diff, filtered,
                                      rounds)
    return out


def speckle_filter_with_flag(disp: jnp.ndarray, max_size: int,
                             max_diff: int, filtered: int,
                             rounds: int = 16):
    """_speckle_filter returning (filtered_disp, converged: bool).

    `converged` is True iff one more neighbor-min hook would not change
    any label — i.e. the fixed-round labeling equals the while-loop
    fixpoint and the result is exactly cv::filterSpeckles.
    """
    h, w = disp.shape
    n = h * w
    d = disp.astype(jnp.int32)

    idx = jnp.arange(n, dtype=jnp.int32).reshape(h, w)

    def neighbors_min(lbl):
        lbl2 = lbl.reshape(h, w)
        big = jnp.int32(n)

        def shift(a, dy, dx, fill):
            return jnp.roll(a, (dy, dx), axis=(0, 1)) if False else a

        # manual shifts with edge fill
        def sh(a, dy, dx):
            out = a
            if dy == 1:
                out = jnp.concatenate(
                    [jnp.full((1, w), big, a.dtype), out[:-1]], axis=0)
            elif dy == -1:
                out = jnp.concatenate(
                    [out[1:], jnp.full((1, w), big, a.dtype)], axis=0)
            if dx == 1:
                out = jnp.concatenate(
                    [jnp.full((h, 1), big, a.dtype), out[:, :-1]], axis=1)
            elif dx == -1:
                out = jnp.concatenate(
                    [out[:, 1:], jnp.full((h, 1), big, a.dtype)], axis=1)
            return out

        def shd(a, dy, dx):
            # disparity values of shifted neighbor, with sentinel
            out = a
            sent = jnp.int32(1 << 30)
            if dy == 1:
                out = jnp.concatenate(
                    [jnp.full((1, w), sent, a.dtype), out[:-1]], axis=0)
            elif dy == -1:
                out = jnp.concatenate(
                    [out[1:], jnp.full((1, w), sent, a.dtype)], axis=0)
            if dx == 1:
                out = jnp.concatenate(
                    [jnp.full((h, 1), sent, a.dtype), out[:, :-1]], axis=1)
            elif dx == -1:
                out = jnp.concatenate(
                    [out[:, 1:], jnp.full((h, 1), sent, a.dtype)], axis=1)
            return out

        valid_here = d != filtered
        best = lbl2
        for dy, dx in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            nl = sh(lbl2, dy, dx)
            nd = shd(d, dy, dx)
            connected = (valid_here & (nd != filtered) &
                         (jnp.abs(nd - d) <= max_diff))
            best = jnp.minimum(best, jnp.where(connected, nl, big))
        return best.reshape(-1)

    def body(lbl, _):
        new = neighbors_min(lbl)
        # pointer jumping (2x)
        new = jnp.minimum(new, new[new])
        new = jnp.minimum(new, new[new])
        return new, None

    # seed the carry from the data (not iota/literals) so its
    # varying-over-mesh-axes type matches the body output under shard_map
    vary0 = disp.reshape(-1).astype(jnp.int32) * 0
    labels, _ = jax.lax.scan(body, idx.reshape(-1) + vary0, None,
                             length=rounds)
    converged = jnp.all(neighbors_min(labels) == labels)

    sizes = jnp.zeros((n,), dtype=jnp.int32).at[labels].add(1)
    comp_size = sizes[labels].reshape(h, w)
    out = jnp.where(comp_size <= max_size, jnp.int32(filtered), disp)
    return out, converged


def speckle_filter_batch(disp: jnp.ndarray, max_size: int, max_diff: int,
                         filtered: int, rounds: int = 16):
    """_speckle_filter over a (B, H, W) batch without pointer jumping.

    Neither vmapping _speckle_filter nor flattening the batch for its
    pointer-jump takes survives on TPU: any gather whose source exceeds
    VMEM runs at ~0.14 G elem/s (measured 125 ms/frame inside the fused
    chunk program), and XLA's associative_scan costs ~2 ms/frame/round.
    This version propagates min labels with HAND-ROLLED segmented
    log-doubling sweeps — per round, a full min-propagation along every
    horizontal run then every vertical run, built from static shifts and
    elementwise selects only (no gathers, no library scans).  A round
    fully propagates along straight runs, so convergence takes one round
    per "direction alternation" of a component's spanning paths; real
    disparity speckle is compact blobs (<= 2-3 alternations) and
    `rounds` = 16 leaves a wide margin.  Convergence is checked: the
    returned flag is True iff one more hook would change nothing, i.e.
    the result equals cv::filterSpeckles exactly (per-frame twin
    _speckle_filter; equality tested).  The component-size count stays a
    per-frame scatter-add under lax.map (the one remaining
    irregular-memory op).

    Returns (filtered_disp (B,H,W), converged (bool))."""
    B, h, w = disp.shape
    n = h * w
    d = disp.astype(jnp.int32)
    big = jnp.int32(n)
    sent = jnp.int32(1 << 30)

    def shz(a, dy, dx, fill):
        out = a
        if dy == 1:
            out = jnp.concatenate(
                [jnp.full((B, 1, w), fill, a.dtype), out[:, :-1]], axis=1)
        elif dy == -1:
            out = jnp.concatenate(
                [out[:, 1:], jnp.full((B, 1, w), fill, a.dtype)], axis=1)
        if dx == 1:
            out = jnp.concatenate(
                [jnp.full((B, h, 1), fill, a.dtype), out[:, :, :-1]],
                axis=2)
        elif dx == -1:
            out = jnp.concatenate(
                [out[:, :, 1:], jnp.full((B, h, 1), fill, a.dtype)],
                axis=2)
        return out

    valid = d != filtered
    # edge(p, axis): p connected to its predecessor along axis
    conn_h = jnp.concatenate(
        [jnp.zeros((B, h, 1), bool),
         valid[:, :, 1:] & valid[:, :, :-1] &
         (jnp.abs(d[:, :, 1:] - d[:, :, :-1]) <= max_diff)], axis=2)
    conn_v = jnp.concatenate(
        [jnp.zeros((B, 1, w), bool),
         valid[:, 1:, :] & valid[:, :-1, :] &
         (jnp.abs(d[:, 1:, :] - d[:, :-1, :]) <= max_diff)], axis=1)

    def shift_pair(m, c, k, axis, fwd, fillm):
        """Shift (labels, span-connectivity) by k along axis, toward
        increasing index if fwd (reads index-k), else decreasing."""
        if axis == 2:
            if fwd:
                ms = jnp.concatenate(
                    [jnp.full((B, h, k), fillm, m.dtype), m[:, :, :-k]],
                    axis=2)
                cs = jnp.concatenate(
                    [jnp.zeros((B, h, k), bool), c[:, :, :-k]], axis=2)
            else:
                ms = jnp.concatenate(
                    [m[:, :, k:], jnp.full((B, h, k), fillm, m.dtype)],
                    axis=2)
                cs = jnp.concatenate(
                    [c[:, :, k:], jnp.zeros((B, h, k), bool)], axis=2)
        else:
            if fwd:
                ms = jnp.concatenate(
                    [jnp.full((B, k, w), fillm, m.dtype), m[:, :-k]],
                    axis=1)
                cs = jnp.concatenate(
                    [jnp.zeros((B, k, w), bool), c[:, :-k]], axis=1)
            else:
                ms = jnp.concatenate(
                    [m[:, k:], jnp.full((B, k, w), fillm, m.dtype)],
                    axis=1)
                cs = jnp.concatenate(
                    [c[:, k:], jnp.zeros((B, k, w), bool)], axis=1)
        return ms, cs

    def run_prop(m, conn, axis):
        """Full min-propagation within runs along `axis`, both
        directions, via segmented log-doubling: span-connectivity
        c_k(p) = run continues across [p-k, p] doubles each step."""
        dim = w if axis == 2 else h
        for fwd in (True, False):
            # c1(p): connected to predecessor (fwd) / successor (bwd)
            if fwd:
                c = conn
            else:
                if axis == 2:
                    c = jnp.concatenate(
                        [conn[:, :, 1:], jnp.zeros((B, h, 1), bool)],
                        axis=2)
                else:
                    c = jnp.concatenate(
                        [conn[:, 1:], jnp.zeros((B, 1, w), bool)],
                        axis=1)
            k = 1
            while k < dim:
                ms, cs = shift_pair(m, c, k, axis, fwd, big)
                m = jnp.where(c, jnp.minimum(m, ms), m)
                c = c & cs
                k *= 2
        return m

    labels0 = (jax.lax.broadcasted_iota(jnp.int32, (B, h, w), 1) * w +
               jax.lax.broadcasted_iota(jnp.int32, (B, h, w), 2))
    labels0 = labels0 + d * 0          # shard_map varying-type seed

    def body(m, _):
        m = run_prop(m, conn_h, 2)
        m = run_prop(m, conn_v, 1)
        return m, None

    labels, _ = jax.lax.scan(body, labels0, None, length=rounds)

    # convergence check = one neighbor-min hook changes nothing
    hooked = labels
    for dy, dx in ((1, 0), (-1, 0), (0, 1), (0, -1)):
        nl = shz(labels, dy, dx, big)
        nd = shz(d, dy, dx, sent)
        connected = (valid & (nd != filtered) &
                     (jnp.abs(nd - d) <= max_diff))
        hooked = jnp.minimum(hooked, jnp.where(connected, nl, big))
    converged = jnp.all(hooked == labels)

    def sizes_one(l):
        flat = l.reshape(-1)
        s = jnp.zeros((n,), jnp.int32).at[flat].add(1)
        return jnp.take(s, flat).reshape(h, w)

    comp_size = jax.lax.map(sizes_one, labels)
    out = jnp.where(comp_size <= max_size,
                    jnp.asarray(filtered, disp.dtype),
                    disp).astype(disp.dtype)
    return out, converged


def _lr_consistency(disp: jnp.ndarray, minsad: jnp.ndarray,
                    cfg: StereoBMConfig) -> jnp.ndarray:
    """Left-right consistency (cv::validateDisparity semantics).

    Projection pass: every valid left pixel x projects its winner to
    x2 = x - round(d/16); each right pixel keeps the cheapest-SAD
    projector (first x wins ties).  Check pass: pixel x is invalidated
    only when BOTH its floor projection x - (d>>4) and its ceil
    projection x - ((d+15)>>4) hold valid winners differing from d by
    more than disp12MaxDiff*16.
    """
    h, w = disp.shape
    mindisp = cfg.min_disparity
    ndisp = cfg.num_disparities
    filtered = (mindisp - 1) * FILTERED_SCALE

    xs_row = jnp.arange(w, dtype=jnp.int32).reshape(1, w)
    lvalid = disp != filtered
    min_x1 = max(mindisp + ndisp, 0)
    participate = lvalid & (xs_row >= min_x1)

    # Scatter- and gather-free formulation: the right-image winner
    # competition and both consistency lookups are per-pixel dynamic
    # indexing, which lowers to (1,1)-element scatters/gathers on TPU
    # (~16 ms/frame).  But the index offset is always a disparity in
    # [mindisp, mindisp+ndisp], so each pass is ndisp+1 STATIC shifted
    # slices + vectorized selects instead.
    #
    # Winner key is (cost, disparity-value) lexicographic.  OpenCV keeps
    # the first (smallest-x) projector on cost ties; for a fixed right
    # pixel x2 the candidate at integer disparity k sits at x = x2 + k,
    # so smaller disparity value <=> smaller k <=> smaller x: the
    # tie-break is identical.
    INF = jnp.int32(2 ** 31 - 1)
    dint = (disp + FILTERED_SCALE // 2) >> 4            # round(d/16)
    dv = disp - mindisp * FILTERED_SCALE                # 0..ndisp*16+15
    enc = jnp.where(participate, minsad * jnp.int32(4096) + dv, INF)

    P = ndisp + abs(mindisp) + 2
    pad_inf = jnp.full((h, P), INF, jnp.int32)
    enc_pad = jnp.concatenate([pad_inf, enc, pad_inf], axis=1)
    dint_pad = jnp.concatenate(
        [jnp.full((h, P), jnp.int32(1 << 20)), dint, pad_inf], axis=1)
    best2 = jnp.full((h, w), INF, jnp.int32)
    for k in range(mindisp, mindisp + ndisp + 1):
        # right pixel x2 sees left pixel x = x2 + k
        sl = jax.lax.slice_in_dim(enc_pad, P + k, P + k + w, axis=1)
        sd = jax.lax.slice_in_dim(dint_pad, P + k, P + k + w, axis=1)
        best2 = jnp.minimum(best2, jnp.where(sd == k, sl, INF))
    have_winner = best2 != INF
    disp2 = jnp.where(have_winner,
                      best2 % 4096 + mindisp * FILTERED_SCALE,
                      jnp.int32(filtered))

    md16 = cfg.disp12_max_diff * FILTERED_SCALE
    disp2_pad = jnp.concatenate(
        [jnp.full((h, P), jnp.int32(filtered)), disp2,
         jnp.full((h, P), jnp.int32(filtered))], axis=1)

    def fails(s):
        """d2 = disp2[x - s(x)] via shifted static slices; s(x) in
        [mindisp, mindisp+ndisp] for every participating pixel."""
        xp = xs_row - s
        inb = (xp >= 0) & (xp < w)
        d2 = jnp.zeros((h, w), jnp.int32)
        for k in range(mindisp, mindisp + ndisp + 1):
            sl = jax.lax.slice_in_dim(disp2_pad, P - k, P - k + w, axis=1)
            d2 = jnp.where(s == k, sl, d2)
        return inb & (d2 >= 0) & (jnp.abs(d2 - disp) > md16)

    bad = participate & fails(disp >> 4) & \
        fails((disp + FILTERED_SCALE - 1) >> 4)
    return jnp.where(bad, filtered, disp)


@functools.partial(jax.jit, static_argnames=("cfg", "with_speckle"))
def stereo_bm(left: jnp.ndarray, right: jnp.ndarray,
              cfg: StereoBMConfig = StereoBMConfig(),
              with_speckle: bool = True) -> jnp.ndarray:
    """Full StereoBM: uint8 (H,W) pair -> int16 (H,W) x16 disparity.

    Invalid pixels get (min_disparity - 1) * 16 like OpenCV.
    """
    ndisp = cfg.num_disparities
    wsz = cfg.block_size
    r = wsz // 2
    mindisp = cfg.min_disparity
    ftzero = cfg.prefilter_cap
    filtered = (mindisp - 1) * FILTERED_SCALE

    h, w = left.shape
    lp = prefilter_xsobel(left, ftzero).astype(jnp.int32)
    rp = prefilter_xsobel(right, ftzero).astype(jnp.int32)

    # ---- cost volume: cost[d, y, x] = window SAD(L(x), R(x-d)) ----------
    # shift R right by d along x; out-of-range gets large cost via masking
    ds = np.arange(ndisp)
    shifted = []
    for dd in ds:
        if dd == 0:
            shifted.append(rp)
        else:
            pad = jnp.zeros((h, dd), dtype=jnp.int32)
            shifted.append(jnp.concatenate([pad, rp[:, :-dd]], axis=1))
    rshift = jnp.stack(shifted, axis=0)                    # (D, H, W)
    absdiff = jnp.abs(lp[None] - rshift)
    cost = _box_sum(absdiff, r)                            # (D, H, W) int32

    # ---- texture gate ---------------------------------------------------
    tex = _box_sum(jnp.abs(lp - ftzero), r)                # (H, W)
    tex_ok = tex >= cfg.texture_threshold

    # ---- winner selection (ties -> larger disparity, like OpenCV's
    # reversed internal ordering) ----------------------------------------
    cost_rev = cost[::-1]                                  # internal order
    mind_int = jnp.argmin(cost_rev, axis=0)                # (H, W)
    minsad = jnp.min(cost_rev, axis=0)
    d_act = ndisp - 1 - mind_int                           # actual disparity

    # ---- uniqueness gate (integer thresh like OpenCV) -------------------
    thresh = minsad + (minsad * cfg.uniqueness_ratio) // 100
    dd_int = jnp.arange(ndisp).reshape(ndisp, 1, 1)
    far = jnp.abs(dd_int - mind_int[None]) > 1
    violate = jnp.any((cost_rev <= thresh[None]) & far, axis=0)
    uniq_ok = ~violate if cfg.uniqueness_ratio > 0 else jnp.ones_like(violate)

    # ---- x16 subpixel (OpenCV integer rounding) -------------------------
    # internal neighbors: sad[-1] := sad[1], sad[ndisp] := sad[ndisp-2]
    lo = jnp.clip(mind_int - 1, 0, ndisp - 1)
    hi = jnp.clip(mind_int + 1, 0, ndisp - 1)
    lo = jnp.where(mind_int == 0, 1, lo)
    hi = jnp.where(mind_int == ndisp - 1, ndisp - 2, hi)
    sad_n = jnp.take_along_axis(cost_rev, lo[None], axis=0)[0]
    sad_p = jnp.take_along_axis(cost_rev, hi[None], axis=0)[0]
    denom = sad_p + sad_n - 2 * minsad + jnp.abs(sad_p - sad_n)
    num = (sad_p - sad_n) * 256
    # C integer division truncates toward zero (OpenCV (p-n)*256/d)
    frac = jnp.where(denom != 0,
                     jnp.sign(num) * (jnp.abs(num) //
                                      jnp.where(denom == 0, 1, denom)),
                     0)
    disp16 = ((d_act + mindisp) * 256 + frac + 15) >> 4

    # ---- valid region ----------------------------------------------------
    ys = jnp.arange(h).reshape(h, 1)
    xs = jnp.arange(w).reshape(1, w)
    in_rows = (ys >= r) & (ys < h - r)
    in_cols = (xs >= mindisp + ndisp - 1 + r) & (xs < w - r)
    valid = in_rows & in_cols & tex_ok & uniq_ok

    disp = jnp.where(valid, disp16, filtered).astype(jnp.int32)

    # ---- left-right consistency (cv::validateDisparity semantics) ------
    if cfg.disp12_max_diff >= 0:
        disp = _lr_consistency(disp, minsad, cfg)

    # ---- speckle filter --------------------------------------------------
    if with_speckle and cfg.speckle_window_size > 0 and cfg.speckle_range >= 0:
        disp = _speckle_filter(disp, cfg.speckle_window_size,
                               cfg.speckle_range, filtered)

    return disp.astype(jnp.int16)
