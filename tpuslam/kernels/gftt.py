"""GFTT (Shi-Tomasi min-eigenvalue) corner detection.

TPU-native re-design of the reference's corner engine:

  * device half: the min-eigenvalue response map — Sobel dx/dy, 3x3 box sums
    of (dx^2, dxdy, dy^2), min-eig closed form.  Mirrors both the PL `gftt`
    pipeline (/root/reference/src/dvp/rtl/gftt_eig.v:154-342: Sobel -> box ->
    (A+C)/2 - sqrt(((A-C)/2)^2 + B^2)) and cv::cornerMinEigenVal (the CPU
    oracle, bit-compared in tests).

  * host half: thresholding at max_response * quality, optional 3x3
    local-max suppression (cv::goodFeaturesToTrack), descending sort with
    deterministic row-major tie-break, and grid-bucket min-distance
    suppression capped at max_features.  This mirrors the reference's
    software half of the HW GFTT (/root/reference/src/slam/src/core/
    GFTT.cpp:41-170 `generateKeypoints2`) which itself mirrors
    goodFeaturesToTrack minus the local-max step.

The split matches the reference architecture: response map on the
accelerator (FPGA there, TPU here), candidate selection on the host.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _reflect101_pad(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """BORDER_REFLECT_101 padding on both axes."""
    top = x[1:r + 1][::-1]
    bot = x[-r - 1:-1][::-1]
    x = jnp.concatenate([top, x, bot], axis=0)
    left = x[:, 1:r + 1][:, ::-1]
    right = x[:, -r - 1:-1][:, ::-1]
    return jnp.concatenate([left, x, right], axis=1)


def _sep_filter(x: jnp.ndarray, kcol, krow) -> jnp.ndarray:
    """Separable 3-tap filter with reflect-101 borders (float32)."""
    p = _reflect101_pad(x, 1)
    # vertical (column) kernel
    v = kcol[0] * p[:-2] + kcol[1] * p[1:-1] + kcol[2] * p[2:]
    out = krow[0] * v[:, :-2] + krow[1] * v[:, 1:-1] + krow[2] * v[:, 2:]
    return out


@functools.partial(jax.jit, static_argnames=("block_size",))
def gftt_response(img: jnp.ndarray, block_size: int = 3) -> jnp.ndarray:
    """Min-eigenvalue response, float32, matching cv::cornerMinEigenVal
    (ksize=3 Sobel, unnormalized blockSize box sum, 8U input scale
    1/(2^(ksize-1) * blockSize * 255))."""
    x = img.astype(jnp.float32)
    scale = (1 << 2) * block_size * 255.0  # (1 << (ksize-1)) * blockSize * 255
    scale = 1.0 / scale
    smooth = (1.0, 2.0, 1.0)
    deriv = (-1.0, 0.0, 1.0)
    dx = _sep_filter(x, smooth, deriv) * scale
    dy = _sep_filter(x, deriv, smooth) * scale

    r = block_size // 2
    ones = tuple([1.0] * block_size)

    def box(z):
        p = _reflect101_pad(z, r)
        v = jnp.zeros_like(z)
        acc = 0.0
        for i in range(block_size):
            acc = acc + p[i:i + z.shape[0]]
        out = 0.0
        for j in range(block_size):
            out = out + acc[:, j:j + z.shape[1]]
        return out

    a = box(dx * dx) * 0.5
    b = box(dx * dy)
    c = box(dy * dy) * 0.5
    return (a + c) - jnp.sqrt((a - c) * (a - c) + b * b)


@functools.partial(jax.jit, static_argnames=("interpret",))
def gftt_response_dil_pallas(img: jnp.ndarray, interpret: bool = False):
    """Pallas strip kernel: min-eigenvalue response AND its 3x3 dilation
    in one pass over the raw image.

    The XLA gftt_response measured ~0.30 ms/frame on v5e — dominated by
    the reflect-101 concat-pads and separate stencil materializations —
    and local_max_3x3 adds more shifted passes.  Here each 16-row strip
    is loaded once; Sobel, products, the 3x3 box, the min-eig closed
    form and the dilation all run on VMEM-resident data.  Arithmetic
    replicates gftt_response's accumulation order exactly, including the
    cv2 quirk that the box filter reflects the PRODUCT images (dxdy is
    antisymmetric under coordinate reflection, so reflecting raw pixels
    first would flip its sign).

    Returns (eig (H, W) f32, dil (H, W) f32) with dil the 3x3 dilation
    under BORDER_CONSTANT -inf — drop-in for
    (gftt_response(img), local_max_3x3(eig))."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    h, w = img.shape
    TH = 16
    n_strips = -(-h // TH)
    Hp = n_strips * TH
    Wp = -(-w // 128) * 128
    Wtot = Wp + 128
    X0 = 8                  # image column 0 at lane X0 (halo 2+2 each side)
    scale = 1.0 / ((1 << 2) * 3 * 255.0)

    # raw embed with 1px reflect-101 rows AND columns for the Sobel
    # stage: image pixel (y, x) at padded (y + 3, x + X0); row -1 / h =
    # rows 1 / h-2, col -1 / w = cols 1 / w-2
    x8 = img
    core = jnp.concatenate([x8[1:2], x8, x8[h - 2:h - 1]], axis=0)
    core = jnp.concatenate([core[:, 1:2], core, core[:, w - 2:w - 1]],
                           axis=1)
    padded = jnp.zeros((Hp + 6, Wtot), jnp.uint8)
    padded = jax.lax.dynamic_update_slice(padded, core, (2, X0 - 1))
    neg = -3.4e38          # python float: a traced constant would be a
                           # captured value pallas_call rejects

    def kernel(img_ref, eig_ref, dil_ref):
        i = pl.program_id(0)
        # strip covers eig rows [Y0-1, Y0+TH+1) (dilation halo); each
        # eig row needs product rows +-1, each product row raw rows +-1
        # -> raw rows [Y0-3, Y0+TH+3) = padded rows [Y0, Y0+TH+6)
        S = TH + 6
        raw = img_ref[pl.ds(i * TH, S), :].astype(jnp.int32) \
            .astype(jnp.float32)
        rt = pltpu.roll(raw, shift=Wtot - 1, axis=1)    # raw[x+1]
        lf = pltpu.roll(raw, shift=1, axis=1)           # raw[x-1]
        # dx: vertical smooth(1,2,1) then horizontal deriv(-1,0,1);
        # dy: vertical deriv then horizontal smooth — gftt_response's
        # exact accumulation order
        vsm = 1.0 * raw[:-2] + 2.0 * raw[1:-1] + 1.0 * raw[2:]
        vsm_r = 1.0 * rt[:-2] + 2.0 * rt[1:-1] + 1.0 * rt[2:]
        vsm_l = 1.0 * lf[:-2] + 2.0 * lf[1:-1] + 1.0 * lf[2:]
        dx = (-1.0 * vsm_l + 0.0 * vsm + 1.0 * vsm_r) * scale
        vdr = -1.0 * raw[:-2] + 0.0 * raw[1:-1] + 1.0 * raw[2:]
        vdr_r = -1.0 * rt[:-2] + 0.0 * rt[1:-1] + 1.0 * rt[2:]
        vdr_l = -1.0 * lf[:-2] + 0.0 * lf[1:-1] + 1.0 * lf[2:]
        dy = (1.0 * vdr_l + 2.0 * vdr + 1.0 * vdr_r) * scale
        # (S-2, Wtot): product rows [Y0-2, Y0+TH+2)

        yg = (i * TH - 2 +
              jax.lax.broadcasted_iota(jnp.int32, (S - 2, Wtot), 0))
        xg = jax.lax.broadcasted_iota(jnp.int32, (S - 2, Wtot), 1) - X0

        def fix_products(p):
            """Reflect-101 of the PRODUCT image at the borders (cv2 box
            semantics; products at out-of-image positions are replaced
            by their mirrored in-image values)."""
            dn2 = jnp.concatenate([p[2:], jnp.zeros((2, Wtot),
                                                    p.dtype)], axis=0)
            up2 = jnp.concatenate([jnp.zeros((2, Wtot), p.dtype),
                                   p[:-2]], axis=0)
            p = jnp.where(yg == -1, dn2, jnp.where(yg == h, up2, p))
            r2 = pltpu.roll(p, shift=Wtot - 2, axis=1)   # p[x+2]
            l2 = pltpu.roll(p, shift=2, axis=1)          # p[x-2]
            return jnp.where(xg == -1, r2,
                             jnp.where(xg == w, l2, p))

        a_p = fix_products(dx * dx)
        b_p = fix_products(dx * dy)
        c_p = fix_products(dy * dy)

        def box3(p):
            acc = 0.0 + p[:-2] + p[1:-1] + p[2:]
            rt1 = pltpu.roll(acc, shift=Wtot - 1, axis=1)
            lf1 = pltpu.roll(acc, shift=1, axis=1)
            return 0.0 + lf1 + acc + rt1   # (S-4, Wtot)

        a = box3(a_p) * 0.5
        b = box3(b_p)
        c = box3(c_p) * 0.5
        eig = (a + c) - jnp.sqrt((a - c) * (a - c) + b * b)
        # eig rows [Y0-1, Y0+TH+1); mask outside-image to -inf for the
        # BORDER_CONSTANT dilation
        yg2 = (i * TH - 1 +
               jax.lax.broadcasted_iota(jnp.int32, (TH + 2, Wtot), 0))
        xg2 = jax.lax.broadcasted_iota(jnp.int32, (TH + 2, Wtot), 1) - X0
        inside = (yg2 >= 0) & (yg2 < h) & (xg2 >= 0) & (xg2 < w)
        eig_m = jnp.where(inside, eig, neg)
        m = jnp.maximum(jnp.maximum(eig_m[:-2], eig_m[1:-1]), eig_m[2:])
        mr = pltpu.roll(m, shift=Wtot - 1, axis=1)
        ml = pltpu.roll(m, shift=1, axis=1)
        dil = jnp.maximum(jnp.maximum(ml, m), mr)       # (TH, Wtot)
        eig_ref[:] = eig[1:-1, X0:X0 + Wp]
        dil_ref[:] = dil[:, X0:X0 + Wp]

    eig_p, dil_p = pl.pallas_call(
        kernel,
        grid=(n_strips,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((TH, Wp), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((TH, Wp), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((Hp, Wp), jnp.float32),
                   jax.ShapeDtypeStruct((Hp, Wp), jnp.float32)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(padded)
    return eig_p[:h, :w], dil_p[:h, :w]


@jax.jit
def local_max_3x3(eig: jnp.ndarray) -> jnp.ndarray:
    """3x3 dilation (BORDER_CONSTANT -inf outside) == cv::dilate used by
    goodFeaturesToTrack."""
    neg = jnp.float32(-jnp.inf)
    h, w = eig.shape
    m = eig
    up = jnp.concatenate([jnp.full((1, w), neg), m[:-1]], axis=0)
    dn = jnp.concatenate([m[1:], jnp.full((1, w), neg)], axis=0)
    m = jnp.maximum(jnp.maximum(up, dn), m)
    lf = jnp.concatenate([jnp.full((h, 1), neg), m[:, :-1]], axis=1)
    rt = jnp.concatenate([m[:, 1:], jnp.full((h, 1), neg)], axis=1)
    return jnp.maximum(jnp.maximum(lf, rt), m)


def _two_stage_top_k(masked: jnp.ndarray, k: int, k1: int = 256,
                     m: int = 256):
    """Exact-ordered top-k of a flat response map via contiguous
    segments: per-segment top-k1, then top-k over the m*k1 survivors.

    lax.top_k over the full 466k map costs ~0.7 ms/frame on v5e; this
    runs the sort network on 8x less data (~0.35 ms measured).  Values
    AND tie-breaks are exact: within a segment stage-1 rank equals flat
    order, and across segments the (segment, rank) order of stage 2 is
    lexicographically the flat order, so equal values still resolve to
    the lower flat index (GFTT.cpp:31-39 semantics) — verified against
    flat top_k in tests/test_kernels.py.  Like the max_candidates cap
    itself, the per-segment k1 cap is a truncation: a single ~3-row
    segment would have to hold >k1 local-max candidates (geometrically
    >2 px apart unless exactly tied) before any global top-k entry
    could be lost; real responses peak at a few dozen per segment
    (measured worst segment on the bench frames: 147 candidates at
    m=128, i.e. ~74 at the m=256 default — 3.5x headroom.  m=256
    halves the stage-1 sort rows for the same stage-2 size and
    headroom ratio: 0.42 -> 0.35 ms/frame).

    Indices at -inf (padding / non-candidate) slots are arbitrary —
    every consumer masks by finite value first.
    """
    n = masked.shape[0]
    seg = -(-n // m)
    xp = masked
    if seg * m != n:
        xp = jnp.pad(masked, (0, seg * m - n),
                     constant_values=-jnp.inf)
    xp = xp.reshape(m, seg)
    v1, i1 = jax.lax.top_k(xp, k1)                       # (m, k1)
    gidx = i1 + (jnp.arange(m, dtype=i1.dtype) * seg)[:, None]
    v2, i2 = jax.lax.top_k(v1.reshape(-1), k)
    return v2, gidx.reshape(-1)[i2]


@functools.partial(jax.jit, static_argnames=("block_size",
                                              "max_candidates"))
def gftt_candidates(img: jnp.ndarray, quality_level: jnp.ndarray,
                    block_size: int = 3,
                    max_candidates: int = 4096):
    """Device-side candidate extraction: response + threshold + 3x3
    local max + top-k, so only ~max_candidates (val, index) pairs cross
    the host boundary instead of the full response map (the dominant
    host<->device transfer in the per-frame loop).

    Returns (vals (K,), flat_idx (K,), max_response, n_candidates).
    Ties in top_k break toward the lower flat index — the same
    row-major tie-break as the host sort (GFTT.cpp:31-39).
    """
    if jax.default_backend() == "tpu" and block_size == 3:
        # fused response+dilation strip kernel; the thresholded-dilation
        # mask is equivalent on the raw dilation: for a pixel above thr,
        # any strictly larger neighbor is itself above thr, so
        # (z != 0) & (z == dil(z))  ==  (eig > thr) & (eig == dil(eig))
        eig, dil = gftt_response_dil_pallas(img)
        # barrier: without it XLA fuses the pallas_call results straight
        # into the reduction chain, and the combined program faults the
        # TPU runtime when the surrounding chunk program also contains
        # the VO lax.scan (same pathology class as the speckle
        # while_loop fault, PERF.md)
        eig, dil = jax.lax.optimization_barrier((eig, dil))
        maxv = jnp.max(eig)
        thr = maxv * quality_level
        mask = (eig > thr) & (eig == dil)
    else:
        eig = gftt_response(img, block_size)
        maxv = jnp.max(eig)
        thr = maxv * quality_level
        z = jnp.where(eig > thr, eig, 0.0)
        dil = local_max_3x3(z)
        mask = (z != 0.0) & (z == dil)
    mask = mask.at[0, :].set(False).at[-1, :].set(False)
    mask = mask.at[:, 0].set(False).at[:, -1].set(False)
    masked = jnp.where(mask, eig, -jnp.inf).reshape(-1)
    vals, idx = _two_stage_top_k(masked, max_candidates)
    return vals, idx, maxv, jnp.sum(mask)


@functools.partial(jax.jit, static_argnames=("width", "max_features",
                                              "capacity"))
def select_from_candidates_device(vals: jnp.ndarray, flat_idx: jnp.ndarray,
                                  width: int,
                                  min_distance: jnp.ndarray,
                                  max_features: int = 1500,
                                  capacity: int = 1536):
    """Device-side twin of select_from_candidates: greedy min-distance
    suppression over candidates already in descending-response order.

    The reference's grid walk (GFTT.cpp:78-141) is inherently sequential:
    a candidate is rejected iff an earlier *accepted* candidate lies within
    min_distance.  That greedy set is the unique fixpoint of
        in[i]  <- every earlier neighbor of i is out
        out[i] <- some earlier neighbor of i is in
    which we reach by parallel status rounds — each round decides at least
    the earliest undecided candidate, and each is two (N,N)x(N,) matvecs
    on the MXU, so convergence (~10-30 rounds in practice) costs microseconds
    instead of the reference's per-candidate pointer chase.

    Returns (kpts (capacity,3) float32 [x, y, response] in acceptance order,
    valid (capacity,) bool, n_accepted int32).
    """
    n = vals.shape[0]
    finite = vals > jnp.float32(-3e38)
    xs = (flat_idx % width).astype(jnp.float32)
    ys = (flat_idx // width).astype(jnp.float32)
    md2 = min_distance * min_distance

    # Block-sequential fixpoint: the greedy status of candidate i
    # depends only on EARLIER candidates, so processing index blocks in
    # order computes the exact same accepted set while never
    # materializing the (n, n) adjacency — the global fixpoint re-read
    # a 64 MB matrix every round (~1.25 ms/frame of pure HBM traffic);
    # here each block builds its (BS, n) rows once, reduces prior-block
    # suppression with one matvec, and runs its internal fixpoint on a
    # tiny (BS, BS) sub-block.
    BS = 256
    if n % BS:
        BS = n                     # degenerate sizes: single block
    NB = n // BS
    col_idx = jnp.arange(n, dtype=jnp.int32)

    def block_body(in_full, b):
        g0 = b * BS
        xb = jax.lax.dynamic_slice(xs, (g0,), (BS,))
        yb = jax.lax.dynamic_slice(ys, (g0,), (BS,))
        finb = jax.lax.dynamic_slice(finite, (g0,), (BS,))
        row_g = g0 + jnp.arange(BS, dtype=jnp.int32)

        dxr = xb[:, None] - xs[None, :]
        dyr = yb[:, None] - ys[None, :]
        near_row = ((dxr * dxr + dyr * dyr < md2) &
                    (col_idx[None, :] < row_g[:, None]) &
                    finite[None, :] & finb[:, None])
        sup_prev = (near_row.astype(jnp.float32)
                    @ in_full.astype(jnp.float32)) > 0.5

        dxb = xb[:, None] - xb[None, :]
        dyb = yb[:, None] - yb[None, :]
        nbb = ((dxb * dxb + dyb * dyb < md2) &
               (jnp.arange(BS)[None, :] < jnp.arange(BS)[:, None]) &
               finb[None, :] & finb[:, None]).astype(jnp.float32)

        def cond(state):
            in_m, out_m, rounds = state
            undecided = finb & ~in_m & ~out_m
            return jnp.any(undecided) & (rounds < BS)

        def body(state):
            in_m, out_m, rounds = state
            undecided = finb & ~in_m & ~out_m
            some_in = (nbb @ in_m.astype(jnp.float32)) > 0.5
            any_not_out = (nbb @ (~out_m).astype(jnp.float32)) > 0.5
            in_m = in_m | (undecided & ~any_not_out)
            out_m = out_m | (undecided & some_in)
            return in_m, out_m, rounds + 1

        in_b, _, _ = jax.lax.while_loop(
            cond, body, (jnp.zeros(BS, jnp.bool_), sup_prev,
                         jnp.int32(0)))
        in_full = jax.lax.dynamic_update_slice(in_full, in_b, (g0,))
        return in_full, None

    in_m, _ = jax.lax.scan(block_body, jnp.zeros(n, jnp.bool_),
                           jnp.arange(NB, dtype=jnp.int32))

    # compact accepted candidates in order, cap at max_features
    order = jnp.argsort(~in_m, stable=True)
    if n < capacity:
        order = jnp.concatenate(
            [order, jnp.zeros(capacity - n, order.dtype)])
    order = order[:capacity]
    n_acc = jnp.minimum(jnp.sum(in_m), max_features)
    valid = jnp.arange(capacity) < n_acc
    kpts = jnp.stack([xs[order], ys[order], vals[order]], axis=1)
    kpts = jnp.where(valid[:, None], kpts, 0.0)
    return kpts, valid, n_acc.astype(jnp.int32)


def select_from_candidates(vals: np.ndarray, flat_idx: np.ndarray,
                           width: int,
                           max_features: int = 1500,
                           min_distance: float = 7.0) -> np.ndarray:
    """Host half of the device-candidate path: identical sort order and
    grid min-distance suppression as select_keypoints (the candidates
    arrive already thresholded, local-max'd and sorted)."""
    keep = np.isfinite(vals)
    vals = vals[keep]
    flat_idx = flat_idx[keep]
    ys = (flat_idx // width).astype(np.int64)
    xs = (flat_idx % width).astype(np.int64)
    return _grid_suppress(xs, ys, vals, width, max_features, min_distance)


def select_keypoints(eig: np.ndarray,
                     max_features: int = 1500,
                     quality_level: float = 0.01,
                     min_distance: float = 7.0,
                     use_local_max: bool = True,
                     max_value: float | None = None) -> np.ndarray:
    """Host-side candidate selection.

    Returns (N, 3) float32 array of (x, y, response), N <= max_features.

    With use_local_max=True this reproduces cv::goodFeaturesToTrack
    (threshold -> 3x3 dilation non-max -> sort -> grid suppression); with
    False it reproduces the reference's FPGA path `generateKeypoints2`
    (GFTT.cpp:41-170) operating on the raw thresholded map.

    `max_value` overrides the map maximum (the FPGA per-frame max-eigenvalue
    register semantics, FPGA.cpp:291-297).
    """
    eig = np.asarray(eig)
    h, w = eig.shape
    maxv = float(eig.max()) if max_value is None else float(max_value)
    thr = maxv * quality_level

    if use_local_max:
        # threshold-to-zero then 3x3 local max, interior only (1..size-2)
        z = np.where(eig > thr, eig, 0.0)
        from scipy.ndimage import maximum_filter
        dil = maximum_filter(z, size=3, mode="constant", cval=0.0)
        mask = (z != 0) & (z == dil)
        mask[0, :] = mask[-1, :] = False
        mask[:, 0] = mask[:, -1] = False
        ys, xs = np.nonzero(mask)
        vals = z[ys, xs]
    else:
        # generateKeypoints2: plain threshold (>=), interior only
        mask = eig >= thr
        mask[0, :] = mask[-1, :] = False
        mask[:, 0] = mask[:, -1] = False
        ys, xs = np.nonzero(mask)
        vals = eig[ys, xs]

    # descending sort; ties resolved by row-major position (the reference's
    # greaterThanPtr pointer comparison, GFTT.cpp:31-39)
    flat = ys.astype(np.int64) * w + xs
    order = np.lexsort((flat, -vals))
    ys, xs, vals = ys[order], xs[order], vals[order]
    return _grid_suppress(xs, ys, vals, w, max_features, min_distance)


def _grid_suppress(xs, ys, vals, w: int, max_features: int,
                   min_distance: float) -> np.ndarray:
    """Grid-bucket min-distance suppression over candidates already in
    descending-response order (GFTT.cpp:78-141)."""
    if min_distance < 1:
        out = [(float(x), float(y), float(v))
               for x, y, v in zip(xs[:max_features], ys[:max_features],
                                  vals[:max_features])]
        return np.array(out, dtype=np.float32).reshape(-1, 3)

    cell = int(round(min_distance))
    gw = (w + cell - 1) // cell
    gh = (int(ys.max()) // cell + 1) if len(ys) else 1
    grid: list[list[tuple[float, float]]] = [[] for _ in range(gw * gh)]
    md2 = min_distance * min_distance
    out = []
    for x, y, v in zip(xs, ys, vals):
        xc, yc = int(x) // cell, int(y) // cell
        good = True
        for yy in range(max(0, yc - 1), min(gh - 1, yc + 1) + 1):
            for xx in range(max(0, xc - 1), min(gw - 1, xc + 1) + 1):
                for (px, py) in grid[yy * gw + xx]:
                    dx = float(x) - px
                    dy = float(y) - py
                    if dx * dx + dy * dy < md2:
                        good = False
                        break
                if not good:
                    break
            if not good:
                break
        if good:
            grid[yc * gw + xc].append((float(x), float(y)))
            out.append((float(x), float(y), float(v)))
            if len(out) == max_features:
                break
    return np.array(out, dtype=np.float32).reshape(-1, 3)
