"""ORB descriptors (descriptor-only pass over provided keypoints).

TPU-native re-design of the reference's descriptor stage
(/root/reference/src/slam/src/opencv/CvORB.cpp, itself a port of OpenCV's
ORB): GFTT keypoints arrive with octave 0 so the pyramid collapses to one
level; the image is blurred with a 7x7 sigma-2 Gaussian (reflect-101
borders, CvORB.cpp:109-114) and each 256-bit descriptor is built from
pairwise intensity tests over the standard `bit_pattern_31_` sampling
pattern rotated by the keypoint angle (CvORB.cpp:164-218).

Instead of the reference's per-keypoint pointer walk, all keypoints are
processed as one batched gather: a (K, 512) index tensor into the blurred
image is built from the rotated pattern, gathered in one op, and compared
pairwise — K keypoints x 512 samples vectorize over the VPU.

GFTT keypoints carry angle == -1 (undefined); OpenCV then literally rotates
the pattern by -1 degree.  We reproduce that exactly.

The sampling pattern ships as package data (kernels/data/orb_pattern.npy,
extracted by tools/extract_fixtures.py from OpenCV's public BSD table).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

_PATTERN_PATH = os.path.join(os.path.dirname(__file__), "data",
                             "orb_pattern.npy")
_pattern_cache = None


def orb_pattern() -> np.ndarray:
    """(512, 2) int32 sampling offsets (x, y)."""
    global _pattern_cache
    if _pattern_cache is None:
        _pattern_cache = np.load(_PATTERN_PATH)
    return _pattern_cache


def gaussian_kernel_7_sigma2() -> np.ndarray:
    """cv::getGaussianKernel(7, 2): normalized exp(-x^2 / (2 sigma^2))."""
    xs = np.arange(7) - 3
    k = np.exp(-(xs.astype(np.float64) ** 2) / (2.0 * 2.0 ** 2))
    return (k / k.sum()).astype(np.float64)


def _reflect101_pad(x: jnp.ndarray, r: int) -> jnp.ndarray:
    top = x[1:r + 1][::-1]
    bot = x[-r - 1:-1][::-1]
    x = jnp.concatenate([top, x, bot], axis=0)
    left = x[:, 1:r + 1][:, ::-1]
    right = x[:, -r - 1:-1][:, ::-1]
    return jnp.concatenate([left, x, right], axis=1)


@jax.jit
def orb_blur(img: jnp.ndarray) -> jnp.ndarray:
    """7x7 sigma-2 Gaussian blur, uint8 with round-half-away like OpenCV's
    saturate_cast(cvRound(.)) on the separable float path."""
    k = jnp.asarray(gaussian_kernel_7_sigma2(), dtype=jnp.float32)
    x = img.astype(jnp.float32)
    p = _reflect101_pad(x, 3)
    h, w = img.shape
    v = jnp.zeros((h, w + 6), jnp.float32)
    for i in range(7):
        v = v + k[i] * p[i:i + h]
    out = jnp.zeros((h, w), jnp.float32)
    for j in range(7):
        out = out + k[j] * v[:, j:j + w]
    return jnp.clip(jnp.floor(out + 0.5), 0, 255).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("max_kpts",))
def _orb_descriptors_device(blurred: jnp.ndarray,
                            kpts_xy: jnp.ndarray,
                            angles_deg: jnp.ndarray,
                            valid: jnp.ndarray,
                            pattern: jnp.ndarray,
                            max_kpts: int) -> jnp.ndarray:
    """(K,2) float keypoints -> (K, 32) uint8 descriptors.

    Samples at center + round(p.x*a - p.y*b), round(p.x*b + p.y*a) with
    a=cos(angle), b=sin(angle) — OpenCV's GET_VALUE indexing.
    """
    h, w = blurred.shape
    img = blurred.astype(jnp.int32)

    theta = angles_deg * (jnp.pi / 180.0)
    a = jnp.cos(theta)[:, None]     # (K,1)
    b = jnp.sin(theta)[:, None]

    px = pattern[:, 0].astype(jnp.float32)[None, :]   # (1,512)
    py = pattern[:, 1].astype(jnp.float32)[None, :]

    # cvRound = round-half-to-even
    dx = jnp.round(px * a - py * b).astype(jnp.int32)  # (K,512)
    dy = jnp.round(px * b + py * a).astype(jnp.int32)

    cx = jnp.round(kpts_xy[:, 0]).astype(jnp.int32)[:, None]
    cy = jnp.round(kpts_xy[:, 1]).astype(jnp.int32)[:, None]

    sx = jnp.clip(cx + dx, 0, w - 1)
    sy = jnp.clip(cy + dy, 0, h - 1)
    # flattened 1D take: a 2D-coordinate gather lowers to 786k (1,1)-slice
    # fetches on TPU (~31 ms); the same gather over flat indices is ~0.07 ms
    samples = jnp.take(img.reshape(-1), sy * w + sx)   # (K,512)

    t0 = samples[:, 0::2]                              # (K,256)
    t1 = samples[:, 1::2]
    bits = (t0 < t1).astype(jnp.uint8)                 # (K,256)

    bits = bits.reshape(max_kpts, 32, 8)
    weights = jnp.asarray([1, 2, 4, 8, 16, 32, 64, 128], dtype=jnp.uint8)
    desc = jnp.sum(bits * weights[None, None, :], axis=-1, dtype=jnp.uint32)
    desc = desc.astype(jnp.uint8)
    return jnp.where(valid[:, None], desc, 0)


@functools.partial(jax.jit, static_argnames=("max_kpts", "angle_deg"))
def _orb_descriptors_const_angle_device(blurred: jnp.ndarray,
                                        kpts_xy: jnp.ndarray,
                                        valid: jnp.ndarray,
                                        pattern: jnp.ndarray,
                                        max_kpts: int,
                                        angle_deg: float = -1.0) -> jnp.ndarray:
    """_orb_descriptors_device specialized for a compile-time-constant
    keypoint angle — the only case the pipeline hits (GFTT keypoints carry
    angle = -1, GFTT.cpp octave-0 path / CvORB.cpp:35-41).

    With the rotated pattern offsets static, the 512-sample random gather
    per keypoint (786k gathered elements/frame, ~6 ms on chip — the
    frontend's hottest op) becomes 256 statically-shifted whole-image
    comparisons fused by XLA into elementwise bit-plane kernels, followed
    by ONE 32-byte-per-keypoint row gather (~2.5x faster end to end).
    Bit-exact for keypoints >= 14 px from the border (the ORB border
    filter enforces 19); padded/invalid rows are masked to zero.
    """
    h, w = blurred.shape
    pat = np.asarray(orb_pattern(), np.float32)
    ca = np.cos(angle_deg * np.pi / 180.0)
    sb = np.sin(angle_deg * np.pi / 180.0)
    dxs = np.round(pat[:, 0] * ca - pat[:, 1] * sb).astype(np.int32)
    dys = np.round(pat[:, 0] * sb + pat[:, 1] * ca).astype(np.int32)
    R = int(max(-dxs.min(), dxs.max(), -dys.min(), dys.max()))

    img = blurred.astype(jnp.int16)
    pad = jnp.pad(img, R)
    desc_planes = []
    for byte in range(32):
        acc = jnp.zeros((h, w), jnp.uint8)
        for bit in range(8):
            s = byte * 8 + bit
            x0, y0 = int(dxs[2 * s]), int(dys[2 * s])
            x1, y1 = int(dxs[2 * s + 1]), int(dys[2 * s + 1])
            t0 = jax.lax.dynamic_slice(pad, (y0 + R, x0 + R), (h, w))
            t1 = jax.lax.dynamic_slice(pad, (y1 + R, x1 + R), (h, w))
            acc = acc | ((t0 < t1).astype(jnp.uint8) << bit)
        desc_planes.append(acc)
    D = jnp.stack(desc_planes, axis=-1)            # (h, w, 32)

    cx = jnp.clip(jnp.round(kpts_xy[:, 0]).astype(jnp.int32), 0, w - 1)
    cy = jnp.clip(jnp.round(kpts_xy[:, 1]).astype(jnp.int32), 0, h - 1)
    desc = D.reshape(-1, 32)[cy * w + cx]          # (K, 32) row gather
    return jnp.where(valid[:, None], desc, 0)


def _const_angle_offsets(angle_deg: float):
    pat = np.asarray(orb_pattern(), np.float32)
    ca = np.cos(angle_deg * np.pi / 180.0)
    sb = np.sin(angle_deg * np.pi / 180.0)
    dxs = np.round(pat[:, 0] * ca - pat[:, 1] * sb).astype(np.int32)
    dys = np.round(pat[:, 0] * sb + pat[:, 1] * ca).astype(np.int32)
    R = int(max(-dxs.min(), dxs.max(), -dys.min(), dys.max()))
    return dxs, dys, R


@functools.partial(jax.jit, static_argnames=("angle_deg", "interpret"))
def _orb_desc_planes_pallas(image: jnp.ndarray,
                            angle_deg: float = -1.0,
                            interpret: bool = False) -> jnp.ndarray:
    """Pallas strip kernel: 7x7 Gaussian blur + 32 descriptor byte
    planes, fused.

    The XLA bit-plane formulation (_orb_descriptors_const_angle_device)
    compiles to fusions that re-read the shifted image per comparison —
    ~512 reads/pixel, ~0.5 GB/frame of effective traffic (measured
    1.2 ms/frame at 1241x376).  Here each 16-row strip is loaded into
    VMEM ONCE; the blur runs in-strip (the standalone XLA orb_blur pass
    cost ~0.7 ms/frame in round 4 — fusing it here removes that whole
    dispatch) with the SAME f32 accumulation order as orb_blur, so the
    rounded u8 values are bit-identical; then all 256 pairwise tests run
    as static in-VMEM shifted slices.  HBM traffic collapses to one raw
    image read + one 32-plane write (~16 MB).  Bit-identical to
    orb_blur + the XLA path (tests/test_kernels).

    `image` is the RAW uint8 image; reflect-101 blur borders are
    pre-embedded in the padded input (pixels outside the image mask to
    blurred==0, matching the zero-padded XLA plane layout).

    Returns D (32, Hp, Wp) uint8 with Hp/Wp the padded geometry; plane
    b holds descriptor byte b of the pixel at that location.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dxs, dys, R = _const_angle_offsets(angle_deg)
    h, w = image.shape
    TH = 32          # 16 doubled the blur/strip-halo redundancy (64
                     # regressed: bigger live strips crowd VMEM); the
                     # raised scoped-VMEM limit fits the 32-row strip
    n_strips = -(-h // TH)
    Hp = n_strips * TH
    Wp = -(-w // 128) * 128
    Wtot = Wp + 128            # static lane slices need 2R + 6 <= 128
    S = TH + 2 * R             # blurred rows the tests read per strip
    kg = gaussian_kernel_7_sigma2().astype(np.float32)

    # raw embed with reflect-101 blur borders: image pixel (y, x) at
    # padded (y + R + 3, x + R + 3); rows/cols -3..-1 and h..h+2 carry
    # the reflect-101 content orb_blur's _reflect101_pad produces
    xi = image
    core = jnp.concatenate([xi[1:4][::-1], xi, xi[h - 4:h - 1][::-1]],
                           axis=0)
    core = jnp.concatenate([core[:, 1:4][:, ::-1], core,
                            core[:, w - 4:w - 1][:, ::-1]], axis=1)
    padded = jnp.zeros((Hp + 2 * R + 6, Wtot), jnp.uint8)
    padded = jax.lax.dynamic_update_slice(padded, core, (R, R))

    def kernel(img_ref, out_ref):
        i = pl.program_id(0)
        # Mosaic has neither u8 nor packed-i16 comparisons on this
        # target (v5e): widen the strip once and work in f32/i32,
        # narrowing on write
        # Mosaic cannot cast u8 -> f32 directly; hop through i32
        raw = img_ref[pl.ds(i * TH, S + 6), :].astype(jnp.int32) \
            .astype(jnp.float32)
        # vertical 7-tap, SAME accumulation order as orb_blur
        v = kg[0] * raw[0:S]
        for t in range(1, 7):
            v = v + kg[t] * raw[t:t + S]
        # horizontal 7-tap via lane rolls (roll right by 3-t reads
        # v[x + t - 3]); wrapped lanes only reach out-of-image columns,
        # which the mask below zeroes
        out = None
        for t in range(7):
            sh = (3 - t) % Wtot
            vt = pltpu.roll(v, shift=sh, axis=1) if sh else v
            out = kg[t] * vt if out is None else out + kg[t] * vt
        b = jnp.clip(jnp.floor(out + 0.5), 0., 255.)
        # blurred==0 outside the image: the XLA plane path zero-pads the
        # blurred image, and halo rows/cols must match it bit-for-bit
        yimg = (i * TH - R - 3 +
                jax.lax.broadcasted_iota(jnp.int32, (S, Wtot), 0) + 3)
        ximg = jax.lax.broadcasted_iota(jnp.int32, (S, Wtot), 1) - (R + 3)
        in_img = (yimg >= 0) & (yimg < h) & (ximg >= 0) & (ximg < w)
        # (negative result, r5c: a bf16 strip would run the 512 shifted
        # compares at 2x lane density — blurred values <= 255 are
        # bf16-exact — but v5e Mosaic rejects vector bf16 cmpf: "Target
        # does not support this comparison")
        strip = jnp.where(in_img, b, 0.).astype(jnp.int32)  # (S, Wtot)
        for byte in range(32):
            acc = jnp.zeros((TH, Wp), jnp.int32)
            for bit in range(8):
                s = byte * 8 + bit
                y0 = int(dys[2 * s]) + R
                x0 = int(dxs[2 * s]) + R + 3
                y1 = int(dys[2 * s + 1]) + R
                x1 = int(dxs[2 * s + 1]) + R + 3
                t0 = strip[y0:y0 + TH, x0:x0 + Wp]
                t1 = strip[y1:y1 + TH, x1:x1 + Wp]
                acc = acc | jnp.where(t0 < t1, jnp.int32(1 << bit),
                                      jnp.int32(0))
            # int16 planes: Mosaic's u8 packing made the 32 plane
            # stores the kernel's hottest ops; i16 halves the packing
            # depth (values are descriptor bytes < 256 either way)
            out_ref[byte] = acc.astype(jnp.int16)

    return pl.pallas_call(
        kernel,
        grid=(n_strips,),
        in_specs=[pl.BlockSpec((Hp + 2 * R + 6, Wtot), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((32, TH, Wp), lambda i: (0, i, 0)),
        out_shape=jax.ShapeDtypeStruct((32, Hp, Wp), jnp.int16),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(padded)


@functools.partial(jax.jit, static_argnames=("max_kpts", "angle_deg",
                                             "interpret"))
def _orb_descriptors_const_angle_pallas(image: jnp.ndarray,
                                        kpts_xy: jnp.ndarray,
                                        valid: jnp.ndarray,
                                        max_kpts: int,
                                        angle_deg: float = -1.0,
                                        interpret: bool = False
                                        ) -> jnp.ndarray:
    """Pallas-plane variant of orb_blur + _orb_descriptors_const_angle_
    device (takes the RAW image — blur is fused into the strip kernel):
    same output semantics, bit-identical descriptors."""
    h, w = image.shape
    D = _orb_desc_planes_pallas(image, angle_deg=angle_deg,
                                interpret=interpret)
    # barrier: without it XLA places the 16 MB plane tensor in scoped
    # VMEM next to the row gather and overruns the 16 MB limit
    D = jax.lax.optimization_barrier(D)
    Wp = D.shape[2]
    cx = jnp.clip(jnp.round(kpts_xy[:, 0]).astype(jnp.int32), 0, w - 1)
    cy = jnp.clip(jnp.round(kpts_xy[:, 1]).astype(jnp.int32), 0, h - 1)
    desc = jnp.take(D.reshape(32, -1), cy * Wp + cx, axis=1).T \
        .astype(jnp.uint8)
    return jnp.where(valid[:, None], desc, 0)


def orb_descriptors_const_angle_auto(image: jnp.ndarray,
                                     kpts_xy: jnp.ndarray,
                                     valid: jnp.ndarray,
                                     pattern: jnp.ndarray,
                                     max_kpts: int,
                                     angle_deg: float = -1.0
                                     ) -> jnp.ndarray:
    """Backend dispatch like stereo_bm_auto: the blur-fused Pallas strip
    kernel on TPU, orb_blur + the XLA bit-plane path elsewhere
    (bit-identical both ways).  Takes the RAW image."""
    if jax.default_backend() == "tpu":
        return _orb_descriptors_const_angle_pallas(
            image, kpts_xy, valid, max_kpts, angle_deg=angle_deg)
    return _orb_descriptors_const_angle_device(
        orb_blur(image), kpts_xy, valid, pattern, max_kpts,
        angle_deg=angle_deg)


def run_by_image_border(kpts: np.ndarray, img_shape, border: int = 19):
    """Drop keypoints within `border` px of the image edge
    (CvORB.cpp runByImageBorder; edgeThreshold 19).

    OpenCV's Rect(border, border, w-2*border, h-2*border).contains uses
    half-open [border, w-border): keep border <= x < w - border.
    """
    h, w = img_shape
    x, y = kpts[:, 0], kpts[:, 1]
    keep = ((x >= border) & (x < w - border) &
            (y >= border) & (y < h - border))
    return kpts[keep], keep


def orb_descriptors(image_or_blurred: jnp.ndarray,
                    kpts_xy: np.ndarray,
                    angles_deg: np.ndarray | None = None,
                    max_kpts: int = 1536,
                    pre_blurred: bool = False):
    """Compute ORB descriptors for given keypoints.

    Returns (desc (max_kpts, 32) uint8 device array, valid (max_kpts,) bool).
    Keypoints must already be border-filtered.  Pads to max_kpts for static
    shapes.
    """
    n = len(kpts_xy)
    assert n <= max_kpts, (n, max_kpts)
    xy = np.zeros((max_kpts, 2), np.float32)
    ang = np.full((max_kpts,), -1.0, np.float32)
    val = np.zeros((max_kpts,), bool)
    if n:
        xy[:n] = kpts_xy[:, :2]
        if angles_deg is not None:
            ang[:n] = angles_deg
        val[:n] = True
    blurred = image_or_blurred if pre_blurred else orb_blur(image_or_blurred)
    desc = _orb_descriptors_device(
        blurred, jnp.asarray(xy), jnp.asarray(ang), jnp.asarray(val),
        jnp.asarray(orb_pattern()), max_kpts)
    return desc, val
