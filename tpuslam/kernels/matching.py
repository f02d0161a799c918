"""Descriptor matching on the MXU.

TPU-native re-design of the reference's matchers
(/root/reference/src/slam/src/core/Registration.cpp — cv::BFMatcher
NORM_HAMMING knn k=2, and the guided 40-px radius search):

  * 256-bit descriptors are unpacked to {0,1} vectors once; the Hamming
    distance matrix is then `sum_a + sum_b - 2 a.b^T` — one (Na,256)x(256,Nb)
    matmul that runs on the systolic array instead of per-pair popcounts,
  * top-2 selection ties resolve to the lower index, matching BFMatcher's
    sequential strict-less scan,
  * the guided variant masks the distance matrix by the projected-point
    radius search before the top-2, fusing the reference's
    radiusMatch -> per-point KNN2 cascade into one batched program.

All shapes are static (pad to capacity and mask); everything jits.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

BIG = np.float32(1e9)   # np scalar: importing this module must not init the jax backend


def unpack_bits(desc_u8: jnp.ndarray) -> jnp.ndarray:
    """(N, 32) uint8 -> (N, 256) float32 in {0,1} (LSB-first per byte,
    matching the ORB kernel's bit packing)."""
    bits = jnp.unpackbits(desc_u8, axis=1, bitorder="little")
    return bits.astype(jnp.float32)


def hamming_matrix(desc_a: jnp.ndarray, desc_b: jnp.ndarray) -> jnp.ndarray:
    """(Na,32)x(Nb,32) uint8 -> (Na,Nb) float32 Hamming distances via MXU."""
    a = unpack_bits(desc_a)
    b = unpack_bits(desc_b)
    # precision="default" (bf16) is exact for {0,1} operands with f32
    # accumulation (sums <= 256), and ~6x faster than the repo-wide
    # "highest" matmul pin (tpuslam/__init__.py)
    ab = jnp.dot(a, b.T, preferred_element_type=jnp.float32,
                 precision="default")
    na = jnp.sum(a, axis=1, keepdims=True)
    nb = jnp.sum(b, axis=1, keepdims=True)
    return na + nb.T - 2.0 * ab


def _top2_min(dist: jnp.ndarray):
    """Per-row two smallest (values, indices); ties -> lower index.

    Index recovery is min-over-iota at the min value rather than argmin,
    and winner masking is a column comparison rather than a row scatter:
    both argmin and scatter lower pathologically on TPU (6 ms / 190 s
    compile for a (1536,1536) operand); this form is pure VPU reductions
    (~0.06 ms) with identical tie-break semantics.

    The optimization_barrier between the reductions is load-bearing: XLA
    otherwise fuses the four lane-reductions over the same (1536,1536)
    operand into one multi-output fusion whose tiling degrades ~300x
    (26 ms instead of 0.09 ms, with compile times up to 400 s).  Keeping
    each reduction in its own fusion restores speed-of-light."""
    n = dist.shape[1]
    cols = jnp.arange(n, dtype=jnp.int32)
    d1 = jnp.min(dist, axis=1)
    d1 = jax.lax.optimization_barrier(d1)
    i1 = jnp.min(jnp.where(dist == d1[:, None], cols[None, :], n), axis=1)
    i1 = jnp.minimum(i1, n - 1)
    i1 = jax.lax.optimization_barrier(i1)
    masked = jnp.where(cols[None, :] == i1[:, None], BIG, dist)
    d2 = jnp.min(masked, axis=1)
    d2 = jax.lax.optimization_barrier(d2)
    i2 = jnp.min(jnp.where(masked == d2[:, None], cols[None, :], n), axis=1)
    i2 = jnp.minimum(i2, n - 1)
    return d1, i1, d2, i2


@jax.jit
def knn2_hamming(desc_a: jnp.ndarray, valid_a: jnp.ndarray,
                 desc_b: jnp.ndarray, valid_b: jnp.ndarray):
    """Brute-force KNN k=2 from A (query) into B (train), Hamming.

    Twin of matchingNoGuess (Registration.cpp:311-335).  Returns
    (d1, i1, d2, i2) per query row; invalid rows/cols produce BIG.
    """
    dist = hamming_matrix(desc_a, desc_b)
    dist = jnp.where(valid_b[None, :], dist, BIG)
    dist = jnp.where(valid_a[:, None], dist, BIG)
    return _top2_min(dist)


@jax.jit
def guided_knn2_hamming(desc_a: jnp.ndarray,
                        proj_xy: jnp.ndarray, proj_valid: jnp.ndarray,
                        desc_b: jnp.ndarray,
                        kpts_b: jnp.ndarray, valid_b: jnp.ndarray,
                        radius: jnp.ndarray):
    """Guided matching: per projected 'from' point, KNN2 Hamming restricted
    to 'to' keypoints within `radius` px of the projection.

    Twin of matchingGuess (Registration.cpp:236-303): radiusMatch(L2,
    guessWinSize=40) to form the candidate set, then per-point KNN2 +
    NNDR on the candidates.  Returns (d1, i1, d2, i2, n_candidates).
    """
    dx = proj_xy[:, 0:1] - kpts_b[None, :, 0]
    dy = proj_xy[:, 1:2] - kpts_b[None, :, 1]
    pix2 = dx * dx + dy * dy
    in_radius = (pix2 <= radius * radius) & valid_b[None, :] \
        & proj_valid[:, None]
    n_cand = jnp.sum(in_radius, axis=1)

    dist = hamming_matrix(desc_a, desc_b)
    dist = jnp.where(in_radius, dist, BIG)
    d1, i1, d2, i2 = _top2_min(dist)
    return d1, i1, d2, i2, n_cand


def nndr_accept(d1, i1, d2, n_cand, nndr: float = 0.8,
                single_accept: bool = True):
    """NNDR uniqueness test (host, numpy):
      * >=2 candidates: accept iff d1 < nndr * d2 (strict, BFMatcher float)
      * ==1 candidate : accept unconditionally (guided path only,
        Registration.cpp:215-218)
    Returns boolean accept mask over query rows.
    """
    d1, d2 = np.asarray(d1), np.asarray(d2)
    n_cand = np.asarray(n_cand)
    many = n_cand >= 2
    ok = many & (d1 < nndr * d2)
    if single_accept:
        ok |= (n_cand == 1)
    return ok


def dedup_matches(from_idx, to_idx, accept):
    """Ordered first-wins dedup on train index (the reference's addedIndex
    set, Registration.cpp:284-300).  Returns list of (from, to) pairs."""
    seen = set()
    out = []
    for f, t, a in zip(from_idx, to_idx, accept):
        if not a:
            continue
        t = int(t)
        if t in seen:
            continue
        seen.add(t)
        out.append((int(f), t))
    return out
