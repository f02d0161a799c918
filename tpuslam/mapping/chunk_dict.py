"""Per-chunk device dictionary update: one program per VO chunk.

The incremental BoW dictionary (mapping/dictionary.py) issues 1-2 device
dispatches per full node (top-2 search, row append).  In the chunked
pipeline those dispatches queue BEHIND whole in-flight VO chunk programs
on the device, so each costs up to a full chunk's compute time of
latency and the mapper becomes the end-to-end bottleneck
(tools/exp_chunksweep.py: 142 fps without mapper, 65 with).

This module folds the dictionary work of ALL of a chunk's full nodes
into ONE device program that the pipeline dispatches immediately after
the VO chunk, consuming the VO program's still-on-device feature
outputs — no host round-trip enters the dependency chain, and the
device executes VO_i -> dict_i -> VO_{i+1} back to back.  The host
fetches the per-node decisions (keep mask, uniqueness, match rows)
asynchronously and replays the exact VWDictionary bookkeeping
(mapping/dictionary.py add_new_words semantics, VWDictionary.cpp:40-115)
without further device traffic.

Semantics preserved exactly (asserted by the count_after invariant and
tests/test_chunk_dict.py bit-equality):
  * per-node keypoint cap: top max_features by (|response|, larger
    index) — SensorData::limitKeypoints (vo/frame.py limit_keypoints),
  * each node's batch searches the dictionary state BEFORE the batch,
  * uniqueness: < 2 words, or d1 > nndr * d2 (f32, strict),
  * insertion order (and therefore word ids) identical.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("qcap", "nndr",
                                             "max_features"),
                   donate_argnums=(0,))
def _chunk_dict_update(train, count, descs, resps, n_kpts, node_active,
                       qcap: int, nndr: float, max_features: int):
    """Scan the chunk's full nodes through search+append on device.

    train (cap,32) f32 [donated], count () int32, descs (K,C,32) u8,
    resps (K,C) f32, n_kpts (K,) int32, node_active (K,) bool.
    Returns (train', count', outs) with per-node outs:
      keep (K,C) bool, unique (K,qcap) bool, i1 (K,qcap) int32,
      count_after (K,) int32, ok (K,) bool (capacity not exceeded).
    """
    cap, _ = train.shape
    C = descs.shape[1]
    qcap = min(qcap, C)
    max_features = min(max_features, C)
    big = jnp.float32(1e30)

    def body(carry, xs):
        train, count = carry
        desc_u8, resp, nk, active = xs
        n = jnp.minimum(nk, C)
        valid = jnp.arange(C) < n

        # ---- limit_keypoints: top max_features by (|r|, larger idx) --
        a = jnp.where(valid, jnp.abs(resp), -1.0)
        # stable argsort over the reversed array breaks ties toward the
        # smaller reversed index == larger original index
        pos = jnp.argsort(-a[::-1], stable=True)
        order = (C - 1) - pos
        kmax = jnp.minimum(jnp.int32(max_features), n)
        keep = jnp.zeros((C,), bool).at[order[:max_features]].set(
            jnp.arange(max_features) < kmax)

        # ---- compact kept rows (row order) to the query pad ----------
        cidx = jnp.argsort(~keep, stable=True)[:qcap]
        q = desc_u8[cidx].astype(jnp.float32)          # (qcap, 32)
        m = jnp.sum(keep)
        kvalid = jnp.arange(qcap) < m

        # ---- top-2 squared-L2 vs rows < count (dictionary.py twin) ---
        tvalid = jnp.arange(cap) < count
        qq = jnp.sum(q * q, axis=1, keepdims=True)
        tt = jnp.sum(train * train, axis=1)
        d = qq + tt[None, :] - 2.0 * jnp.matmul(q, train.T,
                                                precision="default")
        d = jnp.where(tvalid[None, :], d, big)
        d = jnp.maximum(d, 0.0)
        d = jax.lax.optimization_barrier(d)
        cols = jnp.arange(cap, dtype=jnp.int32)
        d1 = jnp.min(d, axis=1)
        d1 = jax.lax.optimization_barrier(d1)
        i1 = jnp.minimum(
            jnp.min(jnp.where(d == d1[:, None], cols[None, :], cap),
                    axis=1), cap - 1)
        i1 = jax.lax.optimization_barrier(i1)
        dm = jnp.where(cols[None, :] == i1[:, None], big, d)
        d2 = jnp.min(dm, axis=1)

        have2 = count >= 2
        unique = kvalid & jnp.where(have2, d1 > np.float32(nndr) * d2,
                                    True) & active
        n_new = jnp.sum(unique).astype(jnp.int32)
        ok = count + qcap <= cap
        n_new = jnp.where(ok, n_new, 0)
        unique = unique & ok

        # append unique rows (k-order) as one contiguous block; rows of
        # the block beyond n_new land beyond the new count and are
        # overwritten by the next append before any search can see them
        aidx = jnp.argsort(~unique, stable=True)
        block = q[aidx]
        train = jnp.where(
            ok,
            jax.lax.dynamic_update_slice(
                train, block, (jnp.where(ok, count, 0), 0)),
            train)
        count = count + n_new
        keep = keep & active
        return (train, count), (keep, unique, i1.astype(jnp.int32),
                                count, ok)

    (train, count), outs = jax.lax.scan(
        body, (train, count), (descs, resps, n_kpts, node_active))
    keep, unique, i1, count_after, ok = outs
    return train, count, dict(keep=keep, unique=unique, i1=i1,
                              count_after=count_after, ok=ok)


class ChunkDictDriver:
    """Owns the device word matrix and drives _chunk_dict_update.

    dispatch() must be called once per chunk IN ORDER, immediately after
    the VO chunk dispatch, with the VO program's device feature arrays;
    fetch() returns the per-node host decisions.  Word-id bookkeeping is
    replayed by VWDictionary.apply_precomputed.
    """
    MIN_CAPACITY = 32768

    def __init__(self, nndr: float, max_features: int, qcap: int = 768):
        import threading
        self.nndr = float(nndr)
        self.max_features = int(max_features)
        # the device program truncates kept rows at qcap while the host
        # keep mask selects up to max_features: qcap must cover it
        self.qcap = max(int(qcap), int(max_features))
        self.capacity = self.MIN_CAPACITY
        self.train = jnp.zeros((self.capacity, 32), jnp.float32)
        self.count = jnp.asarray(0, jnp.int32)
        # host upper bound on the device count: last fetched exact count
        # plus worst-case growth of the chunks still in flight (dispatch
        # runs on the producer thread, fetch on the consumer)
        self._lock = threading.Lock()
        self._base = 0                  # exact count at last fetch
        self._inflight_nodes = 0

    def seed(self, vwd) -> None:
        """Adopt the rows of an existing (host) VWDictionary."""
        need = vwd._count + self.qcap
        while self.capacity < need:
            self.capacity *= 2
        buf = np.zeros((self.capacity, 32), np.float32)
        buf[:vwd._count] = vwd._train[:vwd._count]
        self.train = jnp.asarray(buf)
        self.count = jnp.asarray(vwd._count, jnp.int32)
        self._base = vwd._count

    def _ensure_capacity(self, n_nodes: int) -> None:
        with self._lock:
            self._inflight_nodes += n_nodes
            need = self._base + self._inflight_nodes * self.qcap
        if need <= self.capacity:
            return
        new_cap = self.capacity
        while new_cap < need:
            new_cap *= 2
        pad = jnp.zeros((new_cap - self.capacity, 32), jnp.float32)
        self.train = jnp.concatenate([self.train, pad], axis=0)
        self.capacity = new_cap

    def dispatch(self, descs, resps, n_kpts, node_active) -> dict:
        """descs (K,C,32) u8 / resps (K,C) f32 / n_kpts (K,) i32 device
        arrays (the VO chunk outputs); node_active (K,) host bools."""
        K = int(descs.shape[0])
        self._ensure_capacity(K)   # worst case uses qcap even if C < qcap
        self.train, self.count, outs = _chunk_dict_update(
            self.train, self.count, descs, resps,
            n_kpts.astype(jnp.int32), jnp.asarray(node_active),
            qcap=self.qcap, nndr=self.nndr,
            max_features=self.max_features)
        outs["_k"] = K
        for key, leaf in outs.items():
            if key == "_k":
                continue
            try:
                leaf.copy_to_host_async()
            except Exception:
                break
        return outs

    def fetch(self, handle: dict) -> dict:
        K = handle.pop("_k")
        out = jax.device_get(handle)
        if not bool(np.all(out["ok"])):
            raise RuntimeError("chunk dictionary capacity exceeded")
        with self._lock:
            # exact count replaces this chunk's worst-case contribution
            # (fetches happen in dispatch order)
            self._base = int(out["count_after"][-1])
            self._inflight_nodes -= K
        return out
