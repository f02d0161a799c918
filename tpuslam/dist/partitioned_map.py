"""Multi-host partitioned map: dictionary + keyframe features sharded by
rank (BASELINE config 5).

`dist/multihost.py` shards the *front-end* over processes; every rank
then runs the full back-end, so map memory (visual-word matrix, keyframe
features) is replicated — it grows with trajectory length on every host.
This module partitions the persistent map state instead:

  * **visual words** are owned by rank `word_id % P`.  The incremental
    NNDR search (VWDictionary.cpp:40-115 semantics) becomes a sharded
    top-2: each rank searches its own word rows, the per-rank two best
    (distance, word-id) pairs cross DCN (a few kB), and every rank merges
    them with the single-process tie-break (ascending distance, then
    ascending word id == insertion order).  Word insertion order and ids
    are identical to the single-process dictionary by construction.
  * **tf-idf likelihood** (Mapper.cpp:606-677) is a sum over query words;
    each rank computes the partial over its owned words' reference maps
    and the partials are all-reduced (one (n_candidates,) vector).
  * **keyframe features** (descriptors, keypoints, 3D, decimated
    disparity) are kept only by rank `node_id % P`; the loop-closure
    transform (Mapper.cpp:581-603) is computed by the candidate's owner
    — the query node's features are still fresh on every rank — and the
    accepted link is broadcast (one 4x4 + 6x6 per event).

Per-rank persistent map memory therefore scales ~1/P while graph
bookkeeping (poses, links, word-id lists — tiny) stays replicated, so
any rank can still run the pose-graph optimizer locally.  With P == 1
every collective is the identity and behavior equals mapping.Mapper.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..config import MapperConfig, MatchingConfig, PnPConfig
from ..geometry import transform as T
from ..geometry.camera import StereoCameraModel
from ..mapping.dictionary import VisualWord, _append_rows
from ..mapping.graph import Link, LOOP_CLOSURE
from ..mapping.mapper import Mapper
from ..vo.registration import compute_transform

BIG = np.float32(1e30)


def _allgather(arr: np.ndarray) -> np.ndarray:
    """(P, *arr.shape) across processes (leading dim 1 single-process).

    The default comm; ShardedVWDictionary / PartitionedMapper accept any
    callable with this signature (tests inject a thread-lockstep comm to
    exercise P=2 semantics inside one process)."""
    if jax.process_count() == 1:
        return arr[None]
    from jax.experimental import multihost_utils
    return np.asarray(multihost_utils.process_allgather(arr))


def _comm_f64(comm, arr: np.ndarray) -> np.ndarray:
    """Allgather a float64 payload EXACTLY over any transport.

    With x64 disabled (nowhere enabled in this repo) jax collectives
    silently downcast f64 to f32, which could flip near-threshold
    loop-closure likelihood comparisons vs the single-process mapper.
    Bit-casting to uint32 pairs keeps the collective exact regardless of
    the transport's dtype support (the last axis doubles and is split
    back after the gather)."""
    bits = np.ascontiguousarray(arr, np.float64).view(np.uint32)
    out = np.asarray(comm(bits))
    return out.view(np.float64)


class ShardedVWDictionary:
    """Rank-sharded twin of mapping.dictionary.VWDictionary.

    Owns the descriptor rows and VisualWord reference maps of words with
    `id % P == rank`; search results and insertion decisions are
    identical to the single-process dictionary.
    """
    MIN_CAPACITY = 1024

    def __init__(self, nndr: float = 0.8, rank: int | None = None,
                 world: int | None = None, comm=None):
        self.nndr = nndr
        self.rank = jax.process_index() if rank is None else rank
        self.world = jax.process_count() if world is None else world
        self.comm = comm or _allgather
        self.words: dict[int, VisualWord] = {}   # owned only
        self._last_word_id = 0                   # global, consistent
        self._total_words = 0                    # global count
        self._capacity = self.MIN_CAPACITY
        self._train = np.zeros((self._capacity, 32), np.float32)
        self._word_ids = np.zeros((self._capacity,), np.int64)
        self._count = 0                          # owned rows
        self._train_dev = None
        self._dev_dirty = True

    def __len__(self):
        return self._total_words

    def owned_bytes(self) -> int:
        return self._count * 32 * 4

    def _grow(self, needed: int):
        while self._capacity < needed:
            self._capacity *= 2
        train = np.zeros((self._capacity, 32), np.float32)
        ids = np.zeros((self._capacity,), np.int64)
        train[:self._count] = self._train[:self._count]
        ids[:self._count] = self._word_ids[:self._count]
        self._train, self._word_ids = train, ids
        self._dev_dirty = True

    def _local_top2(self, desc_q: np.ndarray):
        """Two smallest squared-L2 (dist, global word id) pairs per query
        against the OWNED rows; (BIG, -1) where absent."""
        from ..mapping.dictionary import _l2_top2_ids
        q = desc_q.shape[0]
        out = np.full((q, 2, 2), BIG, np.float32)
        out[:, :, 1] = -1.0
        if self._count == 0:
            return out
        if self._dev_dirty or self._train_dev is None:
            self._train_dev = jnp.asarray(self._train)
            self._dev_dirty = False
        d1, i1, d2, i2 = jax.device_get(_l2_top2_ids(
            jnp.asarray(desc_q), self._train_dev, jnp.int32(self._count)))
        out[:, 0, 0] = d1
        out[:, 0, 1] = self._word_ids[i1.astype(np.int64)]
        if self._count >= 2:
            out[:, 1, 0] = d2
            out[:, 1, 1] = self._word_ids[i2.astype(np.int64)]
        return out

    def add_new_words(self, descriptors: np.ndarray,
                      node_id: int) -> list[int]:
        n = len(descriptors)
        if n == 0:
            return []
        desc_f = descriptors.astype(np.float32)

        have2 = self._total_words >= 2
        if have2:
            qcap = 256
            while qcap < n:
                qcap *= 2
            desc_q = np.zeros((qcap, 32), np.float32)
            desc_q[:n] = desc_f
            local = self._local_top2(desc_q)          # (qcap, 2, 2)
            alls = self.comm(local)                   # (P, qcap, 2, 2)
            cands = alls.reshape(-1, qcap, 2, 2)
            cands = np.concatenate([cands[i] for i in range(len(cands))],
                                   axis=1)            # (qcap, 2P, 2)
            # lexicographic (distance, word id) ascending == the single-
            # process first-minimum-row tie-break (rows are wid-ordered)
            order = np.lexsort((cands[:, :, 1], cands[:, :, 0]), axis=-1)
            top = np.take_along_axis(cands, order[:, :, None], axis=1)
            d1 = top[:n, 0, 0]
            w1 = top[:n, 0, 1].astype(np.int64)
            d2 = top[:n, 1, 0]

        old_count = self._count
        word_ids: list[int] = []
        for k in range(n):
            unique = (not have2) or (d1[k] > self.nndr * d2[k])
            if unique:
                wid = self._last_word_id
                self._last_word_id += 1
                self._total_words += 1
                if wid % self.world == self.rank:
                    vw = VisualWord(wid, descriptors[k].copy(), node_id)
                    self.words[wid] = vw
                    if self._count >= self._capacity:
                        self._grow(self._count + 1)
                    self._train[self._count] = desc_f[k]
                    self._word_ids[self._count] = wid
                    self._count += 1
                word_ids.append(wid)
            else:
                wid = int(w1[k])
                if wid % self.world == self.rank:
                    self.words[wid].add_ref(node_id)
                word_ids.append(wid)

        n_new = self._count - old_count
        if n_new and not self._dev_dirty and self._train_dev is not None:
            pad = 256
            while pad < n_new:
                pad *= 2
            if old_count + pad > self._capacity:
                self._dev_dirty = True
            else:
                rows = np.zeros((pad, 32), np.float32)
                rows[:n_new] = self._train[old_count:self._count]
                self._train_dev = _append_rows(
                    self._train_dev, jnp.asarray(rows),
                    jnp.int32(old_count))
        return word_ids

    def get_word(self, word_id: int) -> VisualWord | None:
        return self.words.get(word_id)


class PartitionedMapper(Mapper):
    """Mapper with rank-partitioned persistent state.

    Every rank feeds the SAME deterministic frame stream (the multi-host
    pipeline allgathers front-end features, dist/multihost.py); the
    collectives below therefore run in lock-step.  Loop-closure work is
    synchronous (collectives cannot ride the async worker thread).
    """

    device_dict_ok = False   # rank-sharded dictionary: per-rank search

    def __init__(self, camera: StereoCameraModel,
                 cfg: MapperConfig = MapperConfig(),
                 matching_cfg: MatchingConfig = MatchingConfig(),
                 pnp_cfg: PnPConfig = PnPConfig(),
                 rank: int | None = None, world: int | None = None,
                 comm=None):
        super().__init__(camera, cfg, matching_cfg, pnp_cfg)
        self.rank = jax.process_index() if rank is None else rank
        self.world = jax.process_count() if world is None else world
        self.comm = comm or _allgather
        self.vwd = ShardedVWDictionary(cfg.dict_nndr, self.rank,
                                       self.world, comm=self.comm)

    # loop-closure collectives run in lock-step across ranks; executing
    # them on the async worker thread would deadlock or diverge ranks, so
    # the realtime `async_lc = True` pattern is rejected outright.
    @property
    def async_lc(self) -> bool:
        return False

    @async_lc.setter
    def async_lc(self, value: bool):
        if value:
            raise ValueError(
                "PartitionedMapper runs loop-closure collectives in "
                "lock-step across ranks; async_lc=True is unsupported")

    def owns_node(self, node_id: int) -> bool:
        return node_id % self.world == self.rank

    def owned_feature_bytes(self) -> int:
        total = 0
        for nid, node in self.nodes.items():
            f = node.frame
            for arr in (f.kpts, f.kpts3d, f.desc, f.disparity_dec):
                if arr is not None:
                    total += arr.nbytes
        return total

    # -- partitioned detectLoopClosure ---------------------------------
    def _dictionary_and_loop_closure(self, node) -> Link | None:
        self._add_word_ids(node)

        link = None
        if node.weight >= 0 and self.working_mem:
            candidates = sorted(i for i in self.working_mem
                                if self.nodes[i].weight != -1)
            lik = self._likelihood_allreduce(node, candidates)

            best_id, best_val = 0, 0.0
            for nid, val in lik.items():
                if nid > 0 and val > best_val:
                    best_id, best_val = nid, val

            if best_val >= self.cfg.loop_thr:
                link = self._loop_transform_owner(node, best_id)

        # partition point: drop features of full nodes this rank does not
        # own (the dictionary/LC steps above were their last local use)
        if node.weight >= 0 and not self.owns_node(node.id):
            node.frame.clear_features()
            node.frame.disparity_dec = None
        return link

    def _likelihood_allreduce(self, node, candidates: list[int]):
        partial = np.zeros(len(candidates), np.float64)
        index = {nid: i for i, nid in enumerate(candidates)}
        word_ids = []
        last = None
        for w, _ in node.words:
            if last is None or w != last:
                word_ids.append(w)
                last = w
        N = float(len(self.nodes))
        if N:
            for w in word_ids:
                if w <= 0 or w % self.world != self.rank:
                    continue
                vw = self.vwd.get_word(w)
                if vw is None:
                    continue
                refs = vw.references
                nw = float(len(refs))
                log_nnw = np.log10(N / nw)
                if log_nnw:
                    for ref_node_id, nwi in refs.items():
                        i = index.get(ref_node_id)
                        if i is not None:
                            ref_node = self.nodes.get(ref_node_id)
                            if ref_node is not None and ref_node.words:
                                partial[i] += (float(nwi) * log_nnw) / \
                                    len(ref_node.words)
        total = _comm_f64(self.comm, partial).sum(axis=0)
        return {nid: float(total[i]) for i, nid in enumerate(candidates)}

    def _loop_transform_owner(self, node, best_id: int) -> Link | None:
        """LC transform computed on the candidate's owner, broadcast."""
        payload = np.zeros(1 + 16 + 36, np.float64)
        if self.owns_node(best_id):
            tf, reg = compute_transform(
                self.nodes[best_id].frame, node.frame, None, self.camera,
                nndr=self.matching_cfg.nndr,
                min_inliers=self.pnp_cfg.min_inliers,
                refine_iterations=self.pnp_cfg.refine_iterations,
                seed=node.id)
            if tf is not None:
                payload[0] = 1.0
                payload[1:17] = T.inverse(tf).reshape(-1)
                payload[17:] = np.linalg.inv(reg.covariance).reshape(-1)
        gathered = _comm_f64(self.comm, payload)
        owner = best_id % self.world
        payload = gathered[min(owner, len(gathered) - 1)]
        if payload[0] < 0.5:
            return None
        tf = payload[1:17].reshape(4, 4)
        information = payload[17:].reshape(6, 6)
        self.loop_closures.append((node.id, best_id))
        return Link(node.id, best_id, LOOP_CLOSURE, tf, information)

    def memory_used(self) -> dict[str, int]:
        return {"Mapper.nodes": self.owned_feature_bytes(),
                "Mapper.words": self.vwd.owned_bytes(),
                "Mapper.index": self.vwd._train.nbytes}
