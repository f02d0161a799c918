"""Chunked driver for the fused on-device VO (vo/fused.py).

Replaces the per-frame host loop of the reference
(/root/reference/src/slam/src/core/main.cpp:149-308) with a pipelined
chunk loop: while the host unpacks chunk i's results and runs the mapper
(graph bookkeeping, dictionary, loop closure — Mapper.cpp), chunk i+1 is
already executing on the device.  This is the TPU re-expression of the
reference's double-banked FPGA/CPU overlap (SURVEY.md §2.7, FPGA.h:35-53)
at chunk granularity: one image upload and one small result download per
`chunk` frames instead of dozens of round-trips per frame.
"""

from __future__ import annotations

import os
import queue

import numpy as np
import jax

from ..config import SlamConfig
from ..geometry import transform as T
from ..geometry.camera import StereoCameraModel
from ..vo.frame import Frame
from ..vo.fused import make_fused_chunk_fn, FusedShapes
from ..vo.odometry import OdomInfo


def _put_or_raise(q, item, t, err) -> None:
    """q.put that cannot deadlock against a dead consumer: if the
    consumer thread has exited on an exception (err non-empty), the
    bounded queue never drains and a plain put blocks forever — poll
    with a timeout and surface the consumer's error on the producer."""
    while True:
        if err:
            raise err[0]
        try:
            q.put(item, timeout=0.2)
            return
        except queue.Full:
            if not t.is_alive():
                raise err[0] if err else RuntimeError(
                    "pipeline consumer thread died without reporting")


class FastSlamPipeline:
    """Fused-VO chunk driver; optionally feeds a Mapper per frame."""

    def __init__(self, camera: StereoCameraModel, cfg: SlamConfig,
                 chunk: int = 40, capacity: int = 1536,
                 device_dict: bool = True, aot_dir: str | None = None):
        mu = cfg.mapper.map_update
        if chunk % mu:
            chunk += mu - chunk % mu     # align chunks to node cadence
        self.camera = camera
        self.cfg = cfg
        self.chunk = chunk
        self.capacity = capacity
        self.device_dict = device_dict
        shapes = FusedShapes(chunk=chunk, capacity=capacity)
        self._init_carry, self._step, self._offsets = make_fused_chunk_fn(
            camera, cfg, shapes)
        self._jit_step = self._step
        # boot-from-artifact (runtime/aot.py): when a compiled-executable
        # artifact for this exact geometry/config/jax-version exists,
        # load it instead of tracing + compiling the chunk program — the
        # TPU analog of the reference booting its prebuilt bitstream
        self.aot_path = None
        self.aot_loaded = False
        if aot_dir is not None:
            from .aot import chunk_artifact_key
            key = chunk_artifact_key(camera, cfg, self.chunk, capacity)
            self.aot_path = os.path.join(aot_dir, f"chunk_{key}.jaxbin")
            if os.path.exists(self.aot_path):
                try:
                    from .aot import load_compiled_step
                    self._step = load_compiled_step(self.aot_path)
                    self.aot_loaded = True
                except Exception:       # stale/foreign artifact: re-jit
                    self._step = self._jit_step
        self.carry = self._init_carry()
        self._frames = 0
        self._prev_stamp = None
        self._dict_driver = None

    def save_aot(self) -> str | None:
        """Compile the chunk step and persist the executable artifact at
        self.aot_path (no-op when no aot_dir was given or an artifact is
        already loaded).  Returns the path written, or None."""
        if self.aot_path is None or self.aot_loaded:
            return None
        import jax.numpy as jnp
        from .aot import save_compiled_step
        B = self.chunk
        H, W = self.camera.height, self.camera.width
        args = (self._init_carry(),
                jnp.zeros((B, H, W), jnp.uint8),
                jnp.zeros((B, H, W), jnp.uint8),
                jnp.zeros((B,), jnp.float32),
                jnp.zeros((B,), bool))
        self._step = save_compiled_step(self._jit_step, args,
                                        self.aot_path)
        self.aot_loaded = True
        return self.aot_path

    def reset(self):
        self.carry = self._init_carry()
        self._frames = 0
        self._prev_stamp = None
        self._dict_driver = None

    def _attach_dict_driver(self, mapper) -> None:
        """Per-run device dictionary (mapping/chunk_dict.py): one program
        per chunk, chained on the VO chunk's on-device features, so the
        mapper's dictionary work never queues behind in-flight VO chunks
        (tools/exp_chunksweep.py: the per-node dispatches were the
        end-to-end bottleneck, 142 fps without mapper vs 65 with)."""
        self._dict_driver = None
        if mapper is None or not self.device_dict:
            return
        if not getattr(mapper, "device_dict_ok", False):
            return
        from ..mapping.chunk_dict import ChunkDictDriver
        driver = ChunkDictDriver(self.cfg.mapper.dict_nndr,
                                 self.cfg.mapper.max_features_per_node)
        if mapper.vwd._count:
            driver.seed(mapper.vwd)
        self._dict_driver = driver

    # -- device side -------------------------------------------------------
    def stage_chunks(self, items: list[dict]) -> list[tuple]:
        """Pre-upload a sequence to device HBM as padded chunk arrays.

        The sensor->DDR path of the reference (CSI DMA into the PL's
        double banks, FPGA.h:35-53) has no host hop; its TPU analog is
        frames resident in HBM before the loop runs.  Returns a list of
        (lefts_dev, rights_dev, stamps, n) tuples that `dispatch`
        consumes without further transfers."""
        import jax.numpy as jnp
        B = self.chunk
        H, W = self.camera.height, self.camera.width
        staged = []
        for lo in range(0, len(items), B):
            batch = items[lo:lo + B]
            n = len(batch)
            lb = np.zeros((B, H, W), np.uint8)
            rb = np.zeros((B, H, W), np.uint8)
            lb[:n] = np.stack([b["left"] for b in batch])
            rb[:n] = np.stack([b["right"] for b in batch])
            staged.append((jnp.asarray(lb), jnp.asarray(rb),
                           np.array([b["stamp"] for b in batch]), n))
        import jax
        jax.block_until_ready([s[0] for s in staged])
        return staged

    def dispatch(self, lefts: np.ndarray, rights: np.ndarray,
                 stamps: np.ndarray, n_active: int):
        """Launch one chunk on the device (non-blocking).  Returns a
        pending handle for collect().  `lefts`/`rights` may be host
        arrays of the active frames or pre-staged (B,H,W) device arrays
        from stage_chunks()."""
        import jax.numpy as jnp
        B = self.chunk
        H, W = self.camera.height, self.camera.width
        n = int(n_active)
        assert 0 < n <= B

        if isinstance(lefts, jnp.ndarray) and lefts.shape == (B, H, W):
            lb, rb = lefts, rights
        else:
            lb = np.zeros((B, H, W), np.uint8)
            rb = np.zeros((B, H, W), np.uint8)
            lb[:n] = lefts[:n]
            rb[:n] = rights[:n]
        st = np.asarray(stamps, np.float64)
        dts = np.zeros((B,), np.float32)
        prev = self._prev_stamp
        for i in range(n):
            dts[i] = 0.0 if (self._frames + i == 0) \
                else st[i] - (prev if i == 0 else st[i - 1])
        active = np.zeros((B,), bool)
        active[:n] = True

        self.carry, outs, feats = self._step(
            self.carry, jnp.asarray(lb), jnp.asarray(rb),
            jnp.asarray(dts), jnp.asarray(active))
        dict_handle = None
        if self._dict_driver is not None:
            # chain the chunk's dictionary program directly on the VO
            # program's device outputs: VO_i -> dict_i -> VO_{i+1}
            node_active = [off < n for off in self._offsets]
            dict_handle = self._dict_driver.dispatch(
                feats["desc"], feats["kpts"][..., 2], feats["n_kpts"],
                node_active)
        # start the D2H copies early; they overlap the next chunk's
        # compute.  disp_dec stays on device: at ~0.5 MB/chunk it was
        # ~40% of the D2H payload, and nothing in the loop reads it —
        # only post-loop grid export / checkpointing do (lazily, see
        # collect)
        fetch = {k: v for k, v in feats.items() if k != "disp_dec"}
        for leaf in jax.tree_util.tree_leaves((outs, fetch)):
            try:
                leaf.copy_to_host_async()
            except Exception:
                break
        start = self._frames
        self._frames += n
        self._prev_stamp = float(st[n - 1])
        return dict(outs=outs, feats=feats, n=n, start=start,
                    stamps=st[:n], dts=dts[:n], dict_handle=dict_handle)

    # -- host side -----------------------------------------------------------
    def collect(self, pending, gt_poses=None) -> list[tuple[OdomInfo,
                                                            Frame]]:
        """Block on a dispatched chunk; return per-frame (OdomInfo, Frame).

        Full-node frames (mapper cadence) carry features + decimated
        disparity; intermediate frames are feature-less shells — exactly
        what Mapper::createNode keeps of them (Mapper.cpp:73-86)."""
        feats_dev = pending["feats"]
        outs, feats = jax.device_get(
            (pending["outs"],
             {k: v for k, v in feats_dev.items() if k != "disp_dec"}))
        n = pending["n"]
        start = pending["start"]
        off_to_slot = {o: j for j, o in enumerate(self._offsets)}

        results = []
        for i in range(n):
            info = OdomInfo(
                pose=np.asarray(outs["pose"][i]),
                lost=bool(outs["lost"][i]),
                stamp=float(pending["stamps"][i]),
                interval=float(pending["dts"][i]),
                transform=(T.NULL.copy() if outs["lost"][i]
                           else np.asarray(outs["transform"][i])),
                distance_travelled=float(outs["dist"][i]),
                velocity=np.asarray(outs["vel"][i]),
                covariance=np.asarray(outs["cov"][i], np.float64),
                keyframe_added=bool(outs["keyframe"][i]),
                num_inliers=int(outs["n_inliers"][i]),
                num_matches=int(outs["n_matches"][i]),
            )
            gt = None if gt_poses is None else gt_poses[i]
            frame = Frame(stamp=info.stamp, frame_id=start + i, gt_pose=gt)
            slot = off_to_slot.get(i)
            if slot is not None:
                nk = int(feats["n_kpts"][slot])
                kpts3d = np.asarray(feats["pts3d"][slot][:nk])
                frame.kpts = np.asarray(feats["kpts"][slot][:nk])
                frame.kpts3d = kpts3d
                frame.desc = np.asarray(feats["desc"][slot][:nk])
                # device handle, NOT fetched: the ~0.5 MB/chunk of
                # decimated disparity rides HBM until grid export /
                # checkpoint actually reads it (np.asarray there)
                frame.disparity_dec = feats_dev["disp_dec"][slot]
            results.append((info, frame))
        return results

    # -- convenience end-to-end loop ----------------------------------------
    def run(self, items: list[dict], mapper=None) -> list[OdomInfo]:
        """Process `items` (dicts with left/right/stamp and optional
        ground_truth) with chunk-level double buffering: dispatch chunk
        i+1 before unpacking chunk i."""
        self._attach_dict_driver(mapper)
        infos: list[OdomInfo] = []
        pending = None
        pending_gt = None
        for lo in range(0, len(items), self.chunk):
            batch = items[lo:lo + self.chunk]
            lefts = np.stack([b["left"] for b in batch])
            rights = np.stack([b["right"] for b in batch])
            stamps = np.array([b["stamp"] for b in batch])
            gts = [b.get("ground_truth") for b in batch]
            nxt = self.dispatch(lefts, rights, stamps, len(batch))
            if pending is not None:
                infos.extend(self._consume(pending, pending_gt, mapper))
            pending, pending_gt = nxt, gts
        if pending is not None:
            infos.extend(self._consume(pending, pending_gt, mapper))
        if mapper is not None:
            mapper.join_loop_closure()
        return infos

    def run_staged(self, staged: list[tuple], items: list[dict],
                   mapper=None, mapper_async: bool = False
                   ) -> list[OdomInfo]:
        """run() over pre-staged device chunks (see stage_chunks): the
        timed loop contains zero host->device image transfers.

        With `mapper_async`, result unpacking + the mapper run on a
        consumer thread while the producer thread keeps dispatching
        chunks: the VO -> mapper dependency is strictly one-way (loop
        closures feed the post-loop pose graph, never the VO), so this
        is the chunk-level generalization of the reference's worker-
        thread LC overlap (Mapper.cpp:107-124) — the device pipeline
        never stalls on host-side graph bookkeeping.  All mapper work
        completes before this returns.
        """
        self._attach_dict_driver(mapper)
        if not mapper_async:
            infos: list[OdomInfo] = []
            pending = None
            pending_gt = None
            for i, (lb, rb, stamps, n) in enumerate(staged):
                gts = [b.get("ground_truth")
                       for b in items[i * self.chunk:i * self.chunk + n]]
                nxt = self.dispatch(lb, rb, stamps, n)
                if pending is not None:
                    infos.extend(self._consume(pending, pending_gt,
                                               mapper))
                pending, pending_gt = nxt, gts
            if pending is not None:
                infos.extend(self._consume(pending, pending_gt, mapper))
            if mapper is not None:
                mapper.join_loop_closure()
            return infos

        import queue
        import threading
        q: queue.Queue = queue.Queue(maxsize=4)
        results: dict[int, list[OdomInfo]] = {}
        err: list[BaseException] = []

        def consumer():
            while True:
                job = q.get()
                if job is None:
                    return
                idx, pending, gts = job
                try:
                    results[idx] = self._consume(pending, gts, mapper)
                except BaseException as e:   # surfaced on the producer
                    err.append(e)
                    return

        t = threading.Thread(target=consumer, daemon=True)
        t.start()
        for i, (lb, rb, stamps, n) in enumerate(staged):
            gts = [b.get("ground_truth")
                   for b in items[i * self.chunk:i * self.chunk + n]]
            pending = self.dispatch(lb, rb, stamps, n)
            _put_or_raise(q, (i, pending, gts), t, err)
        _put_or_raise(q, None, t, err)
        t.join()
        if err:
            raise err[0]
        if mapper is not None:
            mapper.join_loop_closure()
        return [info for i in sorted(results) for info in results[i]]

    def run_ingest(self, left_paths: list[str], right_paths: list[str],
                   stamps, mapper=None) -> list[OdomInfo]:
        """Full-ingest chunk loop: native PNG decode (banked prefetch
        ring, io/native_loader.py) -> rotating pinned-style host chunk
        buffers -> async H2D upload -> fused chunk dispatch, with result
        unpacking + mapper on a consumer thread.

        This is the measured-loop analog of the reference's sensor->DDR
        DMA into the PL's double banks (xusb_main.c:91-212, FPGA.h:35-53):
        decode threads run ahead, the upload of chunk i+1 overlaps the
        device compute of chunk i (JAX transfers are asynchronous; the
        rotating buffers keep the host from scribbling over a transfer
        still in flight), and nothing in the loop blocks on the mapper.
        """
        import queue
        import threading
        import jax.numpy as jnp
        from ..io.native_loader import NativeStereoLoader

        self._attach_dict_driver(mapper)

        B = self.chunk
        H, W = self.camera.height, self.camera.width
        stamps = np.asarray(stamps, np.float64)
        n_total = len(left_paths)

        q: queue.Queue = queue.Queue(maxsize=4)
        results: dict[int, list[OdomInfo]] = {}
        err: list[BaseException] = []

        def consumer():
            while True:
                job = q.get()
                if job is None:
                    return
                idx, pending = job
                try:
                    results[idx] = self._consume(pending, None, mapper)
                except BaseException as e:
                    err.append(e)
                    return

        t = threading.Thread(target=consumer, daemon=True)
        t.start()

        # two rotating host-side chunk buffers per eye: buffer k may
        # still back an in-flight H2D copy while k^1 is being filled
        bufs = [(np.zeros((B, H, W), np.uint8),
                 np.zeros((B, H, W), np.uint8)) for _ in range(2)]
        in_flight: list = [None, None]   # device arrays backed by bufs[k]
        cur = 0
        chunk_idx = 0
        n_in_chunk = 0
        # lookahead >= one full chunk: while the H2D upload of a chunk
        # occupies the link (seconds on the tunneled chip), the decoder
        # threads must keep filling the ring or the next chunk's fill
        # serializes behind decode (measured ingest_efficiency 0.42 with
        # the default 4 banks)
        loader = NativeStereoLoader(left_paths, right_paths,
                                    n_banks=2 * B + 8, n_threads=4)
        # slab uploads: start the H2D transfer of each quarter-chunk as
        # soon as it is decoded, so the upload of a chunk overlaps the
        # decode of its own tail instead of starting only when the whole
        # chunk is buffered (the non-overlapped head was most of the
        # ingest_efficiency gap on short sequences); the device
        # concatenate at dispatch is one trivial kernel
        SLAB = max(1, B // 4)
        slabs: list = []
        try:
            for idx, left, right in loader:
                if n_in_chunk == 0 and in_flight[cur] is not None:
                    # the previous transfer out of this buffer slot must
                    # have landed before the host scribbles over it
                    # (a no-op by the time the ring comes back around)
                    jax.block_until_ready(in_flight[cur])
                    in_flight[cur] = None
                lb, rb = bufs[cur]
                lb[n_in_chunk] = left
                rb[n_in_chunk] = right
                n_in_chunk += 1
                last = idx == n_total - 1
                if n_in_chunk % SLAB == 0 and n_in_chunk < B and not last:
                    s0 = n_in_chunk - SLAB
                    slabs.append((jnp.asarray(lb[s0:n_in_chunk]),
                                  jnp.asarray(rb[s0:n_in_chunk])))
                if n_in_chunk == B or last:
                    lo = chunk_idx * B
                    if n_in_chunk == B:
                        s0 = len(slabs) * SLAB
                        slabs.append((jnp.asarray(lb[s0:B]),
                                      jnp.asarray(rb[s0:B])))
                        ld = jnp.concatenate([s[0] for s in slabs])
                        rd = jnp.concatenate([s[1] for s in slabs])
                        in_flight[cur] = (ld, rd)
                    else:           # partial tail chunk: host arrays
                        ld, rd = lb, rb
                    slabs = []
                    pending = self.dispatch(
                        ld, rd, stamps[lo:lo + n_in_chunk], n_in_chunk)
                    _put_or_raise(q, (chunk_idx, pending), t, err)
                    chunk_idx += 1
                    n_in_chunk = 0
                    cur ^= 1
        finally:
            while True:            # consumer may be dead with a full queue
                if err or not t.is_alive():
                    break
                try:
                    q.put(None, timeout=0.2)
                    break
                except queue.Full:
                    pass
            t.join()
            loader.close()
        if err:
            raise err[0]
        if mapper is not None:
            mapper.join_loop_closure()
        return [info for i in sorted(results) for info in results[i]]

    def _consume(self, pending, gts, mapper) -> list[OdomInfo]:
        if mapper is not None and pending.get("dict_handle") is not None:
            decisions = self._dict_driver.fetch(pending["dict_handle"])
            start, n = pending["start"], pending["n"]
            for j, off in enumerate(self._offsets):
                if off < n:
                    mapper.word_precomputed[start + off] = (
                        decisions["keep"][j], decisions["unique"][j],
                        decisions["i1"][j], decisions["count_after"][j])
        out = []
        for info, frame in self.collect(pending, gts):
            if mapper is not None:
                mapper.process(frame, info)
            out.append(info)
        return out
