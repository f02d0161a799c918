"""Driver benchmark: end-to-end SLAM frames/sec on one chip.

Runs the flagship fused pipeline (FastSlamPipeline: the whole per-frame
front-end + VO as ONE jitted lax.scan per 40-frame chunk — disparity via
the Pallas strip kernel on TPU, GFTT, ORB, guided matching, PnP — with the
host-side mapper/loop-closure overlapped against device compute) on a
synthetic KITTI-geometry (1241x376) sequence and prints ONE JSON line.

Baseline: the reference's implied real-time bound of 30 fps on the
Ultra96 (BASELINE.md — no absolute fps published in-tree), so
vs_baseline = fps / 30.
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
CACHE = os.path.join(REPO, ".bench_cache", "kittigeo120")
N_FRAMES = 120          # x 1.4 m = 168 m: long enough for the KITTI
CHUNK = 30              # 100-800 m segment metric (t_err/r_err)
SPEED = 1.4             # chunk 30 re-measured best after the Pallas LM
                        # refine + lazy disp_dec round (interleaved A/B:
                        # 317 fps median vs 301 @40 — faster chunks make
                        # the last chunk's D2H+consume tail the binding
                        # overhead, and smaller chunks shrink it)


def ensure_sequence():
    if not os.path.exists(os.path.join(CACHE, "calib.txt")):
        from tpuslam.io.synthetic import make_sequence
        os.makedirs(CACHE, exist_ok=True)
        make_sequence(CACHE, n_frames=N_FRAMES, width=1241, height=376,
                      f=718.856, baseline=0.54, speed=SPEED,
                      yaw_rate=0.003, seed=11)
    return CACHE


def main():
    seq = ensure_sequence()

    from tpuslam.runtime.cache import enable_persistent_cache
    enable_persistent_cache()

    from tpuslam.config import SlamConfig
    from tpuslam.geometry.camera import StereoCameraModel
    from tpuslam.io.dataset import StereoImageDataset
    from tpuslam.runtime.fast_pipeline import FastSlamPipeline
    from tpuslam.mapping.mapper import Mapper

    cfg = SlamConfig()
    camera = StereoCameraModel.load_kitti(
        os.path.join(seq, "calib.txt"), image_size=(1241, 376))
    ds = StereoImageDataset(
        left_dir=os.path.join(seq, "image_0"),
        right_dir=os.path.join(seq, "image_1"),
        times_path=os.path.join(seq, "times.txt"),
        gt_path=os.path.join(seq, "poses.txt"))

    # preload images so disk IO is excluded from the timed region
    items = [ds[i] for i in range(min(N_FRAMES, len(ds)))]

    # boot-from-artifact: a compiled-executable artifact from a previous
    # run loads with zero tracing/compilation (runtime/aot.py — the
    # reference's prebuilt-bitstream boot, doc/petalinux/run:7-8)
    pipe = FastSlamPipeline(camera, cfg, chunk=CHUNK,
                            aot_dir=os.path.join(REPO, ".bench_cache",
                                                 "aot"))
    print(f"# aot artifact: {pipe.aot_path} "
          f"({'loaded' if pipe.aot_loaded else 'absent - will compile'})",
          file=sys.stderr)

    # pre-stage all frames in device HBM: the reference's sensors DMA
    # into the PL's double banks with no host hop (FPGA.h:35-53); the
    # tunneled chip's ~40 MB/s uplink is no real deployment link, so the
    # timed loop measures the framework, not the tunnel
    staged = pipe.stage_chunks(items)

    # warmup pass: first execution of the chunk program (compiles it
    # unless the AOT artifact was loaded; steady-state is what we
    # measure).  After a compiling warmup, persist the executable so
    # every later start boots from the artifact.
    t0 = time.perf_counter()
    pipe.run_staged(staged[:1], items[:CHUNK])
    print(f"# warmup ({'artifact boot' if pipe.aot_loaded else 'compile'}"
          f" + first chunk): {time.perf_counter() - t0:.1f} s",
          file=sys.stderr)
    if not pipe.aot_loaded:
        try:
            t0 = time.perf_counter()
            pipe.save_aot()
            print(f"# aot artifact saved ({time.perf_counter() - t0:.1f}"
                  " s): next start boots from it", file=sys.stderr)
        except Exception as e:
            print(f"# aot save failed: {e}", file=sys.stderr)
    # full-run warmup WITH a mapper: the device dictionary's
    # capacity-step programs and the chained chunk-dict program compile
    # on their first use, which otherwise lands inside measured pass 0
    # (observed 50-60% of steady-state on every round's pass 0)
    pipe.reset()
    m_w = Mapper(camera, cfg.mapper, cfg.matching, cfg.pnp)
    m_w.async_lc = True
    t0 = time.perf_counter()
    pipe.run_staged(staged, items, mapper=m_w, mapper_async=True)
    print(f"# warmup full pass (mapper + dict programs): "
          f"{time.perf_counter() - t0:.1f} s", file=sys.stderr)
    pipe.reset()

    # the chip is tunneled and shared: external tenant load adds bursts
    # of ~25 ms+ per dispatch for minutes at a time (observed 22-43 fps
    # across runs of identical code).  Take the best of five passes so
    # the number measures the framework, not a noisy neighbor.
    infos, dt, best_mapper = None, float("inf"), None
    pass_dts = []
    for attempt in range(5):
        pipe.reset()
        mapper = Mapper(camera, cfg.mapper, cfg.matching, cfg.pnp)
        # dictionary + loop closure on a worker thread, overlapped with
        # the next chunk's device compute (the reference's LC worker,
        # Mapper.cpp:107-124)
        mapper.async_lc = True
        t0 = time.perf_counter()
        run_infos = pipe.run_staged(staged, items, mapper=mapper,
                                    mapper_async=True)
        run_dt = time.perf_counter() - t0
        pass_dts.append(run_dt)
        print(f"# pass {attempt}: {len(items) / run_dt:.2f} fps",
              file=sys.stderr)
        if run_dt < dt:
            # keep the mapper of the winning pass so the post-loop
            # back-end metrics below describe the same run as the gated
            # VO metrics (passes are deterministic, but don't rely on it)
            infos, dt, best_mapper = run_infos, run_dt, mapper
    mapper = best_mapper
    fps = len(items) / dt
    fps_median = len(items) / sorted(pass_dts)[len(pass_dts) // 2]

    # with-ingest pass: native PNG decode + H2D upload inside the
    # measured loop (the reference's sensor->DDR DMA analog,
    # xusb_main.c:91-212).  On real deployment links (PCIe, GB/s) this
    # tracks the staged number; through the tunnel's ~40 MB/s uplink it
    # mostly measures the tunnel (PERF.md), so it becomes the headline
    # only when within 10% of the staged figure.
    ingest_fps = None
    ingest_eff = None
    try:
        import glob
        lpaths = sorted(glob.glob(os.path.join(seq, "image_0",
                                               "*.png")))[:N_FRAMES]
        rpaths = sorted(glob.glob(os.path.join(seq, "image_1",
                                               "*.png")))[:N_FRAMES]
        stamps = [it["stamp"] for it in items]
        pipe.reset()
        m_in = Mapper(camera, cfg.mapper, cfg.matching, cfg.pnp)
        m_in.async_lc = True
        t0 = time.perf_counter()
        infos_in = pipe.run_ingest(lpaths, rpaths, stamps, mapper=m_in)
        ingest_dt = time.perf_counter() - t0
        # link ceiling: a pure H2D pass of the same bytes (decode-free,
        # compute-free) measured at the same moment — ingest cannot beat
        # it; ingest_efficiency says how much of the measured link the
        # overlap actually uses
        import jax
        import numpy as _np
        import jax.numpy as jnp
        t0 = time.perf_counter()
        sink = []
        for lo in range(0, len(items), CHUNK):
            batch = items[lo:lo + CHUNK]
            lb = _np.stack([b["left"] for b in batch])
            rb = _np.stack([b["right"] for b in batch])
            sink.append((jnp.asarray(lb), jnp.asarray(rb)))
        jax.block_until_ready(sink)
        ceiling_dt = time.perf_counter() - t0
        del sink
        ceiling_fps = len(items) / ceiling_dt
        if not any(i.lost for i in infos_in[1:]):
            ingest_fps = len(infos_in) / ingest_dt
            # the tunnel link speed drifts between the two measurements,
            # so the ratio can exceed 1 when the link happened to be
            # faster during ingest; cap — "at the link" is the claim
            ingest_eff = min(1.0, ingest_fps / ceiling_fps)
            print(f"# ingest pass (decode+H2D in loop): "
                  f"{ingest_fps:.2f} fps; pure-H2D link ceiling "
                  f"{ceiling_fps:.2f} fps -> efficiency "
                  f"{ingest_eff:.2f}", file=sys.stderr)
    except Exception as e:  # native toolchain absent etc.
        print(f"# ingest pass skipped: {e}", file=sys.stderr)

    n_lost = sum(1 for i in infos[1:] if i.lost)
    inl = sorted(i.num_inliers for i in infos[1:])
    med_inl = inl[len(inl) // 2]

    # trajectory quality: ATE vs exact synthetic ground truth.  A perf
    # number on a lost tracker is meaningless (round-1 failure mode) —
    # fail loudly instead of reporting it.
    import numpy as np
    est = np.stack([i.pose for i in infos])        # robot-frame poses
    # dataset GT is already optically conjugated to the robot frame
    # (io/dataset.py import_poses, twin of Graph.cpp:32-70)
    gt = np.stack([np.vstack([it["ground_truth"], [0, 0, 0, 1]])
                   if it["ground_truth"].shape == (3, 4)
                   else it["ground_truth"] for it in items])
    ate = float(np.sqrt(np.mean(
        np.sum((est[:, :3, 3] - gt[:, :3, 3]) ** 2, axis=1))))
    # the acceptance metric of the reference itself (KITTI devkit
    # 100-800 m segment errors, KITTI.cpp:90-154) — needs the >=150 m
    # trajectory this sequence provides
    from tpuslam.geometry.kitti_metric import calc_kitti_sequence_errors
    t_err, r_err = calc_kitti_sequence_errors(gt, est)
    print(f"# {len(items)} frames in {dt:.2f} s, lost={n_lost}, "
          f"median inliers={med_inl}, ATE={ate:.3f} m, "
          f"t_err={t_err:.3f} %, r_err={r_err:.6f} deg/m",
          file=sys.stderr)

    # post-loop back-end, untimed like the reference's post-loop stage
    # (main.cpp:317-363): robust pose-graph optimization, then windowed
    # BA over the mapper's keyframes (BASELINE config 2)
    from tpuslam.optim import run_optimize_robust
    from tpuslam.mapping.ba_window import refine_trajectory_global_ba
    poses, links = mapper.get_graph()
    optimized, _ = run_optimize_robust(poses, links, 20, cfg.optimizer)
    # global BA is the post-loop refinement: strictly improves drifted
    # trajectories and is gated to a no-op on clean ones (both pinned in
    # tests/test_ba.py).  The sliding-window variant is the *online*
    # tool; at the noise floor its per-window gauge chaining
    # accumulates mm-scale pose noise that reprojection holdouts cannot
    # see (measured +3% ATE on this artifact), so it is not run here.
    ba_poses = refine_trajectory_global_ba(mapper, optimized, camera)
    ids = sorted(optimized)
    gt_n = gt[[i - 1 for i in ids]]
    for name, pd in (("posegraph", optimized), ("ba", ba_poses)):
        est_n = np.stack([pd[i] for i in ids])
        ate_n = float(np.sqrt(np.mean(
            np.sum((est_n[:, :3, 3] - gt_n[:, :3, 3]) ** 2, axis=1))))
        te, re_ = calc_kitti_sequence_errors(gt_n, est_n)
        print(f"# {name}: ATE={ate_n:.3f} m, t_err={te:.3f} %, "
              f"r_err={re_:.6f} deg/m", file=sys.stderr)
    if n_lost > 0 or med_inl < 300 or t_err > 1.0:
        print(f"# BENCH INVALID: lost={n_lost} median_inliers={med_inl} "
              f"t_err={t_err:.2f}% (gates: 0 lost, >=300 inliers, "
              f"<=1% t_err)", file=sys.stderr)
        sys.exit(1)

    print(f"# median fps across passes: {fps_median:.2f}", file=sys.stderr)
    # median of 5 passes is the headline: the tunneled chip's noise
    # spreads the passes (107-159 fps observed in r4), and best-of-N is
    # the least defensible statistic of that spread.  Best stays as a
    # diagnostic field.
    headline = fps_median
    if ingest_fps is not None and abs(fps_median - ingest_fps) \
            / fps_median < 0.10:
        headline = ingest_fps   # ingest is the honest loop when it keeps up
    # roofline accounting (PERF.md "Roofline" section derives these):
    # per-frame MXU work is dominated by the BM banded box matmuls
    # (49.0 GFLOP) + Hamming/top-2 (~2.5) + dictionary (~1); the
    # analytic light-speed bound sums each stage's max(VPU, MXU, HBM)
    # time at v5e peaks (197 TF bf16, ~3.9 T VPU op/s, 819 GB/s).
    MXU_GFLOP_PER_FRAME = 52.5
    LIGHTSPEED_MS_PER_FRAME = 0.9
    best_ms = 1000.0 / fps
    med_ms = 1000.0 / fps_median
    out = {
        "metric": "slam_e2e_fps_1241x376_1chip",
        "value": round(headline, 3),
        "unit": "frames/s",
        "vs_baseline": round(headline / 30.0, 3),
        "median_fps": round(fps_median, 3),
        "best_fps": round(fps, 3),
        "roofline": {
            "device_ms_per_frame_median": round(med_ms, 3),
            "lightspeed_ms_per_frame": LIGHTSPEED_MS_PER_FRAME,
            "fraction_of_lightspeed": round(
                LIGHTSPEED_MS_PER_FRAME / med_ms, 3),
            "mfu_pct": round(100.0 * MXU_GFLOP_PER_FRAME * 1e9
                             / (med_ms * 1e-3) / 197e12, 2),
        },
    }
    if ingest_fps is not None:
        out["ingest_fps"] = round(ingest_fps, 3)
    if ingest_eff is not None:
        out["ingest_efficiency"] = round(ingest_eff, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
