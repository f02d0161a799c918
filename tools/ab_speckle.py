"""A/B: fused front-end with vs without speckle filtering.

The reference's batch mode runs cv::StereoBM with speckleWindowSize 50 /
speckleRange 32 (main.cpp:207-212); the realtime PL pipeline has no
speckle stage.  tpuslam's fused front-end defaults to speckle OFF
(SlamConfig.fused_speckle).  This tool runs the bench-geometry
acceptance sequence both ways and reports trajectory metrics + timing,
writing AB_SPECKLE.md.

Round 5: the speckle filter is a FIXED-trip lax.scan (the round-4
data-dependent while_loop faulted the TPU runtime when fused next to a
pallas_call; kernels/stereo_bm.py _speckle_filter), so the A/B runs
fused on the real TPU at the full bench length — pass --tpu.

Usage: python tools/ab_speckle.py [n_frames] [--tpu]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "--tpu" not in sys.argv:
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")

from tpuslam.runtime.cache import enable_persistent_cache  # noqa: E402
enable_persistent_cache()

import numpy as np  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SEQ = os.path.join(REPO, ".bench_cache", "kittigeo120")


def run_variant(items, camera, speckle: bool):
    import dataclasses
    from tpuslam.config import SlamConfig
    from tpuslam.runtime.fast_pipeline import FastSlamPipeline
    from tpuslam.geometry.kitti_metric import calc_kitti_sequence_errors

    cfg = dataclasses.replace(SlamConfig(), fused_speckle=speckle)
    chunk = 60 if "--tpu" in sys.argv else 20
    pipe = FastSlamPipeline(camera, cfg, chunk=chunk)
    staged = pipe.stage_chunks(items)
    pipe.run_staged(staged[:1], items[:pipe.chunk])      # warmup/compile
    best = 1e9
    infos = None
    for _ in range(3):
        pipe.reset()
        t0 = time.perf_counter()
        infos = pipe.run_staged(staged, items)
        best = min(best, time.perf_counter() - t0)

    lost = sum(1 for i in infos[1:] if i.lost)
    inl = sorted(i.num_inliers for i in infos[1:])
    gt = np.stack([np.vstack([it["ground_truth"], [0, 0, 0, 1]])
                   if it["ground_truth"].shape == (3, 4)
                   else it["ground_truth"] for it in items])
    est = np.stack([i.pose for i in infos])
    ate = float(np.sqrt(np.mean(
        np.sum((est[:, :3, 3] - gt[:, :3, 3]) ** 2, axis=1))))
    t_err, r_err = calc_kitti_sequence_errors(gt, est)
    return dict(speckle=speckle, fps=len(items) / best, lost=lost,
                med_inliers=inl[len(inl) // 2], ate=ate, t_err=t_err,
                r_err=r_err)


def main():
    from tpuslam.geometry.camera import StereoCameraModel
    from tpuslam.io.dataset import StereoImageDataset

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n = int(args[0]) if args else 120
    camera = StereoCameraModel.load_kitti(
        os.path.join(SEQ, "calib.txt"), image_size=(1241, 376))
    ds = StereoImageDataset(
        left_dir=os.path.join(SEQ, "image_0"),
        right_dir=os.path.join(SEQ, "image_1"),
        times_path=os.path.join(SEQ, "times.txt"),
        gt_path=os.path.join(SEQ, "poses.txt"))
    items = [ds[i] for i in range(min(n, len(ds)))]

    rows = []
    for speckle in (False, True):
        r = run_variant(items, camera, speckle)
        print(f"speckle={r['speckle']}: {r['fps']:.1f} fps, "
              f"lost={r['lost']}, med_inl={r['med_inliers']}, "
              f"ATE={r['ate']:.3f} m, t_err={r['t_err']:.3f} %, "
              f"r_err={r['r_err']:.6f}", flush=True)
        rows.append(r)

    md = ["# A/B: speckle filtering on the fused batch front-end",
          "",
          "Reference batch mode filters speckle (main.cpp:207-212); the",
          "PL realtime path does not.  tpuslam defaults to OFF"
          " (`SlamConfig.fused_speckle`); measured on the bench-geometry"
          f" sequence ({len(items)} frames, 1241x376):",
          "",
          "| fused_speckle | fps | lost | med inliers | ATE | t_err |"
          " r_err |",
          "|---|---|---|---|---|---|---|"]
    for r in rows:
        md.append(f"| {r['speckle']} | {r['fps']:.1f} | {r['lost']} | "
                  f"{r['med_inliers']} | {r['ate']:.3f} m | "
                  f"{r['t_err']:.3f} % | {r['r_err']:.6f} deg/m |")
    backend = "TPU (fused chunk program)" if "--tpu" in sys.argv \
        else "CPU"
    md += ["",
           f"Backend: {backend}.  The speckle pass is a fixed-trip",
           "segmented-sweep labeling (convergence-flagged in tests)",
           "fused INTO the chunk program — no while_loop, no crash",
           "workaround (kernels/stereo_bm.py speckle_filter_batch).",
           "",
           "The trade the default makes: speckle ON buys a modest",
           "accuracy gain (a few boundary keypoints get cleaner 3D",
           "lifts) at a ~4x throughput cost — the CC labeling is",
           "irregular-memory work TPUs price heavily.  The default",
           "stays OFF (the reference's REAL-TIME PL path, bm*.v, has no",
           "speckle stage either); batch-parity runs flip",
           "SlamConfig.fused_speckle and take the measured cost."]
    with open(os.path.join(REPO, "AB_SPECKLE.md"), "w") as f:
        f.write("\n".join(md) + "\n")


if __name__ == "__main__":
    main()
