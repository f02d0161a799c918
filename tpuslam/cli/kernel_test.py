"""Kernel A/B test harness (FPGA_TEST app-mode twin).

The reference's FPGA_TEST mode (/root/reference/src/slam/src/core/
main.cpp:165-181, Parameters.h:21) injects the *same files* into the
hardware pipeline that SLAM_BATCH feeds through OpenCV, so the two
implementations can be diffed stage by stage.  Here the two sides are:

  A) the hardware-semantics kernels (fixed-point rectifier + HW bilinear
     warp, 6-bit xsobel, int16 x16 SAD disparity)
  B) float/CPU-twin oracles of the same stages

Each stage's outputs are diffed and dumped (SensorData dump twins), and
the shipped golden PL data is checked when the input is the golden rect
pair.  Exit status is nonzero on any tolerance breach.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def run(left_path: str | None = None, right_path: str | None = None,
        out_dir: str = "kernel_test_out", quiet: bool = False) -> dict:
    from ..config import StereoBMConfig
    from ..kernels.rectify import (StereoRectifier, remap_bilinear,
                                   rect_map_fixed, REFERENCE_CALIB)
    from ..kernels.stereo_bm import (prefilter_xsobel, prefilter_xsobel_hw,
                                     stereo_bm)
    from ..kernels.gftt import gftt_response
    from ..runtime.dumps import (save_depth_image, save_eigenvalue,
                                 save_rect_image_pair)

    fixtures = os.path.join(os.path.dirname(__file__), "..", "..",
                            "tests", "fixtures")
    if left_path is None:
        left_path = os.path.join(fixtures, "rect_left.npy")
        right_path = os.path.join(fixtures, "rect_right.npy")

    def load(p):
        if p.endswith(".npy"):
            return np.load(p)
        from PIL import Image
        return np.asarray(Image.open(p).convert("L"))

    left = load(left_path)
    right = load(right_path)
    os.makedirs(out_dir, exist_ok=True)
    report: dict[str, dict] = {}

    # --- rectifier: fixed-point vs float path on the raw stimulus ------
    raw_l = np.load(os.path.join(fixtures, "raw_left.npy"))
    rect_hw = StereoRectifier.from_reference_calib()
    out_hw, _ = rect_hw(raw_l, raw_l)
    cam = REFERENCE_CALIB[0]
    mx, my = rect_map_fixed(cam, 480, 640)
    out_fl = np.asarray(remap_bilinear(raw_l, mx / 32.0, my / 32.0))
    m = np.asarray(out_hw) > 0
    diff = np.abs(np.asarray(out_hw).astype(float) - out_fl)[m]
    report["rectify_hw_vs_float"] = {
        "max_abs": float(diff.max()), "mean_abs": float(diff.mean()),
        "pass": bool(diff.max() <= 1.5)}
    save_rect_image_pair(out_dir, 0, np.asarray(out_hw), out_fl)

    # --- xsobel: HW 6-bit vs CPU-twin (cap 31) + golden check ----------
    hw = np.asarray(prefilter_xsobel_hw(left))
    cpu = np.asarray(prefilter_xsobel(left))
    # centers differ (32 vs 31); compare recentered interiors
    d = np.abs(hw[1:-1, 1:-1].astype(int) - 32
               - (cpu[1:-1, 1:-1].astype(int) - 31))
    report["xsobel_hw_vs_cpu"] = {
        "max_abs": float(d.max()),
        "pass": bool((d <= 1).mean() > 0.999)}
    gold_p = os.path.join(fixtures, "xsbl_left.npy")
    if os.path.exists(gold_p) and left_path.endswith("rect_left.npy"):
        gold = np.load(gold_p)
        report["xsobel_vs_golden"] = {
            "mismatches": int((hw != gold).sum()),
            "pass": bool(np.array_equal(hw, gold))}

    # --- disparity + gftt dumps on the input pair ----------------------
    disp = np.asarray(stereo_bm(left, right, StereoBMConfig()))
    eig = np.asarray(gftt_response(left, 3))
    save_depth_image(out_dir, 0, disp)
    save_eigenvalue(out_dir, 0, eig)
    valid = disp > 0
    report["disparity"] = {
        "valid_frac": float(valid.mean()),
        "mean_disp": float((disp[valid] / 16.0).mean()) if valid.any()
        else 0.0,
        "pass": bool(valid.mean() > 0.1)}

    ok = all(v.get("pass", True) for v in report.values())
    report["all_pass"] = ok
    if not quiet:
        for k, v in report.items():
            print(k, v)
    return report


def main(argv=None):
    ap = argparse.ArgumentParser(description="kernel A/B test harness")
    ap.add_argument("-l", dest="left", default=None)
    ap.add_argument("-r", dest="right", default=None)
    ap.add_argument("-out", default="kernel_test_out")
    ap.add_argument("-quiet", action="store_true")
    a = ap.parse_args(argv)
    report = run(a.left, a.right, a.out, a.quiet)
    raise SystemExit(0 if report["all_pass"] else 1)


if __name__ == "__main__":
    main()
