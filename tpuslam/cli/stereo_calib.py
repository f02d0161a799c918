"""Stereo calibration CLI (src/stereo_calib tool twin).

Reads stereo chessboard captures (dir/left_*.png + right_*.png, or
image_0/ + image_1/ subdirs), detects the board, runs stereo
calibration + rectification, and writes intrinsics.yml /
extrinsics.yml (stereo_calib.cpp:303-316) plus per-camera
left_camera.yml / right_camera.yml consumable by the SLAM pipeline's
StereoCameraModel loader.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def _pairs(d: str):
    if os.path.isdir(os.path.join(d, "image_0")):
        l_dir, r_dir = os.path.join(d, "image_0"), os.path.join(d, "image_1")
        names = sorted(os.listdir(l_dir))
        return ([os.path.join(l_dir, n) for n in names],
                [os.path.join(r_dir, n) for n in names])
    names = sorted(os.listdir(d))
    lefts = [os.path.join(d, n) for n in names if n.startswith("left")]
    rights = [os.path.join(d, n) for n in names if n.startswith("right")]
    return lefts, rights


def run(image_dir: str, nx: int = 9, ny: int = 6, square: float = 0.025,
        out_dir: str | None = None, quiet: bool = False) -> dict:
    from PIL import Image
    from ..calib import (find_chessboard, q_matrix, stereo_calibrate,
                         stereo_rectify, write_camera_info_yaml,
                         write_opencv_yaml)

    out_dir = out_dir or image_dir
    lefts, rights = _pairs(image_dir)
    corners_l, corners_r = [], []
    size = None
    for lp, rp in zip(lefts, rights):
        il = np.asarray(Image.open(lp).convert("L"))
        ir = np.asarray(Image.open(rp).convert("L"))
        size = (il.shape[1], il.shape[0])
        cl, okl = find_chessboard(il, nx, ny)
        cr, okr = find_chessboard(ir, nx, ny)
        if okl and okr:
            corners_l.append(cl)
            corners_r.append(cr)
        elif not quiet:
            print(f"board not found in {os.path.basename(lp)} "
                  f"(L {okl} / R {okr})")
    if len(corners_l) < 3:
        raise RuntimeError(
            f"only {len(corners_l)} usable views; need >= 3")

    calib = stereo_calibrate(corners_l, corners_r, nx, ny, square, size)
    R1, R2, P1, P2 = stereo_rectify(calib["K1"], calib["D1"], calib["K2"],
                                    calib["D2"], size, calib["R"],
                                    calib["T"])
    Q = q_matrix(P1, P2)

    write_opencv_yaml(os.path.join(out_dir, "intrinsics.yml"),
                      {"M1": calib["K1"], "D1": calib["D1"],
                       "M2": calib["K2"], "D2": calib["D2"]})
    write_opencv_yaml(os.path.join(out_dir, "extrinsics.yml"),
                      {"R": calib["R"], "T": calib["T"], "R1": R1,
                       "R2": R2, "P1": P1, "P2": P2, "Q": Q})
    write_camera_info_yaml(os.path.join(out_dir, "left_camera.yml"),
                           size[0], size[1], P1, R1, calib["K1"],
                           calib["D1"], "left")
    write_camera_info_yaml(os.path.join(out_dir, "right_camera.yml"),
                           size[0], size[1], P2, R2, calib["K2"],
                           calib["D2"], "right")
    if not quiet:
        b = -P2[0, 3] / P2[0, 0]
        print(f"{len(corners_l)} views, rms {calib['rms']:.4f} px, "
              f"baseline {b * 100:.2f} cm -> intrinsics.yml / "
              f"extrinsics.yml")
    calib.update(R1=R1, R2=R2, P1=P1, P2=P2, Q=Q,
                 n_views=len(corners_l))
    return calib


def main(argv=None):
    ap = argparse.ArgumentParser(description="stereo calibration")
    ap.add_argument("-dir", required=True)
    ap.add_argument("-nx", type=int, default=9)
    ap.add_argument("-ny", type=int, default=6)
    ap.add_argument("-square", type=float, default=0.025)
    ap.add_argument("-out", default=None)
    ap.add_argument("-quiet", action="store_true")
    a = ap.parse_args(argv)
    run(a.dir, a.nx, a.ny, a.square, a.out, a.quiet)


if __name__ == "__main__":
    main()
