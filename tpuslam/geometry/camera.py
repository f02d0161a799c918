"""Stereo camera model.

Behavioral twin of /root/reference/src/slam/src/core/StereoCameraModel.cpp:

  * loads KITTI `calib.txt` (P0/P1 lines, image size hard-set to 1241x376,
    StereoCameraModel.cpp:71) or an OpenCV-YAML pair
    (image_width/image_height/projection_matrix, :19-66),
  * optional resize-to-640x480 rescale of P (:107-119),
  * baseline = Tx_l/fx_l - Tx_r/fx_r (:124-132),
  * fixed optical->robot local transform (:10-13).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import numpy as np

# optical frame -> robot frame (StereoCameraModel.cpp:10-13)
LOCAL_TRANSFORM = np.array([
    [0.0, 0.0, 1.0, 0.0],
    [-1.0, 0.0, 0.0, 0.0],
    [0.0, -1.0, 0.0, 0.0],
    [0.0, 0.0, 0.0, 1.0],
], dtype=np.float32)


@dataclass
class StereoCameraModel:
    P_l: np.ndarray = field(default_factory=lambda: np.zeros((3, 4)))
    P_r: np.ndarray = field(default_factory=lambda: np.zeros((3, 4)))
    width: int = 0
    height: int = 0

    # --- accessors (StereoCameraModel.h) -------------------------------
    @property
    def fx_l(self): return float(self.P_l[0, 0])
    @property
    def fy_l(self): return float(self.P_l[1, 1])
    @property
    def cx_l(self): return float(self.P_l[0, 2])
    @property
    def cy_l(self): return float(self.P_l[1, 2])
    @property
    def Tx_l(self): return float(self.P_l[0, 3])
    @property
    def fx_r(self): return float(self.P_r[0, 0])
    @property
    def fy_r(self): return float(self.P_r[1, 1])
    @property
    def cx_r(self): return float(self.P_r[0, 2])
    @property
    def cy_r(self): return float(self.P_r[1, 2])
    @property
    def Tx_r(self): return float(self.P_r[0, 3])

    @property
    def K_l(self) -> np.ndarray:
        return np.ascontiguousarray(self.P_l[:3, :3])

    @property
    def local_transform(self) -> np.ndarray:
        return LOCAL_TRANSFORM

    def baseline(self) -> float:
        # StereoCameraModel.cpp:124-132
        if self.fx_r != 0.0 and self.fx_l != 0.0:
            return self.Tx_l / self.fx_l - self.Tx_r / self.fx_r
        return 0.0

    # --- loaders --------------------------------------------------------
    @classmethod
    def load_kitti(cls, calib_path: str, do_resize: bool = False,
                   image_size: tuple[int, int] = (1241, 376)) -> "StereoCameraModel":
        """KITTI odometry calib.txt: P0 (left gray) / P1 (right gray).

        reference: StereoCameraModel.cpp:69-103 (image size hardcoded
        1241x376 because KITTI calib does not carry it).
        """
        P = {}
        with open(calib_path) as f:
            for line in f:
                m = re.match(r"(P\d):\s*(.*)", line.strip())
                if m:
                    vals = np.array([float(v) for v in m.group(2).split()],
                                    dtype=np.float64)
                    P[m.group(1)] = vals.reshape(3, 4)
        model = cls(P_l=P["P0"], P_r=P["P1"],
                    width=image_size[0], height=image_size[1])
        if do_resize:
            model._resize_to(640, 480)
        return model

    @classmethod
    def load_opencv_yaml(cls, left_path: str, right_path: str,
                         do_resize: bool = False) -> "StereoCameraModel":
        """OpenCV-FileStorage YAML calibration pair.

        reference: StereoCameraModel.cpp:27-66.  Parsed without cv2 so the
        loader works in minimal environments.
        """
        def parse(path):
            width = height = None
            proj = None
            text = open(path).read()
            mw = re.search(r"image_width[:\s]+(\d+)", text)
            mh = re.search(r"image_height[:\s]+(\d+)", text)
            if mw:
                width = int(mw.group(1))
            if mh:
                height = int(mh.group(1))
            mp = re.search(
                r"projection_matrix:.*?data:\s*\[([^\]]*)\]", text, re.S)
            if mp:
                vals = [float(v) for v in mp.group(1).replace("\n", " ").split(",")]
                proj = np.array(vals, dtype=np.float64).reshape(3, 4)
            return width, height, proj

        w, h, P_l = parse(left_path)
        _, _, P_r = parse(right_path)
        model = cls(P_l=P_l, P_r=P_r, width=w or 0, height=h or 0)
        if do_resize:
            model._resize_to(640, 480)
        return model

    def _resize_to(self, w: int, h: int):
        # StereoCameraModel.cpp:107-119
        sx = w / self.width
        sy = h / self.height
        for P in (self.P_l, self.P_r):
            P[0, 0] *= sx  # fx
            P[0, 2] *= sx  # cx
            P[0, 3] *= sx  # Tx
            P[1, 1] *= sy  # fy
            P[1, 2] *= sy  # cy
            P[1, 3] *= sy  # Ty
        self.width, self.height = w, h


def project_disparity_to_3d(pts2d: np.ndarray, disp: np.ndarray,
                            model: StereoCameraModel) -> np.ndarray:
    """Disparity -> 3D in the optical frame, vectorized.

    reference: src/slam/src/core/Stereo.cpp:157-182:
      c  = cx_r - cx_l
      Wx = (Tx_l/fx_l - Tx_r/fx_r) / (d + c)
      Wy = (Tx_l/fy_l - Tx_r/fy_r) / (d + c)
      X = (u - cx_l) Wx ; Y = (v - cy_l) Wy ; Z = fx_l Wx
    Non-positive disparity yields NaN (Stereo.cpp:175-180).
    """
    pts2d = np.asarray(pts2d, dtype=np.float32).reshape(-1, 2)
    disp = np.asarray(disp, dtype=np.float32).reshape(-1)
    c = np.float32(model.cx_r - model.cx_l)
    denom = disp + c
    wx_n = np.float32(model.Tx_l / model.fx_l - model.Tx_r / model.fx_r)
    wy_n = np.float32(model.Tx_l / model.fy_l - model.Tx_r / model.fy_r)
    with np.errstate(divide="ignore", invalid="ignore"):
        Wx = wx_n / denom
        Wy = wy_n / denom
        x = (pts2d[:, 0] - np.float32(model.cx_l)) * Wx
        y = (pts2d[:, 1] - np.float32(model.cy_l)) * Wy
        z = np.float32(model.fx_l) * Wx
    out = np.stack([x, y, z], axis=-1)
    out[disp <= 0.0] = np.nan
    return out
