"""TPU front-end compute kernels.

This package is the TPU-native equivalent of the reference's FPGA fabric
(`/root/reference/src/dvp/rtl`, 14k LoC Verilog) and its CPU OpenCV twins:

  xsobel      — X-Sobel prefilter (xsbl2.v / cv::StereoBM prefilter)
  stereo_bm   — dense SAD block-matching disparity (bm*.v / cv::StereoBM)
  gftt        — Shi-Tomasi min-eigenvalue response (gftt*.v / cv::GFTT)
  orb         — 256-bit ORB descriptors (CvORB.cpp)
  matching    — Hamming / L2 brute-force matchers on the MXU
  pnp         — batched EPnP + RANSAC + Gauss-Newton refinement
  rectify     — stereo rectification remap (rect*.v)
"""

# NOTE: import kernels from their submodules (tpuslam.kernels.stereo_bm,
# .gftt, .orb, ...).  No re-exports here: function names intentionally match
# module names and re-exporting would shadow the submodules.
