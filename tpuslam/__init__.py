"""tpuslam — a TPU-native stereo visual SLAM engine.

A from-scratch re-design of the capabilities of U96-SLAM
(reference: /root/reference, an Ultra96-V2 FPGA+ARM stereo SLAM) as an
idiomatic JAX/XLA/Pallas framework:

  * front-end vision kernels (rectification, X-Sobel prefilter, SAD
    block-matching disparity, GFTT corner response, ORB descriptors)
    run as batched XLA/Pallas programs on TPU,
  * matching / PnP-RANSAC / pose-graph LM are batched device math,
  * host drives the graph bookkeeping (keyframe memory, loop closure,
    robust optimization) exactly like the reference's CPU back-end.

Layer map (mirrors SURVEY.md §7):
  config      — all reference constants, per-app-mode presets
  geometry    — SE3 transforms, stereo camera model, KITTI metric
  io          — KITTI-style dataset reader, pose/link CSV serialization
  kernels     — TPU front-end compute (the FPGA fabric equivalent)
  vo          — visual odometry state machine, registration, PnP
  mapping     — keyframe memory, visual-word dictionary, loop closure
  optim       — SE3 pose-graph Levenberg-Marquardt, robust outlier loop
  mapping3d   — occupancy voxel map + OctoMap .bt export
  dist        — device-mesh sharding for multi-chip/multi-host scaling
  runtime     — frame pipeline driver, perf tracing, logging
  cli         — application entry points (slam_batch, eval, ...)
"""

__version__ = "0.1.0"

# f32-accurate matmuls everywhere.  TPUs default dot_general/conv inputs
# to bfloat16 (8-bit mantissa); in the fused VO's pose chain that is a
# 2 m quantum at KITTI-scale coordinates (~300 m), and XLA materializes
# duplicated, differently-fused copies of the pose that then disagree —
# observed as inv(kf_pose) @ pose != I one frame after a keyframe, i.e.
# an alternating double-step on any sequence whose keyframe cadence is
# not every-frame.  The only matmuls large enough for bf16 to matter
# economically (Hamming distance, dictionary top-2) consume exact small
# integers and are bit-identical at either precision, so exactness is
# free: highest costs ~3x on <1 GFLOP of MXU work per frame.
import jax as _jax

_jax.config.update("jax_default_matmul_precision", "highest")
