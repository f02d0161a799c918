"""Pose-graph optimization: SE3 Levenberg-Marquardt with robust
loop-closure outlier ejection.

TPU-native re-design of /root/reference/src/slam/src/core/{HyperGraph,
GraphVertex,GraphEdge,Optimizer}.cpp and g2o/SE3Gradient.cpp: per-edge
errors, analytic Jacobians and quadratic-form blocks are computed batched
over all edges (vectorized; the arithmetic is exactly the reference's),
then the damped system solves via sparse LDLT on host f64 — graphs are
O(1k) poses where the solve is a microscopic fraction of frame time.
"""

from .pose_graph import PoseGraphOptimizer, run_optimize, run_optimize_robust  # noqa: F401
