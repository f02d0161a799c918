"""Multi-chip scaling: device mesh, frame-parallel front-end, sharded
pose-graph Gauss-Newton.

The reference's parallel structure (SURVEY.md §2.7) — PL dataflow blocks
+ double-banked DDR + A53/R5 pipeline — maps onto TPU as:

  * frame-parallel front-end: the per-frame vision pipeline is
    embarrassingly parallel over frames -> shard the frame axis across
    the mesh (`shard_map`), no collectives needed,
  * sharded pose-graph/BA: edges sharded across devices, each computes
    partial normal equations, `psum` over ICI, replicated dense solve —
    the distributed-BA analog the reference lacks (its LM is one Eigen
    thread).
"""

from .mesh import make_mesh, sharded_frontend_step, sharded_pose_graph_step  # noqa: F401
