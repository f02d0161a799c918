"""Visual odometry: frame container, registration, motion estimation,
odometry state machine.

TPU-native re-design of the reference VO stack
(/root/reference/src/slam/src/core/{SensorData,Registration,
MotionEstimation,Odometry}.cpp): descriptor matching and PnP RANSAC run as
batched device programs (tpuslam.kernels.matching / .pnp); the state
machine and graph bookkeeping stay on host.
"""
