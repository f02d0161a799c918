"""Configuration tree for tpuslam.

Every algorithm constant of the reference pipeline is lifted verbatim into
these dataclasses so presets can reproduce its behavior.  Citations are to
/root/reference (see SURVEY.md for the full map).

The reference scatters constants as hard-coded locals at point of use
(e.g. BM params src/slam/src/core/main.cpp:197-216, GFTT
src/slam/src/core/GFTT.cpp:13-18, NNDR src/slam/src/core/Registration.cpp:174,
keyframe thresholds src/slam/src/core/Odometry.cpp:165-166, mapper cadence
src/slam/src/core/Mapper.cpp:17-18).  Here they live in one config tree.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from enum import Enum


class AppMode(str, Enum):
    # reference: src/slam/include/core/Parameters.h:16-22
    SLAM_BATCH = "slam_batch"
    SLAM_REALTIME = "slam_realtime"
    STEREO_CAPTURE = "stereo_capture"
    FRAME_GRABBER = "frame_grabber"
    FPGA_TEST = "fpga_test"        # file-driven kernel-vs-oracle validation


class DepthMethod(str, Enum):
    # reference: src/slam/include/core/Parameters.h:24-30
    BM = "bm"                      # dense SAD block matching (TPU kernel)
    SGBM = "sgbm"                  # semi-global matching (TPU kernel)
    LK = "lk"                      # sparse pyramidal LK stereo correspondence
    CV_BM = "cv_bm"                # OpenCV oracle (tests only)


class KptsMethod(str, Enum):
    GFTT = "gftt"                  # TPU GFTT response + host NMS
    CV_GFTT = "cv_gftt"            # OpenCV oracle (tests only)


@dataclass(frozen=True)
class StereoBMConfig:
    """Dense disparity block matching.

    reference: src/slam/src/core/main.cpp:197-216 (CPU twin) and the PL `bm`
    block configured with winSize 21 / ndisp 64 (src/StereoBM/src/fpga.c:158).
    """
    num_disparities: int = 64
    block_size: int = 21
    min_disparity: int = 0
    prefilter_cap: int = 31        # X-Sobel saturation, main.cpp:204
    texture_threshold: int = 10    # main.cpp:207
    uniqueness_ratio: int = 10     # main.cpp:208
    speckle_window_size: int = 50  # main.cpp:209
    speckle_range: int = 32        # main.cpp:210
    disp12_max_diff: int = 1       # main.cpp:211
    subpixel_scale: int = 16       # int16 disparity is x16 fixed point


@dataclass(frozen=True)
class SGBMConfig:
    """Semi-global block matching (the DEPTH_METHOD_CV_SGBM option).

    reference: src/slam/src/core/main.cpp:218-244 — the cv::StereoSGBM
    positional arguments map to (minDisparity, numDisparities, blockSize,
    P1, P2, disp12MaxDiff, preFilterCap, uniquenessRatio,
    speckleWindowSize, speckleRange, mode=MODE_HH); the in-source comments
    there are shifted by one argument, the values below are what the call
    actually passes.
    """
    min_disparity: int = -64
    num_disparities: int = 128
    block_size: int = 11
    p1: int = 100
    p2: int = 1000
    disp12_max_diff: int = 32
    prefilter_cap: int = 0         # clamped to max(.,15)|1 = 15 internally
    uniqueness_ratio: int = 15
    speckle_window_size: int = 1000
    speckle_range: int = 16        # scaled x16 at the filter (SGBM quirk)


@dataclass(frozen=True)
class GFTTConfig:
    """Shi-Tomasi (min-eigenvalue) corner detection.

    reference: src/slam/src/core/GFTT.cpp:13-18 (CPU) and :47-53 (FPGA path).
    """
    max_features: int = 1500
    quality_level: float = 0.01
    min_distance: float = 7.0
    block_size: int = 3
    use_harris: bool = False
    k: float = 0.04


@dataclass(frozen=True)
class ORBConfig:
    """ORB descriptor (descriptor-only pass over provided keypoints).

    reference: src/slam/src/opencv/CvORB.cpp:12-19.
    """
    scale_factor: float = 2.0
    n_levels: int = 3              # effectively 1: GFTT emits octave 0
    edge_threshold: int = 19
    first_level: int = 0
    wta_k: int = 2
    patch_size: int = 31
    blur_ksize: int = 7            # GaussianBlur 7x7 sigma 2, CvORB.cpp:109-114
    blur_sigma: float = 2.0


@dataclass(frozen=True)
class MatchingConfig:
    """Descriptor matching for registration.

    reference: src/slam/src/core/Registration.cpp.
    """
    nndr: float = 0.8              # Registration.cpp:174,227,330
    guess_win_size: float = 40.0   # radius search in px, Registration.cpp:112
    max_keypoints: int = 1500      # static capacity for padded device arrays


@dataclass(frozen=True)
class PnPConfig:
    """PnP RANSAC motion estimation.

    reference: src/slam/src/core/MotionEstimation.cpp:279-374 and
    src/slam/src/opencv/CvSolvePnP.cpp.
    """
    min_inliers: int = 20          # Registration.cpp:371
    refine_iterations: int = 1     # Registration.cpp:372
    reprojection_error: float = 2.0
    refine_sigma: float = 3.0
    iterations_count: int = 300    # RANSAC hypothesis budget
    confidence: float = 0.99
    model_points: int = 5          # EPnP minimal sample (cv3 RANSAC)
    gn_iterations: int = 10        # Gauss-Newton refine steps (device solve)


@dataclass(frozen=True)
class StereoLKConfig:
    """Sparse LK stereo correspondence (DEPTH_METHOD_CV_LK option).

    reference: src/slam/src/core/Stereo.cpp:9-51.
    """
    win_w: int = 15
    win_h: int = 3
    max_level: int = 5
    iterations: int = 30
    epsilon: float = 0.01
    min_disparity: float = 0.5
    max_disparity: float = 128.0
    min_eig_threshold: float = 1e-4


@dataclass(frozen=True)
class OdometryConfig:
    """Visual odometry state machine.

    reference: src/slam/src/core/Odometry.cpp.
    """
    guess_ratio: float = 0.25      # wrong-guess retry, Odometry.cpp:21,139-142
    keyframe_thr: float = 0.3      # Odometry.cpp:165
    vis_keyframe_thr: int = 150    # Odometry.cpp:166
    initial_cov: float = 9999.0    # Odometry.cpp:126


@dataclass(frozen=True)
class MapperConfig:
    """Keyframe memory management and loop closure.

    reference: src/slam/src/core/Mapper.cpp.
    """
    map_update: int = 5            # full node every 5 frames, Mapper.cpp:17
    max_stm_size: int = 30         # STM capacity, Mapper.cpp:18
    loop_thr: float = 0.2          # LC hypothesis threshold, Mapper.cpp:580
    max_features_per_node: int = 750  # Mapper.cpp:424
    dict_nndr: float = 0.8         # VWDictionary.cpp:43


@dataclass(frozen=True)
class OptimizerConfig:
    """SE3 pose-graph Levenberg-Marquardt.

    reference: src/slam/src/core/HyperGraph.cpp and Optimizer.cpp.
    """
    robust_iterations: int = 5     # per robust round, Optimizer.cpp:177
    final_iterations: int = 20     # main.cpp:328
    outlier_chi2: float = 10.0     # Optimizer.cpp:156
    tau: float = 1e-5              # initial lambda = tau * max_diag, HyperGraph.cpp:16
    lower_step: float = 1.0 / 3.0  # lambda clamp, HyperGraph.cpp:11-12
    upper_step: float = 2.0 / 3.0


@dataclass(frozen=True)
class OccupancyConfig:
    """Occupancy grid map generation.

    reference: src/slam/src/core/main.cpp:495-561.
    """
    resolution: float = 0.1
    range_max: float = 5.0
    disp_decimation: int = 4       # SensorData.cpp:50-58


@dataclass(frozen=True)
class RuntimeConfig:
    """Frame-pipeline execution on TPU."""
    pad_height: int = 384          # KITTI 376 -> 384 (8-sublane aligned)
    pad_width: int = 1280          # KITTI 1241 -> 1280 (128-lane aligned)
    prefetch_depth: int = 2        # double-banked buffers (FPGA.h:35-53 analog)
    use_pallas: bool = True        # pallas kernels where available
    profile: bool = False


@dataclass(frozen=True)
class SlamConfig:
    app: AppMode = AppMode.SLAM_BATCH
    depth_method: DepthMethod = DepthMethod.BM
    kpts_method: KptsMethod = KptsMethod.GFTT
    do_resize: bool = False        # resize input to 640x480
    num_images: int = -1           # -1 = all
    quiet: bool = False
    track_memory: bool = False
    # speckle filtering in the fused front-end: the reference's BATCH
    # mode runs cv::StereoBM with speckle (main.cpp:207-212) while the
    # realtime PL pipeline (bm*.v) has none.  Default False mirrors the
    # PL path and keeps the fused scan free of the filter's
    # data-dependent while_loop; tools/ab_speckle.py measures the A/B
    # (AB_SPECKLE.md: trajectory metrics unchanged on the acceptance
    # sequences).  Set True for strict batch-mode parity.
    fused_speckle: bool = False

    bm: StereoBMConfig = field(default_factory=StereoBMConfig)
    sgbm: SGBMConfig = field(default_factory=SGBMConfig)
    gftt: GFTTConfig = field(default_factory=GFTTConfig)
    orb: ORBConfig = field(default_factory=ORBConfig)
    matching: MatchingConfig = field(default_factory=MatchingConfig)
    pnp: PnPConfig = field(default_factory=PnPConfig)
    lk: StereoLKConfig = field(default_factory=StereoLKConfig)
    odometry: OdometryConfig = field(default_factory=OdometryConfig)
    mapper: MapperConfig = field(default_factory=MapperConfig)
    optimizer: OptimizerConfig = field(default_factory=OptimizerConfig)
    occupancy: OccupancyConfig = field(default_factory=OccupancyConfig)
    runtime: RuntimeConfig = field(default_factory=RuntimeConfig)

    def replace(self, **kw) -> "SlamConfig":
        return dataclasses.replace(self, **kw)


def preset(app: AppMode) -> SlamConfig:
    """Per-app-mode defaults (reference: Parameters.cpp:158-236)."""
    if app == AppMode.SLAM_BATCH:
        return SlamConfig(app=app)
    if app == AppMode.SLAM_REALTIME:
        return SlamConfig(app=app, do_resize=True)
    if app == AppMode.FPGA_TEST:
        return SlamConfig(app=app)
    return SlamConfig(app=app)
