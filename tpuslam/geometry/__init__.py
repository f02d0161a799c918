from .transform import (
    identity,
    compose,
    inverse,
    from_rpy_xyz,
    get_rpy,
    rot_to_quat,
    quat_to_rot,
    translation_norm,
    is_null,
    NULL,
)
from .camera import StereoCameraModel
from .kitti_metric import calc_kitti_sequence_errors, ate_rmse
